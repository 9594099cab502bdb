package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** `top2_by(v, k)` — the top-2 (v DOUBLE, k BIGINT) pairs of a group,
  * ordered v DESC then k ASC, as ARRAY<STRUCT<v, k>> (shorter when the
  * group holds fewer qualifying rows; null-v/null-k rows are skipped).
  *
  * This is the SCALE twin of the generic `topk` TypedImperativeAggregate
  * (`TopKRows.scala`). The generic form carries an object buffer, so
  * Catalyst plans it as ObjectHashAggregate — whose hash map falls back
  * to SORT-BASED aggregation past
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
  * 128!) distinct keys per task. On a high-cardinality group key
  * (orders per customer: 15M groups at sf100) every task trips the
  * fallback immediately and the "bounded top-k agg" silently becomes a
  * full external sort of the fact — exactly the 150M-row spill the agg
  * was chosen to avoid (observed: 35 GB of spill and a wedged run at
  * sf100, r16). Here the buffer is four primitive slots
  * (v1, k1, v2, k2), so the planner picks HashAggregateExec: whole-stage
  * codegen, an UnsafeRow-backed vectorized map with NO row-count
  * fallback (under memory pressure it spills the MAP and merges spills
  * — bounded by distinct keys per partition, not input rows), and
  * map-side partials that stay 32 bytes per group at any scale.
  *
  * Sentinel contract: empty slots hold (−∞, Long.MaxValue), which any
  * real (finite v, k) row beats under the (v DESC, k ASC) order; inputs
  * of v = −∞ are therefore indistinguishable from empty and are
  * excluded from the output (fine for the monetary/metric columns this
  * aggregates; the generic `topk` has no such restriction).
  *
  * k > 2 wants the same pattern with 2k slots (or the generic `topk`
  * where group cardinality is modest); 2 covers the gated rank ≤ 2
  * window keys.
  */
case class Top2By(valueExpr: Expression, keyExpr: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(valueExpr, keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = Top2By.outType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (valueExpr.dataType == DoubleType && keyExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top2_by needs (DOUBLE, BIGINT); got " +
          s"(${valueExpr.dataType.simpleString}, ${keyExpr.dataType.simpleString})")
  }

  private val v1 = AttributeReference("v1", DoubleType, nullable = false)()
  private val k1 = AttributeReference("k1", LongType, nullable = false)()
  private val v2 = AttributeReference("v2", DoubleType, nullable = false)()
  private val k2 = AttributeReference("k2", LongType, nullable = false)()

  override val aggBufferAttributes: Seq[AttributeReference] =
    Seq(v1, k1, v2, k2)

  private def negInf = Literal(Double.NegativeInfinity)
  private def maxK = Literal(Long.MaxValue)

  override val initialValues: Seq[Expression] =
    Seq(negInf, maxK, negInf, maxK)

  /** (av, ak) strictly before (bv, bk) under v DESC, k ASC. */
  private def beats(av: Expression, ak: Expression,
      bv: Expression, bk: Expression): Expression =
    Or(GreaterThan(av, bv), And(EqualTo(av, bv), LessThan(ak, bk)))

  override lazy val updateExpressions: Seq[Expression] = {
    val skip = Or(IsNull(valueExpr), IsNull(keyExpr))
    val nv = KnownNotNull(valueExpr)
    val nk = KnownNotNull(keyExpr)
    val b1 = beats(nv, nk, v1, k1)
    val b2 = beats(nv, nk, v2, k2)
    Seq(
      If(skip, v1, If(b1, nv, v1)),
      If(skip, k1, If(b1, nk, k1)),
      If(skip, v2, If(b1, v1, If(b2, nv, v2))),
      If(skip, k2, If(b1, k1, If(b2, nk, k2))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // both sides are internally ordered (slot 1 beats slot 2), so the
    // merged top-2 is: the better slot-1, then the better of (loser's
    // slot-1, winner's slot-2)
    val lWins = beats(v1.left, k1.left, v1.right, k1.right)
    Seq(
      If(lWins, v1.left, v1.right),
      If(lWins, k1.left, k1.right),
      If(lWins,
        If(beats(v2.left, k2.left, v1.right, k1.right), v2.left, v1.right),
        If(beats(v1.left, k1.left, v2.right, k2.right), v1.left, v2.right)),
      If(lWins,
        If(beats(v2.left, k2.left, v1.right, k1.right), k2.left, k1.right),
        If(beats(v1.left, k1.left, v2.right, k2.right), k1.left, k2.right)))
  }

  override lazy val evaluateExpression: Expression = {
    def entry(v: Expression, k: Expression) = CreateNamedStruct(
      Seq(Literal("v"), v, Literal("k"), k))
    def empty(v: Expression, k: Expression) =
      And(EqualTo(v, negInf), EqualTo(k, maxK))
    If(empty(v1, k1),
      Literal.create(Array.empty[Any], Top2By.outType),
      If(empty(v2, k2),
        CreateArray(Seq(entry(v1, k1))),
        CreateArray(Seq(entry(v1, k1), entry(v2, k2)))))
  }

  override def prettyName: String = "top2_by"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Top2By =
    copy(valueExpr = newChildren(0), keyExpr = newChildren(1))
}

object Top2By {
  val outType: ArrayType = ArrayType(StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("k", LongType, nullable = false))), containsNull = false)
}
