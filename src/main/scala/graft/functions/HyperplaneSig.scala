package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the 6-bit hyperplane sign bucket used by
  * `ann_hyperplane_topk` (SURVEY.md §2C ANN path). Replaces the last
  * interpreted nested-HOF fold in the engine —
  * `aggregate(sequence(0,5), … aggregate(zip_with(…)))` at ~1 ms/row
  * (the measured cost class behind both round-11 scale bugs).
  *
  * Bit p (p ∈ 0..5) is set iff Σ_j embedding(j) · sin(p·64 + j) > 0,
  * accumulated in ascending j — the SAME double-op sequence as the HOF
  * and the DuckDB oracle's sin() CTE, so buckets are bit-identical
  * (SimilaritySpec pins native == HOF on data AND degenerate edges).
  *
  * HOF edge semantics preserved exactly:
  *  - length ≠ 64 or any null element → every zip_with product chain is
  *    NULL, every CASE falls through → bucket 0 (NOT null);
  *  - a NaN element makes a plane's dot NaN, and Spark's `>` orders NaN
  *    above every value → that bit is SET (java primitive `>` would
  *    drop it — the one place naive nativization would diverge).
  */
case class HyperplaneSig(child: Expression) extends UnaryExpression {

  private def elemFloat: Option[Boolean] = child.dataType match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemFloat.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    HyperplaneSig.compute(a.asInstanceOf[ArrayData], elemFloat.contains(true))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HyperplaneSig.compute($a, ${elemFloat.contains(true)});")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sig"
}

object HyperplaneSig {

  val NPLANES = 6
  val DIM = 64

  /** 6×64 plain-sin plane matrix — w(p, d) = sin(p·64 + d); single source
    * of truth for the native expression, the HOF twin in the spec, and
    * the DuckDB oracle CTE (which recomputes sin() directly). */
  val planes: Array[Array[Double]] =
    Array.tabulate(NPLANES, DIM)((p, d) => math.sin((p * DIM + d).toDouble))

  /** Shared by interpreted eval and generated code. */
  def compute(x: ArrayData, isFloat: Boolean): Long = {
    val n = x.numElements()
    if (n != DIM) return 0L
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return 0L; i += 1 }
    var sig = 0L
    var p = 0
    while (p < NPLANES) {
      val w = planes(p)
      var dot = 0.0
      var j = 0
      while (j < DIM) {
        dot += (if (isFloat) x.getFloat(j).toDouble else x.getDouble(j)) * w(j)
        j += 1
      }
      // Spark's GreaterThan orders NaN above all doubles (SQLOrderingUtil),
      // so a NaN dot sets the bit exactly as the HOF CASE does.
      if (dot > 0.0 || java.lang.Double.isNaN(dot)) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
