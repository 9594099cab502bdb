package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: nearest-centroid assignment
  * `argmax_dot(v, cs)` — for a vector v ARRAY<DOUBLE> and a centroid
  * table cs ARRAY<STRUCT<c: BIGINT, cv: ARRAY<DOUBLE>>>, the `c` of the
  * centroid maximizing the dot product v·cv, earliest (lowest array
  * position) winner on ties. −1 when no centroid wins the nan-safe `>`
  * against the −2.0 seed: an empty table, every cv skipped (below), or
  * every dp < −2 (unreachable for normalized inputs — the seed exists
  * to sort below any real cosine, exactly as in the HOF fold).
  *
  * This is the codegen upgrade of the k-means assignment fold in
  * `Similarity.assignCells` (r11 s3): the interpreted nested-HOF form
  * (`aggregate(transform(cs, named_struct(dp, …)))`) costs ~1 ms/row at
  * K=10×64 dims — it was the whole-corpus bottleneck the sf10 LLM
  * artifact caught in `semantic_dedup` (and the latent cost of every
  * `ivf_*` key). Bit-fidelity contract, pinned by FunctionsSpec:
  *
  *  - dp accumulates left-to-right from 0.0 exactly like
  *    `aggregate(zip_with(v, cv, (x, y) -> x * y), 0D, (a, x) -> a + x)`;
  *  - the winner comparison replicates Spark SQL's nan-safe `>`
  *    (NaN counts as greater than every non-NaN, equal to NaN, and
  *    ±0.0 compare equal), against the same −2.0/−1 seed accumulator —
  *    so an all-NaN row picks the FIRST centroid, as the HOF does;
  *  - degenerate inputs follow the HOF's null algebra rather than
  *    reading garbage: a centroid whose cv length differs from v, or
  *    with any null element/field on the dot-product path, yields a
  *    null dp in the HOF (zip_with pads with null) and the null fails
  *    `IF(x.dp > acc.dp)` — so here such centroids are SKIPPED; a
  *    winning centroid whose `c` itself is null makes the whole HOF
  *    fold null — so here the expression returns null.
  */
case class ArgmaxDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private val centType: DataType = ArrayType(
    StructType(Seq(
      StructField("c", LongType, nullable = false),
      StructField("cv", ArrayType(DoubleType, containsNull = false),
        nullable = false))),
    containsNull = false)

  private def okCents(t: DataType): Boolean = t match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _),
      StructField(_, ArrayType(DoubleType, _), _, _))), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(DoubleType, _) if okCents(right.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"argmax_dot expects (ARRAY<DOUBLE>, ${centType.sql}), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  // null even for non-null children: a winning centroid with a null `c`
  // yields null, matching the HOF fold's null algebra
  override def nullable: Boolean = true

  /** Spark SQL's nan-safe strict >: NaN > non-NaN, NaN == NaN, ±0 equal. */
  private def nanSafeGt(x: Double, y: Double): Boolean =
    if (java.lang.Double.isNaN(x)) !java.lang.Double.isNaN(y)
    else if (java.lang.Double.isNaN(y)) false
    else x > y

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    var best = -2.0
    var bestC = -1L
    var bestCNull = false
    var j = 0
    while (j < cs.numElements()) {
      if (!cs.isNullAt(j)) {
        val row = cs.getStruct(j, 2)
        if (!row.isNullAt(1)) {
          val cv = row.getArray(1)
          if (cv.numElements() == v.numElements()) {
            val n = v.numElements()
            var dp = 0.0
            var ok = true
            var i = 0
            while (ok && i < n) {
              if (v.isNullAt(i) || cv.isNullAt(i)) ok = false
              else { dp += v.getDouble(i) * cv.getDouble(i); i += 1 }
            }
            if (ok && nanSafeGt(dp, best)) {
              best = dp
              bestCNull = row.isNullAt(0)
              bestC = if (bestCNull) -1L else row.getLong(0)
            }
          }
        }
      }
      j += 1
    }
    if (bestCNull) null else bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dp = ctx.freshName("dp")
      val ok = ctx.freshName("ok")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val bestCNull = ctx.freshName("bestCNull")
      val row = ctx.freshName("row")
      val cv = ctx.freshName("cv")
      val gt = ctx.freshName("gt")
      s"""
         |double $best = -2.0; long $bestC = -1L; boolean $bestCNull = false;
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  if ($b.isNullAt($j)) continue;
         |  org.apache.spark.sql.catalyst.InternalRow $row = $b.getStruct($j, 2);
         |  if ($row.isNullAt(1)) continue;
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $row.getArray(1);
         |  int $n = $a.numElements();
         |  if ($cv.numElements() != $n) continue;
         |  double $dp = 0.0;
         |  boolean $ok = true;
         |  for (int $i = 0; $ok && $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $cv.isNullAt($i)) { $ok = false; }
         |    else { $dp += $a.getDouble($i) * $cv.getDouble($i); }
         |  }
         |  if (!$ok) continue;
         |  boolean $gt;
         |  if (java.lang.Double.isNaN($dp)) $gt = !java.lang.Double.isNaN($best);
         |  else if (java.lang.Double.isNaN($best)) $gt = false;
         |  else $gt = $dp > $best;
         |  if ($gt) {
         |    $best = $dp;
         |    $bestCNull = $row.isNullAt(0);
         |    $bestC = $bestCNull ? -1L : $row.getLong(0);
         |  }
         |}
         |${ev.isNull} = $bestCNull;
         |${ev.value} = $bestC;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "argmax_dot"
}
