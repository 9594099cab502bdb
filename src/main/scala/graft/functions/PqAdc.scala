package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: product-quantization asymmetric-distance
  * scoring `pq_adc(codes, tab)` — the ADC inner loop of IVF-PQ ANN
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011, §IV-A).
  *
  *  - `codes` BINARY: a vector's packed PQ code word, two 4-bit codes
  *    per byte (high nibble = even subspace, low nibble = odd), so M =
  *    2 × length(codes) subspaces with 16 codebook entries each;
  *  - `tab` ARRAY<DOUBLE>: the query's flat distance table, slot
  *    m·16 + j = dot(query subvector m, codebook entry j) — built once
  *    per query from the trained codebooks, broadcast to every row.
  *
  * Returns Σ_m tab[m·16 + code_m], accumulated left-to-right from 0.0
  * in subspace order — the approximate dot(query, vector) with the
  * vector reproduced from its codebook entries. That m-ordered
  * accumulation is the cross-engine contract: the DuckDB oracle replays
  * it as list_dot_product(list(dp ORDER BY m), [1.0, …]), which
  * multiplies each term by exactly 1.0 and folds in the same order, so
  * both engines produce the identical double.
  *
  * Why an expression and not a HOF: the scoring loop runs once per
  * candidate row inside the probe scan — the exact shape where the
  * interpreted nested-HOF fold cost `assignCells` ~1 ms/row before
  * `argmax_dot` (the pattern this follows). With doGenCode the whole
  * probe stays inside whole-stage codegen: unpack two nibbles per byte,
  * two flat array reads, one add — no per-row allocation.
  *
  * Null algebra: null children → null (BinaryExpression default); a
  * table too short for the code word or a null table slot the codes
  * actually reference → null (a live lookup must never read garbage —
  * dead slots for codebook entries that lost all members during Lloyd
  * training are legitimately null and legitimately never referenced).
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (BINARY, ARRAY<DOUBLE>), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType

  // null even for non-null children: short table / null referenced slot
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val tab = b.asInstanceOf[ArrayData]
    if (tab.numElements() < codes.length * 2 * 16) return null
    var acc = 0.0
    var i = 0
    while (i < codes.length) {
      val hi = (codes(i) >> 4) & 15
      val lo = codes(i) & 15
      val idxHi = (2 * i) * 16 + hi
      val idxLo = (2 * i + 1) * 16 + lo
      if (tab.isNullAt(idxHi) || tab.isNullAt(idxLo)) return null
      acc += tab.getDouble(idxHi)
      acc += tab.getDouble(idxLo)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val hi = ctx.freshName("hi")
      val lo = ctx.freshName("lo")
      val ih = ctx.freshName("ih")
      val il = ctx.freshName("il")
      val bad = ctx.freshName("bad")
      s"""
         |double $acc = 0.0;
         |boolean $bad = ($b.numElements() < $a.length * 2 * 16);
         |for (int $i = 0; !$bad && $i < $a.length; $i++) {
         |  int $hi = ($a[$i] >> 4) & 15;
         |  int $lo = $a[$i] & 15;
         |  int $ih = (2 * $i) * 16 + $hi;
         |  int $il = (2 * $i + 1) * 16 + $lo;
         |  if ($b.isNullAt($ih) || $b.isNullAt($il)) { $bad = true; }
         |  else { $acc += $b.getDouble($ih); $acc += $b.getDouble($il); }
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}
