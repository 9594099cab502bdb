package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the 64-bit sign-LSH signature of an
  * embedding (SURVEY.md §2C near-dup path — the hot-path upgrade over
  * the HOF form in `Similarity.embeddingLshCandidates`, which walked a
  * 64×64 literal plane matrix through interpreted `aggregate`/`zip_with`
  * with one array allocation per (row, plane)).
  *
  * Bit p is set iff Σ_i embedding(i) · planes(p)(i) > 0, accumulated in
  * ascending i — the SAME double-op sequence as the HOF, so signatures
  * are bit-identical (SimilaritySpec pins native == HOF == inline-sin).
  * The plane matrix is the fract-sin family materialized once per JVM
  * in [[SignLshSig.planes]]; both paths read the same object.
  */
case class SignLshSig(child: Expression) extends UnaryExpression {

  private def elemFloat: Option[Boolean] = child.dataType match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemFloat.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_sig expects ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    SignLshSig.compute(a.asInstanceOf[ArrayData], elemFloat.contains(true))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SignLshSig.compute($a, ${elemFloat.contains(true)});")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh_sig"
}

object SignLshSig {

  /** The 64×64 fract-sin plane matrix — w(p, d) = fract(sin(p·64 + d) ·
    * 43758.5453)·2 − 1, decorrelated per (plane, dim); single source of
    * truth for the native expression, the HOF literal column, and the
    * spec pins. */
  val planes: Array[Array[Double]] =
    Array.tabulate(64, 64) { (p, d) =>
      val s = math.sin((p * 64 + d).toDouble) * 43758.5453
      (s - math.floor(s)) * 2 - 1
    }

  /** Shared by interpreted eval and generated code (a static call keeps
    * the codegen template one line; the loop JITs identically).
    *
    * Degenerate inputs follow the HOF's null-propagation exactly: a
    * non-64-dim embedding or a null element makes every zip_with dot
    * product NULL there, so every CASE yields bit 0 → signature 0. The
    * same rule here keeps the bit-identity pin total, not just on
    * well-formed data. */
  def compute(x: ArrayData, isFloat: Boolean): Long = {
    val n = x.numElements()
    if (n != 64) return 0L
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return 0L; i += 1 }
    var sig = 0L
    var p = 0
    while (p < 64) {
      val w = planes(p)
      var dot = 0.0
      var j = 0
      while (j < 64) {
        dot += (if (isFloat) x.getFloat(j).toDouble else x.getDouble(j)) * w(j)
        j += 1
      }
      if (dot > 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
