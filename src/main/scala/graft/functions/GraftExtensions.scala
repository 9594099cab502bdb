package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point registering the engine's native
  * functions (`spark.sql.extensions=graft.functions.GraftExtensions`),
  * plus an imperative registrar for sessions created without the config
  * (both paths are idempotent). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSim)
    ext.injectFunction(GraftExtensions.minhashSig)
    ext.injectFunction(GraftExtensions.signLshSig)
    ext.injectFunction(GraftExtensions.hyperplaneSig)
    ext.injectFunction(GraftExtensions.argmaxDot)
    ext.injectFunction(GraftExtensions.pqAdc)
    ext.injectFunction(GraftExtensions.vecMean)
    ext.injectFunction(GraftExtensions.countIn)
    ext.injectFunction(GraftExtensions.misraGries)
    ext.injectFunction(GraftExtensions.bloomFilterAgg)
    ext.injectFunction(GraftExtensions.mightContain)
    ext.injectFunction(GraftExtensions.topkRows)
    ext.injectFunction(GraftExtensions.top2By)
    ext.injectOptimizerRule(_ => ReplaceHofCosine)
  }
}

object GraftExtensions {

  private type FnDesc =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val cosineSim: FnDesc = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (es: Seq[Expression]) => CosineSimilarity(es(0), es(1)))

  val minhashSig: FnDesc = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (es: Seq[Expression]) => MinHashSig(es.head))

  val signLshSig: FnDesc = (
    FunctionIdentifier("sign_lsh_sig"),
    new ExpressionInfo(classOf[SignLshSig].getName, "sign_lsh_sig"),
    (es: Seq[Expression]) => SignLshSig(es.head))

  val hyperplaneSig: FnDesc = (
    FunctionIdentifier("hyperplane_sig"),
    new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
    (es: Seq[Expression]) => HyperplaneSig(es.head))

  val argmaxDot: FnDesc = (
    FunctionIdentifier("argmax_dot"),
    new ExpressionInfo(classOf[ArgmaxDot].getName, "argmax_dot"),
    (es: Seq[Expression]) => ArgmaxDot(es(0), es(1)))

  val pqAdc: FnDesc = (
    FunctionIdentifier("pq_adc"),
    new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
    (es: Seq[Expression]) => PqAdc(es(0), es(1)))

  val vecMean: FnDesc = (
    FunctionIdentifier("vec_mean"),
    new ExpressionInfo(classOf[VecMeanAgg].getName, "vec_mean"),
    (es: Seq[Expression]) => VecMeanAgg(es.head).toAggregateExpression())

  val countIn: FnDesc = (
    FunctionIdentifier("count_in"),
    new ExpressionInfo(classOf[CountIn].getName, "count_in"),
    (es: Seq[Expression]) => {
      if (es.length < 2) throw new IllegalArgumentException(
        "count_in requires (array, word, word, ...)")
      val words = es.tail.map {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
            if l.dataType == org.apache.spark.sql.types.StringType && l.value != null =>
          l.value.toString
        case other => throw new IllegalArgumentException(
          s"count_in word arguments must be string literals, got $other")
      }
      CountIn(es.head, words)
    })

  val misraGries: FnDesc = (
    FunctionIdentifier("misra_gries"),
    new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
    (es: Seq[Expression]) => MisraGries(es.head).toAggregateExpression())

  // Spark's OWN bloom machinery (BloomFilterAggregate /
  // BloomFilterMightContain — the expressions InjectRuntimeFilter plants),
  // absent from the public function registry — exposed here so
  // bloom_prune_join probes natively: BloomFilterMightContain has
  // doGenCode, so the probe stays inside whole-stage codegen instead of
  // a black-box Scala UDF over a driver-built sketch (r16, verdict #5).
  val bloomFilterAgg: FnDesc = (
    FunctionIdentifier("bloom_filter_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "bloom_filter_agg"),
    (es: Seq[Expression]) => {
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      val agg = es.length match {
        case 1 => new BloomFilterAggregate(es(0))
        case 2 => new BloomFilterAggregate(es(0), es(1))
        case 3 => new BloomFilterAggregate(es(0), es(1), es(2))
        case n => throw new IllegalArgumentException(
          s"bloom_filter_agg takes (hash[, numItems[, numBits]]); got $n args")
      }
      agg.toAggregateExpression()
    })

  val mightContain: FnDesc = (
    FunctionIdentifier("might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "might_contain"),
    (es: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1)))

  val top2By: FnDesc = (
    FunctionIdentifier("top2_by"),
    // the sentinel restriction lives in the USAGE string (r17, per
    // ADVICE): a SQL user sees it in DESCRIBE FUNCTION instead of only
    // in a Scaladoc they never read
    new ExpressionInfo(classOf[Top2By].getName, null, "top2_by",
      "top2_by(v, k) - top-2 (v DOUBLE, k BIGINT) pairs of the group, " +
        "ordered v DESC then k ASC, as ARRAY<STRUCT<v, k>>. RESTRICTION: " +
        "empty buffer slots are the sentinel (-Infinity, Long.MaxValue), " +
        "so rows with v = -Infinity (and the exact pair " +
        "(-Infinity, Long.MaxValue)) are dropped from the output; use the " +
        "generic topk aggregate when -Infinity is a live value.", ""),
    (es: Seq[Expression]) => Top2By(es(0), es(1)).toAggregateExpression())

  val topkRows: FnDesc = (
    FunctionIdentifier("topk"),
    new ExpressionInfo(classOf[TopKRows].getName, "topk"),
    (es: Seq[Expression]) => {
      if (es.length != 2) throw new IllegalArgumentException(
        s"topk requires exactly 2 arguments (struct, k); got ${es.length}")
      TopKRows(es(0), es(1))
    })

  /** Register on an existing session (no-op if already present). */
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    for ((id, info, builder) <- Seq(cosineSim, minhashSig, signLshSig, hyperplaneSig, argmaxDot, pqAdc, vecMean, countIn, misraGries, bloomFilterAgg, mightContain, topkRows, top2By))
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    if (!spark.experimental.extraOptimizations.contains(ReplaceHofCosine))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ReplaceHofCosine
  }
}
