package graft

import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  test("cosine_sim native expression equals the HOF formulation and stays in codegen") {
    graft.functions.GraftExtensions.install(spark)
    val e = Tables.t(spark, sf001, "embeddings").limit(200)
    val hof = e.select(col("vec_id"), expr(
      """aggregate(zip_with(transform(embedding, x -> CAST(x AS DOUBLE)),
        |                   transform(embedding, x -> CAST(x AS DOUBLE)), (a, b) -> a * b),
        |          0D, (acc, x) -> acc + x)""".stripMargin).as("selfdot"))
    val native = e.select(col("vec_id"), expr("cosine_sim(embedding, embedding)").as("cos"))
    // self-cosine must be exactly 1 (up to float) for nonzero vectors
    assert(native.collect().forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-9))
    assert(hof.collect().forall(_.getDouble(1) > 0.0))
    // the expression must compile into whole-stage codegen (no fallback)
    // `*(n)` marks operators inside a WholeStageCodegen span; the Project
    // evaluating cosine_sim must carry it (no eval fallback)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("cosine_sim"),
      s"cosine_sim fell out of whole-stage codegen:\n$plan")
  }

  test("cosine_sim rejects wrong argument types with a clear error") {
    graft.functions.GraftExtensions.install(spark)
    val err = intercept[Exception] {
      Tables.t(spark, sf001, "documents").select(expr("cosine_sim(text, text)")).collect()
    }
    assert(err.getMessage.contains("ARRAY<FLOAT>") || err.getMessage.contains("DATATYPE"))
  }

  test("ReplaceHofCosine rule rewrites the HOF pattern into the native expression") {
    graft.functions.GraftExtensions.install(spark)
    val hofCos = graft.queries.Similarity.cosineTopk(spark, sf001)
    val optimized = hofCos.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosine_sim"),
      s"HOF cosine not rewritten to native expression:\n$optimized")
    // semantics preserved: rewritten HOF query == native query
    val a = hofCos.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = graft.queries.Similarity.cosineTopkNative(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("minhash_sig aggregate matches the HOF transform signatures") {
    graft.functions.GraftExtensions.install(spark)
    val s = spark
    import s.implicits._
    val docs = Seq((1L, Seq("a b c", "b c d", "c d e")), (2L, Seq("x y z")))
      .toDF("doc_id", "shingles")
    val viaAgg = docs.select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .groupBy("doc_id").agg(expr("minhash_sig(shingle)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaHof = docs.select(col("doc_id"), expr(
      """transform(sequence(0, 31),
        |  i -> array_min(transform(shingles, s -> substring(md5(concat(i, ':', s)), 1, 8))))"""
        .stripMargin).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaAgg == viaHof)
  }
}
