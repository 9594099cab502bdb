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

  test("topk aggregate: bounded per-group top-k equals sort-and-take, across partitions") {
    graft.functions.GraftExtensions.install(spark)
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i => (i % 7L, rnd.nextDouble() * 100, i.toLong))
    val df = rows.toDF("g", "score", "id").repartition(8)
    val got = df.groupBy("g")
      .agg(expr("topk(struct(-score AS ns, id), 3)").as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("p", "r")))
      .select(col("g"), col("p"), (-col("r.ns")).as("score"), col("r.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    val want = rows.groupBy(_._1).view.mapValues(
      _.sortBy(t => (-t._2, t._3)).take(3).map(t => (t._2, t._3)).toSeq).toMap
    assert(got == want, "topk disagrees with sort-and-take")
    // k larger than the group emits the whole group, still sorted
    val small = Seq((1L, 5.0, 1L), (1L, 9.0, 2L)).toDF("g", "score", "id")
      .groupBy("g").agg(expr("topk(struct(-score AS ns, id), 10)").as("top"))
      .select(size(col("top"))).collect().head.getInt(0)
    assert(small == 2)
  }
}
