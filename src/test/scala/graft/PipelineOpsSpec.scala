package graft

import org.apache.spark.sql.functions._

import graft.queries.{Relational, TextOps}

/** Specs for the round-7 operator batch: pivot/unpivot, distribution
  * windows, salted skew aggregation, deterministic hash sampling,
  * incremental snapshot dedup, repeated n-gram span mining. */
class PipelineOpsSpec extends SparkSpec {

  test("salted_skew_agg equals the plain single-stage group-by") {
    val salted = Relational.saltedSkewAgg(spark, sf001).collect()
    val plain = Tables.t(spark, sf001, "events")
      .groupBy(col("event_type"))
      .agg(round(sum(col("value")), 4).as("sum_value"), count(lit(1)).as("n_events"))
      .orderBy(col("event_type")).collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("skew_join_salted: fact salt varies WITHIN a join key and result is exact") {
    // The whole point of salting is that one hot orderkey's rows spread
    // over R reducers — a salt that is a pure function of the join key
    // puts them all back in one group. Assert some multi-line order sees
    // more than one salt value.
    val R = 4
    val li = Tables.t(spark, sf001, "lineitem")
      .withColumn("salt_f", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(R)))
    val spread = li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("salt_f")).as("nsalt"), count(lit(1)).as("n"))
      .filter(col("n") >= lit(4))
    assert(spread.filter(col("nsalt") > 1).count() > 0,
      "multi-line orders must spread across salts")
    val salted = Relational.skewJoinSalted(spark, sf001).collect()
    val plain = Tables.t(spark, sf001, "lineitem")
      .join(Tables.t(spark, sf001, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority")).collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("hash_sample is deterministic under repartitioning and ~1/8 rate") {
    val a = Relational.hashSample(spark, sf001).collect().toSeq
    val b = Relational.hashSample(spark, sf001).repartition(13).orderBy(col("o_orderkey"))
      .collect().toSeq
    assert(a == b, "sample membership must be a pure function of the key")
    val total = Tables.t(spark, sf001, "orders").count().toDouble
    val rate = a.size / total
    assert(rate > 0.09 && rate < 0.16, s"expected ~1/8 sample, got $rate")
  }

  test("window_ntile: quartiles in [1,4] and balanced within each nation") {
    val rows = Relational.windowNtile(spark, sf001).collect()
    assert(rows.forall { r => val q = r.getLong(3); q >= 1 && q <= 4 })
    rows.groupBy(_.get(0)).foreach { case (nation, grp) =>
      val sizes = grp.groupBy(_.getLong(3)).values.map(_.size)
      assert(sizes.max - sizes.min <= 1,
        s"nation $nation quartile sizes unbalanced: $sizes")
    }
  }

  test("pivot_status_revenue matches per-status filtered aggregates") {
    val piv = Relational.pivotStatusRevenue(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getAs[java.lang.Double]("rev_o")).toMap
    val direct = Tables.t(spark, sf0001, "orders")
      .filter(col("o_orderstatus") === "O")
      .groupBy(year(col("o_orderdate")).cast("long").as("y"))
      .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    direct.foreach { case (y, rev) => assert(piv(y) == rev, s"year $y") }
  }

  test("unpivot_metrics emits one long row per (flag, metric)") {
    val rows = Relational.unpivotMetrics(spark, sf0001).collect()
    val flags = Tables.t(spark, sf0001, "lineitem")
      .select(col("l_returnflag")).distinct().count()
    assert(rows.length == flags * 2)
    assert(rows.map(_.getString(1)).toSet == Set("sum_qty", "sum_price"))
  }

  test("incremental_dedup keeps only novel batch docs") {
    val kept = TextOps.incrementalDedup(spark, sf001).collect()
    assert(kept.forall(_.getLong(0) >= 400), "keep_id must come from the new batch")
    // no kept doc's digest may exist in the ingested corpus
    val docs = Tables.t(spark, sf001, "documents")
    val keptIds = kept.map(_.getLong(0)).toSeq
    val overlap = docs.filter(col("doc_id").isin(keptIds: _*))
      .select(md5(col("text")).as("h"))
      .join(docs.filter(col("doc_id") < 400).select(md5(col("text")).as("h")), Seq("h"))
      .count()
    assert(overlap == 0, s"$overlap kept digests already ingested")
  }

  test("repeated_ngram_spans: every span is shared by >=2 docs and is a real 5-gram") {
    val rows = TextOps.repeatedNgramSpans(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    assert(rows.forall(_.getLong(1) >= 2))
    assert(rows.forall(_.getString(0).split(" ").length == 5))
  }
}
