package graft

import org.apache.spark.sql.functions._

/** grouped_quantiles (exact `percentile`) vs approx_quantiles
  * (approx_percentile sketch) — the sketch is the 100 TB path, so its
  * error vs exact must be bounded, not assumed. */
class QuantilesSpec extends SparkSpec {

  private def byFlag(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getString(0) -> (r.getDouble(r.fieldIndex("p50")),
      r.getDouble(r.fieldIndex("p90")), r.getDouble(r.fieldIndex("p99")))).toMap

  test("grouped_quantiles: p50<=p90<=p99 per group, groups cover lineitem flags") {
    val rows = graft.queries.Relational.groupedQuantiles(spark, sf001).collect()
    assert(rows.nonEmpty)
    val flags = Tables.t(spark, sf001, "lineitem")
      .select("l_returnflag").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet == flags)
    for (r <- rows) {
      val (p50, p90, p99) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 <= p90 && p90 <= p99, s"non-monotone quantiles in $r")
      assert(r.getLong(1) > 0)
    }
  }

  test("approx_quantiles tracks exact within 1% relative error at accuracy 10000") {
    // r16: the GATED key now emits the in-band verdicts (bounds oracle);
    // this spec keeps bounding the RAW sketch values against exact, so
    // it recomputes the sketch directly with the gate's parameters.
    val exact = byFlag(graft.queries.Relational.groupedQuantiles(spark, sf001).collect())
    val approx = byFlag(Tables.t(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_percentile(col("l_extendedprice"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("q"))
      .select(col("l_returnflag"),
        element_at(col("q"), 1).as("p50"),
        element_at(col("q"), 2).as("p90"),
        element_at(col("q"), 3).as("p99"))
      .collect())
    assert(exact.keySet == approx.keySet)
    for ((flag, (e50, e90, e99)) <- exact) {
      val (a50, a90, a99) = approx(flag)
      def relErr(e: Double, a: Double) = math.abs(e - a) / math.max(math.abs(e), 1e-12)
      // approx_percentile at accuracy 10000 guarantees rank error <=
      // n/10000; on lineitem's smooth price distribution that is well
      // under 1% in value space
      assert(relErr(e50, a50) < 0.01, s"$flag p50: exact=$e50 approx=$a50")
      assert(relErr(e90, a90) < 0.01, s"$flag p90: exact=$e90 approx=$a90")
      assert(relErr(e99, a99) < 0.01, s"$flag p99: exact=$e99 approx=$a99")
    }
    // and the gated key's verdict columns are all-true at this sf
    val gate = graft.queries.Relational.approxQuantiles(spark, sf001).collect()
    assert(gate.nonEmpty && gate.forall(r =>
      r.getBoolean(r.fieldIndex("p50_in_band")) &&
        r.getBoolean(r.fieldIndex("p90_in_band")) &&
        r.getBoolean(r.fieldIndex("p99_in_band"))))
  }
}
