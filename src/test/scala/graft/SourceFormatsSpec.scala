package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Multi-format source coverage: the same relation reads identically from
  * parquet, CSV, and JSON lines (the lake's usual ingest formats). */
class SourceFormatsSpec extends SparkSpec {

  test("events round-trip through csv and json with identical content") {
    val base = Tables.t(spark, sf0001, "events")
      .select("event_id", "ts_ns", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("graft_fmt").toString

    base.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    base.write.mode("overwrite").json(s"$dir/json")
    base.write.mode("overwrite").orc(s"$dir/orc")

    val fromCsv = spark.read.option("header", "true").schema(base.schema).csv(s"$dir/csv")
    val fromJson = spark.read.schema(base.schema).json(s"$dir/json")
    val fromOrc = spark.read.orc(s"$dir/orc")

    def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      // ts_ns sums overflow LongType (1e18-scale values): fold mod a prime
      val r = df.agg(count(lit(1)), sum(col("ts_ns") % 1000000007L), sum("value")).collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    val fp = fingerprint(base)
    assert(fingerprint(fromCsv) == fp, "csv round-trip differs")
    assert(fingerprint(fromJson) == fp, "json round-trip differs")
    assert(fingerprint(fromOrc) == fp, "orc round-trip differs")

    // and the derived query layer works over any of them
    val perType = fromJson.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = base.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perType == ref)
  }
}
