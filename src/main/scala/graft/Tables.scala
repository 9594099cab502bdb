package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver-generated parquet testdata.
  *
  * All queries read through here so that a future move to a real lake
  * layout (partitioned dirs, bucketed tables, a catalog) is a one-file
  * change. At 100 TB these would be catalog tables with partition pruning;
  * at test scale they are single parquet files.
  */
object Tables {

  /** Sessions must set this: Spark has no nanosecond timestamp type, so the
    * events table's TIMESTAMP(NANOS) parquet column is read as a raw
    * nanosecond BIGINT and re-derived below. DuckDB 1.0 (the oracle)
    * truncates ns→µs on read, so `timestamp_micros(ts_ns div 1000)` is
    * bit-identical to what the oracle sees.
    */
  val nanosAsLongConf: (String, String) =
    "spark.sql.legacy.parquet.nanosAsLong" -> "true"

  /** Plan cache: re-reading the same table re-lists files and re-reads
    * parquet footers on every call; reusing the analyzed DataFrame keeps
    * one shared FileIndex per (session, dir, table). On a cluster this is
    * what a catalog table gives you for free. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Bench-only: the testdata files are single-row-group parquet, so every
    * scan is ONE task regardless of maxPartitionBytes. When >0, tables are
    * repartitioned at load so the (persisted) in-memory relations scan in
    * parallel. 0 (the default everywhere but Bench) keeps the raw scan —
    * on a real lake, row groups already give scan parallelism. */
  @volatile var benchParts: Int = 0

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name), { _ =>
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val df = if (name == "events")
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts_ns div 1000)"))
      else raw
      if (benchParts > 0) df.repartition(benchParts) else df
    })
}
