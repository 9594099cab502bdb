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

  /** Sessions must set this: Spark has no nanosecond timestamp type, so a
    * TIMESTAMP(NANOS) events parquet column is read as a raw nanosecond
    * BIGINT and re-derived below. DuckDB 1.0 (the oracle) truncates ns→µs
    * on read, so `timestamp_micros(ts_ns div 1000)` is bit-identical to
    * what the oracle sees. Harmless when the file is µs-precision (the
    * conf only affects NANOS columns).
    */
  val nanosAsLongConf: (String, String) =
    "spark.sql.legacy.parquet.nanosAsLong" -> "true"

  /** Normalize an events frame to the one shape every downstream query
    * assumes: `ts_ns` BIGINT epoch-nanoseconds in the original column slot
    * plus `ts` TIMESTAMP (µs, session-UTC) appended — derived as
    * `timestamp_micros(ts_ns div 1000)` in both branches so the µs
    * truncation matches what the DuckDB oracle reads.
    *
    * The driver has shipped two physical encodings of `events.ts`:
    * TIMESTAMP(NANOS), which `nanosAsLong` surfaces as a raw LongType; and
    * plain µs TIMESTAMP / TIMESTAMP_NTZ (the NANOS conf is a no-op there).
    * For the µs shapes, ts_ns = unix_micros × 1000 — value-preserving
    * under the UTC session timezone and far from Long overflow. */
  def normalizeEvents(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val tsNs: org.apache.spark.sql.Column = df.schema("ts").dataType match {
      case LongType => df("ts")
      case _ => unix_micros(df("ts").cast(TimestampType)) * 1000L
    }
    df.select(df.columns.map {
        case "ts" => tsNs.as("ts_ns")
        case c => df(c)
      }.toSeq: _*)
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
  }

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

  /** Bucketed-layout preference (r17, verdict item: make the lake layout
    * the DEFAULT read path, not an opt-in twin). With the session conf
    * `graft.lake.preferBucketed=true`, a fact table whose bucketed build
    * exists in the session catalog (`Relational.bucketedFacts` names) is
    * served FROM that build — so every orderkey-joining query written
    * against the flat files silently picks up the exchange-free layout,
    * the way a catalog table's declared bucketing works on a cluster.
    * Returns None when the conf is off or the build doesn't exist (the
    * flat read stays the answer; correctness never depends on layout). */
  private def bucketedFor(spark: SparkSession, dir: String, name: String): Option[String] = {
    if (spark.conf.getOption("graft.lake.preferBucketed").getOrElse("false") != "true")
      return None
    val (lTab, oTab) = graft.queries.Relational.bucketedFactNames(dir)
    val tab = name match {
      case "lineitem" => lTab
      case "orders" => oTab
      case _ => return None
    }
    if (spark.catalog.tableExists(tab)) Some(tab) else None
  }

  /** The bucketed table's BUILD GENERATION — its catalog createTime.
    * Part of the cache key (r17, per ADVICE): the name alone covers the
    * None→Some transition but not rebuild-under-the-same-name (DROP +
    * rebuild in one session), where a name-keyed cache would keep
    * serving a frame whose analyzed plan pins the dropped build's file
    * listing. */
  private def tableGen(spark: SparkSession, tab: String): Long =
    try spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(tab)).createTime
    catch {
      // only the expected dropped-between-check-and-read race collapses
      // to generation 0; anything else (parse bug, catalog corruption)
      // must not silently degrade the cache key to name-only — that
      // would resurrect the stale-frame-after-rebuild bug this key
      // exists to prevent (r18 ADVICE)
      case _: org.apache.spark.sql.catalyst.analysis.NoSuchTableException
           | _: org.apache.spark.sql.catalyst.analysis.NoSuchDatabaseException =>
        0L
    }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // the bucketed choice — name AND build generation — is part of the
    // cache key: flipping the conf, building, or REBUILDING the tables
    // mid-session must not serve a stale frame
    val bucketed = bucketedFor(spark, dir, name)
    val key = name + bucketed.fold("")(tab =>
      "@" + tab + "@" + tableGen(spark, tab))
    cache.computeIfAbsent((spark, dir, key), { _ =>
      bucketed match {
        case Some(tab) => spark.table(tab)
        case None =>
          val raw = spark.read.parquet(s"$dir/$name.parquet")
          val df = if (name == "events") normalizeEvents(raw) else raw
          if (benchParts > 0) df.repartition(benchParts) else df
      }
    })
  }
}
