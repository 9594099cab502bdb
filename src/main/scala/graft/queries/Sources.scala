package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Source/sink format coverage beyond parquet (SURVEY §2B row 1-2): the
  * formats an LLM-corpus lake actually ingests. Each gate writes a
  * fixture from the driver tables, reads it back through the format
  * under test, and reduces — the oracle runs the same reduction over
  * the ORIGINAL parquet, so any escaping, type-mapping, row-boundary,
  * or partition-layout defect in the round-trip breaks the hash.
  */
object SourceQueries {

  type Q = (SparkSession, String) => DataFrame

  private def tmp(dir: String, tag: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_src_${tag}_${math.abs(dir.hashCode)}").toString

  /** documents → JSON-LINES on disk → schema-pinned read-back → per-lang
    * reduction. JSONL is the lingua franca of text-corpus interchange;
    * reading it back with the parquet schema (not inference) is the
    * production shape — inference at 100 TB is a full extra pass. */
  val jsonlRoundtrip: Q = (s, dir) => {
    val out = tmp(dir, "jsonl")
    val docs = t(s, dir, "documents")
    docs.write.mode("overwrite").json(out)
    s.read.schema(docs.schema).json(out)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text"))).as("sum_text_len"))
      .orderBy(col("lang"))
  }

  val jsonlRoundtripSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** documents → quoted CSV → schema-pinned read-back → the same
    * reduction as the JSONL gate. CSV is where interchange breaks in
    * practice — free text full of commas and quotes must survive the
    * quote/escape cycle byte-for-byte or sum(length(text)) moves. */
  val csvRoundtrip: Q = (s, dir) => {
    val out = tmp(dir, "csv")
    val docs = t(s, dir, "documents")
    docs.write.mode("overwrite").option("header", "true").csv(out)
    s.read.schema(docs.schema).option("header", "true").csv(out)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text"))).as("sum_text_len"))
      .orderBy(col("lang"))
  }

  /** lineitem → ORC → read-back → q1-shaped reduction. ORC is Spark's
    * other first-class columnar format (Hive lakes); the gate proves the
    * type mapping (DOUBLE/STRING/TIMESTAMP) survives the round-trip. */
  val orcRoundtrip: Q = (s, dir) => {
    val out = tmp(dir, "orc")
    t(s, dir, "lineitem").write.mode("overwrite").orc(out)
    s.read.orc(out)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag"))
  }

  val orcRoundtripSql: String =
    """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS n_items
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** orders → hive-layout PARTITIONED parquet (partitionBy status) →
    * filtered read-back. The filter must land as a PartitionFilter —
    * directory pruning, zero foreign files opened (plan asserted in
    * SourcesSpec) — which IS the 100 TB scan-cost mechanism: a
    * status='F' query over a petabyte lake reads only status=F/ files. */
  val partitionedPrune: Q = (s, dir) => {
    val out = tmp(dir, "part")
    t(s, dir, "orders").write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(out)
    prunedScan(s, out)
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
  }

  /** The filtered read-back, factored un-aggregated so SourcesSpec can
    * assert the PartitionFilters plan shape. */
  private[graft] def prunedScan(s: SparkSession, out: String): DataFrame =
    s.read.parquet(out).filter(col("o_orderstatus") === "F")

  val partitionedPruneSql: String =
    """SELECT count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM orders WHERE o_orderstatus = 'F'""".stripMargin

  val queries: Map[String, Q] = Map(
    "jsonl_source_roundtrip" -> jsonlRoundtrip,
    "csv_source_roundtrip" -> csvRoundtrip,
    "orc_source_roundtrip" -> orcRoundtrip,
    "partitioned_lake_prune" -> partitionedPrune,
  )

  val oracle: Map[String, String] = Map(
    "jsonl_source_roundtrip" -> jsonlRoundtripSql,
    "csv_source_roundtrip" -> jsonlRoundtripSql, // same reduction, same truth
    "orc_source_roundtrip" -> orcRoundtripSql,
    "partitioned_lake_prune" -> partitionedPruneSql,
  )
}
