package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one key per implemented operator (SURVEY.md §2) to a
  * DataFrame builder; `oracleSql` gives the DuckDB-equivalent SQL for each
  * key that is SQL-expressible (keys absent there get a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.TensorQueries.queries ++
      graft.queries.ImreadQueries.queries ++
      graft.queries.Multimodal.queries ++
      graft.queries.SourceQueries.queries ++
      graft.streaming.StreamOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.TextOps.oracle ++
      graft.queries.Similarity.oracle ++
      graft.queries.TensorQueries.oracle ++
      graft.queries.ImreadQueries.oracle ++
      graft.queries.Multimodal.oracle ++
      graft.queries.SourceQueries.oracle ++
      graft.streaming.StreamOps.oracle
}
