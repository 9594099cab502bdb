package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-layout utilities — the 100 TB storage posture the flat test
  * parquet stands in for (SURVEY.md §1.2: "at 100 TB these would be
  * catalog tables").
  *
  * - `bucketize` writes a table bucketed+sorted by its join key; two
  *   tables bucketed the same way join with ZERO shuffle (verified in
  *   LakeSpec by asserting no Exchange in the physical plan).
  * - `saltedJoin` spreads a skewed build-side key across `salt` synthetic
  *   sub-keys — the standard hot-key mitigation when AQE's skew split
  *   isn't available (e.g. broadcast-unfriendly aggregations).
  */
object Lake {

  /** Write `df` as a bucketed, sorted managed table. */
  def bucketize(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join `left` (large, possibly skewed on `leftKey`) with `right` on
    * equality, salting the right side `salt` ways so one hot key spreads
    * over `salt` tasks. Result equals the plain equi-join. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salt: Int): DataFrame = {
    val l = left.withColumn("__salt", (rand(seed = 7) * salt).cast("int"))
    val r = right.crossJoin(
      left.sparkSession.range(salt).select(col("id").cast("int").as("__salt")))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop(l("__salt")).drop(r("__salt"))
  }
}
