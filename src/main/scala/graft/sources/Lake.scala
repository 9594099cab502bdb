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

  /** Compact a directory of (typically many small) parquet files into
    * size-targeted output files — the streaming-sink / incremental-ingest
    * hygiene pass a 100 TB lake runs continuously. Output file count is
    * computed from the actual input bytes (target ~`targetMb` MiB per
    * file, compression-ratio agnostic by design: parquet in ≈ parquet
    * out); rows are range-partitioned on `sortKey` so each output file
    * covers a contiguous key range (query-time file pruning). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      sortKey: String, targetMb: Int = 128): Long = {
    val df = spark.read.parquet(inDir)
    // size via the Hadoop FileSystem of whatever store the path lives on
    // (hdfs://, s3a://, file:, nested layouts) — a java.io.File listing
    // would silently see 0 bytes on any non-local URI and compact the
    // whole dataset into one partition
    val hconf = spark.sparkContext.hadoopConfiguration
    val bytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val nFiles = math.max(1L, bytes / (targetMb.toLong << 20) +
      (if (bytes % (targetMb.toLong << 20) == 0) 0 else 1)).toInt
    df.repartitionByRange(nFiles, col(sortKey))
      .sortWithinPartitions(col(sortKey))
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    nFiles.toLong
  }

  /** Join `left` (large, possibly skewed on `leftKey`) with `right` on
    * equality, salting the right side `salt` ways so one hot key spreads
    * over `salt` tasks. Result equals the plain equi-join.
    *
    * The left-side salt is `pmod(hash(<every left column>), salt)` — the
    * same retry-deterministic idiom as `Relational.skewJoinSalted` (task
    * re-execution reproduces the salt, which `rand()` would not), and
    * hashing the full row makes the salt vary WITHIN a hot key, which
    * hashing the join key alone would not. */
  /** The fact-side salt expression — factored so LakeSpec pins spread
    * and retry-determinism on the expression the join actually uses. */
  private[graft] def saltCol(left: DataFrame, salt: Int) =
    pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salt))

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salt: Int): DataFrame = {
    val l = left.withColumn("__salt", saltCol(left, salt))
    val r = right.crossJoin(
      left.sparkSession.range(salt).select(col("id").cast("int").as("__salt")))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop(l("__salt")).drop(r("__salt"))
  }
}
