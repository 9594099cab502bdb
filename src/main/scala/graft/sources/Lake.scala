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

  /** Stable identifier-safe suffix for per-dataset table/dir names.
    *
    * md5 of the CANONICAL path (symlink/`..`-normalized), hex-truncated:
    * never negative (the old `math.abs(hashCode)` emitted an invalid
    * `-214…` identifier for Int.MinValue) and collision-safe across sf
    * dirs (a 32-bit hashCode collision between two dirs would silently
    * reuse the wrong-scale bucketed tables within a session). 12 hex
    * chars = 48 bits — collision odds are negligible at
    * handfuls-of-dirs cardinality. */
  def dirSuffix(dir: String): String = {
    val canonical =
      try new java.io.File(dir).getCanonicalPath catch { case _: java.io.IOException => dir }
    keySuffix(canonical)
  }

  /** md5-hex-12 of an arbitrary key string — the same identifier-safe
    * suffix for keys that are not paths (content fingerprints). */
  def keySuffix(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString

  /** Write `df` date-partitioned by calendar month of `tsCol` — the
    * TIME-axis lake layout (the bucketed layout's twin for scans instead
    * of joins). The derived `monthCol` becomes a hive-style partition
    * directory (`ship_month=1995-02-01/`), so:
    *
    *  - a month-grouped aggregate reads the grouping key from DIRECTORY
    *    METADATA — the timestamp column never appears in the scan's
    *    ReadSchema (at 100 TB, decoding 600B timestamps IS the wall);
    *  - any time-range predicate lands as a PartitionFilter — directory
    *    pruning, zero foreign files opened, the same mechanism
    *    `partitioned_lake_prune` gates for categorical keys.
    *
    * `tsCol` itself is RETAINED in the data files: month is the
    * partition grain, finer predicates (a specific cut date) still push
    * down as parquet filters within the selected months.
    *
    * The `repartition(col(monthCol))` before the write is load-bearing
    * the same way [[bucketize]]'s is: it hash-clusters each month into
    * exactly one task, so every partition directory holds ONE file
    * (~84 months × 1 instead of tasks × months small files — at
    * streaming-sink file counts the lake would need [[compact]]).
    *
    * Rows are additionally SORTED by `tsCol` within each task, so the
    * month file's parquet row groups carry tight min/max stats on the
    * timestamp — a day-grain predicate inside a month (the residual cut
    * `q1_partitioned` pushes) prunes at the ROW-GROUP level after the
    * directory level, finishing the pruning hierarchy: dir → row group
    * → page. */
  def datePartitionByMonth(df: DataFrame, outDir: String, tsCol: String,
      monthCol: String): Unit =
    df.withColumn(monthCol, to_date(date_trunc("month", col(tsCol))))
      .repartition(col(monthCol))
      .sortWithinPartitions(col(monthCol), col(tsCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(monthCol)
      .parquet(outDir)

  /** Write `df` as a bucketed, sorted managed table.
    *
    * The `repartition(buckets, key)` BEFORE the bucketed write is
    * load-bearing: Spark's bucket id is `pmod(murmur3(key), buckets)` —
    * the same function HashPartitioning computes — so after the
    * repartition every write task holds exactly ONE bucket's rows.
    * Without it, each of the N input tasks writes into all `buckets`
    * files (N×buckets small files; at 600M rows / sf100 that is ~4000
    * files whose per-task sorts collectively spill the whole fact
    * uncompressed) and, worse for the READ side, each bucket is split
    * across N files — Spark only treats a bucketed table's sort order
    * as usable when each bucket holds a single file, so the sortBy
    * metadata would be dead weight and every join would re-sort. One
    * file per bucket keeps the write sort to rows-per-bucket and lets
    * the sort-merge join read both sides sort-free. */
  def bucketize(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write
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

  /** Compact a HIVE-PARTITIONED dataset while PRESERVING its partition
    * layout — the hygiene pass behind a date-partitioned streaming sink
    * (every micro-batch strews a small file into each day dir it
    * touches; at 100 TB that decays both scan parallelism and manifest
    * pressure until a compactor rewrites it).
    *
    * One distributed pass, no per-partition driver loop: rows are
    * range-partitioned on (partitionCol, sortKey) into size-targeted
    * tasks — ranges keep partition values CONTIGUOUS across tasks, so
    * each task writes into at most two partition dirs and each dir ends
    * up with ceil(dirBytes/targetMb) files (±1 at a range boundary),
    * sorted by sortKey within each file (query-time file pruning within
    * the dir, same property as [[compact]]). The partitionBy write
    * re-lands the hive layout, so partition pruning on the compacted
    * output is unchanged. */
  def compactPartitioned(spark: SparkSession, inDir: String, outDir: String,
      partitionCol: String, sortKey: String, targetMb: Int = 128): Long = {
    val df = spark.read.parquet(inDir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val bytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val nFiles = math.max(1L, bytes / (targetMb.toLong << 20) +
      (if (bytes % (targetMb.toLong << 20) == 0) 0 else 1)).toInt
    df.repartitionByRange(nFiles, col(partitionCol), col(sortKey))
      .sortWithinPartitions(col(partitionCol), col(sortKey))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(outDir)
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
    * and retry-determinism on the expression the join actually uses.
    *
    * hash() rejects MapType columns (map iteration order is undefined,
    * so Spark refuses to hash them), so maps are EXCLUDED from the salt
    * mix — frames carrying a map column salt on their remaining columns.
    * Known limit, shared with any deterministic row-content salt: fully
    * identical duplicate rows of a hot key hash to one salt and don't
    * spread; rows must differ somewhere outside their map columns for
    * the salt to vary within a key. */
  private[graft] def saltCol(left: DataFrame, salt: Int) = {
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val hashable = left.schema.fields.filterNot(f => hasMap(f.dataType)).map(f => col(f.name))
    require(hashable.nonEmpty,
      "saltedJoin: every left column contains a map — nothing hashable to salt on")
    pmod(hash(hashable.toIndexedSeq: _*), lit(salt))
  }

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salt: Int): DataFrame = {
    val l = left.withColumn("__salt", saltCol(left, salt))
    val r = right.crossJoin(
      left.sparkSession.range(salt).select(col("id").cast("int").as("__salt")))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop(l("__salt")).drop(r("__salt"))
  }
}
