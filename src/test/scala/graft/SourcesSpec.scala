package graft

import org.apache.spark.sql.functions._

import graft.queries.SourceQueries

/** Source/sink format gates: JSONL + ORC round-trip fidelity and
  * hive-layout partition pruning (the filter must reach the directory
  * listing, not just the row scan). */
class SourcesSpec extends SparkSpec {

  test("partitioned lake write prunes at the directory level") {
    val out = java.nio.file.Files.createTempDirectory("graft_part_spec").toString
    Tables.t(spark, sf0001, "orders").write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(out)
    val scan = SourceQueries.prunedScan(spark, out)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"),
      s"status filter did not land as a partition filter:\n$plan")
    // inputFiles lists the RELATION's files pre-filter; the pruned set
    // lives on the executed scan node
    val files = scan.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.map(_.filePath.toString).toSeq
    }.flatten
    assert(files.nonEmpty && files.forall(_.contains("o_orderstatus=F")),
      s"scan touched foreign partitions: ${files.filterNot(_.contains("o_orderstatus=F")).toSeq}")
    val expected = Tables.t(spark, sf0001, "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(scan.count() == expected)
  }

  test("jsonl and orc round-trips agree with the parquet originals") {
    val viaJson = SourceQueries.jsonlRoundtrip(spark, sf0001).collect().toSeq
    val direct = Tables.t(spark, sf0001, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text"))).as("sum_text_len"))
      .orderBy(col("lang")).collect().toSeq
    assert(viaJson == direct, "jsonl round-trip diverges from parquet")
    // the csv gate adds adversarial rows (lang 'zz': newline, quote,
    // comma, backslash, empty, NULL) and a count(text) column — expect
    // the augmented reduction, which is what the DuckDB oracle computes
    val viaCsv = SourceQueries.csvRoundtrip(spark, sf0001).collect().toSeq
    val directCsv = direct.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(1)))
    val expectedCsv = directCsv :+ (("zz", 5L, 42L, 37L, 4L))
    assert(viaCsv.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))) == expectedCsv,
      "csv round-trip diverges from parquet + adversarial fixture")

    val viaOrc = SourceQueries.orcRoundtrip(spark, sf0001).collect().toSeq
    val directL = Tables.t(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag")).collect().toSeq
    assert(viaOrc == directL, "orc round-trip diverges from parquet")
  }

  test("O_DIRECT disk probe: reads whole aligned chunks or declines cleanly") {
    // the warm-pass disk self-adjudication (r20) must never throw and
    // never report fiction: a probe-sized file yields (mb_per_s > 0,
    // bytes == the whole-MiB prefix) — or (-1, 0) on a platform that
    // refuses O_DIRECT — and sub-chunk / absent files always decline
    // try/finally (r21, per ADVICE): an assertion failure must not leak
    // graft_probe_spec* temp dirs; the accepted-vs-declined branch is
    // logged so platform coverage is visible in the suite output
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_spec")
    val f = dir.resolve("lineitem.parquet")
    val empty = java.nio.file.Files.createTempDirectory("graft_probe_spec2")
    try {
      val chunk = 1 << 20
      java.nio.file.Files.write(f, new Array[Byte](4 * chunk + 1234))
      val (mbps, bytes) = Bench.diskProbeDirect(dir.toString)
      if (mbps >= 0) {
        info(f"O_DIRECT accepted on this platform: $mbps%.1f MB/s over $bytes bytes")
        assert(bytes == 4L * chunk,
          s"probe read $bytes bytes, want the whole-MiB prefix ${4L * chunk}")
        assert(mbps > 0)
      } else {
        info("O_DIRECT declined on this platform (tmpfs or unsupported)")
        assert(bytes == 0L, "declined probe must report zero bytes")
      }
      // sub-chunk file: too small for one aligned read -> declined
      java.nio.file.Files.write(f, new Array[Byte](chunk - 1))
      assert(Bench.diskProbeDirect(dir.toString) == ((-1.0, 0L)))
      // no table file at all -> declined
      assert(Bench.diskProbeDirect(empty.toString) == ((-1.0, 0L)))
    } finally {
      java.nio.file.Files.deleteIfExists(f)
      java.nio.file.Files.deleteIfExists(dir)
      java.nio.file.Files.deleteIfExists(empty)
    }
  }
}
