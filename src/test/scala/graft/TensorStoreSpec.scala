package graft

import org.apache.spark.sql.functions._
import graft.sources.TensorStore
import graft.tensor.Images

/** Block-tensor store: round-trip fidelity, manifest, and source-level
  * chunk pruning (the frame-range filter must reach the parquet scan as
  * a PartitionFilter, not a post-scan filter). */
class TensorStoreSpec extends SparkSpec {

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("graft_store_spec").toString

  test("round-trip preserves every pixel and the manifest geometry") {
    val raster = Images.eventsRaster(spark, sf0001)
    TensorStore.write(raster, dir)
    val back = TensorStore.read(spark, dir)
    val a = Images.toPixels(raster).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val b = Images.toPixels(back).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a == b, "pixels changed across the store round-trip")
    val Seq((id, shape, chunks, grid, n, dtype)) = TensorStore.attrs(spark, dir)
    assert(shape == Seq(48, 64) && chunks == Seq(16, 16) && grid == Seq(3, 4))
    assert(n == 12L && dtype == "float64" && id.nonEmpty)
  }

  test("frame-range read prunes partitions at the scan") {
    TensorStore.write(Images.eventsRaster(spark, sf0001), dir)
    val sliced = TensorStore.read(spark, dir, frameRange = Some((1, 1)))
    val plan = sliced.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("idx0"),
      s"frame range did not land as a partition filter:\n$plan")
    val blocks = sliced.collect()
    assert(blocks.length == 4 && blocks.forall(_.idx.head == 1))
    // pruned slice carries exactly rows 16..31
    val rows = Images.toPixels(sliced).select(min(col("i")), max(col("i"))).head()
    assert(rows.getInt(0) == 16 && rows.getInt(1) == 31)
  }

  test("mixed geometry under one imageId fails the write loudly") {
    val s = spark
    import s.implicits._
    val raster = Images.eventsRaster(spark, sf0001)
    val broken = raster.map(b =>
      if (b.idx.head == 0) b.copy(chunk = Seq(8, 8)) else b)
    val err = intercept[IllegalArgumentException] {
      TensorStore.write(broken, dir + "_broken")
    }
    assert(err.getMessage.contains("share arrayShape+chunk"))
  }
}
