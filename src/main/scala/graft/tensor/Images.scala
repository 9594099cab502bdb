package graft.tensor

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Relational → tensor bridge: build distributed Block images from the
  * testdata tables (the engine's `imread` stand-in for driver-checkable
  * pipelines; the reference's imread is a lazy file source —
  * dask_image/imread/__init__.py::imread ≈ L15–95 — while here the
  * "sensor" is the events table rasterized onto a grid).
  *
  * The whole path is distributed: pixels aggregate in one shuffle keyed
  * (i, j), blocks assemble in a second keyed (bi, bj); no driver-side
  * array materialization at any point.
  */
object Images {

  /** Rasterize events onto an h×w grid:
    * i = user_id mod h, j = hour(ts) mod w, v = Σ value.
    * Missing pixels are dense zeros, like a real sensor frame. */
  def eventsRaster(spark: SparkSession, dir: String, h: Int = 48, w: Int = 64,
      ch: Int = 16, cw: Int = 16): Dataset[Block] = {
    val px = graft.Tables.t(spark, dir, "events")
      .select((col("user_id") % h).cast("int").as("i"),
        (expr("ts_ns div 3600000000000") % w).cast("int").as("j"),
        col("value"))
      .groupBy("i", "j").agg(sum("value").as("v"))
    fromPixels(px, "events_raster", h, w, ch, cw)
  }

  /** Assemble a Dataset[Block] from a sparse (i, j, v) pixel frame. */
  def fromPixels(px: DataFrame, imageId: String, h: Int, w: Int,
      ch: Int, cw: Int): Dataset[Block] = {
    val spark = px.sparkSession
    import spark.implicits._
    val gridH = (h + ch - 1) / ch
    val gridW = (w + cw - 1) / cw
    val keyed = px.select(
      (col("i") / ch).cast("int").as("bi"),
      (col("j") / cw).cast("int").as("bj"),
      col("i").cast("int"), col("j").cast("int"), col("v").cast("double"))
      .as[(Int, Int, Int, Int, Double)]
    val nonEmpty = keyed.groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Int, Int, Double)]) =>
        val (bi, bj) = key
        val bh = math.min(ch, h - bi * ch)
        val bw = math.min(cw, w - bj * cw)
        val data = new Array[Double](bh * bw)
        for ((_, _, i, j, v) <- it) data((i - bi * ch) * bw + (j - bj * cw)) = v
        Block(imageId, Seq(bi, bj), Seq(bi * ch, bj * cw), Seq(bh, bw),
          Seq(ch, cw), Seq(h, w), data)
      }
    // blocks with zero pixels must still exist (dense semantics)
    val allIdx = spark.createDataset(
      for (bi <- 0 until gridH; bj <- 0 until gridW) yield (bi, bj))
    val present = nonEmpty.map(b => (b.idx.head, b.idx(1)))
    val missing = allIdx.except(present).map { case (bi, bj) =>
      val bh = math.min(ch, h - bi * ch)
      val bw = math.min(cw, w - bj * cw)
      Block(imageId, Seq(bi, bj), Seq(bi * ch, bj * cw), Seq(bh, bw),
        Seq(ch, cw), Seq(h, w), new Array[Double](bh * bw))
    }
    nonEmpty.union(missing)
  }

  /** Pixel frame (i, j, v) of a 2-d block image — inverse of fromPixels,
    * for reducing tensor results back to relational form. */
  def toPixels(ds: Dataset[Block]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { b =>
      val nd = Nd.of(b.shape.toArray, b.data)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
      nd.foreachCoord { c =>
        buf += ((b.origin(0) + c(0), b.origin(1) + c(1), nd(c)))
      }
      buf
    }.toDF("i", "j", "v")
  }
}
