package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tensor.Block

/** Image file source — the reference's `imread` analog
  * (dask_image/imread/__init__.py::imread ≈ L15–95: lazily expose a
  * file/glob as an array with one chunk per frame).
  *
  * Spark-native shape: `spark.read.format("binaryFile")` scans the glob
  * (distributed, one task per file), a per-file decoder turns each frame
  * into one Block row keyed by frame index. Frames stack on a leading
  * axis exactly like the reference's nframes chunking. The decoder here
  * handles binary PGM (P5), a real self-contained format; other codecs
  * plug into the same `decode` seam.
  */
object ImageSource {

  /** Read a glob of PGM files as one stacked Block image: block idx =
    * (frame, 0, 0), one chunk per frame (the imread contract). Frame
    * order is the sorted file path order, matching glob-sorted imread. */
  def readPgm(spark: SparkSession, glob: String, imageId: String = "imread"): Dataset[Block] = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    // frame index = rank of the path among all matched paths (small
    // metadata-only collect, like imread's eager shape probe)
    val order = files.select(col("path")).as[String].collect().sorted.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(order)
    val nFrames = order.size
    files.map { case (path, bytes) =>
      val (h, w, px) = decodePgm(bytes)
      Block(imageId, Seq(bc.value(path), 0, 0), Seq(bc.value(path), 0, 0),
        Seq(1, h, w), Seq(1, h, w), Seq(nFrames, h, w), px)
    }
  }

  /** Binary PGM (P5) decoder: header "P5 <w> <h> <maxval>" then raw
    * bytes. Returns (h, w, doubles). */
  private[graft] def decodePgm(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    // parse ASCII header tokens, skipping comment lines
    var pos = 0
    def token(): String = {
      val sb = new StringBuilder
      while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
      while (pos < bytes.length && bytes(pos).toChar == '#') {
        while (pos < bytes.length && bytes(pos).toChar != '\n') pos += 1
        while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
      }
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) {
        sb.append(bytes(pos).toChar); pos += 1
      }
      sb.toString
    }
    val magic = token()
    require(magic == "P5", s"not a binary PGM: $magic")
    val w = token().toInt; val h = token().toInt; val maxval = token().toInt
    require(maxval > 0 && maxval < 65536, "PGM maxval out of range")
    pos += 1 // single whitespace after maxval
    val bytesPerPx = if (maxval < 256) 1 else 2
    val out = new Array[Double](h * w)
    var i = 0
    while (i < h * w) {
      out(i) =
        if (bytesPerPx == 1) (bytes(pos + i) & 0xff).toDouble
        else (((bytes(pos + 2 * i) & 0xff) << 8) | (bytes(pos + 2 * i + 1) & 0xff)).toDouble
      i += 1
    }
    (h, w, out)
  }

  /** Encode a 2-d array as binary PGM (test/round-trip support). */
  private[graft] def encodePgm(h: Int, w: Int, px: Array[Double]): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII)
    val body = px.map(v => math.max(0, math.min(255, math.round(v))).toByte)
    header ++ body
  }
}
