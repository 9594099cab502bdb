package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import javax.imageio.ImageIO
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tensor.Block

/** Image file source — the reference's `imread` analog
  * (dask_image/imread/__init__.py::imread ≈ L15–95: lazily expose a
  * file/glob as an array with one chunk per frame).
  *
  * Spark-native shape: `spark.read.format("binaryFile")` scans the glob
  * (distributed, one task per file), a per-file decoder turns each frame
  * into one Block row keyed by frame index. Frames stack on a leading
  * axis exactly like the reference's nframes chunking. Codecs: binary
  * PGM (P5) and PNG (grayscale, via the JDK's javax.imageio — no extra
  * dependency); other decoders plug into the same seam.
  */
object ImageSource {

  /** Read a glob of image files as one stacked Block image: block idx =
    * (frame, 0, 0), one chunk per frame (the imread contract). Frame
    * order is the sorted file path order, matching glob-sorted imread.
    *
    * Frame indexing is fully distributed: a row_number window over the
    * path column (metadata-only — paths, not contents, move through the
    * single-partition sort; the frame axis of ONE logical image is
    * bounded, unlike the lake's file population, so this is not the
    * O(#files)-on-the-driver collect it replaces).
    */
  def readFrames(spark: SparkSession, glob: String, codec: String,
      imageId: String = "imread"): Dataset[Block] = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
    val nFrames = files.count()
    val indexed = files
      .withColumn("frame", row_number().over(Window.orderBy(col("path"))) - 1)
      .select(col("frame"), col("content"))
      .as[(Int, Array[Byte])]
    indexed.map { case (frame, bytes) =>
      val (h, w, px) = codec match {
        case "pgm" => decodePgm(bytes)
        case "png" => decodePng(bytes)
        case other => throw new IllegalArgumentException(s"imread codec: $other")
      }
      Block(imageId, Seq(frame, 0, 0), Seq(frame, 0, 0),
        Seq(1, h, w), Seq(1, h, w), Seq(nFrames.toInt, h, w), px)
    }
  }

  def readPgm(spark: SparkSession, glob: String, imageId: String = "imread"): Dataset[Block] =
    readFrames(spark, glob, "pgm", imageId)

  def readPng(spark: SparkSession, glob: String, imageId: String = "imread"): Dataset[Block] =
    readFrames(spark, glob, "png", imageId)

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

  /** PNG decoder via the JDK's ImageIO — first band (grayscale sample)
    * per pixel. */
  private[graft] def decodePng(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image")
    val h = img.getHeight; val w = img.getWidth
    val raster = img.getRaster
    val out = new Array[Double](h * w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) = raster.getSample(x, y, 0).toDouble
        x += 1
      }
      y += 1
    }
    (h, w, out)
  }

  /** Encode a 2-d array as binary PGM (test/round-trip support). */
  private[graft] def encodePgm(h: Int, w: Int, px: Array[Double]): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII)
    val body = px.map(v => math.max(0, math.min(255, math.round(v))).toByte)
    header ++ body
  }

  /** Encode a 2-d array as 8-bit grayscale PNG (test/round-trip support). */
  private[graft] def encodePng(h: Int, w: Int, px: Array[Double]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, math.max(0, math.min(255, math.round(px(y * w + x)))).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
