package graft

import java.nio.file.{Files, Paths}
import graft.sources.ImageSource
import graft.tensor._

class ImageSourceSpec extends SparkSpec {

  test("imread analog: PGM glob round-trips through binaryFile into a stacked Block image") {
    val dir = Files.createTempDirectory("graft_pgm").toFile
    dir.deleteOnExit()
    val frames = (0 until 3).map { f =>
      val px = Array.tabulate(6 * 5)(i => ((i * 7 + f * 31) % 251).toDouble)
      Files.write(Paths.get(dir.getPath, f"frame_$f%03d.pgm"),
        ImageSource.encodePgm(6, 5, px))
      px
    }
    val ds = ImageSource.readPgm(spark, dir.getPath + "/*.pgm")
    val blocks = ds.collect().sortBy(_.idx.head)
    assert(blocks.length == 3)
    assert(blocks.forall(_.arrayShape == Seq(3, 6, 5)))
    for ((b, f) <- blocks.zipWithIndex) {
      assert(b.idx == Seq(f, 0, 0) && b.shape == Seq(1, 6, 5))
      assert(b.data.sameElements(frames(f)), s"frame $f bytes differ")
    }
    // the stacked image is a normal tensor: a 3-d filter runs on it
    val sm = Filters.uniformFilter(ds, Seq(1, 3, 3))
    assert(Grid.unblockify(sm).shape.toSeq == Seq(3, 6, 5))
  }

  test("imread PNG: grayscale codec round-trips and frame order follows sorted paths") {
    val dir = Files.createTempDirectory("graft_png").toFile
    dir.deleteOnExit()
    val frames = (0 until 4).map { f =>
      val px = Array.tabulate(5 * 7)(i => ((i * 11 + f * 13) % 256).toDouble)
      Files.write(Paths.get(dir.getPath, f"img_$f%03d.png"),
        ImageSource.encodePng(5, 7, px))
      px
    }
    val ds = ImageSource.readPng(spark, dir.getPath + "/*.png")
    val blocks = ds.collect().sortBy(_.idx.head)
    assert(blocks.length == 4)
    assert(blocks.forall(_.arrayShape == Seq(4, 5, 7)))
    for ((b, f) <- blocks.zipWithIndex) {
      assert(b.idx == Seq(f, 0, 0) && b.shape == Seq(1, 5, 7))
      assert(b.data.sameElements(frames(f)), s"frame $f pixels differ")
    }
  }

  test("PGM decoder: comments and 16-bit maxval") {
    val ascii = "P5\n# a comment line\n2 2\n65535\n".getBytes("US-ASCII")
    val body = Array[Byte](0x01, 0x00, 0x00, 0xff.toByte, 0x10, 0x00, 0x00, 0x2a)
    val (h, w, px) = ImageSource.decodePgm(ascii ++ body)
    assert(h == 2 && w == 2)
    assert(px.toSeq == Seq(256.0, 255.0, 4096.0, 42.0))
  }
}
