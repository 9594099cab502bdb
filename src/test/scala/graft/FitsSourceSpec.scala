package graft

import graft.sources.FitsSource
import graft.tensor.DType

/** FITS codec + reader spec: integer-exact round trips for all three
  * dtype mappings (u8, i16, u16-via-BZERO), header-card parsing edges,
  * the malformed-stream IllegalArgumentException contract (incl. a
  * garbage fuzz pass), and cube frame indexing through the distributed
  * reader.
  */
class FitsSourceSpec extends SparkSpec {

  private def pseudo(n: Int, mod: Int, seed: Int): Array[Double] = {
    var x = seed
    Array.fill(n) {
      x = x * 1103515245 + 12345
      (((x >>> 16) & 0x7fffffff) % mod).toDouble
    }
  }

  test("fits round trip: u8, signed i16, unsigned u16 (BZERO=32768)") {
    val h = 7; val w = 9
    // u8
    val u8 = pseudo(h * w, 256, 1)
    val d8 = FitsSource.decodeFits(FitsSource.encodeFits(h, w, Seq(u8), bitpix = 8))
    assert(d8.length == 1 && d8.head._3 == DType.U8.name)
    assert((0 until h * w).forall(i => DType.U8.read(d8.head._4, i) == u8(i)))
    // unsigned 16: values crossing 32767 exercise the sign-flip exactly
    val u16 = pseudo(h * w, 65536, 2)
    val d16 = FitsSource.decodeFits(FitsSource.encodeFits(h, w, Seq(u16), bitpix = 16))
    assert(d16.head._3 == DType.U16.name)
    assert((0 until h * w).forall(i => DType.U16.read(d16.head._4, i) == u16(i)))
    // signed 16 (no BZERO card): negative values survive
    val i16 = pseudo(h * w, 65536, 3).map(_ - 32768.0)
    val di = FitsSource.decodeFits(
      FitsSource.encodeFits(h, w, Seq(i16), bitpix = 16, unsigned16 = false))
    assert(di.head._3 == DType.I16.name)
    assert((0 until h * w).forall(i => DType.I16.read(di.head._4, i) == i16(i)))
  }

  test("fits cube: NAXIS3 planes decode in order; frame count is header-only") {
    val h = 5; val w = 6
    val frames = (0 until 4).map(f => pseudo(h * w, 65536, 10 + f))
    val bytes = FitsSource.encodeFits(h, w, frames, bitpix = 16)
    assert(FitsSource.fitsFrameCount(bytes) == 4L)
    val dec = FitsSource.decodeFits(bytes)
    assert(dec.length == 4)
    for ((fr, f) <- dec.zipWithIndex)
      assert((0 until h * w).forall(i => DType.U16.read(fr._4, i) == frames(f)(i)),
        s"plane $f")
  }

  test("fits header parses comments and rejects the unsupported subset loudly") {
    val ok = FitsSource.encodeFits(3, 3, Seq(pseudo(9, 256, 5)), bitpix = 8)
    // a comment on a value card must not break parsing
    val withComment = ok.clone()
    val card0 = "BITPIX  =                    8 / bits per sample"
    val card = card0 + " " * (80 - card0.length)
    assert(card.length == 80)
    System.arraycopy(card.getBytes, 0, withComment, 80, 80)
    assert(FitsSource.decodeFits(withComment).nonEmpty)
    def corrupt(key: String, value: String): Array[Byte] = {
      val b = ok.clone()
      val c = f"$key%-8s= $value%20s"
      // overwrite the BITPIX card (second card in our encoder layout)
      System.arraycopy((c + " " * (80 - c.length)).getBytes, 0, b, 80, 80)
      b
    }
    assertThrows[IllegalArgumentException](
      FitsSource.decodeFits(corrupt("BITPIX", "32")))
    assertThrows[IllegalArgumentException](
      FitsSource.decodeFits(corrupt("BITPIX", "ten")))
    assertThrows[IllegalArgumentException](
      FitsSource.decodeFits(corrupt("BSCALE", "2")))
    assertThrows[IllegalArgumentException](
      FitsSource.decodeFits("NOTFITS".getBytes ++ ok.drop(7)))
    assertThrows[IllegalArgumentException](
      FitsSource.decodeFits(ok.take(2880))) // header only, no data unit
    assertThrows[IllegalArgumentException](
      FitsSource.decodeFits(ok.take(100))) // mid-header truncation
  }

  test("fits decoder terminates with a clean failure on arbitrary garbage (fuzz)") {
    val rnd = new scala.util.Random(31)
    for (i <- 1 to 500) {
      val bytes = new Array[Byte](rnd.nextInt(6000))
      rnd.nextBytes(bytes)
      if (i % 2 == 0 && bytes.length >= 6)
        System.arraycopy("SIMPLE".getBytes, 0, bytes, 0, 6)
      try { FitsSource.decodeFits(bytes); () }
      catch { case _: IllegalArgumentException => () }
    }
    val ok = FitsSource.encodeFits(6, 6, Seq(pseudo(36, 65536, 7)), bitpix = 16)
    for (_ <- 1 to 500) {
      val mut = ok.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      try {
        for ((h, w, dt, px) <- FitsSource.decodeFits(mut))
          assert(h > 0 && w > 0 && px.length == h * w * DType.of(dt).bytes)
      } catch { case _: IllegalArgumentException => () }
    }
  }

  test("readFits stacks cube planes and mixed-dtype files across the glob") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fits_spec")
    val h = 8; val w = 5
    val cube = (0 until 2).map(f => pseudo(h * w, 65536, 20 + f))
    val flat = pseudo(h * w, 256, 30)
    java.nio.file.Files.write(dir.resolve("a_cube.fits"),
      FitsSource.encodeFits(h, w, cube, bitpix = 16))
    java.nio.file.Files.write(dir.resolve("b_flat.fits"),
      FitsSource.encodeFits(h, w, Seq(flat), bitpix = 8))
    val blocks = FitsSource.readFits(spark, s"$dir/*.fits")
      .collect().sortBy(_.origin.head)
    assert(blocks.length == 3)
    assert(blocks.map(_.dtype).toSeq ==
      Seq(DType.U16.name, DType.U16.name, DType.U8.name))
    for ((b, k) <- blocks.zipWithIndex) {
      assert(b.origin == Seq(k, 0, 0) && b.shape == Seq(1, h, w))
      val exp = if (k < 2) cube(k) else flat
      assert((0 until h * w).forall(i => b.dt.read(b.data, i) == exp(i)),
        s"frame $k payload")
    }
    dir.toFile.listFiles().foreach(_.delete())
    java.nio.file.Files.delete(dir)
  }
}
