package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.sources.GifSource
import graft.sources.GifSource.GifFrame

/** GIF codec + distributed reader spec.
  *
  * The LZW layer is pinned by round trips (including a dictionary-full
  * mid-stream CLEAR) and the full-frame decode is cross-checked against
  * javax.imageio's independent GIF reader — two decoders agreeing on the
  * same real stream rules out a self-consistent-but-wrong codec. The
  * animation semantics (partial frames, transparency, disposal 2/3,
  * interlace, local palettes) are pinned with hand-built expectations,
  * and malformed streams must all fail with the IllegalArgumentException
  * contract (never an index/buffer error).
  */
class GifSourceSpec extends SparkSpec {

  /** 256-entry gray palette: entry i = (i, i, i). */
  private val grayPal: Array[Byte] =
    Array.tabulate(256 * 3)(i => (i / 3).toByte)

  /** Deterministic pseudo-random bytes below `mod`. */
  private def pseudo(n: Int, mod: Int, seed: Int): Array[Byte] = {
    var x = seed
    Array.fill(n) {
      x = x * 1103515245 + 12345
      (((x >>> 16) & 0x7fffffff) % mod).toByte
    }
  }

  test("gif lzw: round trip at root sizes 2 and 8") {
    for ((min, mod) <- Seq((2, 4), (8, 256))) {
      val data = pseudo(5000, mod, seed = min)
      val dec = GifSource.lzwDecodeGif(min, GifSource.lzwEncodeGif(min, data), data.length)
      assert(dec.sameElements(data), s"lzw round trip failed at min=$min")
    }
  }

  test("gif lzw: dictionary fill forces a mid-stream clear and survives it") {
    // enough entropy that the 4096-entry dictionary fills several times
    val data = pseudo(60000, 256, seed = 7)
    val codes = GifSource.lzwEncodeGif(8, data)
    val dec = GifSource.lzwDecodeGif(8, codes, data.length)
    assert(dec.sameElements(data))
  }

  test("gif lzw: KwKwK pattern (code == next) decodes") {
    // 'aaaa...' immediately produces the code-equals-next case
    val data = Array.fill[Byte](64)(3)
    val dec = GifSource.lzwDecodeGif(2, GifSource.lzwEncodeGif(2, data), 64)
    assert(dec.sameElements(data))
  }

  test("gif decode agrees with javax.imageio on a full-frame file") {
    val h = 31; val w = 47
    val idx = pseudo(h * w, 256, seed = 11)
    val bytes = GifSource.encodeGif(w, h, grayPal,
      Seq(GifFrame(0, 0, w, h, idx)))
    val ours = GifSource.decodeGif(bytes)
    assert(ours.length == 1)
    val (dh, dw, rgb) = ours.head
    assert((dh, dw) == (h, w))
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "imageio could not parse our GIF stream")
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val o = (y * w + x) * 3
      assert(((p >> 16) & 0xff) == (rgb(o) & 0xff)
        && ((p >> 8) & 0xff) == (rgb(o + 1) & 0xff)
        && (p & 0xff) == (rgb(o + 2) & 0xff),
        s"pixel ($y,$x) disagrees with imageio")
    }
  }

  test("gif interlace: interlaced and progressive frames decode identically") {
    val h = 29; val w = 16 // odd height exercises every interlace pass edge
    val idx = pseudo(h * w, 256, seed = 3)
    val prog = GifSource.decodeGif(GifSource.encodeGif(w, h, grayPal,
      Seq(GifFrame(0, 0, w, h, idx))))
    val inter = GifSource.decodeGif(GifSource.encodeGif(w, h, grayPal,
      Seq(GifFrame(0, 0, w, h, idx, interlace = true))))
    assert(prog.head._3.sameElements(inter.head._3))
  }

  test("gif compositing: partial frame + transparency over a persistent canvas") {
    val w = 8; val h = 6
    val f0 = Array.tabulate[Byte](w * h)(i => (i % 256).toByte)
    // frame 1: 3x2 rect at (x=2, y=1); index 7 marked transparent
    val rect = Array[Byte](100, 7, 101, 7, 102, 103)
    val bytes = GifSource.encodeGif(w, h, grayPal, Seq(
      GifFrame(0, 0, w, h, f0),
      GifFrame(2, 1, 3, 2, rect, transparent = 7)))
    val frames = GifSource.decodeGif(bytes)
    assert(frames.length == 2)
    def at(fr: Array[Byte], y: Int, x: Int): Int = fr((y * w + x) * 3) & 0xff
    // expected: frame 1 = frame 0 with the opaque rect pixels overwritten
    val exp = f0.map(_ & 0xff)
    exp(1 * w + 2) = 100; exp(1 * w + 4) = 101
    exp(2 * w + 3) = 102; exp(2 * w + 4) = 103
    // (1,3) and (2,2) were transparent — frame 0 shows through
    for (y <- 0 until h; x <- 0 until w)
      assert(at(frames(1)._3, y, x) == exp(y * w + x), s"composite ($y,$x)")
    // gray palette: all three channels equal
    assert(frames(1)._3.grouped(3).forall(c => c(0) == c(1) && c(1) == c(2)))
  }

  test("gif disposal 2 restores the rect to background; 3 restores the canvas") {
    val w = 4; val h = 4
    val f0 = Array.fill[Byte](w * h)(50)
    val patch = Array.fill[Byte](4)(200.toByte) // 2x2 at (1,1)
    val f2 = Array.fill[Byte](1)(99) // 1x1 probe at (0,0)
    // disposal=2 on the patch: after frame 1 is shown, its rect reverts
    // to the background color (palette entry 0 = gray 0)
    val d2 = GifSource.decodeGif(GifSource.encodeGif(w, h, grayPal, Seq(
      GifFrame(0, 0, w, h, f0),
      GifFrame(1, 1, 2, 2, patch, disposal = 2),
      GifFrame(0, 0, 1, 1, f2))))
    def at(fr: (Int, Int, Array[Byte]), y: Int, x: Int): Int =
      fr._3((y * w + x) * 3) & 0xff
    assert(at(d2(1), 1, 1) == 200, "frame 1 shows the patch")
    assert(at(d2(2), 1, 1) == 0, "disposal 2: rect reverts to background")
    assert(at(d2(2), 0, 0) == 99 && at(d2(2), 3, 3) == 50)
    // disposal=3 on the patch: frame 2 sees the pre-patch canvas
    val d3 = GifSource.decodeGif(GifSource.encodeGif(w, h, grayPal, Seq(
      GifFrame(0, 0, w, h, f0),
      GifFrame(1, 1, 2, 2, patch, disposal = 3),
      GifFrame(0, 0, 1, 1, f2))))
    assert(at(d3(1), 1, 1) == 200)
    assert(at(d3(2), 1, 1) == 50, "disposal 3: canvas restored to previous")
  }

  test("gif local palette overrides the global one") {
    val w = 5; val h = 3
    val idx = pseudo(w * h, 256, seed = 5)
    // reversed-gray local palette: entry i = 255 - i
    val revPal = Array.tabulate(256 * 3)(i => (255 - i / 3).toByte)
    val frames = GifSource.decodeGif(GifSource.encodeGif(w, h, grayPal,
      Seq(GifFrame(0, 0, w, h, idx, localPalette = Some(revPal)))))
    for (p <- 0 until w * h)
      assert((frames.head._3(p * 3) & 0xff) == 255 - (idx(p) & 0xff))
  }

  test("gif malformed streams fail with IllegalArgumentException") {
    val good = GifSource.encodeGif(4, 4, grayPal,
      Seq(GifFrame(0, 0, 4, 4, Array.fill[Byte](16)(9))))
    val bads = Seq[Array[Byte]](
      Array[Byte](),
      "GIF89a".getBytes,
      "NOTGIF".getBytes ++ good.drop(6),
      good.take(20), // inside the global palette
      good.dropRight(1), // trailer gone
      { val b = good.clone(); b(13 + 768) = 0x55; b }, // unknown block type
    )
    for (b <- bads)
      assertThrows[IllegalArgumentException](GifSource.decodeGif(b))
    // palette index out of range: 4-entry palette, index 3 valid, but a
    // 2-bit stream can still name transparent-free index beyond palette
    val smallPal = Array.tabulate(2 * 3)(i => (i / 3 * 255).toByte)
    val overIdx = GifSource.encodeGif(2, 2, smallPal,
      Seq(GifFrame(0, 0, 2, 2, Array[Byte](0, 1, 1, 0))))
    assert(GifSource.decodeGif(overIdx).nonEmpty) // in-range control
  }

  test("gif decoder terminates with a clean failure on arbitrary garbage (fuzz)") {
    // a corrupt lake object must throw, never hang, loop, or index out
    // of bounds — random payloads (some with a valid signature) plus
    // bit-flipped valid streams
    val rnd = new scala.util.Random(29)
    for (i <- 1 to 500) {
      val bytes = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(bytes)
      if (i % 2 == 0 && bytes.length >= 6)
        System.arraycopy("GIF89a".getBytes, 0, bytes, 0, 6)
      try { GifSource.decodeGif(bytes); () }
      catch { case _: IllegalArgumentException => () }
      try { GifSource.gifFrameCount(bytes); () }
      catch { case _: IllegalArgumentException => () }
    }
    val ok = GifSource.encodeGif(12, 10, grayPal, Seq(
      GifFrame(0, 0, 12, 10, pseudo(120, 256, seed = 1)),
      GifFrame(2, 2, 6, 4, pseudo(24, 256, seed = 2), transparent = 3)))
    for (_ <- 1 to 1000) {
      val mut = ok.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      try {
        // a surviving decode must still be structurally sane
        for ((h, w, rgb) <- GifSource.decodeGif(mut))
          assert(h > 0 && w > 0 && rgb.length == h * w * 3)
      } catch { case _: IllegalArgumentException => () }
      try { GifSource.gifFrameCount(mut); () }
      catch { case _: IllegalArgumentException => () }
    }
    // every truncation of a valid stream fails with the contract
    // exception (or decodes the frames that were complete before the cut)
    for (n <- 0 until ok.length)
      try { GifSource.decodeGif(java.util.Arrays.copyOf(ok, n)); () }
      catch { case _: IllegalArgumentException => () }
  }

  test("gifFrameCount matches the decoded frame count without decoding") {
    val idx = pseudo(12 * 10, 256, seed = 13)
    val bytes = GifSource.encodeGif(10, 12, grayPal, Seq(
      GifFrame(0, 0, 10, 12, idx),
      GifFrame(2, 2, 4, 4, idx.take(16), transparent = 1),
      GifFrame(0, 0, 10, 12, idx, interlace = true)))
    assert(GifSource.gifFrameCount(bytes) == 3L)
    assert(GifSource.decodeGif(bytes).length == 3)
  }

  test("readGif stacks frames across files in glob order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gif_spec")
    val h = 9; val w = 11
    def frame(k: Int): Array[Byte] =
      Array.tabulate[Byte](h * w)(i => ((i + 31 * k) % 256).toByte)
    // file a: 2-frame animation (frames 0, 1); file b: 1 frame (frame 2)
    java.nio.file.Files.write(dir.resolve("a.gif"),
      GifSource.encodeGif(w, h, grayPal, Seq(
        GifFrame(0, 0, w, h, frame(0)),
        GifFrame(0, 0, w, h, frame(1)))))
    java.nio.file.Files.write(dir.resolve("b.gif"),
      GifSource.encodeGif(w, h, grayPal, Seq(GifFrame(0, 0, w, h, frame(2)))))
    val blocks = GifSource.readGif(spark, s"$dir/*.gif").collect().sortBy(_.origin.head)
    assert(blocks.length == 3)
    for ((b, k) <- blocks.zipWithIndex) {
      assert(b.origin == Seq(k, 0, 0, 0))
      assert(b.shape == Seq(1, h, w, 3))
      assert(b.arrayShape == Seq(3, h, w, 3))
      assert(b.dtype == graft.tensor.DType.U8.name)
      val exp = frame(k)
      for (p <- 0 until h * w; c <- 0 until 3)
        assert((b.data(p * 3 + c) & 0xff) == (exp(p) & 0xff), s"frame $k pixel $p")
    }
    dir.toFile.listFiles().foreach(_.delete())
    java.nio.file.Files.delete(dir)
  }
}
