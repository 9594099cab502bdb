package graft

import graft.sources.AviSource

/** AVI container codec + distributed reader spec.
  *
  * DIB frames are pinned byte-exact through encode→decode round trips
  * (including a non-multiple-of-4 row stride, where the 4-byte padding
  * and the bottom-up BGR order must both be honored), MJPEG through
  * geometry + decode determinism (lossy codec — same contract as
  * imread_jpeg), the interleaved audio track through sample-exact
  * reassembly across chunks, and malformed containers through the
  * shared IllegalArgumentException fuzz contract.
  */
class AviSourceSpec extends SparkSpec {

  private def pseudoRgb(h: Int, w: Int, seed: Int): Array[Byte] = {
    var x = seed
    Array.fill(h * w * 3) {
      x = x * 1103515245 + 12345
      ((x >>> 16) & 0xff).toByte
    }
  }

  test("avi DIB round trip is byte-exact, including a padded (w=5) stride") {
    for ((h, w) <- Seq((8, 6), (7, 5))) {
      val frames = (0 until 3).map(k => pseudoRgb(h, w, seed = 31 * k + 1))
      val bytes = AviSource.encodeAvi(w, h, 40000L, frames)
      val clip = AviSource.decodeAvi(bytes)
      assert(clip.w == w && clip.h == h && clip.usPerFrame == 40000L)
      assert(clip.frames.size == 3)
      for ((f, k) <- clip.frames.zipWithIndex)
        assert(f.sameElements(frames(k)), s"frame $k differs at ${h}x$w")
    }
  }

  test("avi MJPEG: geometry exact, decode deterministic, residual bounded") {
    val h = 16; val w = 12
    val frames = (0 until 2).map(k => pseudoRgb(h, w, seed = 7 * k + 3))
    val bytes = AviSource.encodeAvi(w, h, 33333L, frames, codec = "MJPG")
    val c1 = AviSource.decodeAvi(bytes)
    val c2 = AviSource.decodeAvi(bytes)
    assert(c1.w == w && c1.h == h && c1.frames.size == 2)
    for (k <- 0 until 2) {
      assert(c1.frames(k).sameElements(c2.frames(k)), "decode must be deterministic")
      assert(c1.frames(k).length == h * w * 3)
    }
  }

  test("avi audio: interleaved 01wb chunks reassemble the exact sample stream") {
    val h = 4; val w = 4
    val frames = (0 until 3).map(k => pseudoRgb(h, w, seed = k + 11))
    val pcm = Array.tabulate[Short](1000)(i => ((i * 37 - 16000) % 32768).toShort)
    val bytes = AviSource.encodeAvi(w, h, 40000L, frames,
      audio = Some((8000, pcm)))
    val clip = AviSource.decodeAvi(bytes)
    assert(clip.audioRate == 8000)
    assert(clip.audio.sameElements(pcm), "audio samples must survive the interleave")
    assert(clip.frames.size == 3)
    assert(AviSource.aviFrameCount(bytes) == 3L)
  }

  test("avi audio-first stream order: video is stream 1 ('01dc') and still decodes") {
    // chunk ids encode the strl order — a decoder hard-coding video as
    // stream 0 reads an audio-first file as zero frames
    val h = 6; val w = 4
    val frames = (0 until 2).map(k => pseudoRgb(h, w, seed = k + 21))
    val pcm = Array.tabulate[Short](200)(i => (i * 5).toShort)
    val bytes = AviSource.encodeAvi(w, h, 40000L, frames,
      audio = Some((8000, pcm)), audioFirst = true)
    val clip = AviSource.decodeAvi(bytes)
    assert(clip.frames.size == 2, "audio-first file must still yield its frames")
    for ((f, k) <- clip.frames.zipWithIndex)
      assert(f.sameElements(frames(k)), s"frame $k differs under audio-first order")
    assert(clip.audio.sameElements(pcm))
    assert(AviSource.aviFrameCount(bytes) == 2L)
  }

  test("avi deep LIST nesting fails with IllegalArgumentException, not StackOverflow") {
    // a 12-bytes-per-level nested LIST chain: thousands of levels in a
    // small file would otherwise blow the JVM stack (an Error, outside
    // the fuzz contract)
    val depth = 20000
    val bos = new java.io.ByteArrayOutputStream()
    def wr32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    // innermost body, then wrap outward
    var body = Array.emptyByteArray
    for (_ <- 1 to depth) {
      val b = new java.io.ByteArrayOutputStream()
      b.write("LIST".getBytes); val inner = body
      val sz = 4L + inner.length
      b.write((sz & 0xff).toInt); b.write(((sz >> 8) & 0xff).toInt)
      b.write(((sz >> 16) & 0xff).toInt); b.write(((sz >> 24) & 0xff).toInt)
      b.write("hdrx".getBytes); b.write(inner)
      body = b.toByteArray
    }
    bos.write("RIFF".getBytes); wr32(4L + body.length)
    bos.write("AVI ".getBytes); bos.write(body)
    intercept[IllegalArgumentException](AviSource.decodeAvi(bos.toByteArray))
  }

  test("avi malformed containers fail with IllegalArgumentException (fuzz)") {
    val rnd = new scala.util.Random(41)
    for (i <- 1 to 500) {
      val bytes = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(bytes)
      if (i % 2 == 0 && bytes.length >= 12) {
        System.arraycopy("RIFF".getBytes, 0, bytes, 0, 4)
        System.arraycopy("AVI ".getBytes, 0, bytes, 8, 4)
      }
      try { AviSource.decodeAvi(bytes); () }
      catch { case _: IllegalArgumentException => () }
      try { AviSource.aviFrameCount(bytes); () }
      catch { case _: IllegalArgumentException => () }
    }
    val ok = AviSource.encodeAvi(6, 5, 40000L,
      Seq(pseudoRgb(5, 6, 1), pseudoRgb(5, 6, 2)),
      audio = Some((8000, Array.tabulate[Short](64)(_.toShort))))
    for (_ <- 1 to 1000) {
      val mut = ok.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      try {
        val c = AviSource.decodeAvi(mut)
        for (f <- c.frames) assert(f.length == c.w * c.h * 3)
      } catch { case _: IllegalArgumentException => () }
    }
    for (n <- 0 until ok.length)
      try { AviSource.decodeAvi(java.util.Arrays.copyOf(ok, n)); () }
      catch { case _: IllegalArgumentException => () }
  }

  test("readAvi stacks frames across files in glob order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avi_spec")
    val h = 9; val w = 11
    def frame(k: Int): Array[Byte] =
      Array.tabulate[Byte](h * w * 3)(i => ((i + 31 * k) % 256).toByte)
    java.nio.file.Files.write(dir.resolve("a.avi"),
      AviSource.encodeAvi(w, h, 40000L, Seq(frame(0), frame(1))))
    java.nio.file.Files.write(dir.resolve("b.avi"),
      AviSource.encodeAvi(w, h, 40000L, Seq(frame(2))))
    val blocks = AviSource.readAvi(spark, s"$dir/*.avi").collect().sortBy(_.origin.head)
    assert(blocks.length == 3)
    for ((b, k) <- blocks.zipWithIndex) {
      assert(b.origin == Seq(k, 0, 0, 0))
      assert(b.shape == Seq(1, h, w, 3))
      assert(b.arrayShape == Seq(3, h, w, 3))
      assert(b.data.sameElements(frame(k)), s"frame $k pixels differ")
    }
  }

  test("readAviAv exposes per-file frame metadata and the audio track") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avi_av_spec")
    val pcm = Array.tabulate[Short](320)(i => (i * 3).toShort)
    java.nio.file.Files.write(dir.resolve("clip.avi"),
      AviSource.encodeAvi(6, 4, 40000L,
        (0 until 4).map(k => pseudoRgb(4, 6, k)), audio = Some((8000, pcm))))
    val rows = AviSource.readAviAv(spark, s"$dir/*.avi").collect()
    assert(rows.length == 1)
    val (_, nf, h, w, usf, rate, audio) = rows.head
    assert(nf == 4 && h == 4 && w == 6 && usf == 40000L && rate == 8000)
    assert(audio.sameElements(pcm))
  }
}
