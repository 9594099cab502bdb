package graft

import graft.sources.AudioSource
import org.apache.spark.sql.functions._

class AudioSourceSpec extends SparkSpec {

  test("WAV PCM16 round-trips exactly across rates, channels, and edge amplitudes") {
    val rnd = new scala.util.Random(7)
    for (ch <- Seq(1, 2, 6); sr <- Seq(8000, 44100, 96000)) {
      val n = (1 + rnd.nextInt(500)) * ch
      val samples = Array.tabulate(n)(_ => (rnd.nextInt(65536) - 32768).toShort)
      samples(0) = Short.MinValue // edge amplitudes must survive the wire
      samples(n - 1) = Short.MaxValue
      val (dsr, dch, ds) = AudioSource.decodeWav(
        AudioSource.encodeWavPcm16(sr, ch, samples))
      assert(dsr == sr && dch == ch, s"geometry $dsr x $dch vs $sr x $ch")
      assert(ds.sameElements(samples), s"sample mismatch at sr=$sr ch=$ch")
    }
  }

  test("decode walks unknown chunks (LIST before data, odd-length, fmt extension)") {
    val samples = Array[Short](100, -200, 300, -400)
    val base = AudioSource.encodeWavPcm16(16000, 1, samples)
    // splice a 5-byte (odd -> 1 pad byte) LIST chunk between fmt and data,
    // and grow the fmt chunk by a 2-byte extension, as real encoders do
    val buf = java.nio.ByteBuffer.allocate(base.length + 8 + 5 + 1 + 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(base, 0, 12) // RIFF + len + WAVE
    buf.put("fmt ".getBytes("US-ASCII")).putInt(18)
    buf.put(base, 20, 16) // original fmt body
    buf.putShort(0) // cbSize = 0 extension
    buf.put("LIST".getBytes("US-ASCII")).putInt(5)
    buf.put("INFOx".getBytes("US-ASCII")).put(0.toByte) // odd body + pad
    buf.put(base, 36, base.length - 36) // data chunk onward
    val bytes = java.util.Arrays.copyOf(buf.array(), buf.position())
    val (sr, ch, ds) = AudioSource.decodeWav(bytes)
    assert(sr == 16000 && ch == 1 && ds.sameElements(samples))
  }

  test("encoded header fields match the RIFF spec byte-for-byte") {
    val b = AudioSource.encodeWavPcm16(8000, 2, Array[Short](1, 2))
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def str(n: Int) = { val a = new Array[Byte](n); buf.get(a); new String(a, "US-ASCII") }
    assert(str(4) == "RIFF"); assert(buf.getInt == 36 + 4)
    assert(str(4) == "WAVE"); assert(str(4) == "fmt "); assert(buf.getInt == 16)
    assert(buf.getShort == 1, "PCM tag")
    assert(buf.getShort == 2, "channels")
    assert(buf.getInt == 8000, "sample rate")
    assert(buf.getInt == 8000 * 2 * 2, "byte rate")
    assert(buf.getShort == 4, "block align")
    assert(buf.getShort == 16, "bit depth")
    assert(str(4) == "data"); assert(buf.getInt == 4)
    assert(buf.getShort == 1 && buf.getShort == 2, "little-endian samples")
  }

  test("malformed streams fail loudly, not with garbage audio") {
    val ok = AudioSource.encodeWavPcm16(8000, 1, Array[Short](1, 2, 3, 4))
    intercept[IllegalArgumentException](AudioSource.decodeWav("nope".getBytes))
    // truncated data chunk: declared length overruns the stream
    intercept[IllegalArgumentException](
      AudioSource.decodeWav(java.util.Arrays.copyOf(ok, ok.length - 3)))
    // non-PCM format tag
    val bad = ok.clone(); bad(20) = 2 // fmt tag lives at offset 20
    intercept[IllegalArgumentException](AudioSource.decodeWav(bad))
  }

  test("decoder terminates with a clean failure on arbitrary garbage (fuzz)") {
    // a corrupt lake object must throw, never hang, loop, or return
    // fabricated audio — 500 random payloads plus bit-flipped valid ones
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 500) {
      val bytes = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(bytes)
      // the ONLY admissible failure is the IllegalArgumentException
      // contract (r12: the header-truncation underflow is guarded)
      try { AudioSource.decodeWav(bytes); () }
      catch { case _: IllegalArgumentException => () }
    }
    val ok = AudioSource.encodeWavPcm16(8000, 1, Array.tabulate(64)(_.toShort))
    for (_ <- 1 to 500) {
      val mut = ok.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      try {
        val (sr, ch, smp) = AudioSource.decodeWav(mut)
        // a surviving decode must still be structurally sane
        assert(sr > 0 && ch > 0 && smp.length % ch == 0)
      } catch { case _: IllegalArgumentException => () }
    }
    // the header-truncation class specifically: every prefix of a valid
    // stream shorter than the 12-byte preamble fails with the contract
    // exception, not BufferUnderflowException
    for (n <- 0 until 12)
      intercept[IllegalArgumentException](
        AudioSource.decodeWav(java.util.Arrays.copyOf(ok, n)))
  }

  test("multimodal_audio_features matches a direct formula recompute (sf0.001)") {
    val rows = graft.queries.Multimodal.multimodalAudioFeatures(spark, sf0001)
      .collect()
    val docs = Tables.t(spark, sf0001, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == docs.size, "one feature row per doc")
    def s(nc: Long, id: Long, i: Int): Int =
      ((nc * 31 + id * 7 + i.toLong * 17 + (i.toLong * i) % 97) % 4001 - 2000).toInt
    for (r <- rows) {
      val id = r.getLong(0); val nc = docs(id)
      val n = 300 + (id % 7).toInt * 50
      val smp = Array.tabulate(n)(i => s(nc, id, i))
      assert(r.getInt(1) == 8000 + (id % 3).toInt * 4000, s"doc $id rate")
      assert(r.getLong(3) == n.toLong, s"doc $id n_samples")
      assert(r.getLong(4) == smp.map(_.toLong).sum, s"doc $id sum")
      assert(r.getInt(5) == smp.min && r.getInt(6) == smp.max, s"doc $id extrema")
      val zx = (1 until n).count(i => (smp(i - 1) < 0) != (smp(i) < 0)).toLong
      assert(r.getLong(7) == zx, s"doc $id zero crossings")
    }
    // the signal must actually oscillate or the zero-crossing gate is vacuous
    assert(rows.exists(_.getLong(7) > 10), "formula produced a one-sided signal")
  }

  test("binaryFile lake ingest equals the in-memory audio feature path") {
    // the seam the synthesized asset table stands in for: write every
    // sf0.001 payload as a real .wav file, re-ingest through Spark's
    // binaryFile source, and require feature-row equality with the
    // in-memory query (keyed by asset id carried in the file name)
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wavlake")
    dir.toFile.deleteOnExit()
    graft.queries.Multimodal.audioAssets(spark, sf0001)
      .select(col("asset_id"), col("payload")).as[(Long, Array[Byte])]
      .collect() // test-side materialization of 500 tiny payloads
      .foreach { case (id, bytes) =>
        java.nio.file.Files.write(dir.resolve(f"a$id%06d.wav"), bytes)
      }
    val lake = graft.queries.Multimodal
      .audioFeaturesFromLake(spark, s"$dir/*.wav").collect()
      .map(r => r.getString(0).stripPrefix("a").stripSuffix(".wav").toLong ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
          r.getInt(5), r.getInt(6), r.getLong(7))).toMap
    val mem = graft.queries.Multimodal
      .multimodalAudioFeatures(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
          r.getInt(5), r.getInt(6), r.getLong(7))).toMap
    assert(lake.keySet == mem.keySet, "one lake file per asset")
    assert(lake == mem, "lake-ingested features diverged from the in-memory path")
  }

  test("empty-data-chunk WAV is rejected by the lake feature path, not featurized") {
    // a valid RIFF stream with 0 samples must not produce a feature row
    // carrying the extrema fold's Int.MaxValue/MinValue sentinels (r12
    // advisor item — reachable from the public entry point on user files)
    val dir = java.nio.file.Files.createTempDirectory("graft_emptywav")
    dir.toFile.deleteOnExit()
    val empty = AudioSource.encodeWavPcm16(8000, 1, Array.empty[Short])
    // sanity: the codec itself round-trips the degenerate stream fine
    val (sr, ch, smp) = AudioSource.decodeWav(empty)
    assert(sr == 8000 && ch == 1 && smp.isEmpty)
    java.nio.file.Files.write(dir.resolve("empty.wav"), empty)
    val e = intercept[Exception](graft.queries.Multimodal
      .audioFeaturesFromLake(spark, s"$dir/*.wav").collect())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("empty data chunk")),
      s"expected the empty-data-chunk rejection, got: ${chain(e)}")
  }

  test("multimodal_av_sync: both codecs per joint row, frame-aligned windows partition the stream, formula-exact") {
    val rows = graft.queries.Multimodal.multimodalAvSync(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = Tables.t(spark, sf0001, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def nf(id: Long) = 3 + (id % 4).toInt
    def h(id: Long) = 16 + (id % 3).toInt * 8
    def w(id: Long) = 16 + (id % 5).toInt * 8
    def n(id: Long) = 300 + (id % 7).toInt * 50
    def px(nc: Long, id: Long, f: Int, i: Int, j: Int): Long =
      (nc + 7 * id + 11 * f + 3 * i + 5 * j) % 256
    def smp(nc: Long, id: Long, i: Int): Long =
      (nc * 31 + id * 7 + i.toLong * 17 + (i.toLong * i) % 97) % 4001 - 2000
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet, "one frame group per doc")
    for ((id, rs) <- byDoc) {
      val nc = docs(id)
      assert(rs.map(_._2).sorted.toSeq == (0 until nf(id)), s"doc $id frames")
      // the audio windows must partition the decoded stream exactly
      assert(rs.map(_._5).sum == n(id).toLong, s"doc $id window coverage")
      for ((_, f, sumP, nPx, nSamps, energy) <- rs) {
        assert(nPx == h(id).toLong * w(id), s"doc $id frame $f n_px")
        val expP = (for (i <- 0 until h(id); j <- 0 until w(id))
          yield px(nc, id, f, i, j)).sum
        assert(sumP == expP, s"doc $id frame $f pixel sum (TIFF decode)")
        val lo = f * n(id) / nf(id); val hi = (f + 1) * n(id) / nf(id)
        assert(nSamps == (hi - lo).toLong, s"doc $id frame $f span")
        val expE = (lo until hi).map(i => math.abs(smp(nc, id, i))).sum
        assert(energy == expE, s"doc $id frame $f energy (WAV decode)")
      }
    }
  }

  test("multimodal_audio_windows: full partition of each stream, energy conserved") {
    val feats = graft.queries.Multimodal.multimodalAudioFeatures(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val wins = graft.queries.Multimodal.multimodalAudioWindows(spark, sf0001)
      .collect()
    val byAsset = wins.groupBy(_.getLong(0))
    assert(byAsset.keySet == feats.keySet)
    for ((id, ws) <- byAsset) {
      assert(ws.map(_.getLong(2)).sum == feats(id), s"doc $id window sizes")
      val idxs = ws.map(_.getInt(1)).sorted.toSeq
      assert(idxs == idxs.indices.toSeq, s"doc $id window indices")
      assert(ws.filter(_.getInt(1) < idxs.last).forall(_.getLong(2) == 128L),
        s"doc $id non-final windows must be full")
    }
  }
}
