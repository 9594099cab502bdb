package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.tensor.{DType, TBlock}

/** AVI (RIFF) video-container source — the last pims-style container
  * shape from SURVEY §2A.1 (upstream `imread` reads video through
  * pims/ffmpeg; a crawl lake's video assets arrive in containers, not
  * loose frames). One AVI file yields an (nframes, y, x, channel)
  * uint8 stack exactly like [[GifSource.readGif]], plus the container's
  * interleaved PCM16 audio track through the same clean-room RIFF
  * walking [[AudioSource]] uses for WAV — so a single asset carries a
  * genuinely synchronized A/V pair.
  *
  * Clean-room codec against the public RIFF/AVI layout (`RIFF…AVI `,
  * `LIST hdrl` [`avih`, per-stream `LIST strl` [`strh`,`strf`]],
  * `LIST movi` [`00dc`/`00db`/`01wb`, optionally inside `LIST rec `],
  * trailing `idx1`), both directions:
  *  - uncompressed DIB frames (`BI_RGB`): bottom-up BGR rows padded to
  *    4-byte stride — the decoder flips, swaps and unpads, so a wrong
  *    row order/stride/channel order breaks the pixel-exact gate;
  *  - MJPEG frames (`MJPG` handler): each `00dc` chunk is one complete
  *    JPEG image, decoded through the same ImageIO path as still JPEG
  *    (lossy — gated for determinism+geometry like `imread_jpeg`);
  *  - the `01wb` audio chunks concatenate to the PCM16LE sample stream
  *    in chunk order (the container's interleave is a transport detail,
  *    not a sample reorder).
  *
  * Malformed input fails loudly as IllegalArgumentException (the
  * shared fuzz contract), and header-declared geometry is Long-math
  * bounded before any allocation (the GIF 1 GiB lesson).
  *
  * Distributed read: frame numbering reuses [[ImageSource.pagedFiles]]
  * (a metadata-only chunk count per file + per-partition prefix sums);
  * decode is one task per file, so a 100 TB video lake parallelizes on
  * files just like TIFF/GIF.
  */
object AviSource {

  /** Decoded container: `frames` are (h, w) interleaved-RGB planes in
    * display order; `audio` is the concatenated PCM16 sample stream. */
  private[graft] case class AviClip(
      w: Int, h: Int, usPerFrame: Long,
      frames: Seq[Array[Byte]],
      audioRate: Int, audio: Array[Short])

  private val MaxDim = 1 << 15
  private val MaxDecode = 1L << 30 // 1 GiB decoded-pixels bound per file

  private def u16le(b: Array[Byte], o: Int): Int = {
    require(o >= 0 && o + 1 < b.length, "avi: truncated stream")
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  }

  private def u32le(b: Array[Byte], o: Int): Long = {
    require(o >= 0 && o + 3 < b.length, "avi: truncated stream")
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  private def fourcc(b: Array[Byte], o: Int): String = {
    require(o >= 0 && o + 3 < b.length, "avi: truncated stream")
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
  }

  // ------------------------------------------------------------ decode
  /** Bottom-up padded BGR rows -> top-down interleaved RGB. */
  private def dibToRgb(w: Int, h: Int, chunk: Array[Byte]): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    require(chunk.length >= stride * h,
      s"avi: DIB frame ${chunk.length} B < expected ${stride * h} B")
    val out = new Array[Byte](w * h * 3)
    var r = 0
    while (r < h) {
      val src = r * stride          // row r counting from the BOTTOM
      val dst = (h - 1 - r) * w * 3
      var x = 0
      while (x < w) {
        out(dst + x * 3) = chunk(src + x * 3 + 2)     // R <- B slot
        out(dst + x * 3 + 1) = chunk(src + x * 3 + 1) // G
        out(dst + x * 3 + 2) = chunk(src + x * 3)     // B <- R slot
        x += 1
      }
      r += 1
    }
    out
  }

  /** Walk the movi payload (including `LIST rec ` groupings), handing
    * each data chunk to `sink(fcc, offset, size)`. Chunks are u32le
    * sized and padded to even offsets. */
  /** Nesting bound for LIST recursion: real files nest 2-3 deep (rec
    * inside movi); a crafted 12-bytes-per-level chain would otherwise
    * walk thousands of frames deep and die with StackOverflowError —
    * an Error, outside the IllegalArgumentException contract. */
  private val MaxListDepth = 64

  private def walkMovi(bytes: Array[Byte], start: Int, end: Int,
      sink: (String, Int, Int) => Unit, depth: Int = 0): Unit = {
    require(depth <= MaxListDepth, s"avi: LIST nesting deeper than $MaxListDepth")
    var pos = start
    while (pos < end) {
      val fcc = fourcc(bytes, pos)
      val size = u32le(bytes, pos + 4)
      require(size >= 0 && size <= Int.MaxValue - 8, s"avi: bad chunk size $size")
      val body = pos + 8
      require(body + size <= end, s"avi: chunk '$fcc' overruns movi list")
      if (fcc == "LIST") {
        require(size >= 4, "avi: LIST too short")
        walkMovi(bytes, body + 4, body + size.toInt, sink, depth + 1)
      } else sink(fcc, body, size.toInt)
      pos = body + size.toInt + (size.toInt & 1)
    }
  }

  /** Parsed container header. `vidIdx`/`audIdx` are the STREAM indices
    * of the video and (first) audio strl — chunk ids in movi encode the
    * strl order (`NNdc`), so a file whose audio stream precedes the
    * video must not be read as if video were stream 0. */
  private case class AviMeta(w: Int, h: Int, usPerFrame: Long, vcodec: String,
      audioRate: Int, vidIdx: Int, audIdx: Int, moviStart: Int, moviEnd: Int)

  private def parseHeader(bytes: Array[Byte]): AviMeta = {
    require(bytes.length >= 12, "avi: shorter than the RIFF preamble")
    require(fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ",
      "avi: not a RIFF/AVI stream")
    val riffEnd = {
      val sz = u32le(bytes, 4)
      require(sz >= 4 && 8 + sz <= bytes.length, s"avi: RIFF size $sz overruns file")
      (8 + sz).toInt
    }
    var w = -1; var h = -1; var usPerFrame = 0L
    var vcodec: String = null; var audioRate = 0
    var moviStart = -1; var moviEnd = -1
    var strType: String = null
    var streamN = 0
    var vidIdx = -1; var audIdx = -1
    def walk(start: Int, end: Int, depth: Int): Unit = {
      require(depth <= MaxListDepth, s"avi: LIST nesting deeper than $MaxListDepth")
      var pos = start
      while (pos < end) {
        val fcc = fourcc(bytes, pos)
        val size = u32le(bytes, pos + 4)
        require(size >= 0 && size <= Int.MaxValue - 8, s"avi: bad chunk size $size")
        val body = pos + 8
        require(body + size <= end, s"avi: chunk '$fcc' overruns list")
        fcc match {
          case "LIST" =>
            require(size >= 4, "avi: LIST too short")
            val kind = fourcc(bytes, body)
            if (kind == "movi") { moviStart = body + 4; moviEnd = body + size.toInt }
            else walk(body + 4, body + size.toInt, depth + 1)
          case "avih" =>
            require(size >= 40, "avi: avih too short")
            usPerFrame = u32le(bytes, body)
            w = u32le(bytes, body + 32).toInt
            h = u32le(bytes, body + 36).toInt
          case "strh" =>
            require(size >= 8, "avi: strh too short")
            strType = fourcc(bytes, body)
            if (strType == "vids" && vidIdx < 0) vidIdx = streamN
            if (strType == "auds" && audIdx < 0) audIdx = streamN
            streamN += 1
          case "strf" =>
            if (strType == "vids") {
              require(size >= 40, "avi: video strf too short")
              val comp = u32le(bytes, body + 16)
              vcodec =
                if (comp == 0L) "DIB " // BI_RGB
                else fourcc(bytes, body + 16)
              require(u16le(bytes, body + 14) == 24,
                "avi: only 24-bit video frames are supported")
            } else if (strType == "auds") {
              require(size >= 16, "avi: audio strf too short")
              require(u16le(bytes, body) == 1, "avi: audio must be PCM")
              require(u16le(bytes, body + 2) == 1, "avi: audio must be mono")
              require(u16le(bytes, body + 14) == 16, "avi: audio must be 16-bit")
              audioRate = u32le(bytes, body + 4).toInt
            }
          case _ => () // strn, idx1, JUNK, vprp … metadata we don't need
        }
        pos = body + size.toInt + (size.toInt & 1)
      }
    }
    walk(12, riffEnd, 0)
    require(moviStart >= 0, "avi: no movi list")
    require(vcodec != null && vidIdx >= 0, "avi: no video stream header")
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim,
      s"avi: implausible geometry ${w}x$h")
    AviMeta(w, h, usPerFrame, vcodec, audioRate, vidIdx, audIdx, moviStart, moviEnd)
  }

  /** Decode a whole container: every video frame to a full (h, w) RGB
    * plane plus the concatenated audio sample stream. */
  private[graft] def decodeAvi(bytes: Array[Byte]): AviClip = {
    val m = parseHeader(bytes)
    import m.{w, h, vcodec}
    require(vcodec == "DIB " || vcodec == "MJPG",
      s"avi: unsupported video codec '$vcodec'")
    val vdc = f"${m.vidIdx}%02ddc"
    val vdb = f"${m.vidIdx}%02ddb"
    val awb = if (m.audIdx >= 0) f"${m.audIdx}%02dwb" else null
    val frames = Seq.newBuilder[Array[Byte]]
    val audio = new ByteArrayOutputStream()
    var decoded = 0L
    walkMovi(bytes, m.moviStart, m.moviEnd, (fcc, off, size) =>
      if (fcc == vdc || fcc == vdb) {
        decoded += w.toLong * h * 3
        require(decoded <= MaxDecode, s"avi: decoded pixels exceed $MaxDecode B")
        val chunk = java.util.Arrays.copyOfRange(bytes, off, off + size)
        if (vcodec == "DIB ") frames += dibToRgb(w, h, chunk)
        else {
          val (jh, jw, rgb) =
            try ImageSource.decodeRgb(chunk)
            catch { case e: Exception =>
              throw new IllegalArgumentException(s"avi: bad MJPEG frame: ${e.getMessage}")
            }
          require(jh == h && jw == w,
            s"avi: MJPEG frame ${jw}x$jh disagrees with container ${w}x$h")
          frames += rgb
        }
      } else if (fcc == awb) {
        require(size % 2 == 0, "avi: odd PCM16 audio chunk")
        audio.write(bytes, off, size)
      } else () // other streams / padding chunks
    )
    val ab = audio.toByteArray
    val samples = new Array[Short](ab.length / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = ((ab(2 * i) & 0xff) | (ab(2 * i + 1) << 8)).toShort
      i += 1
    }
    AviClip(w, h, m.usPerFrame, frames.result(), m.audioRate, samples)
  }

  /** Metadata-only frame count (for [[ImageSource.pagedFiles]]): walks
    * the chunk headers of the movi list without touching payloads. */
  private[graft] def aviFrameCount(bytes: Array[Byte]): Long = {
    val m = parseHeader(bytes)
    val vdc = f"${m.vidIdx}%02ddc"
    val vdb = f"${m.vidIdx}%02ddb"
    var n = 0L
    walkMovi(bytes, m.moviStart, m.moviEnd,
      (fcc, _, _) => if (fcc == vdc || fcc == vdb) n += 1)
    n
  }

  // ------------------------------------------------------------ encode
  /** Encode frames (+ an optional PCM16 audio track, interleaved one
    * chunk per frame) as a spec-conformant AVI — fixtures, specs and
    * round-trip support. `codec` is "DIB " (lossless BI_RGB) or "MJPG".
    * `audioFirst` writes the audio strl BEFORE the video strl (video
    * becomes stream 1, chunks '01dc') — the legal stream order a
    * decoder must not hard-code away. */
  private[graft] def encodeAvi(w: Int, h: Int, usPerFrame: Long,
      frames: Seq[Array[Byte]], codec: String = "DIB ",
      audio: Option[(Int, Array[Short])] = None,
      audioFirst: Boolean = false): Array[Byte] = {
    require(codec == "DIB " || codec == "MJPG", s"unsupported codec '$codec'")
    require(!audioFirst || audio.isDefined, "audioFirst needs an audio track")
    val vidIdx = if (audioFirst) 1 else 0
    val audIdx = if (audioFirst) 0 else 1
    val out = new ByteArrayOutputStream()
    def wr32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def wr16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def wrFcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def chunk(fcc: String, body: Array[Byte]): Unit = {
      wrFcc(fcc); wr32(body.length.toLong); out.write(body)
      if ((body.length & 1) == 1) out.write(0)
    }
    // encode each frame payload up front so sizes are known
    val payloads = frames.map { rgb =>
      require(rgb.length == w * h * 3, s"frame must be ${w * h * 3} B RGB")
      if (codec == "MJPG") ImageSource.encodeRgb(h, w, rgb, "jpg")
      else {
        val stride = (w * 3 + 3) & ~3
        val dib = new Array[Byte](stride * h)
        var r = 0
        while (r < h) {
          val dst = r * stride              // bottom-up
          val src = (h - 1 - r) * w * 3
          var x = 0
          while (x < w) {
            dib(dst + x * 3) = rgb(src + x * 3 + 2)     // B
            dib(dst + x * 3 + 1) = rgb(src + x * 3 + 1) // G
            dib(dst + x * 3 + 2) = rgb(src + x * 3)     // R
            x += 1
          }
          r += 1
        }
        dib
      }
    }
    val audioChunks: Seq[Array[Byte]] = audio match {
      case None => Nil
      case Some((_, pcm)) =>
        // one audio chunk per video frame (the standard interleave)
        val per = math.max(1, pcm.length / math.max(1, frames.size))
        pcm.grouped(per).map { g =>
          val b = new Array[Byte](g.length * 2)
          for (i <- g.indices) {
            b(2 * i) = (g(i) & 0xff).toByte
            b(2 * i + 1) = ((g(i) >> 8) & 0xff).toByte
          }
          b
        }.toSeq
    }
    val nStreams = if (audio.isDefined) 2 else 1

    def sub(build: => Unit): Array[Byte] = {
      val save = out.toByteArray; out.reset()
      build
      val b = out.toByteArray; out.reset(); out.write(save, 0, save.length)
      b
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = sub {
      wrFcc("LIST"); wr32((4 + body.length).toLong); wrFcc(kind); out.write(body)
      if ((body.length & 1) == 1) out.write(0)
    }

    val avih = sub {
      wr32(usPerFrame); wr32(0); wr32(0); wr32(0x10 /* HASINDEX */)
      wr32(frames.size.toLong); wr32(0); wr32(nStreams.toLong); wr32(0)
      wr32(w.toLong); wr32(h.toLong); wr32(0); wr32(0); wr32(0); wr32(0)
    }
    val strhV = sub {
      wrFcc("vids"); wrFcc(codec); wr32(0); wr16(0); wr16(0); wr32(0)
      wr32(usPerFrame) /* scale */; wr32(1000000L) /* rate */; wr32(0)
      wr32(frames.size.toLong); wr32(0); wr32(0xffffffffL); wr32(0)
      wr16(0); wr16(0); wr16(w); wr16(h)
    }
    val strfV = sub {
      wr32(40); wr32(w.toLong); wr32(h.toLong); wr16(1); wr16(24)
      if (codec == "MJPG") wrFcc("MJPG") else wr32(0)
      wr32((((w * 3 + 3) & ~3) * h).toLong); wr32(0); wr32(0); wr32(0); wr32(0)
    }
    val strlV = list("strl", sub { chunk("strh", strhV); chunk("strf", strfV) })
    val strlA = audio.map { case (rate, pcm) =>
      val strhA = sub {
        wrFcc("auds"); wr32(0); wr32(0); wr16(0); wr16(0); wr32(0)
        wr32(1) /* scale */; wr32(rate.toLong); wr32(0)
        wr32(pcm.length.toLong); wr32(0); wr32(0xffffffffL); wr32(2); wr32(0)
      }
      val strfA = sub {
        wr16(1) /* PCM */; wr16(1) /* mono */; wr32(rate.toLong)
        wr32(rate.toLong * 2); wr16(2) /* block align */; wr16(16)
      }
      list("strl", sub { chunk("strh", strhA); chunk("strf", strfA) })
    }
    val hdrl = list("hdrl", sub {
      chunk("avih", avih)
      if (audioFirst) {
        strlA.foreach(b => out.write(b, 0, b.length))
        out.write(strlV)
      } else {
        out.write(strlV)
        strlA.foreach(b => out.write(b, 0, b.length))
      }
    })
    // movi body + idx1 entries (offsets relative to the 'movi' fourcc);
    // chunk ids carry the strl order of each stream
    val vdc = f"$vidIdx%02ddc"
    val awb = f"$audIdx%02dwb"
    val idx = Seq.newBuilder[(String, Long, Int)]
    val moviBody = sub {
      var off = 4L
      def put(fcc: String, body: Array[Byte]): Unit = {
        idx += ((fcc, off, body.length))
        chunk(fcc, body)
        off += 8 + body.length + (body.length & 1)
      }
      for (f <- frames.indices) {
        put(vdc, payloads(f))
        if (f < audioChunks.length) put(awb, audioChunks(f))
      }
      // grouped() can yield one trailing remainder chunk beyond nframes
      for (a <- frames.size until audioChunks.length) put(awb, audioChunks(a))
    }
    val movi = list("movi", moviBody)
    val idx1 = sub {
      for ((fcc, off, sz) <- idx.result()) {
        wrFcc(fcc); wr32(0x10L /* AVIIF_KEYFRAME */); wr32(off); wr32(sz.toLong)
      }
    }
    val riffBody = sub { wrFcc("AVI "); out.write(hdrl); out.write(movi); chunk("idx1", idx1) }
    out.reset()
    wrFcc("RIFF"); wr32(riffBody.length.toLong); out.write(riffBody)
    out.toByteArray
  }

  // -------------------------------------------------------------- read
  /** Read a glob of AVI files as one stacked 4-d uint8 image: shape
    * (total_frames, h, w, 3), one chunk per frame, channel-last — the
    * pims video surface. Frame bases come from the distributed
    * metadata pass; pixels stay native uint8 end to end. */
  def readAvi(spark: SparkSession, glob: String,
      imageId: String = "imread_avi"): Dataset[TBlock] = {
    import spark.implicits._
    val (paged, total) = ImageSource.pagedFiles(spark, glob, aviFrameCount)
    paged.flatMap { case (base, bytes) =>
      val clip = decodeAvi(bytes)
      clip.frames.zipWithIndex.map { case (rgb, pg) =>
        val f = (base + pg).toInt
        TBlock(imageId, Seq(f, 0, 0, 0), Seq(f, 0, 0, 0),
          Seq(1, clip.h, clip.w, 3), Seq(1, clip.h, clip.w, 3),
          Seq(total, clip.h, clip.w, 3), DType.U8.name, rgb)
      }
    }
  }

  /** Header-walk A/V stats: (nframes, h, w, usPerFrame, audioRate,
    * samples) — frame COUNT from chunk headers (no pixel decode), audio
    * fully extracted. The per-file closure [[readAviAv]] and the
    * streaming ingest share. */
  private[graft] def avMeta(b: Array[Byte]): (Int, Int, Int, Long, Int, Array[Short]) = {
    val m = parseHeader(b)
    val vdc = f"${m.vidIdx}%02ddc"
    val vdb = f"${m.vidIdx}%02ddb"
    val awb = if (m.audIdx >= 0) f"${m.audIdx}%02dwb" else null
    var nf = 0
    val audio = new ByteArrayOutputStream()
    walkMovi(b, m.moviStart, m.moviEnd, (fcc, off, size) =>
      if (fcc == vdc || fcc == vdb) nf += 1
      else if (fcc == awb) {
        require(size % 2 == 0, "avi: odd PCM16 audio chunk")
        audio.write(b, off, size)
      } else ())
    val ab = audio.toByteArray
    val samples = new Array[Short](ab.length / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = ((ab(2 * i) & 0xff) | (ab(2 * i + 1) << 8)).toShort
      i += 1
    }
    (nf, m.h, m.w, m.usPerFrame, m.audioRate, samples)
  }

  /** Per-file A/V metadata + audio track for lake triage: one row per
    * container with the frame-stack geometry (from chunk HEADERS — no
    * pixel decode) and the concatenated PCM16 samples. The cheap first
    * pass of an ingest pipeline that decides which clips are worth the
    * full [[readAvi]] pixel decode; proven over a real binaryFile round
    * trip in AviSourceSpec (the same lake-ingest seam the WAV path
    * pins). */
  def readAviAv(spark: SparkSession, glob: String):
      Dataset[(String, Int, Int, Int, Long, Int, Array[Short])] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, b) =>
        val (nf, h, w, usf, rate, samples) = avMeta(b)
        (p, nf, h, w, usf, rate, samples)
      }
  }
}
