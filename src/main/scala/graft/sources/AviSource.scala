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
  private def walkMovi(bytes: Array[Byte], start: Int, end: Int,
      sink: (String, Int, Int) => Unit): Unit = {
    var pos = start
    while (pos < end) {
      val fcc = fourcc(bytes, pos)
      val size = u32le(bytes, pos + 4)
      require(size >= 0 && size <= Int.MaxValue - 8, s"avi: bad chunk size $size")
      val body = pos + 8
      require(body + size <= end, s"avi: chunk '$fcc' overruns movi list")
      if (fcc == "LIST") {
        require(size >= 4, "avi: LIST too short")
        walkMovi(bytes, body + 4, body + size.toInt, sink)
      } else sink(fcc, body, size.toInt)
      pos = body + size.toInt + (size.toInt & 1)
    }
  }

  /** Parse header lists; returns (w, h, usPerFrame, videoCompression,
    * audioRate, moviStart, moviEnd). */
  private def parseHeader(bytes: Array[Byte]):
      (Int, Int, Long, String, Int, Int, Int) = {
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
    def walk(start: Int, end: Int): Unit = {
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
            else walk(body + 4, body + size.toInt)
          case "avih" =>
            require(size >= 40, "avi: avih too short")
            usPerFrame = u32le(bytes, body)
            w = u32le(bytes, body + 32).toInt
            h = u32le(bytes, body + 36).toInt
          case "strh" =>
            require(size >= 8, "avi: strh too short")
            strType = fourcc(bytes, body)
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
    walk(12, riffEnd)
    require(moviStart >= 0, "avi: no movi list")
    require(vcodec != null, "avi: no video stream header")
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim,
      s"avi: implausible geometry ${w}x$h")
    (w, h, usPerFrame, vcodec, audioRate, moviStart, moviEnd)
  }

  /** Decode a whole container: every video frame to a full (h, w) RGB
    * plane plus the concatenated audio sample stream. */
  private[graft] def decodeAvi(bytes: Array[Byte]): AviClip = {
    val (w, h, usf, vcodec, audioRate, ms, me) = parseHeader(bytes)
    require(vcodec == "DIB " || vcodec == "MJPG",
      s"avi: unsupported video codec '$vcodec'")
    val frames = Seq.newBuilder[Array[Byte]]
    val audio = new ByteArrayOutputStream()
    var decoded = 0L
    walkMovi(bytes, ms, me, (fcc, off, size) => fcc match {
      case "00dc" | "00db" =>
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
      case "01wb" =>
        require(size % 2 == 0, "avi: odd PCM16 audio chunk")
        audio.write(bytes, off, size)
      case _ => () // other streams / padding chunks
    })
    val ab = audio.toByteArray
    val samples = new Array[Short](ab.length / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = ((ab(2 * i) & 0xff) | (ab(2 * i + 1) << 8)).toShort
      i += 1
    }
    AviClip(w, h, usf, frames.result(), audioRate, samples)
  }

  /** Metadata-only frame count (for [[ImageSource.pagedFiles]]): walks
    * the chunk headers of the movi list without touching payloads. */
  private[graft] def aviFrameCount(bytes: Array[Byte]): Long = {
    val (_, _, _, _, _, ms, me) = parseHeader(bytes)
    var n = 0L
    walkMovi(bytes, ms, me,
      (fcc, _, _) => if (fcc == "00dc" || fcc == "00db") n += 1)
    n
  }

  // ------------------------------------------------------------ encode
  /** Encode frames (+ an optional PCM16 audio track, interleaved one
    * chunk per frame) as a spec-conformant AVI — fixtures, specs and
    * round-trip support. `codec` is "DIB " (lossless BI_RGB) or "MJPG". */
  private[graft] def encodeAvi(w: Int, h: Int, usPerFrame: Long,
      frames: Seq[Array[Byte]], codec: String = "DIB ",
      audio: Option[(Int, Array[Short])] = None): Array[Byte] = {
    require(codec == "DIB " || codec == "MJPG", s"unsupported codec '$codec'")
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
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val save = out.toByteArray; out.reset()
      wrFcc("LIST"); wr32((4 + body.length).toLong); wrFcc(kind); out.write(body)
      if ((body.length & 1) == 1) out.write(0)
      val b = out.toByteArray; out.reset(); out.write(save, 0, save.length)
      b
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
      chunk("avih", avih); out.write(strlV)
      strlA.foreach(b => out.write(b, 0, b.length))
    })
    // movi body + idx1 entries (offsets relative to the 'movi' fourcc)
    val idx = Seq.newBuilder[(String, Long, Int)]
    val moviBody = sub {
      var off = 4L
      def put(fcc: String, body: Array[Byte]): Unit = {
        idx += ((fcc, off, body.length))
        chunk(fcc, body)
        off += 8 + body.length + (body.length & 1)
      }
      for (f <- frames.indices) {
        put("00dc", payloads(f))
        if (f < audioChunks.length) put("01wb", audioChunks(f))
      }
      // grouped() can yield one trailing remainder chunk beyond nframes
      for (a <- frames.size until audioChunks.length) put("01wb", audioChunks(a))
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

  /** Per-file A/V rows for lake queries: one row per container with the
    * frame stack metadata and the full audio track — the joint-asset
    * seam [[graft.queries.Multimodal]] consumes. */
  def readAviAv(spark: SparkSession, glob: String):
      Dataset[(String, Int, Int, Int, Long, Int, Array[Short])] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, b) =>
        val c = decodeAvi(b)
        (p, c.frames.size, c.h, c.w, c.usPerFrame, c.audioRate, c.audio)
      }
  }
}
