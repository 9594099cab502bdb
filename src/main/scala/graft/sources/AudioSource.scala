package graft.sources

/** WAV (RIFF) PCM codec — the audio leg of the multimodal column support,
  * written from the public RIFF/WAVE layout the same way `ImageSource`'s
  * TIFF reader is written from TIFF 6.0: little-endian chunks, a `fmt `
  * chunk describing the stream, a `data` chunk holding interleaved
  * samples. Only uncompressed 16-bit PCM (format tag 1) is supported —
  * the dominant raw-audio interchange shape; compressed formats are a
  * codec-library seam, as JPEG is on the image side.
  *
  * Decode WALKS the chunk list rather than assuming `fmt `/`data` sit at
  * fixed offsets: real encoders emit LIST/INFO, fact, cue chunks in
  * between, and chunk bodies are word-aligned (odd sizes carry a pad
  * byte). Per-row map work — no Spark types in here, so it runs inside
  * any executor lambda.
  */
object AudioSource {

  /** Encode interleaved 16-bit PCM samples as a WAV byte payload. */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0, "bad WAV geometry")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
    out.putInt(36 + dataLen) // riff body = WAVE + fmt chunk + data chunk
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII"))
    out.putInt(16) // PCM fmt body length
    out.putShort(1) // format tag: PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * channels * 2) // byte rate
    out.putShort((channels * 2).toShort) // block align
    out.putShort(16) // bits per sample
    out.put("data".getBytes("US-ASCII"))
    out.putInt(dataLen)
    var i = 0
    while (i < samples.length) { out.putShort(samples(i)); i += 1 }
    out.array()
  }

  /** Decode a WAV payload to (sampleRate, channels, interleaved samples).
    * Requires 16-bit PCM; walks and skips unknown chunks (word-aligned). */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    // uniform malformed-input contract: every bad payload fails with
    // IllegalArgumentException — a header shorter than the 12-byte
    // RIFF//WAVE preamble must not surface as BufferUnderflowException
    require(bytes.length >= 12, s"truncated WAV header: ${bytes.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF stream")
    buf.getInt // riff body length (trailing garbage tolerated; chunks govern)
    require(tag() == "WAVE", "not a WAVE form")
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var data: Array[Short] = null
    while ((data == null || sampleRate < 0) && buf.remaining() >= 8) {
      val id = tag()
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(),
        s"chunk '$id' length $len overruns the stream")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short: $len")
          val fmtTag = buf.getShort
          require(fmtTag == 1, s"unsupported WAV format tag $fmtTag (PCM only)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt // byte rate (derived; ignored)
          buf.getShort // block align (derived; ignored)
          bits = buf.getShort.toInt
          require(bits == 16, s"unsupported bit depth $bits (16-bit PCM only)")
          buf.position(buf.position() + (len - 16)) // extension bytes
        case "data" =>
          require(len % 2 == 0, s"odd PCM16 data length $len")
          val s = new Array[Short](len / 2)
          var i = 0
          while (i < s.length) { s(i) = buf.getShort; i += 1 }
          data = s
        case _ =>
          buf.position(buf.position() + len) // LIST/fact/cue/...: skip
      }
      if (len % 2 == 1 && buf.remaining() > 0)
        buf.position(buf.position() + 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && channels > 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    require(data.length % channels == 0,
      s"data length ${data.length} not a multiple of $channels channels")
    (sampleRate, channels, data)
  }
}
