package graft.operators

/** Pure-JVM media codecs (round 13, verdict ask #5 — retiring the
  * multimodal decode stubs): a binary PPM (P6) image codec and a RIFF
  * PCM WAV audio codec, both dependency-free and exact-integer, so
  * the multimodal family decodes REAL bytes and every derived
  * statistic (dimensions, pixel sums, sample sums, durations) is
  * oracle-replayable arithmetic.
  *
  * Reference behavior modeled on the public format specs: PPM P6
  * (netpbm: `P6\n<w> <h>\n<maxval>\n` + w·h·3 raw bytes, `#` comments
  * allowed in the header) and canonical RIFF/WAVE (`RIFF` size `WAVE`
  * + `fmt ` chunk (PCM, 16-bit) + `data` chunk, chunks walked by
  * size, little-endian).
  */
object Codecs {

  // ------------------------------------------------------------------
  // PPM (P6, maxval <= 255)
  // ------------------------------------------------------------------

  /** Decoded P6 image: `pixels` is w·h·3 RGB bytes, row-major. */
  final case class PpmImage(width: Int, height: Int, pixels: Array[Byte])

  /** Encode w·h·3 RGB bytes as binary PPM (maxval 255). */
  def encodePpm(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"encodePpm: bad dims ${width}x$height")
    require(pixels.length == width * height * 3,
      s"encodePpm: ${pixels.length} bytes for ${width}x$height")
    val header = s"P6\n$width $height\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Parse a binary PPM. Fails loudly on a malformed payload — a
    * corrupt blob must never decode to silently-wrong pixels.
    */
  def decodePpm(bytes: Array[Byte]): PpmImage = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"decodePpm: $msg (offset $i)")
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
      fail("not a P6 ppm")
    i = 2
    // header tokens separated by whitespace; '#' starts a comment to EOL
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs()
      if (i >= bytes.length || bytes(i) < '0' || bytes(i) > '9')
        fail("expected integer")
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0')
        if (v > Int.MaxValue) fail("integer overflow")
        i += 1
      }
      v.toInt
    }
    val w = int(); val h = int(); val maxval = int()
    if (w <= 0 || h <= 0) fail(s"bad dims ${w}x$h")
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    // exactly ONE whitespace byte separates the header from the raster
    if (i >= bytes.length || !(bytes(i) == ' ' || bytes(i) == '\t' ||
        bytes(i) == '\r' || bytes(i) == '\n')) fail("missing raster separator")
    i += 1
    val n = w * h * 3
    if (bytes.length - i < n)
      fail(s"truncated raster: need $n, have ${bytes.length - i}")
    val px = new Array[Byte](n)
    System.arraycopy(bytes, i, px, 0, n)
    PpmImage(w, h, px)
  }

  /** Nearest-neighbor resize of a decoded PPM — the real resample the
    * old stub stood in for: output pixel (x, y) copies input pixel
    * (x·inW/outW, y·inH/outH) (truncating integer division — exact,
    * engine-replayable). Returns a re-encoded PPM payload.
    */
  def resizePpm(img: PpmImage, outW: Int, outH: Int): Array[Byte] = {
    require(outW > 0 && outH > 0, s"resizePpm: bad dims ${outW}x$outH")
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * img.height / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * img.width / outW).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * outW + x) * 3
        out(d) = img.pixels(s)
        out(d + 1) = img.pixels(s + 1)
        out(d + 2) = img.pixels(s + 2)
        x += 1
      }
      y += 1
    }
    encodePpm(outW, outH, out)
  }

  // ------------------------------------------------------------------
  // WAV (RIFF, PCM 16-bit little-endian)
  // ------------------------------------------------------------------

  /** Decoded PCM wave: interleaved samples (channel-major per frame). */
  final case class Wav(channels: Int, sampleRate: Int,
      samples: Array[Short]) {
    /** Whole milliseconds of audio (truncating — exact arithmetic). */
    def durationMs: Long =
      samples.length.toLong * 1000L / (channels.toLong * sampleRate)
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Encode mono-or-multichannel 16-bit PCM as a canonical 44-byte-
    * header WAV.
    */
  def encodeWav(channels: Int, sampleRate: Int,
      samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0,
      s"encodeWav: bad format $channels ch @ $sampleRate")
    require(samples.length % channels == 0,
      s"encodeWav: ${samples.length} samples not divisible by $channels")
    val dataLen = samples.length * 2
    val blockAlign = channels * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16.toShort) // bits per sample
    out.put("data".getBytes).putInt(dataLen)
    samples.foreach(s => out.putShort(s))
    out.array()
  }

  /** Parse a RIFF/WAVE PCM-16 payload, walking chunks by size (extra
    * chunks like LIST are skipped, as the format allows). Fails loudly
    * on anything that is not 16-bit PCM.
    */
  def decodeWav(bytes: Array[Byte]): Wav = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"decodeWav: $msg")
    if (bytes.length < 44) fail("too short for a RIFF header")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII")
    }
    if (tag() != "RIFF") fail("missing RIFF magic")
    buf.getInt // declared riff size; chunk walk below is the authority
    if (tag() != "WAVE") fail("not a WAVE form")
    var channels = -1
    var rate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (samples == null || channels < 0)) {
      val id = tag()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) fail(s"bad chunk size $size")
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too small")
          val fmt = buf.getShort
          if (fmt != 1) fail(s"not PCM (format $fmt)")
          channels = buf.getShort.toInt
          rate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          if (bits != 16) fail(s"not 16-bit ($bits)")
          buf.position(buf.position() + size - 16 + (size & 1))
        case "data" =>
          if (size % 2 != 0) fail("odd data chunk")
          val s = new Array[Short](size / 2)
          var i = 0
          while (i < s.length) { s(i) = buf.getShort; i += 1 }
          samples = s
          if (size % 2 == 1) buf.get
        case _ =>
          buf.position(buf.position() + size + (size & 1)) // skip + pad
      }
    }
    if (channels < 0) fail("no fmt chunk")
    if (samples == null) fail("no data chunk")
    if (samples.length % channels != 0) fail("partial frame in data")
    Wav(channels, rate, samples)
  }
}
