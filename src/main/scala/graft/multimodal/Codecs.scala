package graft.multimodal

/** Dependency-free pure-JVM codecs for the multimodal decode path:
  * binary PPM (P6) and 24-bit uncompressed BMP for images, RIFF/WAVE
  * 16-bit PCM for audio, plus a nearest-neighbor image resampler and a
  * P6 encoder. These are REAL parsers over the actual container
  * byte layouts (netpbm spec for P6; BITMAPFILEHEADER/BITMAPINFOHEADER
  * for BMP; RIFF chunk walk for WAV) — no external libraries, so they
  * run in this container and on any executor JVM unchanged. Formats
  * the sniffer doesn't recognize fall back to [[Multimodal]]'s labeled
  * deterministic fake, keeping decode total over arbitrary payloads.
  *
  * All decoders return Option: a malformed or truncated payload yields
  * None (caller falls back / routes to an invalid side) rather than an
  * exception — the same router discipline as the cleanse path, which
  * is what a 100 TB media crawl needs (a single corrupt blob must
  * never kill a stage).
  */
object Codecs {

  /** Decoded raster: row-major, interleaved channels, 8 bits/channel. */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  /** Decoded PCM audio: interleaved frames, 16-bit signed samples. */
  final case class Wav(sampleRate: Int, nChannels: Int, bitsPerSample: Int,
                       samples: Array[Short])

  /** Header-level image metadata — what a 100 TB image-curation scan
    * actually computes first (full decode of JPEG/PNG entropy data is
    * out of scope dependency-free; the header fields drive the
    * filter/route/dedupe decisions). `bitDepth` is bits per sample
    * (PNG bit depth / JPEG precision; 8 for the uncompressed
    * formats). */
  final case class ImageMeta(format: String, width: Int, height: Int,
                             bitDepth: Int, channels: Int)

  /** Cheap container sniff on magic bytes — decides which real decoder
    * to try; decoders re-validate everything they read. */
  def sniff(b: Array[Byte]): Option[String] =
    if (b.length >= 2 && b(0) == 'P' && b(1) == '6') Some("ppm")
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') Some("bmp")
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E') Some("wav")
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a &&
      b(6) == 0x1a && b(7) == 0x0a) Some("png")
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
      (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) Some("jpeg")
    else None

  def decodeImage(b: Array[Byte]): Option[Image] = sniff(b) match {
    case Some("ppm") => decodePpm(b)
    case Some("bmp") => decodeBmp(b)
    case _ => None
  }

  // ---------------------------------------------------------------- PPM

  /** Binary PPM (netpbm P6): `P6 <ws> width <ws> height <ws> maxval
    * <single-ws> raster`, where <ws> admits `#` comment lines and
    * maxval must be < 256 for 1-byte samples. */
  def decodePpm(b: Array[Byte]): Option[Image] = {
    var pos = 2 // past "P6"
    def skipWs(): Unit = {
      var inComment = false
      while (pos < b.length &&
        (inComment || b(pos).toChar.isWhitespace || b(pos) == '#')) {
        if (b(pos) == '#') inComment = true
        else if (b(pos) == '\n') inComment = false
        pos += 1
      }
    }
    def readInt(): Option[Int] = {
      skipWs()
      val start = pos
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') pos += 1
      if (pos == start || pos - start > 9) None
      else Some(new String(b, start, pos - start, "US-ASCII").toInt)
    }
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if w > 0 && h > 0 && maxval > 0 && maxval < 256
      // exactly ONE whitespace byte separates maxval from the raster
      if pos < b.length && b(pos).toChar.isWhitespace
      raster = pos + 1
      if b.length - raster >= w.toLong * h * 3
    } yield Image(w, h, 3,
      java.util.Arrays.copyOfRange(b, raster, raster + w * h * 3))
  }

  /** Encode a raster as binary PPM (P6, maxval 255). Single-channel
    * input is replicated to gray RGB; 3-channel passes through. */
  def encodePpm(img: Image): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"PPM needs 1 or 3 channels, got ${img.channels}")
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val n = img.width * img.height
    val out = new Array[Byte](header.length + n * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) {
      val base = header.length + i * 3
      if (img.channels == 3) {
        out(base) = img.pixels(i * 3)
        out(base + 1) = img.pixels(i * 3 + 1)
        out(base + 2) = img.pixels(i * 3 + 2)
      } else {
        val g = img.pixels(i)
        out(base) = g; out(base + 1) = g; out(base + 2) = g
      }
      i += 1
    }
    out
  }

  // ---------------------------------------------------------------- BMP

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** 24-bit uncompressed BMP (BITMAPINFOHEADER or later): BGR rows
    * padded to 4-byte boundaries, bottom-up when height > 0 (top-down
    * when negative). Output is top-down RGB. */
  def decodeBmp(b: Array[Byte]): Option[Image] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOffset = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None // BITMAPCOREHEADER not supported
    val w = le32(b, 18)
    val rawH = le32(b, 22)
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || rawH == 0 || planes != 1 || bpp != 24 || compression != 0)
      return None
    val h = math.abs(rawH)
    val topDown = rawH < 0
    // dimension sanity BEFORE any Int arithmetic: a malformed header
    // declaring ~2^30 pixels would overflow rowBytes/the output array
    // size into a negative and CRASH instead of returning None — and a
    // corrupt blob must never kill a stage. 2^26 bytes/raster bounds
    // genuine images comfortably.
    if (w.toLong * h * 3 > (1L << 26)) return None
    val rowBytes = ((w * 3 + 3) / 4) * 4 // rows pad to 4-byte boundary
    if (dataOffset < 0 ||
      b.length.toLong < dataOffset.toLong + rowBytes.toLong * h) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val src = dataOffset + srcRow * rowBytes
      var x = 0
      while (x < w) {
        val s = src + x * 3
        val d = (y * w + x) * 3
        out(d) = b(s + 2)     // R  (BMP stores BGR)
        out(d + 1) = b(s + 1) // G
        out(d + 2) = b(s)     // B
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, 3, out))
  }

  // ---------------------------------------------------- PNG/JPEG headers

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** PNG IHDR sniff: the 8-byte signature is followed by the IHDR
    * chunk at a FIXED offset (length 13, type "IHDR", then width/
    * height as big-endian 32-bit, bit depth, color type — PNG spec
    * 11.2.2). Channels derive from the color type: 0 grayscale→1,
    * 2 truecolor→3, 3 palette→1 (indexed), 4 gray+alpha→2,
    * 6 truecolor+alpha→4. CRC is not verified — this is the metadata
    * scan, not an integrity pass. */
  def sniffPngMeta(b: Array[Byte]): Option[ImageMeta] = {
    if (!sniff(b).contains("png") || b.length < 26) return None
    if (be32(b, 8) != 13 || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' ||
      b(15) != 'R') return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val depth = b(24) & 0xff
    val channels = (b(25) & 0xff) match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (w <= 0 || h <= 0) None
    else Some(ImageMeta("png", w, h, depth, channels))
  }

  /** JPEG SOF sniff: walk the marker segments from SOI until a
    * start-of-frame marker (SOF0 baseline / SOF1 extended / SOF2
    * progressive …), whose payload is precision(1), height(2 BE),
    * width(2 BE), componentCount(1) — ITU T.81 §B.2.2. Skips APPn/COM/
    * DQT/DHT via their big-endian length fields, tolerates fill bytes
    * (0xFF padding before a marker), and gives up cleanly (None) on
    * SOS/EOI-before-SOF or any truncation — a corrupt blob must never
    * kill the scan. */
  def sniffJpegMeta(b: Array[Byte]): Option[ImageMeta] = {
    if (!sniff(b).contains("jpeg")) return None
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // lost marker alignment
      var j = i + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // fill bytes
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      val seg = j + 1 // first byte after the marker
      marker match {
        case 0x01 | 0xd8 => i = seg // standalone: TEM / SOI
        case m if m >= 0xd0 && m <= 0xd7 => i = seg // standalone: RSTn
        case 0xd9 | 0xda => return None // EOI / SOS before any SOF
        case m if m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
          m != 0xcc => // SOFn (C4=DHT, C8=JPG, CC=DAC are not frames)
          if (seg + 7 >= b.length) return None
          val depth = b(seg + 2) & 0xff
          val h = be16(b, seg + 3)
          val w = be16(b, seg + 5)
          val ncomp = b(seg + 7) & 0xff
          return if (w > 0 && h > 0 && ncomp > 0)
            Some(ImageMeta("jpeg", w, h, depth, ncomp))
          else None
        case _ => // any length-prefixed segment: APPn, COM, DQT, DHT…
          if (seg + 1 >= b.length) return None
          val len = be16(b, seg)
          if (len < 2) return None
          i = seg + len
      }
    }
    None
  }

  /** Uniform header-metadata sniff across every container the engine
    * recognizes (PPM/BMP reuse their full decoders — they are already
    * header-cheap). */
  def sniffMeta(b: Array[Byte]): Option[ImageMeta] = sniff(b) match {
    case Some("png") => sniffPngMeta(b)
    case Some("jpeg") => sniffJpegMeta(b)
    case Some("ppm") =>
      decodePpm(b).map(i => ImageMeta("ppm", i.width, i.height, 8, i.channels))
    case Some("bmp") =>
      decodeBmp(b).map(i => ImageMeta("bmp", i.width, i.height, 8, i.channels))
    case _ => None
  }

  // ---------------------------------------------------------------- WAV

  /** RIFF/WAVE chunk walk: requires a PCM (audioFormat=1) `fmt ` chunk
    * with 16 bits/sample, then decodes the `data` chunk's
    * little-endian interleaved samples. Chunk sizes pad to even
    * offsets per the RIFF spec; a data size past the payload end is
    * truncated to the bytes actually present (streaming writers often
    * leave a stale size field). */
  def decodeWav(b: Array[Byte]): Option[Wav] = {
    if (sniff(b) != Some("wav")) return None
    var pos = 12
    var sampleRate = 0
    var nChannels = 0
    var bits = 0
    var fmtSeen = false
    var data: Array[Short] = null
    var next = 0L
    while (pos + 8 <= b.length && data == null) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = le32(b, pos + 4)
      if (size < 0) return None
      val body = pos + 8
      id match {
        case "fmt " if size >= 16 && body + 16 <= b.length =>
          val audioFormat = le16(b, body)
          nChannels = le16(b, body + 2)
          sampleRate = le32(b, body + 4)
          bits = le16(b, body + 14)
          if (audioFormat != 1 || nChannels <= 0 || sampleRate <= 0 ||
            bits != 16) return None
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) return None
          val avail = math.min(size.toLong, (b.length - body).toLong).toInt
          val n = avail / 2
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = ((b(body + 2 * i) & 0xff) |
              ((b(body + 2 * i + 1) & 0xff) << 8)).toShort
            i += 1
          }
          data = samples
        case _ => () // skip LIST/fact/cue/... chunks
      }
      // advance in LONG arithmetic: a corrupt chunk declaring ~2^31
      // bytes would wrap `body + size` Int-negative, keep the loop
      // guard true, and crash the String read — same corrupt-blob
      // contract as the BMP dimension bound
      next = body.toLong + size.toLong + (size & 1) // chunks pad to even
      if (next > b.length.toLong) return if (data != null && fmtSeen)
        Some(Wav(sampleRate, nChannels, bits, data)) else None
      pos = next.toInt
    }
    if (fmtSeen && data != null) Some(Wav(sampleRate, nChannels, bits, data))
    else None
  }

  /** Encode 16-bit PCM mono/interleaved samples as a minimal WAV. */
  def encodeWav(wav: Wav): Array[Byte] = {
    require(wav.bitsPerSample == 16, "16-bit PCM only")
    val dataBytes = wav.samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = wav.sampleRate * wav.nChannels * 2
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(wav.nChannels.toShort).putInt(wav.sampleRate)
      .putInt(byteRate).putShort((wav.nChannels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    wav.samples.foreach(out.putShort)
    out.array()
  }

  // ------------------------------------------------------------- resize

  /** Nearest-neighbor resample: source index = (dst * srcDim) / dstDim
    * (integer floor) — the standard decimation mapping, replicated
    * arithmetically by the DuckDB oracle, so the resized bytes are
    * end-to-end checkable. */
  def resizeNearest(img: Image, dstW: Int, dstH: Int): Image = {
    require(dstW > 0 && dstH > 0, "target dims must be positive")
    val out = new Array[Byte](dstW * dstH * img.channels)
    var y = 0
    while (y < dstH) {
      val srcY = y * img.height / dstH
      var x = 0
      while (x < dstW) {
        val srcX = x * img.width / dstW
        val s = (srcY * img.width + srcX) * img.channels
        val d = (y * dstW + x) * img.channels
        var c = 0
        while (c < img.channels) { out(d + c) = img.pixels(s + c); c += 1 }
        x += 1
      }
      y += 1
    }
    Image(dstW, dstH, img.channels, out)
  }
}
