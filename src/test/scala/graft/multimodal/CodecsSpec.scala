package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Bit-level tests for the dependency-free codecs: hand-built
  * container bytes (not produced by our own encoders, where that
  * matters) decoded to exact expected values, malformed inputs
  * rejected as None, and encode→decode round-trips. */
class CodecsSpec extends AnyFunSuite {

  // ------------------------------------------------------------- PPM

  test("PPM round-trip: encode then decode is the identity") {
    val img = Codecs.Image(3, 2, 3, Array.tabulate(18)(i => (i * 13).toByte))
    val decoded = Codecs.decodePpm(Codecs.encodePpm(img)).get
    assert(decoded.width === 3 && decoded.height === 2 && decoded.channels === 3)
    assert(decoded.pixels.toSeq === img.pixels.toSeq)
  }

  test("PPM header tolerates comments and mixed whitespace") {
    val raster = Array.tabulate(6)(_.toByte)
    val withComments =
      "P6 # a comment\n# full comment line\n 2\t1 # w h\n255\n".getBytes("US-ASCII") ++ raster
    val img = Codecs.decodePpm(withComments).get
    assert(img.width === 2 && img.height === 1)
    assert(img.pixels.toSeq === raster.toSeq)
  }

  test("PPM rejects truncation, bad magic, and wide maxval") {
    val ok = Codecs.encodePpm(Codecs.Image(2, 2, 3, new Array[Byte](12)))
    assert(Codecs.decodePpm(ok.dropRight(1)) === None) // short raster
    assert(Codecs.decodePpm("P5\n2 2\n255\n".getBytes ++ new Array[Byte](12)) === None)
    assert(Codecs.decodePpm("P6\n2 2\n65535\n".getBytes ++ new Array[Byte](24)) === None)
    assert(Codecs.decodePpm(Array[Byte]()) === None)
  }

  test("grayscale encodes as replicated RGB") {
    val gray = Codecs.Image(2, 1, 1, Array[Byte](10, 20))
    val rgb = Codecs.decodePpm(Codecs.encodePpm(gray)).get
    assert(rgb.pixels.toSeq === Seq[Byte](10, 10, 10, 20, 20, 20))
  }

  // ------------------------------------------------------------- BMP

  /** Hand-built 2×2 24-bit BMP. BMP rows are BGR, bottom-up, padded
    * to 4 bytes (2 px × 3 B = 6 B → 2 pad bytes per row). */
  private def bmp2x2(topDown: Boolean): Array[Byte] = {
    val rowBytes = 8
    val h = if (topDown) -2 else 2
    val buf = java.nio.ByteBuffer.allocate(54 + rowBytes * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * 2)
      .putInt(0).putInt(54) // reserved, pixel data offset
      .putInt(40).putInt(2).putInt(h) // BITMAPINFOHEADER, w, h
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(rowBytes * 2).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // stored first row = BOTTOM row unless topDown. Pixels as BGR.
    // Target top-down RGB image: (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    val top = Array[Byte](0, 0, -1, 0, -1, 0, 0, 0) // BGR: red, green + pad
    val bottom = Array[Byte](-1, 0, 0, -1, -1, -1, 0, 0) // BGR: blue, white + pad
    if (topDown) { buf.put(top).put(bottom) } else { buf.put(bottom).put(top) }
    buf.array()
  }

  test("BMP bottom-up and top-down decode to the same top-down RGB") {
    for (td <- Seq(false, true)) {
      val img = Codecs.decodeBmp(bmp2x2(td)).get
      assert(img.width === 2 && img.height === 2 && img.channels === 3)
      assert(img.pixels.toSeq === Seq[Byte](
        -1, 0, 0, 0, -1, 0, // red, green
        0, 0, -1, -1, -1, -1)) // blue, white
    }
  }

  test("BMP rejects unsupported bpp / compression / truncation") {
    val ok = bmp2x2(topDown = false)
    assert(Codecs.decodeBmp(ok.dropRight(3)) === None)
    val bpp8 = ok.clone(); bpp8(28) = 8
    assert(Codecs.decodeBmp(bpp8) === None)
    val rle = ok.clone(); rle(30) = 1 // BI_RLE8
    assert(Codecs.decodeBmp(rle) === None)
  }

  test("BMP with absurd declared dimensions returns None, never crashes") {
    // a header declaring ~2^30 pixels used to overflow rowBytes into a
    // negative array size (NegativeArraySizeException) — a corrupt
    // blob must degrade to None, never kill the stage
    val huge = bmp2x2(topDown = false).clone()
    val bb = java.nio.ByteBuffer.wrap(huge).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 1 << 20) // width
    bb.putInt(22, 1 << 20) // height
    assert(Codecs.decodeBmp(huge) === None)
  }

  // ------------------------------------------------------------- WAV

  test("WAV round-trip: encode then decode is the identity") {
    val samples = Array.tabulate(7)(i => (i * 1000 - 3000).toShort)
    val wav = Codecs.decodeWav(
      Codecs.encodeWav(Codecs.Wav(8000, 1, 16, samples))).get
    assert(wav.sampleRate === 8000 && wav.nChannels === 1 &&
      wav.bitsPerSample === 16)
    assert(wav.samples.toSeq === samples.toSeq)
  }

  test("WAV chunk walk skips unknown chunks and honors odd-size padding") {
    val base = Codecs.encodeWav(Codecs.Wav(44100, 2, 16, Array[Short](5, -5, 7, -7)))
    // splice an odd-sized LIST chunk between fmt and data
    val fmtEnd = 12 + 8 + 16
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte]('a', 'b', 'c', 0) // 3 bytes + pad
    val spliced = base.take(fmtEnd) ++ listChunk ++ base.drop(fmtEnd)
    // fix RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val wav = Codecs.decodeWav(spliced).get
    assert(wav.nChannels === 2 && wav.sampleRate === 44100)
    assert(wav.samples.toSeq === Seq[Short](5, -5, 7, -7))
  }

  test("WAV rejects non-PCM, non-16-bit, and missing chunks") {
    val ok = Codecs.encodeWav(Codecs.Wav(8000, 1, 16, Array[Short](1, 2)))
    val float = ok.clone(); float(20) = 3 // IEEE float format tag
    assert(Codecs.decodeWav(float) === None)
    val bits8 = ok.clone(); bits8(34) = 8
    assert(Codecs.decodeWav(bits8) === None)
    assert(Codecs.decodeWav(ok.take(12)) === None) // no fmt/data
    assert(Codecs.decodeWav("RIFFxxxxWAVE".getBytes) === None)
  }

  test("WAV with a huge declared chunk size returns None, never crashes") {
    // a chunk declaring ~2^31 bytes used to wrap `body + size`
    // Int-negative and crash the chunk walk on the next String read
    val huge = Codecs.encodeWav(Codecs.Wav(8000, 1, 16, Array[Short](1)))
    val bb = java.nio.ByteBuffer.wrap(huge).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, 0x7ffffff0) // fmt chunk size field
    assert(Codecs.decodeWav(huge) === None)
    // ...but an overrunning final DATA chunk still yields its samples
    // (the stale-size case below)
  }

  test("WAV stale data-size field truncates to available bytes") {
    val ok = Codecs.encodeWav(Codecs.Wav(8000, 1, 16, Array[Short](1, 2, 3)))
    val bb = java.nio.ByteBuffer.wrap(ok).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, 1000) // data chunk claims 1000 bytes; only 6 exist
    assert(Codecs.decodeWav(ok).get.samples.toSeq === Seq[Short](1, 2, 3))
  }

  // ----------------------------------------------------------- resize

  test("nearest-neighbor resize: identity at same size, floor mapping") {
    val img = Codecs.Image(4, 3, 3,
      Array.tabulate(36)(i => (i * 7).toByte))
    assert(Codecs.resizeNearest(img, 4, 3).pixels.toSeq === img.pixels.toSeq)
    val small = Codecs.resizeNearest(img, 2, 2)
    // srcX = x*4/2 ∈ {0,2}; srcY = y*3/2 ∈ {0,1}
    def px(x: Int, y: Int): Seq[Byte] =
      (0 until 3).map(c => img.pixels((y * 4 + x) * 3 + c))
    assert(small.pixels.toSeq ===
      (px(0, 0) ++ px(2, 0) ++ px(0, 1) ++ px(2, 1)))
  }

  // -------------------------------------------- dispatch through Spark ops

  test("sniffer routes real containers; text falls through") {
    assert(Codecs.sniff("P6\n1 1\n255\n...".getBytes) === Some("ppm"))
    assert(Codecs.sniff(bmp2x2(false)) === Some("bmp"))
    assert(Codecs.sniff(
      Codecs.encodeWav(Codecs.Wav(8000, 1, 16, Array[Short](0)))) === Some("wav"))
    assert(Codecs.sniff("plain text document".getBytes) === None)
  }

  // ------------------------------------------------- PNG / JPEG headers

  /** Hand-packed PNG: signature + IHDR(w, h, depth, colorType). */
  private def png(w: Int, h: Int, depth: Int, colorType: Int,
                  chunkType: String = "IHDR"): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 13 + 4)
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      .putInt(13).put(chunkType.getBytes("US-ASCII"))
      .putInt(w).putInt(h).put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .putInt(0) // CRC deliberately wrong: the metadata sniff skips it
    buf.array()
  }

  test("PNG IHDR sniff reads big-endian dims and maps color types") {
    assert(Codecs.sniffPngMeta(png(640, 480, 8, 2)) ===
      Some(Codecs.ImageMeta("png", 640, 480, 8, 3)))
    // big-endian on purpose: 0x0102 = 258, not 0x0201 = 513
    assert(Codecs.sniffPngMeta(png(258, 16, 16, 6)) ===
      Some(Codecs.ImageMeta("png", 258, 16, 16, 4)))
    assert(Codecs.sniffPngMeta(png(5, 5, 8, 0)).get.channels === 1) // gray
    assert(Codecs.sniffPngMeta(png(5, 5, 8, 3)).get.channels === 1) // palette
    assert(Codecs.sniffPngMeta(png(5, 5, 8, 4)).get.channels === 2) // gray+a
    assert(Codecs.sniffPngMeta(png(5, 5, 8, 7)) === None) // bad color type
    assert(Codecs.sniffPngMeta(png(0, 5, 8, 2)) === None) // zero width
    assert(Codecs.sniffPngMeta(png(5, 5, 8, 2, "IDAT")) === None) // not IHDR
    assert(Codecs.sniffPngMeta(png(5, 5, 8, 2).take(20)) === None) // truncated
  }

  /** Hand-packed JPEG marker stream. */
  private def jpeg(segments: Array[Byte]*): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ segments.flatten :+
      0xff.toByte :+ 0xd9.toByte

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte,
      ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte
    ) ++ payload

  private def sof(marker: Int, w: Int, h: Int, ncomp: Int,
                  depth: Int = 8): Array[Byte] =
    seg(marker, Array(depth.toByte,
      (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte,
      ncomp.toByte) ++
      (1 to ncomp).flatMap(c => Seq(c.toByte, 0x11.toByte, 0.toByte)))

  test("JPEG SOF sniff walks segments and reads frame dims") {
    val app0 = seg(0xe0, "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 72, 0, 72, 0, 0))
    val com = seg(0xfe, "a comment".getBytes)
    // baseline SOF0 behind APP0 + COM: the length-skip walk is on the path
    assert(Codecs.sniffJpegMeta(jpeg(app0, com, sof(0xc0, 1024, 768, 3))) ===
      Some(Codecs.ImageMeta("jpeg", 1024, 768, 8, 3)))
    // progressive SOF2, grayscale, 12-bit precision
    assert(Codecs.sniffJpegMeta(jpeg(app0, sof(0xc2, 320, 200, 1, depth = 12))) ===
      Some(Codecs.ImageMeta("jpeg", 320, 200, 12, 1)))
    // DHT (C4) is NOT a frame marker and must be skipped, not parsed
    val dht = seg(0xc4, Array.fill[Byte](19)(0))
    assert(Codecs.sniffJpegMeta(jpeg(app0, dht, sof(0xc1, 64, 32, 3))) ===
      Some(Codecs.ImageMeta("jpeg", 64, 32, 8, 3)))
    // fill bytes (FF padding) before a marker are tolerated
    val padded = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      jpeg(sof(0xc0, 8, 8, 3)).drop(2)
    assert(Codecs.sniffJpegMeta(padded).map(_.width) === Some(8))
    // SOS before any SOF -> None (corrupt/truncated stream, not a crash)
    val sos = seg(0xda, Array[Byte](1, 1, 0, 0, 63, 0))
    assert(Codecs.sniffJpegMeta(jpeg(app0, sos)) === None)
    // truncated mid-segment -> None
    assert(Codecs.sniffJpegMeta(
      jpeg(app0, sof(0xc0, 1024, 768, 3)).dropRight(12)) === None)
    // not a JPEG at all
    assert(Codecs.sniffJpegMeta("plain".getBytes) === None)
  }

  test("sniffMeta dispatches uniformly; PPM/BMP reuse their decoders") {
    assert(Codecs.sniffMeta(png(12, 34, 8, 6)) ===
      Some(Codecs.ImageMeta("png", 12, 34, 8, 4)))
    assert(Codecs.sniffMeta(jpeg(sof(0xc0, 99, 7, 1))) ===
      Some(Codecs.ImageMeta("jpeg", 99, 7, 8, 1)))
    assert(Codecs.sniffMeta(bmp2x2(false)) ===
      Some(Codecs.ImageMeta("bmp", 2, 2, 8, 3)))
    assert(Codecs.sniffMeta("plain text".getBytes) === None)
  }
}
