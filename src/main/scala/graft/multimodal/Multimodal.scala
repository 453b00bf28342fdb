package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extraction
  * runs per-partition over the binary payloads.
  *
  * The decode path dispatches on container magic bytes to REAL
  * dependency-free codecs ([[Codecs]]: binary PPM + 24-bit BMP images,
  * RIFF/WAVE 16-bit PCM audio, nearest-neighbor resize). Payloads in a
  * format the sniffer doesn't know (e.g. the text-backed synthetic
  * media of [[synthesize]]) fall back to a clearly-marked DETERMINISTIC
  * FAKE (byte histogram + length-derived dimensions) so decode stays
  * total — the fallback stands in for the long tail of codecs a
  * production cluster would add via the same per-partition hook. */
object Multimodal {

  val featureBuckets = 16

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("media_type", StringType),
    StructField("byte_len", IntegerType),
    StructField("checksum", StringType)))

  /** Wrap any (id, text) frame as a fake media table: payload = UTF-8
    * bytes. Stands in for reading real image/audio blobs. */
  def synthesize(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video")).as("media_type"),
      octet_length(col(textCol).cast("binary")).as("byte_len"),
      md5(col(textCol).cast("binary")).as("checksum"))

  /** Deterministic REAL PPM payloads keyed by id: pixel byte `i` of
    * media `m` is `(m * 131 + i * 7) mod 256`, wrapped in a genuine
    * binary P6 container by [[Codecs.encodePpm]]. The closed-form
    * content is what lets a SQL oracle verify the real decoder
    * end-to-end without itself parsing binaries. */
  def synthesizePpm(docs: DataFrame, w: Int, h: Int,
                    idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val px = Array.tabulate(w * h * 3)(i => ((id * 131 + i * 7) % 256).toByte)
        val payload = Codecs.encodePpm(Codecs.Image(w, h, 3, px))
        Row(id, payload, "image", payload.length)
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType),
      StructField("media_type", StringType),
      StructField("byte_len", IntegerType))))
  }

  /** Deterministic REAL BMP payloads keyed by id: the same closed-form
    * pixel content as [[synthesizePpm]] (top-down RGB pixel byte `i` is
    * `(m * 131 + i * 7) mod 256`), hand-packed here into a genuine
    * 24-bit bottom-up BMP — BGR channel order, rows padded to 4-byte
    * boundaries — WITHOUT going through [[Codecs]], so decoding it
    * exercises the parser against an independent writer. A decoder that
    * forgets the row flip, the BGR swap, or the padding fails the q158
    * gate (same oracle as q154: same content, different container). */
  def synthesizeBmp(docs: DataFrame, w: Int, h: Int,
                    idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val buf = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
          .putInt(0).putInt(54)
          .putInt(40).putInt(w).putInt(h) // positive height = bottom-up
          .putShort(1).putShort(24).putInt(0)
          .putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
        def v(i: Int): Byte = ((id * 131 + i * 7) % 256).toByte
        var y = h - 1 // stored bottom row first
        while (y >= 0) {
          var x = 0
          while (x < w) {
            val base = (y * w + x) * 3 // top-down RGB index of (x, y)
            buf.put(v(base + 2)).put(v(base + 1)).put(v(base)) // as BGR
            x += 1
          }
          var pad = rowBytes - w * 3
          while (pad > 0) { buf.put(0.toByte); pad -= 1 }
          y -= 1
        }
        val payload = buf.array()
        Row(id, payload, "image", payload.length)
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType),
      StructField("media_type", StringType),
      StructField("byte_len", IntegerType))))
  }

  /** Deterministic REAL WAV payloads keyed by id: mono 16-bit PCM,
    * sample `i` of media `m` is `((m * 7919 + i * 104729) mod 65536) -
    * 32768`, wrapped in a genuine RIFF/WAVE container. */
  def synthesizeWav(docs: DataFrame, sampleRate: Int, nSamples: Int,
                    idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val samples = Array.tabulate(nSamples)(i =>
          (((id * 7919 + i.toLong * 104729) % 65536) - 32768).toShort)
        val payload = Codecs.encodeWav(Codecs.Wav(sampleRate, 1, 16, samples))
        Row(id, payload, "audio", payload.length)
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType),
      StructField("media_type", StringType),
      StructField("byte_len", IntegerType))))
  }

  /** Deterministic REAL PNG containers keyed by id: signature + IHDR
    * (closed-form dims `w = 16 + id mod 7`, `h = 9 + id mod 5`, bit
    * depth 8, color type cycling gray/truecolor/truecolor+alpha) +
    * IEND, with correct CRC32s — hand-packed against the PNG spec, not
    * through any codec. Entropy data is absent on purpose: the
    * metadata sniff is a header scan and must not need it. */
  def synthesizePng(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = 16 + (id % 7).toInt
        val h = 9 + (id % 5).toInt
        val colorType = Array(0, 2, 6)((id % 3).toInt)
        val ihdr = java.nio.ByteBuffer.allocate(17)
        ihdr.put("IHDR".getBytes("US-ASCII"))
          .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
          .put(0.toByte).put(0.toByte).put(0.toByte)
        def crc(a: Array[Byte]): Int = {
          val c = new java.util.zip.CRC32(); c.update(a); c.getValue.toInt
        }
        val iend = "IEND".getBytes("US-ASCII")
        val buf = java.nio.ByteBuffer.allocate(8 + 25 + 12)
        buf.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
            .map(_.toByte))
          .putInt(13).put(ihdr.array()).putInt(crc(ihdr.array()))
          .putInt(0).put(iend).putInt(crc(iend))
        val payload = buf.array()
        Row(id, payload, "image", payload.length)
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType),
      StructField("media_type", StringType),
      StructField("byte_len", IntegerType))))
  }

  /** Deterministic REAL JPEG header sequences keyed by id: SOI, a
    * genuine APP0/JFIF segment, a COM segment (so the sniffer's
    * length-skip walk is on the path), SOF0 with closed-form dims
    * (`w = 32 + id mod 11`, `h = 24 + id mod 7`, 3 components for
    * even ids / 1 for odd), EOI — ITU T.81 layout, hand-packed. */
  def synthesizeJpeg(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = 32 + (id % 11).toInt
        val h = 24 + (id % 7).toInt
        val ncomp = if (id % 2 == 0) 3 else 1
        val comment = s"graft synthetic $id".getBytes("US-ASCII")
        val sofLen = 8 + 3 * ncomp
        val buf = java.nio.ByteBuffer.allocate(
          2 + 18 + (4 + comment.length) + (2 + sofLen) + 2)
        buf.put(0xff.toByte).put(0xd8.toByte) // SOI
        buf.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
          .put("JFIF".getBytes("US-ASCII")).put(0.toByte) // identifier
          .put(1.toByte).put(1.toByte) // version 1.1
          .put(0.toByte).putShort(72).putShort(72) // DPI aspect
          .put(0.toByte).put(0.toByte) // no thumbnail
        buf.put(0xff.toByte).put(0xfe.toByte) // COM
          .putShort((2 + comment.length).toShort).put(comment)
        buf.put(0xff.toByte).put(0xc0.toByte).putShort(sofLen.toShort) // SOF0
          .put(8.toByte).putShort(h.toShort).putShort(w.toShort)
          .put(ncomp.toByte)
        var c = 1
        while (c <= ncomp) { // component id, 1x1 sampling, qtable 0
          buf.put(c.toByte).put(0x11.toByte).put(0.toByte); c += 1
        }
        buf.put(0xff.toByte).put(0xd9.toByte) // EOI
        val payload = buf.array()
        Row(id, payload, "image", payload.length)
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType),
      StructField("media_type", StringType),
      StructField("byte_len", IntegerType))))
  }

  private val metaSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("channels", IntegerType)))

  /** Header-metadata scan over binary payloads ([[Codecs.sniffMeta]]):
    * format, dimensions, bit depth, channel count — the first pass a
    * 100 TB image-curation pipeline runs (filter/route/shard on header
    * facts BEFORE paying for any entropy decode). Unrecognized or
    * corrupt payloads yield NULL fields, never exceptions. */
  def imageMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes =
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          Codecs.sniffMeta(bytes) match {
            case Some(m) =>
              Row(id, m.format, m.width, m.height, m.bitDepth, m.channels)
            case None => Row(id, null, null, null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, metaSchema)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Feature extraction over binary payloads. Recognized containers
    * decode for REAL: PPM/BMP → true (width, height) + per-channel
    * mean intensities normalized to [0,1]; WAV → (sampleRate, frames)
    * + [mean |amplitude|, RMS] normalized by 2^15. Unrecognized
    * payloads take the deterministic fallback (normalized byte
    * histogram + length-derived fake dimensions). Runs via
    * mapPartitions so a decoder needing init (JNI codec, model…) would
    * be initialized once per partition, not per row.
    *
    * `passthrough` columns ride through the decode unchanged — a
    * caller needing decoded features NEXT TO upstream metadata keeps
    * one pipeline instead of re-joining (and re-executing) the
    * upstream frame. */
  /** ViT-style patch extraction: decode each image payload (REAL
    * PPM/BMP parsers) and emit one row per `patchW`×`patchH` grid cell
    * with EXACT per-channel pixel sums — the patch-token prep a vision
    * transformer's data pipeline runs before embedding. Edge patches
    * clip to the image (n_px carries the true pixel count, so a
    * downstream mean is exact). Runs via mapPartitions like
    * [[decodeFeatures]] (decoder init amortizes per partition);
    * undecodable payloads contribute no rows — route them through
    * [[imageMeta]] first if they must be audited. The fan-out is
    * (image rows) × (grid size): a narrow, shuffle-free expansion that
    * partitions by media row at any corpus scale. */
  def patchFeatures(media: DataFrame, patchW: Int, patchH: Int): DataFrame = {
    require(patchW >= 1 && patchH >= 1, "patch dims must be >= 1")
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          Codecs.decodeImage(bytes).toSeq.flatMap { img =>
            val gridX = (img.width + patchW - 1) / patchW
            val gridY = (img.height + patchH - 1) / patchH
            for (gy <- 0 until gridY; gx <- 0 until gridX) yield {
              var sr = 0L; var sg = 0L; var sb = 0L; var n = 0L
              var y = gy * patchH
              val yEnd = math.min((gy + 1) * patchH, img.height)
              val xEnd = math.min((gx + 1) * patchW, img.width)
              while (y < yEnd) {
                var x = gx * patchW
                while (x < xEnd) {
                  val base = (y * img.width + x) * img.channels
                  sr += img.pixels(base) & 0xff
                  if (img.channels > 1) sg += img.pixels(base + 1) & 0xff
                  if (img.channels > 2) sb += img.pixels(base + 2) & 0xff
                  n += 1
                  x += 1
                }
                y += 1
              }
              Row(id, gx, gy, n, sr, sg, sb)
            }
          }
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("patch_x", IntegerType, nullable = false),
      StructField("patch_y", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false))))
  }

  def decodeFeatures(media: DataFrame,
                     passthrough: Seq[String] = Nil): DataFrame = {
    val spark = media.sparkSession
    val passFields = passthrough.map(n => media.schema(n))
    val cols = Seq("media_id", "media_type", "payload") ++ passthrough
    val rdd = media.select(cols.map(col): _*).rdd
      .mapPartitions { rows =>
        // per-partition decoder init would go here (JNI codec, model…)
        rows.map { r =>
          val id = r.getLong(0)
          val mtype = r.getString(1)
          val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
          val (w, h, feats) = decodeOne(bytes)
          Row.fromSeq(Seq(id, mtype, w, h, feats) ++
            passthrough.indices.map(i => r.get(3 + i)))
        }
      }
    spark.createDataFrame(rdd, StructType(featureSchema.fields ++ passFields))
  }

  /** Deterministic frame sampling over binary payloads — REAL
    * plumbing, no stub: the payload is chunked into `frameSize`-byte
    * frames entirely inside codegen'd SQL (sequence + explode +
    * byte-indexed substring), and every `everyK`-th frame is kept with
    * its index, length, and checksum. This is the video
    * keyframe-sampling dataflow: no decode needed to slice transport
    * chunks, no driver involvement, one narrow projection + explode
    * that partitions by media row. */
  def frameSample(media: DataFrame, frameSize: Int, everyK: Int): DataFrame = {
    require(frameSize >= 1 && everyK >= 1, "frameSize/everyK must be >= 1")
    media
      .select(col("media_id"), col("payload"),
        ceil(octet_length(col("payload")) / lit(frameSize.toDouble)).cast("int")
          .as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % everyK === 0)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameSize + 1, $frameSize)").as("frame"))
      .select(col("media_id"), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))
  }

  private val resizeSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("target_w", IntegerType),
    StructField("target_h", IntegerType),
    StructField("out_len", IntegerType),
    StructField("out_md5", StringType),
    StructField("out_payload", BinaryType)))

  /** Resize over binary payloads. Recognized images (PPM/BMP) go
    * through the REAL pipeline: decode → [[Codecs.resizeNearest]] →
    * re-encode as P6, so out_payload holds genuine resampled image
    * bytes (q155 decodes them again and oracle-checks the pixel sums).
    * Unrecognized payloads take the deterministic byte-stride
    * fallback. Per-partition processing (one scaler init per
    * partition), typed output schema. */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "media_type", "payload").rdd
      .mapPartitions { rows =>
        // per-partition scaler init would go here
        rows.map { r =>
          val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
          val out = resizeOne(bytes, targetW, targetH)
          val md = java.security.MessageDigest.getInstance("MD5").digest(out)
          Row(r.getLong(0), r.getString(1), targetW, targetH, out.length,
            md.map("%02x".format(_)).mkString, out)
        }
      }
    spark.createDataFrame(rdd, resizeSchema)
  }

  private val wavStatsSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("sum_sq", LongType),
    StructField("sum_abs", LongType)))

  /** REAL audio decode with exact typed stats: parses each payload as
    * RIFF/WAVE PCM ([[Codecs.decodeWav]]) and emits integer-exact
    * aggregates (Σ s², Σ |s|) plus format metadata — integers, so the
    * DuckDB oracle check is bit-exact with no float tolerance. A
    * payload that is not a valid PCM WAV yields NULL stats (router
    * discipline: corrupt blobs degrade to null rows, never kill the
    * stage). */
  def wavStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        Codecs.decodeWav(bytes) match {
          case Some(wav) =>
            var sumSq = 0L
            var sumAbs = 0L
            wav.samples.foreach { s =>
              sumSq += s.toLong * s; sumAbs += math.abs(s.toLong)
            }
            Row(id, wav.sampleRate, wav.nChannels, wav.samples.length.toLong,
              sumSq, sumAbs)
          case None => Row(id, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, wavStatsSchema)
  }

  /** Quantized windowed-DFT basis shared by the executor kernel and
    * the oracle-SQL generator: for bin k and in-frame position t,
    * `c9 = round(1e9·cos(2πkt/N)·hann(t))`, `s9` the sine twin, with
    * `hann(t) = 0.5 − 0.5·cos(2πt/N)` (periodic Hann) — integer
    * nanos, so the per-frame spectrum is EXACT int64 arithmetic on
    * both engines (no cross-engine trig: the table is computed once
    * here and inlined into both sides). Bins 0..N/2 (the real
    * spectrum's non-redundant half). */
  def dftBasis(frameLen: Int): Seq[(Int, Int, Long, Long)] = {
    def q9(x: Double): Long =
      BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    for (k <- 0 to frameLen / 2; t <- 0 until frameLen) yield {
      val w = 0.5 - 0.5 * math.cos(2 * math.Pi * t / frameLen)
      val th = 2 * math.Pi * k * t / frameLen
      (k, t, q9(math.cos(th) * w), q9(math.sin(th) * w))
    }
  }

  private val spectrogramSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("k", LongType),
    StructField("r6", LongType),
    StructField("i6", LongType)))

  /** AUDIO SPECTROGRAM FEATURES: decode each payload as PCM WAV,
    * slide `frameLen`-sample frames at `hop`, and correlate every
    * frame against the quantized windowed-DFT basis — per (media,
    * bin): Σ over frames of |Re|/10⁶ and |Im|/10⁶ (micro-quantized
    * magnitudes keep the cross-media sums inside int64 at any corpus
    * size). Per-partition imperative decode (the codec contract —
    * audio bytes never pass through a SQL expression), O(frames ·
    * bins · frameLen) ints per clip, no shuffle until the caller's
    * aggregation. Undecodable payloads yield NULL feature rows. */
  def spectrogram(media: DataFrame, frameLen: Int, hop: Int): DataFrame = {
    val spark = media.sparkSession
    val basis = dftBasis(frameLen)
    val nBins = frameLen / 2 + 1
    val cos = Array.ofDim[Long](nBins, frameLen)
    val sin = Array.ofDim[Long](nBins, frameLen)
    basis.foreach { case (k, t, c9, s9) => cos(k)(t) = c9; sin(k)(t) = s9 }
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        Codecs.decodeWav(bytes) match {
          case Some(wav) =>
            val x = wav.samples
            val nFrames =
              if (x.length < frameLen) 0 else (x.length - frameLen) / hop + 1
            val r6 = new Array[Long](nBins)
            val i6 = new Array[Long](nBins)
            var f = 0
            while (f < nFrames) {
              val base = f * hop
              var k = 0
              while (k < nBins) {
                var re = 0L; var im = 0L
                var t = 0
                while (t < frameLen) {
                  val s = x(base + t).toLong
                  re += s * cos(k)(t); im += s * sin(k)(t)
                  t += 1
                }
                r6(k) += math.abs(re) / 1000000L
                i6(k) += math.abs(im) / 1000000L
                k += 1
              }
              f += 1
            }
            (0 until nBins).map(k => Row(id, k.toLong, r6(k), i6(k)))
          case None => Seq(Row(id, null, null, null))
        }
      }
    }
    spark.createDataFrame(rdd, spectrogramSchema)
  }

  /** Real scaler for recognized images (decode → nearest-neighbor →
    * P6 re-encode); DETERMINISTIC FAKE fallback otherwise (strides
    * bytes down to the target budget, deterministic in (payload,
    * targetW, targetH)). */
  private def resizeOne(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    Codecs.decodeImage(bytes) match {
      case Some(img) => Codecs.encodePpm(Codecs.resizeNearest(img, w, h))
      case None =>
        val budget = math.max(1, w * h / 256)
        if (bytes.length <= budget) bytes
        else {
          val stride = bytes.length.toDouble / budget
          Array.tabulate(budget)(i => bytes((i * stride).toInt))
        }
    }

  /** Real decode for recognized containers; DETERMINISTIC FAKE
    * fallback (normalized byte histogram, length-derived dimensions)
    * for everything else — deterministic in the payload bytes alone
    * either way. */
  private def decodeOne(bytes: Array[Byte]): (Int, Int, Seq[Float]) =
    Codecs.decodeImage(bytes) match {
      case Some(img) =>
        val n = img.width * img.height
        val sums = new Array[Long](img.channels)
        var i = 0
        while (i < n * img.channels) {
          sums(i % img.channels) += img.pixels(i) & 0xff
          i += 1
        }
        (img.width, img.height,
          sums.map(s => (s.toDouble / (255.0 * n)).toFloat).toSeq)
      case None => Codecs.decodeWav(bytes) match {
        case Some(wav) =>
          var sumAbs = 0L
          var sumSq = 0L
          wav.samples.foreach { s =>
            sumAbs += math.abs(s.toLong); sumSq += s.toLong * s
          }
          val n = math.max(wav.samples.length, 1)
          (wav.sampleRate, wav.samples.length / math.max(wav.nChannels, 1),
            Seq((sumAbs.toDouble / n / 32768.0).toFloat,
              (math.sqrt(sumSq.toDouble / n) / 32768.0).toFloat))
        case None =>
          val hist = new Array[Int](featureBuckets)
          var i = 0
          while (i < bytes.length) {
            hist((bytes(i) & 0xff) % featureBuckets) += 1
            i += 1
          }
          val total = math.max(bytes.length, 1).toFloat
          val feats = hist.map(_ / total).toSeq
          val w = 64 + (bytes.length % 577)
          val h = 64 + ((bytes.length.toLong * 31) % 433).toInt // Long: *31 overflows Int past ~69MB
          (w, h, feats)
      }
    }
}
