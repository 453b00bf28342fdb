package graft.queries

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.multimodal.Multimodal

/** Real-codec multimodal queries, oracle-gated end to end.
  *
  * q27/q28/q85 pin the multimodal PLUMBING over text-backed payloads
  * (which exercise the decode fallback); these three exercise the REAL
  * codecs over genuine binary containers. The payloads are built by
  * [[Multimodal.synthesizePpm]]/[[Multimodal.synthesizeWav]] with
  * closed-form content (pixel/sample `i` of media `m` is a fixed
  * affine-mod formula), wrapped in real P6/RIFF containers — so the
  * DuckDB oracle can recompute every decoded statistic arithmetically
  * WITHOUT parsing binaries: if the parser misreads a header, skips a
  * pad byte, or flips a channel, the integer sums diverge and the gate
  * fails. All compared columns are integers — no float tolerance
  * anywhere.
  *
  * Scale: one mapPartitions decode per payload, no shuffle until the
  * final (tiny) per-media aggregate rows; decoder init is
  * per-partition. The same shape carries a JNI codec at 100 TB.
  */
object MultimodalQueries {

  /** Real PPM decode: synthesize genuine 4×3 P6 images, parse them
    * with the real netpbm decoder, and compare exact per-channel pixel
    * sums (recovered integer-exactly from the normalized float means:
    * sum = mean × 255 × 12 ≤ 3060, well inside float32's 24-bit
    * mantissa) against the closed-form oracle. */
  val q154PpmDecode = GraftQuery(
    "q154_ppm_decode",
    (s, dir) => {
      val media = Multimodal.synthesizePpm(Tables.documents(s, dir), 4, 3)
      Multimodal.decodeFeatures(media)
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("features"), 1).cast("double") * 255 * 12)
            .cast("long").as("sum_r"),
          round(element_at(col("features"), 2).cast("double") * 255 * 12)
            .cast("long").as("sum_g"),
          round(element_at(col("features"), 3).cast("double") * 255 * 12)
            .cast("long").as("sum_b"))
        .orderBy("media_id")
    },
    Some("""WITH px AS (
           |  SELECT d.doc_id AS media_id, i.g AS i,
           |    (d.doc_id * 131 + i.g * 7) % 256 AS b
           |  FROM documents d,
           |    LATERAL (SELECT unnest(generate_series(0, 35)) g) i)
           |SELECT media_id,
           |  CAST(4 AS INTEGER) AS width, CAST(3 AS INTEGER) AS height,
           |  CAST(sum(CASE WHEN i % 3 = 0 THEN b END) AS BIGINT) AS sum_r,
           |  CAST(sum(CASE WHEN i % 3 = 1 THEN b END) AS BIGINT) AS sum_g,
           |  CAST(sum(CASE WHEN i % 3 = 2 THEN b END) AS BIGINT) AS sum_b
           |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin))

  /** Real resize round-trip: 4×3 P6 → nearest-neighbor 2×2 → P6
    * re-encode → decode AGAIN → exact channel sums of the RESIZED
    * pixels. The oracle replays the floor mapping (srcX = x·4/2 ∈
    * {0,2}, srcY = y·3/2 ∈ {0,1} → source pixel bases {0,6,12,18})
    * on the closed-form content; out_len pins the container size
    * (11-byte "P6\n2 2\n255\n" header + 12 raster bytes). */
  val q155PpmResize = GraftQuery(
    "q155_ppm_resize",
    (s, dir) => {
      val media = Multimodal.synthesizePpm(Tables.documents(s, dir), 4, 3)
      val resized = Multimodal.resize(media, 2, 2)
      // out_len rides THROUGH the decode as a passthrough column — a
      // join back to `resized` would re-execute the whole
      // synthesize+resize pipeline for the second branch
      val redecoded = Multimodal.decodeFeatures(
        resized.select(col("media_id"), col("media_type"),
          col("out_payload").as("payload"),
          col("out_len").cast("long").as("out_len")),
        passthrough = Seq("out_len"))
      redecoded
        .select(col("media_id"), col("width"), col("height"), col("out_len"),
          round(element_at(col("features"), 1).cast("double") * 255 * 4)
            .cast("long").as("sum_r"),
          round(element_at(col("features"), 2).cast("double") * 255 * 4)
            .cast("long").as("sum_g"),
          round(element_at(col("features"), 3).cast("double") * 255 * 4)
            .cast("long").as("sum_b"))
        .orderBy("media_id")
    },
    Some("""WITH px AS (
           |  SELECT d.doc_id AS media_id, c.c AS c, b.b AS base,
           |    (d.doc_id * 131 + (b.b + c.c) * 7) % 256 AS v
           |  FROM documents d,
           |    LATERAL (SELECT unnest([0, 6, 12, 18]) b) b,
           |    LATERAL (SELECT unnest([0, 1, 2]) c) c)
           |SELECT media_id,
           |  CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
           |  CAST(23 AS BIGINT) AS out_len,
           |  CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_r,
           |  CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g,
           |  CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_b
           |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin))

  /** Real WAV PCM decode: genuine RIFF containers, 64 mono 16-bit
    * samples at 8 kHz, closed-form sample values; the decoder's chunk
    * walk, format validation, and little-endian sample reads are all
    * on the path to the integer-exact Σ s² / Σ |s| the oracle
    * recomputes. */
  val q156WavDecode = GraftQuery(
    "q156_wav_decode",
    (s, dir) =>
      Multimodal.wavStats(
          Multimodal.synthesizeWav(Tables.documents(s, dir), 8000, 64))
        .orderBy("media_id"),
    Some("""WITH sm AS (
           |  SELECT d.doc_id AS media_id,
           |    ((d.doc_id * 7919 + i.g * 104729) % 65536) - 32768 AS v
           |  FROM documents d,
           |    LATERAL (SELECT unnest(generate_series(0, 63)) g) i)
           |SELECT media_id,
           |  CAST(8000 AS INTEGER) AS sample_rate,
           |  CAST(1 AS INTEGER) AS n_channels,
           |  CAST(64 AS BIGINT) AS n_samples,
           |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
           |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs
           |FROM sm GROUP BY media_id ORDER BY media_id""".stripMargin))

  /** Real BMP decode: the SAME closed-form pixel content as q154 but
    * hand-packed into a genuine 24-bit bottom-up BMP (BGR, padded
    * rows) by an independent writer — so the oracle is q154's
    * verbatim. A decoder that forgets the row flip, the BGR swap, or
    * the 4-byte row padding diverges from the PPM-decoded sums and
    * fails here. */
  val q158BmpDecode = GraftQuery(
    "q158_bmp_decode",
    (s, dir) => {
      val media = Multimodal.synthesizeBmp(Tables.documents(s, dir), 4, 3)
      Multimodal.decodeFeatures(media)
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("features"), 1).cast("double") * 255 * 12)
            .cast("long").as("sum_r"),
          round(element_at(col("features"), 2).cast("double") * 255 * 12)
            .cast("long").as("sum_g"),
          round(element_at(col("features"), 3).cast("double") * 255 * 12)
            .cast("long").as("sum_b"))
        .orderBy("media_id")
    },
    q154PpmDecode.oracle)

  /** JPEG/PNG header sniffing — real corpora are JPEG/PNG, and the
    * first pass of a 100 TB image-curation scan is a header-metadata
    * read (dimensions / bit depth / channels drive filter-route-shard
    * decisions before any entropy decode is paid for). Payloads are
    * hand-packed REAL containers (PNG signature + IHDR + CRC'd IEND;
    * JPEG SOI + JFIF APP0 + COM + SOF0 per ITU T.81) with closed-form
    * dims, so the oracle recomputes every field arithmetically: a
    * sniffer that misreads big-endian dims, skips a segment wrong, or
    * maps a color type to the wrong channel count diverges. */
  val q196ImageHeaderSniff = GraftQuery(
    "q196_image_header_sniff",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      Multimodal.imageMeta(Multimodal.synthesizePng(docs))
        .unionByName(Multimodal.imageMeta(Multimodal.synthesizeJpeg(docs)))
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("bit_depth"), col("channels"))
        .orderBy("format", "media_id")
    },
    Some("""WITH ids AS (SELECT doc_id AS media_id FROM documents)
           |SELECT media_id, 'jpeg' AS format,
           |  CAST(32 + media_id % 11 AS INTEGER) AS width,
           |  CAST(24 + media_id % 7 AS INTEGER) AS height,
           |  CAST(8 AS INTEGER) AS bit_depth,
           |  CAST(CASE WHEN media_id % 2 = 0 THEN 3 ELSE 1 END AS INTEGER)
           |    AS channels
           |FROM ids
           |UNION ALL
           |SELECT media_id, 'png',
           |  CAST(16 + media_id % 7 AS INTEGER),
           |  CAST(9 + media_id % 5 AS INTEGER),
           |  CAST(8 AS INTEGER),
           |  CAST(CASE media_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
           |    AS INTEGER)
           |FROM ids
           |ORDER BY format, media_id""".stripMargin))

  /** ViT-style patch extraction over REAL decoded pixels: 8×6 P6
    * images (closed-form content, same generator as q154) are decoded
    * by the real PPM parser and split into a 2×2 grid of 4×3 patches —
    * one row per (image, patch) with EXACT per-channel pixel sums, the
    * patch-token prep a vision transformer's pipeline runs before
    * embedding. Edge behavior (clipping) is exercised by the grid
    * dividing the image exactly here and pinned for ragged sizes in
    * MultimodalSpec. The oracle never decodes: it replays the
    * closed-form raster arithmetic (byte i → pixel i/3, channel i%3,
    * pixel → (x,y) → patch) — parser bugs and patch-walk bugs land on
    * different sides and cannot cancel. Scale: decode+patchify is one
    * mapPartitions pass, fan-out bounded by grid size, no shuffle
    * before the gate's aggregation-free projection. */
  val q240ImagePatches = GraftQuery(
    "q240_image_patches",
    (s, dir) => {
      val media = Multimodal.synthesizePpm(Tables.documents(s, dir), 8, 6)
      Multimodal.patchFeatures(media, patchW = 4, patchH = 3)
        .select(col("media_id"), col("patch_x").cast("long").as("patch_x"),
          col("patch_y").cast("long").as("patch_y"), col("n_px"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy("media_id", "patch_y", "patch_x")
    },
    Some("""WITH px AS (
           |  SELECT d.doc_id AS media_id, i.g AS bi,
           |    (d.doc_id * 131 + i.g * 7) % 256 AS v
           |  FROM documents d,
           |    LATERAL (SELECT unnest(generate_series(0, 8*6*3 - 1)) g) i),
           |cells AS (
           |  SELECT media_id, v, bi % 3 AS ch,
           |    ((bi // 3) % 8) // 4 AS patch_x,
           |    ((bi // 3) // 8) // 3 AS patch_y
           |  FROM px)
           |SELECT media_id, CAST(patch_x AS BIGINT) AS patch_x,
           |  CAST(patch_y AS BIGINT) AS patch_y,
           |  CAST(count(*) / 3 AS BIGINT) AS n_px,
           |  CAST(sum(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS sum_r,
           |  CAST(sum(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS sum_g,
           |  CAST(sum(CASE WHEN ch = 2 THEN v END) AS BIGINT) AS sum_b
           |FROM cells GROUP BY media_id, patch_x, patch_y
           |ORDER BY media_id, patch_y, patch_x""".stripMargin))

  /** AUDIO SPECTROGRAM over real WAV containers: 128-sample clips →
    * 32-sample Hann-windowed frames at hop 16 → windowed DFT against
    * the [[Multimodal.dftBasis]] nano-quantized basis — EXACT int64
    * per-frame spectra, micro-quantized magnitudes summed per (clip,
    * bin), then one aggregation to the 17-bin corpus profile. The
    * oracle replays the closed-form samples (never the decoder) against
    * the SAME inlined basis table, so container parsing, framing, and
    * the DFT walk are all pinned; the basis itself is pinned by
    * `MultimodalSpec`'s analytic checks (DC bin = Hann mass, Parseval
    * sanity). */
  val q264AudioSpectrogram = GraftQuery(
    "q264_audio_spectrogram",
    (s, dir) =>
      Multimodal.spectrogram(
          Multimodal.synthesizeWav(Tables.documents(s, dir), 8000, 128),
          frameLen = 32, hop = 16)
        .groupBy("k")
        .agg(count(lit(1)).as("n_media"),
          sum("r6").as("sum_r6"), sum("i6").as("sum_i6"))
        .orderBy("k"),
    Some(s"""WITH sm AS MATERIALIZED (
            |  SELECT d.doc_id AS m, i.g AS t,
            |    ((d.doc_id * 7919 + i.g * 104729) % 65536) - 32768 AS x
            |  FROM documents d,
            |    LATERAL (SELECT unnest(generate_series(0, 127)) g) i),
            |basis(k, t, c9, s9) AS (VALUES
            |  ${Multimodal.dftBasis(32)
               .map { case (k, t, c9, s9) => s"($k,$t,$c9,$s9)" }
               .grouped(8).map(_.mkString(",")).mkString(",\n  ")}),
            |fr AS (
            |  SELECT sm.m, fl.f, b.k,
            |    CAST(sum(sm.x * b.c9) AS BIGINT) AS re,
            |    CAST(sum(sm.x * b.s9) AS BIGINT) AS im
            |  FROM (SELECT unnest(generate_series(0, 6)) AS f) fl
            |  JOIN sm ON sm.t >= fl.f * 16 AND sm.t < fl.f * 16 + 32
            |  JOIN basis b ON b.t = sm.t - fl.f * 16
            |  GROUP BY 1, 2, 3),
            |per AS (
            |  SELECT m, k, CAST(sum(abs(re) // 1000000) AS BIGINT) AS r6,
            |    CAST(sum(abs(im) // 1000000) AS BIGINT) AS i6
            |  FROM fr GROUP BY 1, 2)
            |SELECT CAST(k AS BIGINT) AS k, count(*) AS n_media,
            |  CAST(sum(r6) AS BIGINT) AS sum_r6,
            |  CAST(sum(i6) AS BIGINT) AS sum_i6
            |FROM per GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(q154PpmDecode, q155PpmResize, q156WavDecode, q158BmpDecode,
      q196ImageHeaderSniff, q240ImagePatches, q264AudioSpectrogram)
}
