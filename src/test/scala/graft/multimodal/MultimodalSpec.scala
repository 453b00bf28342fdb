package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world"), (1L, "spark engine"), (2L, "")
  ).toDF("doc_id", "text")

  test("synthesize: binary payload with typed metadata") {
    val m = Multimodal.synthesize(docs).collect()
    assert(m.length === 3)
    val r0 = m.find(_.getAs[Long]("media_id") == 0L).get
    assert(new String(r0.getAs[Array[Byte]]("payload"), "UTF-8") === "hello world")
    assert(r0.getAs[Int]("byte_len") === 11)
    assert(r0.getAs[String]("media_type") === "image")
    assert(r0.getAs[String]("checksum").length === 32)
  }

  test("decodeFeatures fallback: deterministic per-partition feature extraction") {
    val f = Multimodal.decodeFeatures(Multimodal.synthesize(docs))
    val rows = f.collect()
    assert(rows.length === 3)
    val r0 = rows.find(_.getAs[Long]("media_id") == 0L).get
    val feats = r0.getSeq[Float](r0.fieldIndex("features"))
    assert(feats.length === Multimodal.featureBuckets)
    // histogram normalizes to ~1 for non-empty payloads
    assert(math.abs(feats.sum - 1.0f) < 1e-5)
    assert(r0.getAs[Int]("width") >= 64)
    // empty payload: zero histogram, no NaN
    val r2 = rows.find(_.getAs[Long]("media_id") == 2L).get
    assert(r2.getSeq[Float](r2.fieldIndex("features")).forall(!_.isNaN))
    // determinism across runs
    val again = Multimodal.decodeFeatures(Multimodal.synthesize(docs)).collect()
      .find(_.getAs[Long]("media_id") == 0L).get
    assert(again.getSeq[Float](again.fieldIndex("features")) === feats)
  }

  test("frameSample: everyK=1 frames reassemble the full payload length") {
    val media = Multimodal.synthesize(docs)
    val frames = Multimodal.frameSample(media, frameSize = 8, everyK = 1)
    val lenByMedia = frames.groupBy("media_id")
      .agg(org.apache.spark.sql.functions.sum("frame_len").as("total"))
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("total")).toMap
    val expected = media.collect()
      .map(r => r.getAs[Long]("media_id") -> Option(r.getAs[Array[Byte]]("payload"))
        .map(_.length.toLong).getOrElse(0L)).toMap
    expected.filter(_._2 > 0).foreach { case (id, len) =>
      assert(lenByMedia(id) === len, s"media $id")
    }
    // empty payloads produce no frames
    assert(!lenByMedia.contains(expected.find(_._2 == 0L).map(_._1).getOrElse(-1L)))
  }

  test("frameSample: everyK=2 keeps exactly the even frame indexes") {
    val media = Multimodal.synthesize(docs)
    val idx = Multimodal.frameSample(media, frameSize = 4, everyK = 2)
      .select("frame_idx").collect().map(_.getLong(0))
    assert(idx.nonEmpty && idx.forall(_ % 2 == 0))
  }

  test("resize fallback: deterministic, bounded output, per-partition shape") {
    val media = Multimodal.synthesize(docs)
    val out = Multimodal.resize(media, 64, 64).collect()
    assert(out.length === 3)
    val budget = 64 * 64 / 256
    out.foreach(r => assert(r.getAs[Int]("out_len") <= budget)) // never exceeds the byte budget
    val again = Multimodal.resize(media, 64, 64).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[String]("out_md5")).toMap
    out.foreach(r => assert(again(r.getAs[Long]("media_id")) === r.getAs[String]("out_md5")))
  }

  test("patchFeatures clips ragged edges and conserves pixel mass") {
    // 5x4 image with 4x3 patches -> 2x2 grid; right column patches are
    // 1 px wide, bottom row patches 1 px tall, corner is 1x1
    val media = Multimodal.synthesizePpm(docs, 5, 4)
    val rows = Multimodal.patchFeatures(media, 4, 3).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("patch_x"),
        r.getAs[Int]("patch_y"), r.getAs[Long]("n_px"),
        r.getAs[Long]("sum_r") + r.getAs[Long]("sum_g") + r.getAs[Long]("sum_b")))
    assert(rows.length === 3 * 4) // 3 images x 2x2 grid
    val byPatch = rows.groupBy(r => (r._2, r._3)).map { case (k, v) => k -> v.head._4 }
    assert(byPatch((0, 0)) === 12L) // full 4x3
    assert(byPatch((1, 0)) === 3L)  // 1 wide x 3 tall
    assert(byPatch((0, 1)) === 4L)  // 4 wide x 1 tall
    assert(byPatch((1, 1)) === 1L)  // corner
    // conservation: per image, patch sums add up to the whole raster
    val totals = rows.groupBy(_._1).map { case (id, v) => id -> v.map(_._5).sum }
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val want = (0 until 5 * 4 * 3).map(i => (id * 131 + i * 7) % 256).sum
      assert(totals(id) === want, s"image $id")
    }
  }

  test("dftBasis: analytic pins (DC row = quantized Hann, sine DC = 0)") {
    val n = 32
    val basis = Multimodal.dftBasis(n)
    assert(basis.size === (n / 2 + 1) * n)
    def q9(x: Double): Long =
      BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    basis.filter(_._1 == 0).foreach { case (_, t, c9, s9) =>
      val hann = 0.5 - 0.5 * math.cos(2 * math.Pi * t / n)
      assert(c9 === q9(hann), s"t=$t") // cos(0)=1 → DC row IS the window
      assert(s9 === 0L, s"t=$t")
    }
    // periodic Hann sums to exactly N/2; the quantized row must sum to
    // 1e9·N/2 within one nano per element
    val dcMass = basis.filter(_._1 == 0).map(_._3).sum
    assert(math.abs(dcMass - n / 2 * 1000000000L) <= n, dcMass.toString)
  }

  test("spectrogram: a pure bin-4 cosine concentrates there; DC goes to bin 0") {
    // two clips: constant amplitude 1000 (all DC) and cos(2π·4t/32)·1000
    val clips = Seq(
      (0L, Array.fill(64)(1000.toShort)),
      (1L, Array.tabulate(64)(t =>
        (1000 * math.cos(2 * math.Pi * 4 * t / 32)).round.toShort)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(clips.map { case (id, xs) =>
        org.apache.spark.sql.Row(id,
          Codecs.encodeWav(Codecs.Wav(8000, 1, 16, xs)), "audio", 0)
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.types.StructField("media_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("byte_len",
          org.apache.spark.sql.types.IntegerType))))
    val rows = Multimodal.spectrogram(media, 32, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) + r.getLong(3)))
    val dc = rows.filter(_._1 == 0L).map(t => t._2 -> t._3).toMap
    val tone = rows.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    assert(dc(0L) === dc.values.max) // constant signal peaks at DC
    assert(tone(4L) === tone.values.max, tone.toString) // tone peaks at its bin
    assert(tone(4L) > 10 * tone(0L)) // and clearly, not marginally
  }
}
