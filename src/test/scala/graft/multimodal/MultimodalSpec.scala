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
}
