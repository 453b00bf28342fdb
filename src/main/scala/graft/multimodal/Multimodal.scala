package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extraction
  * runs per-partition over the binary payloads.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked DETERMINISTIC FAKE decoder (byte histogram + fake
  * dimensions) — the Spark-side contract that matters at scale is real:
  * binary schema, per-partition batch processing (one decoder init per
  * partition, the same shape a JNI/codec binding needs), typed feature
  * output, and no driver-side collection.
  */
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

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("fake_width", IntegerType),
    StructField("fake_height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** DETERMINISTIC FAKE decode: a real codec call would replace the
    * body of `decodeOne`. Emits a normalized byte histogram as the
    * "feature vector" and payload-derived fake dimensions. Runs via
    * mapPartitions so a real decoder would be initialized once per
    * partition, not per row. */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "media_type", "payload").rdd
      .mapPartitions { rows =>
        // per-partition decoder init would go here (JNI codec, model…)
        rows.map { r =>
          val id = r.getLong(0)
          val mtype = r.getString(1)
          val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
          val (w, h, feats) = decodeOne(bytes)
          Row(id, mtype, w, h, feats)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
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
    StructField("out_md5", StringType)))

  /** DETERMINISTIC FAKE resize: a real scaler (libvips/ffmpeg binding)
    * would replace `resizeOne`. The Spark-side contract is real:
    * per-partition processing (one scaler init per partition), typed
    * output schema, payload-derived deterministic result. The fake
    * strides the payload down to ~targetW×targetH/256 bytes. */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "media_type", "payload").rdd
      .mapPartitions { rows =>
        // per-partition scaler init would go here
        rows.map { r =>
          val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
          val out = resizeOne(bytes, targetW, targetH)
          val md = java.security.MessageDigest.getInstance("MD5").digest(out)
          Row(r.getLong(0), r.getString(1), targetW, targetH, out.length,
            md.map("%02x".format(_)).mkString)
        }
      }
    spark.createDataFrame(rdd, resizeSchema)
  }

  /** ??? — real scaler goes here; the fake strides bytes down to the
    * target budget, deterministic in (payload, targetW, targetH). */
  private def resizeOne(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val budget = math.max(1, w * h / 256)
    if (bytes.length <= budget) bytes
    else {
      val stride = bytes.length.toDouble / budget
      Array.tabulate(budget)(i => bytes((i * stride).toInt))
    }
  }

  /** ??? — real decoder goes here. The fake is deterministic in the
    * payload bytes alone. */
  private def decodeOne(bytes: Array[Byte]): (Int, Int, Seq[Float]) = {
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
