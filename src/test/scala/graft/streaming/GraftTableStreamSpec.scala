package graft.streaming

import graft.SparkSpec
import graft.sources.GraftTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The graft TABLE streaming source (snapshot-then-tail rows view):
  * batch 0 = snapshot, later batches = appended/upserted rows per
  * version window; checkpointed restart resumes mid-history; deletes
  * refuse unless ignored; per-trigger version caps pace catch-up;
  * dropped-column history refuses at start. */
class GraftTableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def mk(root: String, n: Int): Unit =
    GraftTable.create(spark, root,
      spark.range(1, n + 1).select(
        $"id".as("k"), ($"id" % 10).as("bucket"), ($"id" * 10).as("v")),
      "k", nBuckets = 4)

  private def sinkFold(out: String) = {
    // keyed last-write-wins fold of the re-emitted rows (upserts
    // re-emit; a keyed consumer dedups — the documented contract)
    val feed = spark.read.parquet(out)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("_batch").desc)
    feed.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .drop("rn", "_batch")
  }

  test("snapshot then tail: batch 0 is the full table, upserts arrive " +
    "as re-emitted rows, a keyed fold reproduces the table") {
    val root = tmp("gts") + "/tbl"
    val out = tmp("gts_out")
    val ckpt = tmp("gts_ckpt")
    mk(root, 500)
    val q = spark.readStream.format("graft")
      .option("path", root).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          b.withColumn("_batch", lit(id)).write.mode("append").parquet(out)
          ()
      }.start()
    q.processAllAvailable()
    // batch 0 = the snapshot
    assert(spark.read.parquet(out).filter($"_batch" === 0).count() === 500)
    // tail: an upsert (2 updates + 1 insert) arrives as 3 rows only
    GraftTable.upsert(spark, root,
      Seq((5L, 99L, -50L), (495L, 99L, -60L), (9999L, 99L, -70L))
        .toDF("k", "bucket", "v"), "k")
    q.processAllAvailable()
    q.stop()
    val tail = spark.read.parquet(out).filter($"_batch" > 0)
    assert(tail.count() === 3)
    assert(tail.select("k").as[Long].collect().sorted.toSeq ===
      Seq(5L, 495L, 9999L))
    // keyed fold == direct read of the head
    val folded = sinkFold(out).orderBy("k").collect().toSeq
    val direct = GraftTable.read(spark, root).orderBy("k").collect().toSeq
    assert(folded === direct)
  }

  test("checkpointed restart resumes the tail (no snapshot replay, " +
    "no loss) and maxVersionsPerTrigger paces multi-commit catch-up") {
    val root = tmp("gts_rs") + "/tbl"
    val out = tmp("gts_rs_out")
    val ckpt = tmp("gts_rs_ckpt")
    mk(root, 100)
    def run(maxV: Option[Int]): Seq[Long] = {
      val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
      val r = spark.readStream.format("graft").option("path", root)
      val q = maxV.fold(r)(n =>
        r.option("maxVersionsPerTrigger", n.toString)).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            val n = b.count()
            if (n > 0) batches.synchronized { batches += n }
            b.withColumn("_batch", lit(id)).write.mode("append").parquet(out)
            ()
        }.start()
      q.processAllAvailable(); q.stop()
      batches.toSeq
    }
    assert(run(None) === Seq(100L)) // snapshot
    // four commits while the stream is DOWN, 3 rows each
    (1 to 4).foreach { i =>
      GraftTable.upsert(spark, root,
        Seq((i * 1000L, 0L, 1L), (i * 1000L + 1, 0L, 1L),
          (i * 1000L + 2, 0L, 1L)).toDF("k", "bucket", "v"), "k")
    }
    // capped restart: one version per trigger → four 3-row batches,
    // never one 12-row batch — and nothing from the snapshot replays
    val caught = run(Some(1))
    assert(caught === Seq(3L, 3L, 3L, 3L))
    // fold over everything matches the head
    val folded = sinkFold(out)
    assert(folded.count() === 112)
    assert(folded.orderBy("k").collect().toSeq ===
      GraftTable.read(spark, root).orderBy("k").collect().toSeq)
  }

  test("DELETEs refuse the batch (rows-only stream) unless " +
    "ignoreDeletes; DV deletes behave exactly like CoW ones") {
    val root = tmp("gts_del") + "/tbl"
    val ckpt1 = tmp("gts_del_c1")
    mk(root, 60)
    def start(ck: String, ignore: Boolean) = {
      val r = spark.readStream.format("graft").option("path", root)
      (if (ignore) r.option("ignoreDeletes", "true") else r).load()
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch {
          // the guard is IN-PLAN: it fires when the batch executes
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            b.count(); ()
        }.start()
    }
    val q1 = start(ckpt1, ignore = false)
    q1.processAllAvailable()
    // a merge-on-read delete lands mid-stream
    GraftTable.deleteWhereDv(spark, root, $"k" <= 10)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    assert(e.getCause.getMessage.contains("contains DELETE") ||
      Option(e.getCause.getCause).exists(
        _.getMessage.contains("contains DELETE")) ||
      e.getMessage.contains("contains DELETE"))
    q1.stop()
    // ignoreDeletes: fresh stream over the same history just skips them
    val out2 = tmp("gts_del_out")
    val q2 = spark.readStream.format("graft").option("path", root)
      .option("ignoreDeletes", "true").option("startingVersion", "0").load()
      .writeStream.option("checkpointLocation", tmp("gts_del_c2"))
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          b.withColumn("_batch", lit(id)).write.mode("append").parquet(out2)
          ()
      }.start()
    q2.processAllAvailable()
    GraftTable.upsert(spark, root,
      Seq((200L, 0L, 7L)).toDF("k", "bucket", "v"), "k")
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(out2)
    assert(rows.filter($"_batch" === 0).count() === 60) // v0 snapshot
    // delete window contributed nothing; the upsert arrived
    assert(rows.filter($"_batch" > 0).select("k").as[Long]
      .collect().toSeq === Seq(200L))
  }

  test("batch-0 REPLAY is deterministic: a replayed snapshot pins to " +
    "the replayed offset, not the restarted instance's startingVersion") {
    val root = tmp("gts_replay") + "/tbl"
    mk(root, 50) // v0
    // scenario: the original query logged batch 0 (end = v0) and
    // crashed before committing it; the upstream table advances
    GraftTable.upsert(spark, root,
      Seq((1000L, 0L, 1L)).toDF("k", "bucket", "v"), "k") // v1
    // the restarted query constructs a NEW source whose DEFAULT
    // startingVersion is the current latest (v1) — the engine then
    // replays batch 0 with the LOGGED offset
    val src = new GraftTableSource(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      Map("path" -> root, "key" -> "k"))
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    import org.apache.spark.sql.graftshim.StreamingFrame
    val replayed = StreamingFrame.toBatch(
      src.getBatch(None, LongOffset(0L)).toDF())
    // byte-identical to the original batch 0: the v0 snapshot, no
    // rows from beyond the logged offset
    assert(replayed.count() === 50)
    assert(replayed.filter($"k" === 1000L).count() === 0)
    // the next window then ships exactly the overlap-free delta
    val next = StreamingFrame.toBatch(
      src.getBatch(Some(LongOffset(0L)), LongOffset(1L)).toDF())
    assert(next.select("k").as[Long].collect().toSeq === Seq(1000L))
  }

  test("incompatible history refuses at start: a column dropped below " +
    "the starting version has no single output schema") {
    val root = tmp("gts_drop") + "/tbl"
    mk(root, 10)
    GraftTable.dropColumn(spark, root, "bucket")
    val e = intercept[Exception] {
      spark.readStream.format("graft")
        .option("path", root).option("startingVersion", "0").load()
        .writeStream.option("checkpointLocation", tmp("gts_drop_c"))
        .foreachBatch {
          (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => ()
        }.start().processAllAvailable()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("DROPPED")))
    // columns ADDED after the start version NULL-pad instead
    val root2 = tmp("gts_add") + "/tbl"
    mk(root2, 10)
    GraftTable.evolveAddColumns(spark, root2, Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType)))
    GraftTable.upsert(spark, root2,
      Seq((100L, 0L, 1L, 5L)).toDF("k", "bucket", "v", "extra"), "k")
    val out = tmp("gts_add_out")
    val q = spark.readStream.format("graft").option("path", root2)
      .option("startingVersion", "0").load()
      .writeStream.option("checkpointLocation", tmp("gts_add_c"))
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          b.withColumn("_batch", lit(id)).write.mode("append").parquet(out)
          ()
      }.start()
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(out)
    // v0 snapshot rows NULL-pad 'extra'; the post-evolution upsert
    // carries its value
    assert(got.filter($"_batch" === 0)
      .filter($"extra".isNotNull).count() === 0)
    assert(got.filter($"k" === 100L).select("extra").as[Long]
      .collect().toSeq === Seq(5L))
  }
}
