package graft.streaming

import graft.SparkSpec
import graft.sources.GraftTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The CDF streaming source's contracts: micro-batch = version window,
  * bootstrap snapshot + incremental changes reproduce the table, and a
  * RESTART from the checkpoint resumes at the committed version offset
  * (no replay, no loss). */
class GraftCdfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private def mk(root: String, n: Int): Unit =
    GraftTable.create(spark, root,
      spark.range(1, n + 1).select(
        $"id".as("k"), ($"id" % 10).as("bucket"), ($"id" * 10).as("v")),
      "k", nBuckets = 4)

  test("bootstrap + incremental feed reconstruct the table via signed deltas") {
    val root = tmp("cdf_src") + "/tbl"
    val out = tmp("cdf_out")
    val ckpt = tmp("cdf_ckpt")
    mk(root, 1000)
    val q = spark.readStream.format("graft-cdf")
      .option("path", root).load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        b.withColumn("_batch", lit(id)).write.mode("append").parquet(out)
        ()
      }.start()
    q.processAllAvailable()
    // out-of-order upsert (low and high keys in one batch) then delete
    GraftTable.upsert(spark, root,
      Seq((5L, 99L, -50L), (995L, 99L, -60L), (2000L, 99L, -70L))
        .toDF("k", "bucket", "v"), "k")
    q.processAllAvailable()
    GraftTable.deleteWhere(spark, root, $"v" % 7 === 0 && $"k" <= 20, "k")
    q.processAllAvailable()
    q.stop()
    // signed-delta fold of the feed == direct read of the final table
    val feed = spark.read.parquet(out)
    val folded = feed.withColumn("sgn",
        when($"_change".isin("insert", "update_postimage"), 1L).otherwise(-1L))
      .groupBy("bucket")
      .agg(sum($"sgn").as("n"), sum($"sgn" * $"v").as("sv"))
      .filter($"n" > 0)
    val direct = GraftTable.read(spark, root)
      .groupBy("bucket").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(folded.orderBy("bucket").collect().toSeq ===
      direct.orderBy("bucket").collect().toSeq)
    // updates carried both images
    assert(feed.filter($"_change" === "update_preimage").count() === 2)
    assert(feed.filter($"_change" === "update_postimage").count() === 2)
    assert(feed.filter($"_change" === "insert" && $"k" === 2000L).count() === 1)
  }

  test("restart resumes from the checkpointed version offset") {
    val root = tmp("cdf_rs") + "/tbl"
    val out = tmp("cdf_rs_out")
    val ckpt = tmp("cdf_rs_ckpt")
    mk(root, 100)
    def run(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(out)
          ()
        }.start()
      q.processAllAvailable(); q.stop()
    }
    run() // consumes v0 bootstrap
    // two commits while the stream is DOWN
    GraftTable.upsert(spark, root,
      Seq((1L, 1L, -1L)).toDF("k", "bucket", "v"), "k")
    GraftTable.upsert(spark, root,
      Seq((200L, 0L, -2L)).toDF("k", "bucket", "v"), "k")
    run() // must pick up exactly versions (0, 2] — no v0 replay
    val feed = spark.read.parquet(out)
    assert(feed.filter($"_change" === "insert" && $"k" <= 100).count() === 100,
      "bootstrap must not replay on restart")
    assert(feed.filter($"k" === 200L && $"_change" === "insert").count() === 1)
    assert(feed.filter($"k" === 1L && $"_change" === "update_postimage").count() === 1)
  }
}
