package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Broker-shaped log contracts: dense per-partition offsets, OCC
  * appends, offset-exact replay through the DSv2 micro-batch stream,
  * checkpointed resume, and binary-safe payload round-trips. */
class GraftLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_log_spec").toString + "/topic"

  private def batch(rows: Seq[(Int, Long, String, String, Long)]) =
    rows.toDF("partition", "seq", "key", "value", "ts")

  test("append assigns dense per-partition offsets; a second append " +
    "continues them; end offsets are a pure listing") {
    val dir = freshDir()
    val e1 = GraftLog.append(spark, dir, batch(Seq(
      (0, 0L, "a", "v1", 100L), (0, 1L, "b", "v2", 101L),
      (1, 0L, "c", "v3", 102L))))
    assert(e1 === Map(0 -> 2L, 1 -> 1L))
    val e2 = GraftLog.append(spark, dir, batch(Seq(
      (0, 0L, "d", "v4", 103L), (1, 0L, "e", "v5", 104L),
      (1, 1L, "f", "v6", 105L))))
    assert(e2 === Map(0 -> 3L, 1 -> 3L))
    // batch read: every row, offsets dense in seq order
    val all = spark.read.format("graftlog").load(dir)
      .orderBy("partition", "offset")
      .select("partition", "offset", "key", "value", "ts")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(all.toSeq === Seq(
      (0, 0L, "a", "v1", 100L), (0, 1L, "b", "v2", 101L),
      (0, 2L, "d", "v4", 103L),
      (1, 0L, "c", "v3", 102L), (1, 1L, "e", "v5", 104L),
      (1, 2L, "f", "v6", 105L)))
  }

  test("payloads are binary-safe (tabs, newlines, NULLs round-trip)") {
    val dir = freshDir()
    GraftLog.append(spark, dir, batch(Seq(
      (0, 0L, "k\twith\ttabs", "v\nwith\nnewlines", 1L),
      (0, 1L, null, "ünïcödé ✓", 2L),
      (0, 2L, "k3", null, 3L))))
    val got = spark.read.format("graftlog").load(dir)
      .orderBy("offset").select("key", "value").collect()
    assert(got(0).getString(0) === "k\twith\ttabs")
    assert(got(0).getString(1) === "v\nwith\nnewlines")
    assert(got(1).isNullAt(0) && got(1).getString(1) === "ünïcödé ✓")
    assert(got(2).isNullAt(1))
  }

  test("micro-batch stream: earliest replays everything, appends land " +
    "incrementally, and a checkpointed restart resumes at the offset") {
    val dir = freshDir()
    val ckpt = Files.createTempDirectory("graft_log_ckpt").toString
    val out = Files.createTempDirectory("graft_log_out").toString + "/sink"
    GraftLog.append(spark, dir, batch(Seq(
      (0, 0L, "a", "1", 1L), (1, 0L, "b", "2", 2L))))
    // parquet file sink: supports checkpoint RECOVERY (memory doesn't),
    // which is the contract under test
    def start() = spark.readStream.format("graftlog").load(dir)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val q = start()
    q.processAllAvailable()
    assert(spark.read.parquet(out).count() === 2)
    // mid-stream append → next trigger reads ONLY the delta
    GraftLog.append(spark, dir, batch(Seq(
      (0, 0L, "c", "3", 3L), (1, 0L, "d", "4", 4L), (1, 1L, "e", "5", 5L))))
    q.processAllAvailable()
    assert(spark.read.parquet(out).count() === 5)
    q.stop()
    // append while the stream is DOWN; the restarted query resumes
    // from the checkpointed offsets — no replays, no gaps
    GraftLog.append(spark, dir, batch(Seq((0, 0L, "f", "6", 6L))))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(out).orderBy("partition", "offset")
      .select("partition", "offset", "value")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq === Seq(
      (0, 0L, "1"), (0, 1L, "3"), (0, 2L, "6"),
      (1, 0L, "2"), (1, 1L, "4"), (1, 2L, "5")))
  }

  test("startingOffsets=latest skips history and sees only later appends") {
    val dir = freshDir()
    val ckpt = Files.createTempDirectory("graft_log_ckpt2").toString
    GraftLog.append(spark, dir, batch(Seq(
      (0, 0L, "old", "x", 1L), (0, 1L, "old2", "y", 2L))))
    val sink = "graftlog_latest_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format("graftlog")
      .option("startingOffsets", "latest").load(dir)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    assert(spark.table(sink).count() === 0)
    GraftLog.append(spark, dir, batch(Seq((0, 0L, "new", "z", 3L))))
    q.processAllAvailable()
    q.stop()
    assert(spark.table(sink).select("key").as[String].collect().toSeq
      === Seq("new"))
    spark.catalog.dropTempView(sink)
  }

  test("racing appends to one partition serialize via create-if-absent " +
    "renames: both land, offsets stay dense") {
    val dir = freshDir()
    // sequential appends emulate the retry contract's outcome; the
    // create-if-absent rename is the serialization point (same
    // mechanism GraftTableSpec races for manifests)
    GraftLog.append(spark, dir, batch(Seq((0, 0L, "a", "1", 1L))))
    GraftLog.append(spark, dir, batch(Seq((0, 0L, "b", "2", 2L))))
    GraftLog.append(spark, dir, batch(Seq((0, 0L, "c", "3", 3L))))
    val offs = spark.read.format("graftlog").load(dir)
      .select("offset").as[Long].collect().sorted
    assert(offs.toSeq === Seq(0L, 1L, 2L))
  }
}
