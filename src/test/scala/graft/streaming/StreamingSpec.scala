package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming cleanse routes rows like the batch router") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String, String, String, String, String)]
    val landing = in.toDF().toDF(
      "order_id", "product", "quantity_ordered", "price_each", "order_date", "purchase_address")
    val routed = Streaming.cleanseStream(landing)

    val qValid = routed.valid.writeStream.format("memory")
      .queryName("sc_valid").outputMode("append").start()
    val qInvalid = routed.invalid.writeStream.format("memory")
      .queryName("sc_invalid").outputMode("append").start()
    in.addData(
      ("1", "iPhone", "1", "700", "01/22/19 21:25", "944 Walnut St, Boston, MA 02215"),
      ("Order ID", "Product", "Quantity Ordered", "Price Each", "Order Date", "Purchase Address"),
      (null, "Cable", "2", "11.95", "01/17/19 13:33", "185 Maple St, Portland, OR 97035"))
    qValid.processAllAvailable(); qInvalid.processAllAvailable()
    qValid.stop(); qInvalid.stop()

    val valid = spark.table("sc_valid").collect()
    val invalid = spark.table("sc_invalid").collect()
    assert(valid.length === 2 && invalid.length === 1)
    assert(invalid.head.getString(1) === "Product")
    val backfilled = valid.find(_.getAs[String]("product") == "Cable").get
    assert(backfilled.getAs[Int]("order_id") < 0) // surrogate id
    assert(valid.find(_.getAs[String]("product") == "iPhone").get
      .getAs[String]("city") === "Boston")
  }

  test("watermarked tumbling window aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val agg = Streaming.windowedEventAggs(events)
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    in.addData(
      (1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 00:02:00"), 2L, "click", 2.0),
      (3L, ts("2024-01-01 00:07:00"), 1L, "view", 5.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win_agg").collect()
    val click = rows.find(_.getAs[String]("event_type") == "click").get
    assert(click.getAs[Long]("n_events") === 2L)
    assert(click.getAs[Double]("total_value") === 3.0)
    assert(click.getAs[Timestamp]("window_start") === ts("2024-01-01 00:00:00"))
    assert(rows.find(_.getAs[String]("event_type") == "view").get
      .getAs[Timestamp]("window_start") === ts("2024-01-01 00:05:00"))
  }

  test("windowed KMV distinct estimate matches the batch sketch over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streaming.windowedDistinctUsersKmv(events)
      .writeStream.format("memory").queryName("win_kmv")
      .outputMode("complete").start()
    // two micro-batches into one window: sketch state must merge
    // across batches (user 1 repeats — dedup inside the sketch)
    in.addData((1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 00:02:00"), 2L, "click", 1.0))
    q.processAllAvailable()
    in.addData((3L, ts("2024-01-01 00:03:00"), 1L, "view", 1.0),
      (4L, ts("2024-01-01 00:04:00"), 3L, "view", 1.0),
      (5L, ts("2024-01-01 00:06:00"), 4L, "view", 1.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win_kmv").collect()
      .map(r => (r.getAs[Timestamp]("window_start"),
        r.getAs[Double]("n_users_kmv"), r.getAs[Long]("n_events"))).toSet
    // 3 distinct users < k in window 0, exact; window 1 has one
    assert(rows === Set((ts("2024-01-01 00:00:00"), 3.0, 4L),
      (ts("2024-01-01 00:05:00"), 1.0, 1L)))
  }

  test("session windows split on gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val sess = Streaming.sessionizedEvents(events)
    val q = sess.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    in.addData(
      (1L, ts("2024-01-01 00:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 00:10:00"), 7L, "click", 1.0),
      (3L, ts("2024-01-01 02:00:00"), 7L, "click", 1.0)) // new session
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("n_events")).sorted === Array(1L, 2L))
  }

  test("dropDuplicatesWithinWatermark removes exact dups across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streaming.dedupedEvents(events).writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    in.addData(
      (1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
      (1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0), // same-batch dup
      (2L, ts("2024-01-01 00:02:00"), 2L, "view", 2.0))
    q.processAllAvailable()
    in.addData((1L, ts("2024-01-01 00:01:30"), 1L, "click", 1.0)) // cross-batch dup
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted
    assert(ids === Array(1L, 2L))
  }

  test("stream-stream join pairs clicks with in-window purchases only") {
    implicit val sqlCtx = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val buysIn = MemoryStream[(Long, Timestamp, Long, String, Double)]
    def named(ms: MemoryStream[(Long, Timestamp, Long, String, Double)]) =
      ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val joined = Streaming.clickToPurchaseJoin(named(clicksIn), named(buysIn))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    clicksIn.addData(
      (10L, ts("2024-01-01 00:00:00"), 1L, "click", 0.0),
      (11L, ts("2024-01-01 00:00:00"), 2L, "click", 0.0))
    buysIn.addData(
      (20L, ts("2024-01-01 00:10:00"), 1L, "purchase", 9.99), // in window
      (21L, ts("2024-01-01 02:00:00"), 2L, "purchase", 5.00)) // past 30 min
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssj").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("click_id") === 10L)
    assert(rows.head.getAs[Long]("purchase_id") === 20L)
    assert(rows.head.getAs[Double]("purchase_value") === 9.99)
  }

  test("foreachBatch parquet sink writes idempotent per-batch dirs") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("fb_sink").toString
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streaming.parquetBatchSink(events, dir)
      .option("checkpointLocation", s"$dir/ckpt").start()
    in.addData((1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0))
    q.processAllAvailable()
    in.addData((2L, ts("2024-01-01 00:02:00"), 2L, "view", 2.0))
    q.processAllAvailable(); q.stop()
    val batches = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted
    assert(batches.length >= 2)
    val all = spark.read.parquet(batches.map(b => s"$dir/$b"): _*)
    assert(all.count() === 2)
    assert(all.select("event_id").collect().map(_.getLong(0)).sorted === Array(1L, 2L))
  }

  for (provider <- Seq("hdfs-default", "rocksdb"))
  test(s"checkpointed stateful query restarts with state intact ($provider)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ckpt_restart").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    if (provider == "rocksdb") spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
      def start() = Streaming.latestStatePerKey(
          in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .outputMode("complete")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          batch.write.mode("overwrite").parquet(s"$dir/out/batch_id=$id")
        }.start()
      val q1 = start()
      in.addData((1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
        (2L, ts("2024-01-01 00:01:00"), 2L, "view", 2.0))
      q1.processAllAvailable(); q1.stop()
      // restart from the SAME checkpoint; only NEW data is delivered,
      // so user 2's survival in the final state proves the state store
      // recovered from the checkpoint rather than recomputing
      val q2 = start()
      in.addData((3L, ts("2024-01-01 00:05:00"), 1L, "purchase", 9.0))
      q2.processAllAvailable(); q2.stop()
      val batches = new java.io.File(s"$dir/out").listFiles()
        .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted
      // batch ids continue across the restart instead of resetting to 0
      assert(batches.length >= 2)
      val last = spark.read.parquet(s"$dir/out/${batches.last}")
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("last_event_id"))).toMap
      assert(last(1L) === ((2L, 3L))) // merged pre- and post-restart rows
      assert(last(2L) === ((1L, 2L))) // state recovered, not recomputed
    } finally {
      prev match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("flatMapGroupsWithState keeps running per-user totals") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streaming.Event]
    // "off": processing-time timeouts keep no-data batches scheduling,
    // so processAllAvailable would never return under MemoryStream
    val out = Streaming.runningUserTotals(in.toDS(), idleTimeout = "off")
    val q = out.writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    in.addData(
      Streaming.Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 2.0),
      Streaming.Event(2L, ts("2024-01-01 00:01:00"), 1L, "error", 3.0))
    q.processAllAvailable()
    in.addData(Streaming.Event(3L, ts("2024-01-01 00:02:00"), 1L, "view", 5.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("running").collect()
      .map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"),
        r.getAs[Long]("errors")))
    // two updates for user 1: after batch 1 and after batch 2
    assert(rows.contains((2L, 5.0, 1L)))
    assert(rows.contains((3L, 10.0, 1L)))
  }

  test("stream-stream LEFT OUTER join emits non-converting clicks after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val buysIn = MemoryStream[(Long, Timestamp, Long, String, Double)]
    def named(ms: MemoryStream[(Long, Timestamp, Long, String, Double)]) =
      ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val joined = Streaming.clickToPurchaseJoin(named(clicksIn), named(buysIn),
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    // user 1 never purchases; user 2 converts in-window
    clicksIn.addData(
      (10L, ts("2024-01-01 00:00:00"), 1L, "click", 0.0),
      (11L, ts("2024-01-01 00:00:00"), 2L, "click", 0.0))
    buysIn.addData((20L, ts("2024-01-01 00:10:00"), 2L, "purchase", 9.99))
    q.processAllAvailable()
    // advance BOTH watermarks past click_ts + within (+1h delay), then
    // one more micro-batch so the new watermark takes effect
    clicksIn.addData((12L, ts("2024-01-01 03:00:00"), 9L, "click", 0.0))
    buysIn.addData((21L, ts("2024-01-01 03:00:00"), 8L, "purchase", 1.0))
    q.processAllAvailable()
    clicksIn.addData((13L, ts("2024-01-01 03:00:01"), 9L, "click", 0.0))
    q.processAllAvailable(); q.stop()
    val byClick = spark.table("ssj_outer").collect()
      .map(r => r.getAs[Long]("click_id") ->
        Option(r.getAs[java.lang.Long]("purchase_id")).map(_.toLong)).toMap
    assert(byClick(11L) === Some(20L), "converting click pairs with its purchase")
    assert(byClick.get(10L) === Some(None),
      "non-converting click must emit with null purchase after the watermark")
  }

  test("stream-static enrichment joins each batch against the dimension") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("user_id", "tier")
    val in = MemoryStream[Streaming.Event]
    val out = Streaming.enrichWithDimension(in.toDS().toDF(), dim, Seq("user_id"))
      .select("event_id", "user_id", "tier")
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    in.addData(
      Streaming.Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
      Streaming.Event(2L, ts("2024-01-01 00:01:00"), 3L, "view", 2.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enriched").collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(rows(1L) === Some("GOLD"))
    assert(rows(2L) === None, "unmatched keys survive the left join unenriched")
  }

  test("streaming compaction equals batch compaction after every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streaming.Event]
    val out = Streaming.latestStatePerKey(in.toDS().toDF())
    val q = out.writeStream.format("memory").queryName("compacted")
      .outputMode("complete").start()
    val b1 = Seq(
      Streaming.Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 2.0),
      Streaming.Event(2L, ts("2024-01-01 00:05:00"), 2L, "view", 1.0))
    val b2 = Seq(
      // arrives after b1 but carries an OLDER timestamp for user 1 —
      // must not displace the existing state
      Streaming.Event(3L, ts("2023-12-31 23:59:00"), 1L, "error", 4.0),
      Streaming.Event(4L, ts("2024-01-01 00:09:00"), 2L, "purchase", 9.0))
    def batchOver(rows: Seq[Streaming.Event]) =
      Streaming.latestStatePerKey(spark.createDataFrame(rows))
        .orderBy("user_id").collect().toSeq
    in.addData(b1: _*); q.processAllAvailable()
    assert(spark.table("compacted").orderBy("user_id").collect().toSeq ===
      batchOver(b1))
    in.addData(b2: _*); q.processAllAvailable(); q.stop()
    // user 1 keeps its newer pre-existing state; user 2 advances
    assert(spark.table("compacted").orderBy("user_id").collect().toSeq ===
      batchOver(b1 ++ b2))
    val u1 = spark.table("compacted").filter("user_id = 1").collect()(0)
    assert(u1.getAs[Long]("last_event_id") === 1L)
  }

  test("near-dup sink admits only novel documents across batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("neardup_sink").toString
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = Streaming.nearDupDedupSink(docs, s"$dir/registry", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "completely different content about spark engines and shuffles at scale"
    val c = "yet another novel document with its own distinct shingle set"
    in.addData((1L, a), (2L, a), (3L, b)) // 2 is an intra-batch dup of 1
    q.processAllAvailable()
    in.addData((4L, a), (5L, c)) // 4 collides with the registry (doc 1)
    q.processAllAvailable(); q.stop()
    val batchDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getPath)
    val admitted = spark.read.parquet(batchDirs: _*)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(admitted === Array(1L, 3L, 5L))
    // the registry accumulated bands for exactly the admitted docs
    val reg = spark.read.parquet(s"$dir/registry")
    assert(reg.select("band_key").distinct().count() > 0)
  }

  test("replayed micro-batch keeps its own survivors (retry idempotency)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neardup_replay").toString
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "completely different content about spark engines and shuffles at scale"
    val batch0 = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    Streaming.dedupBatchAgainstRegistry(batch0, s"$dir/registry",
      s"$dir/out/batch_id=0", 0L, 8, 2, 3)
    val first = spark.read.parquet(s"$dir/out/batch_id=0")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(first === Array(1L, 2L))
    // replay of batch 0 (failure after registry write, before
    // checkpoint commit): its own bands are in the registry, but
    // tagged batch_id=0 and excluded — nothing may be lost
    Streaming.dedupBatchAgainstRegistry(batch0, s"$dir/registry",
      s"$dir/out/batch_id=0", 0L, 8, 2, 3)
    val replayed = spark.read.parquet(s"$dir/out/batch_id=0")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(replayed === Array(1L, 2L))
    // a LATER batch still collides with batch 0's registry rows
    Streaming.dedupBatchAgainstRegistry(Seq((3L, a)).toDF("doc_id", "text"),
      s"$dir/registry", s"$dir/out/batch_id=1", 1L, 8, 2, 3)
    assert(spark.read.parquet(s"$dir/out/batch_id=1").count() === 0)
  }

  test("registry compaction bounds growth and preserves dedup behavior") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neardup_compact").toString
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "completely different content about spark engines and shuffles at scale",
      "yet another novel document with its own distinct shingle set")
    // 6 batches: batches 3..5 replay the same documents under NEW ids —
    // all dropped as registry collisions, but each batch still rewrites
    // band rows nowhere (dropped batches admit nothing); to force
    // duplicate band rows across batches, re-admit via distinct ids on
    // distinct novel text plus repeated registry writes of batch 0
    texts.zipWithIndex.foreach { case (t, i) =>
      Streaming.dedupBatchAgainstRegistry(Seq((i.toLong, t)).toDF("doc_id", "text"),
        s"$dir/registry", s"$dir/out/batch_id=$i", i.toLong, 8, 2, 3)
    }
    // replays of every batch append nothing new but overwrite in place
    texts.zipWithIndex.foreach { case (t, i) =>
      Streaming.dedupBatchAgainstRegistry(Seq((i.toLong, t)).toDF("doc_id", "text"),
        s"$dir/registry", s"$dir/out/batch_id=$i", i.toLong, 8, 2, 3)
    }
    val before = spark.read.parquet(s"$dir/registry")
    val distinctBands = before.select("band", "band_key").distinct().count()
    val n = Streaming.compactRegistry(spark, s"$dir/registry")
    assert(n === distinctBands)
    val after = spark.read.parquet(s"$dir/registry")
    assert(after.count() === distinctBands) // row count == distinct bands
    // dedup against the compacted registry still drops near-dups
    Streaming.dedupBatchAgainstRegistry(
      Seq((100L, texts.head)).toDF("doc_id", "text"),
      s"$dir/registry", s"$dir/out/batch_id=9", 9L, 8, 2, 3)
    assert(spark.read.parquet(s"$dir/out/batch_id=9").count() === 0)
  }

  test("a compaction swap interrupted mid-rename is recovered, losing no state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neardup_crash").toString
    val reg = s"$dir/registry"
    val doc = "the quick brown fox jumps over the lazy dog again and again"
    Streaming.dedupBatchAgainstRegistry(Seq((1L, doc)).toDF("doc_id", "text"),
      reg, s"$dir/out/batch_id=0", 0L, 8, 2, 3)
    val rows = spark.read.parquet(reg).count()
    assert(rows > 0)
    // simulate the worst crash window: live dir renamed aside, the
    // compacted tmp dir incomplete — exactly what a failure between
    // the two renames leaves behind
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(reg)
    assert(fs.rename(live, new org.apache.hadoop.fs.Path(reg + ".old")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(reg + ".compact.tmp")) // partial junk
    // the next batch must see the FULL historical state (its near-dup
    // collides and is dropped), not an empty registry
    Streaming.dedupBatchAgainstRegistry(Seq((50L, doc)).toDF("doc_id", "text"),
      reg, s"$dir/out/batch_id=1", 1L, 8, 2, 3)
    assert(spark.read.parquet(s"$dir/out/batch_id=1").count() === 0)
    // recovery restored the live dir and cleared the leftovers
    assert(fs.exists(live))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(reg + ".old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(reg + ".compact.tmp")))
    // compacting after recovery also works
    assert(Streaming.compactRegistry(spark, reg) > 0)
  }
}
