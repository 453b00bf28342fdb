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

  test("GENUINELY concurrent producers to one partition: the claim " +
    "protocol keeps offsets dense and disjoint whatever the row counts") {
    val dir = freshDir()
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // 8 threads × 5 appends each, DIFFERENT row counts per thread —
    // the exact shape that broke the old (start, count)-keyed rename:
    // same-start racers with different counts got different names,
    // both exists-checks passed, and the partition ended up with
    // overlapping segments. The claim file is keyed on start alone.
    val threads = 8
    val appendsEach = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val latch = new java.util.concurrent.CountDownLatch(1)
    (0 until threads).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = try {
          latch.await()
          (0 until appendsEach).foreach { i =>
            val n = 1 + (t + i) % 3 // 1..3 rows, varies per attempt
            val lines = (0 until n).map(j =>
              s"${GraftLog.b64(s"t$t-a$i-r$j")}\t${GraftLog.b64("v")}\t1")
            GraftLog.appendPartition(f, dir, 0, lines)
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    latch.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
    assert(errs.isEmpty, s"producer thread failed: ${errs.peek()}")
    val expectRows = (0 until threads).flatMap(t =>
      (0 until appendsEach).map(i => 1 + (t + i) % 3)).sum
    val rows = spark.read.format("graftlog").load(dir)
      .select("offset", "key").collect()
    // every offset exactly once, dense from 0 — overlap or loss fails
    assert(rows.map(_.getLong(0)).sorted.toSeq ===
      (0L until expectRows.toLong))
    // every producer's every row arrived exactly once
    assert(rows.map(_.getString(1)).distinct.length === expectRows)
    // segment ledger itself is non-overlapping and dense
    val pDir = new org.apache.hadoop.fs.Path(dir, "p=0")
    val segs = f.listStatus(pDir).map(_.getPath.getName)
      .filter(_.matches("seg-\\d{12}-\\d{8}\\.log"))
      .map(s => (s.substring(4, 16).toLong, s.substring(17, 25).toLong))
      .sortBy(_._1)
    segs.foldLeft(0L) { case (expectStart, (start, n)) =>
      assert(start === expectStart, s"segment gap/overlap at $start")
      start + n
    }
  }

  test("stale-claim takeover is FENCED: a live-but-slow producer whose " +
    "claim was taken over must NOT publish — offsets stay dense and " +
    "no two segments share a start") {
    val dir = freshDir()
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def enc(k: String) = s"${GraftLog.b64(k)}\t${GraftLog.b64("v")}\t1"
    val takerRan = new java.util.concurrent.atomic.AtomicBoolean(false)
    // the zombie: pauses between staging its temp file and the fence
    // check — exactly the upload-took-too-long window. While paused,
    // its claim goes stale and a taker REPLACES it and publishes.
    val zombiePause: () => Unit = () => {
      if (takerRan.compareAndSet(false, true)) {
        val claim = new org.apache.hadoop.fs.Path(dir,
          "p=0/" + f".claim-${0L}%012d")
        // age the zombie's claim past the horizon
        f.setTimes(claim, System.currentTimeMillis() - 600000L, -1)
        // the taker: sees a stale claim, replaces the token, publishes
        val (s, n) = GraftLog.appendPartition(f, dir, 0,
          Seq(enc("taker")), staleClaimMs = 1000L)
        assert((s, n) === (0L, 1L))
      }
    }
    val (zStart, zN) = GraftLog.appendPartition(f, dir, 0,
      Seq(enc("zombie")), staleClaimMs = 1000L,
      beforePublish = zombiePause)
    // the zombie's first publish was fenced off; it retried and landed
    // AFTER the taker — dense, disjoint offsets
    assert((zStart, zN) === (1L, 1L))
    val rows = spark.read.format("graftlog").load(dir)
      .orderBy("offset").select("offset", "key").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((0L, "taker"), (1L, "zombie")))
    // exactly one segment per start offset
    val starts = f.listStatus(new org.apache.hadoop.fs.Path(dir, "p=0"))
      .map(_.getPath.getName)
      .filter(_.matches("seg-\\d{12}-\\d{8}\\.log"))
      .map(_.substring(4, 16).toLong)
    assert(starts.sorted.toSeq === Seq(0L, 1L))
  }

  test("KEY COMPACTION: latest record per key survives below the " +
    "watermark, offsets preserved, newest segment protected; batch " +
    "reads, offset windows, and a checkpointed consumer resume " +
    "compose across the compaction") {
    val dir = freshDir()
    // pid 0: three eras of keyed updates + a protected newest segment
    GraftLog.append(spark, dir, batch(Seq(
      (0, 0L, "k1", "a1", 1L), (0, 1L, "k2", "b1", 2L))))
    GraftLog.append(spark, dir, batch(Seq(
      (0, 0L, "k1", "a2", 3L), (0, 1L, "k3", "c1", 4L))))
    GraftLog.append(spark, dir, batch(Seq(
      (0, 0L, "k2", "b2", 5L), (0, 1L, "k1", "a3", 6L))))
    GraftLog.append(spark, dir, batch(Seq((0, 0L, "k4", "d1", 7L))))
    // pid 1: one key updated twice, one never updated
    GraftLog.append(spark, dir, batch(Seq(
      (1, 0L, "x", "x1", 1L), (1, 1L, "y", "y1", 2L))))
    GraftLog.append(spark, dir, batch(Seq((1, 0L, "x", "x2", 3L))))
    GraftLog.append(spark, dir, batch(Seq((1, 0L, "z", "z1", 4L))))
    // a consumer drains everything BEFORE compaction (checkpoint at
    // the head: {0:7, 1:4})
    val ckpt = Files.createTempDirectory("graft_compact_ckpt").toString
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
    def drain(): Unit = {
      val q = spark.readStream.format("graftlog").load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val rows = b.select("partition", "offset", "value").collect()
              .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
            out.synchronized { out ++= rows }
            ()
        }.start()
      q.processAllAvailable(); q.stop()
    }
    drain()
    assert(out.size === 11)
    // COMPACT below the end of each partition's eligible history
    val removed = GraftLog.compact(spark, dir, Map(0 -> 7L, 1 -> 4L))
    assert(removed === 5) // 3 dense segs folded on pid 0, 2 on pid 1
    // whole-log batch read: survivors + protected newest, original
    // offsets — k1 keeps ONLY a3@5, k2 ONLY b2@4, x ONLY x2@2
    val got = spark.read.format("graftlog").load(dir)
      .select("partition", "offset", "key", "value").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      (0, 3L, "k3", "c1"), (0, 4L, "k2", "b2"), (0, 5L, "k1", "a3"),
      (0, 6L, "k4", "d1"),
      (1, 1L, "y", "y1"), (1, 2L, "x", "x2"), (1, 3L, "z", "z1")))
    // end offsets unchanged (offsets never renumber)
    assert(GraftLog.endOffsets(spark, dir) === Map(0 -> 7L, 1 -> 4L))
    // a mid-compacted-range offset window serves exactly its slice
    val win = spark.read.format("graftlog")
      .option("startingOffsets", """{"0":4}""")
      .option("endingOffsets", """{"0":6}""").load(dir)
      .select("offset", "key").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(win.toSeq === Seq((4L, "k2"), (5L, "k1")))
    // the checkpointed consumer resumes ACROSS the compaction: only
    // NEW records arrive, nothing replays, nothing is lost
    GraftLog.append(spark, dir, batch(Seq((0, 0L, "k5", "e1", 9L))))
    out.clear()
    drain()
    assert(out.toSeq === Seq((0, 7L, "e1")))
    // RE-COMPACTION: the new watermark folds the old cseg + later
    // segments into one WIDER cseg (shadowing resolves mid-crash too)
    GraftLog.compact(spark, dir, Map(0 -> 8L))
    val segs0 = GraftLog.segments(
      new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration), dir, 0)
    assert(segs0.count(s => GraftLog.isSparse(s._1)) === 1)
    val got2 = spark.read.format("graftlog").load(dir)
      .filter($"partition" === 0)
      .select("offset", "key").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got2.toSeq === Seq((3L, "k3"), (4L, "k2"), (5L, "k1"),
      (6L, "k4"), (7L, "k5")))
  }

  test("compaction STREAMS the segment writer: a fat partition's " +
    "survivor set never materializes in memory (writes stay row-sized)") {
    val dir = freshDir()
    val fat = "x" * 1000
    // 1000 keys × 3 versions over three segments — survivor bytes
    // (~1.4 MB, the latest 1000 records) dwarf any single record
    (0 until 3).foreach { gen =>
      GraftLog.append(spark, dir, batch(
        (0 until 1000).map(i =>
          (0, i.toLong, s"k$i", s"$fat-g$gen-k$i", (gen * 1000 + i).toLong))))
    }
    val removed = GraftLog.compact(spark, dir, Map(0 -> 2000L))
    assert(removed === 2)
    // row-sized writes by construction: the largest single byte[] the
    // writer handed its stream is one record's encoding, nowhere near
    // the partition's full survivor byte count (the pre-round-14
    // whole-partition StringBuilder would surface here as ~1.4 MB)
    val maxWrite = GraftLog.lastCompactMaxWriteBytes.get()
    assert(maxWrite > 1000 && maxWrite < 4096,
      s"expected row-sized writes, saw max single write of $maxWrite B")
    val cseg = new java.io.File(s"$dir/p=0")
      .listFiles().filter(_.getName.startsWith("cseg-"))
    assert(cseg.length === 1)
    assert(cseg.head.length() > 1000000L,
      s"cseg holds the full survivor set (${cseg.head.length()} B)")
    // replay correctness: latest record per key below the watermark,
    // offsets preserved, the protected newest segment untouched
    val got = spark.read.format("graftlog").load(dir)
    assert(got.count() === 2000)
    assert(got.filter(col("offset") < 1000).count() === 0)
    val v1 = got.filter(col("offset") === 1500L).select("key", "value")
      .collect().head
    assert(v1.getString(0) === "k500" && v1.getString(1) === s"$fat-g1-k500")
  }

  test("COMPACT LOG through SQL: the dirty-ratio trigger compacts only " +
    "when the eligible run is dirty enough; offsets preserved") {
    val dir = freshDir()
    def gen(g: Int, n: Int): Unit = {
      GraftLog.append(spark, dir, batch(
        (0 until n).map(i => (0, i.toLong, s"k$i", s"g$g-k$i", i.toLong))))
      ()
    }
    gen(0, 100); gen(1, 100); gen(2, 10)
    // eligible run (segments 0+1) carries no cseg yet: ratio 1.0 → the
    // default 0.5 trigger fires and folds both
    val r1 = spark.sql(s"COMPACT LOG '$dir'").collect()(0)
    assert(r1.getInt(0) === 1 && r1.getInt(1) === 2)
    gen(3, 10)
    // now eligible = cseg(span 200) + the 10-row segment: dirty ratio
    // 10/210 ≈ 0.05 — under the default threshold the probe NO-OPS
    // (pure listing, no I/O)
    val r2 = spark.sql(s"COMPACT LOG '$dir'").collect()(0)
    assert(r2.getInt(0) === 0 && r2.getInt(1) === 0)
    // an explicit lower ratio re-triggers and folds cseg + segment
    val r3 = spark.sql(s"COMPACT LOG '$dir' DIRTY RATIO 0.04").collect()(0)
    assert(r3.getInt(0) === 1 && r3.getInt(1) >= 2)
    // replay correctness: offsets preserved, latest record per key
    // below the watermark, the protected newest segment untouched
    val got = spark.read.format("graftlog").load(dir)
    assert(got.count() === 110) // 100 live keys + the newest 10-row seg
    val k50 = got.filter(col("key") === "k50")
      .select("offset", "value").collect()
    assert(k50.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((150L, "g1-k50")))
    val k5 = got.filter(col("key") === "k5").orderBy("offset")
      .select("offset", "value").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(k5 === Seq((205L, "g2-k5"), (215L, "g3-k5")))
  }

  test("OFFSET INDEX sidecar: mid-segment reads are identical with " +
    "and without the .idx (seek + bounded tail walk vs full skip); " +
    "a corrupt sidecar degrades, never corrupts") {
    val dir = freshDir()
    val n = 20000
    GraftLog.append(spark, dir, batch(
      (0 until n).map(i => (0, i.toLong, s"k$i", s"v$i", i.toLong))))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val seg = GraftLog.segments(f, dir, 0).head._1
    // the produce path already wrote an inline sidecar (n ≥ 2×4096)
    assert(f.exists(new org.apache.hadoop.fs.Path(seg + ".idx")))
    // indexSeek lands on the largest indexed offset ≤ from
    val hit = GraftLog.indexSeek(f, seg, 9000L)
    assert(hit.exists(_._1 === 8192L))
    assert(GraftLog.indexSeek(f, seg, 100L) === None) // below first entry
    def readWindow(): Seq[(Long, String)] =
      spark.read.format("graftlog")
        .option("startingOffsets", """{"0":8995}""")
        .option("endingOffsets", """{"0":9005}""").load(dir)
        .select("offset", "value").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val expect = (8995L until 9005L).map(o => (o, s"v$o"))
    assert(readWindow() === expect)          // seeked via the sidecar
    // rebuild at a different stride — same rows
    GraftLog.writeOffsetIndex(f, seg, every = 1000)
    assert(GraftLog.indexSeek(f, seg, 9000L).exists(_._1 === 9000L))
    assert(readWindow() === expect)
    // corrupt sidecar: reads degrade to the plain line skip
    val os = f.create(new org.apache.hadoop.fs.Path(seg + ".idx"), true)
    os.write("garbage\twith\textra\tfields\n".getBytes); os.close()
    assert(readWindow() === expect)
    // no sidecar at all: still identical
    f.delete(new org.apache.hadoop.fs.Path(seg + ".idx"), false)
    assert(readWindow() === expect)
  }

  test("capped offset split: proportional to lag, deterministic " +
    "remainder, never past the head") {
    import GraftLogOffset.capped
    // total lag 10 (6 + 3 + 1), cap 5 → floor shares (3, 1, 0),
    // remainder 1 goes to the largest lag (p0)
    val from = Map(0 -> 0L, 1 -> 0L, 2 -> 0L)
    val head = Map(0 -> 6L, 1 -> 3L, 2 -> 1L)
    assert(capped(from, head, 5) === Map(0 -> 4L, 1 -> 1L, 2 -> 0L))
    // cap at/above total lag returns the head verbatim
    assert(capped(from, head, 10) === head)
    assert(capped(from, head, 100) === head)
    // mid-stream: lags (2, 3, 1), cap 4 → floors (1, 2, 0), rem 1 →
    // p1 (the largest lag) → takes (1, 3, 0)
    val from2 = Map(0 -> 4L, 1 -> 0L, 2 -> 0L)
    assert(capped(from2, head, 4) === Map(0 -> 5L, 1 -> 3L, 2 -> 0L))
    // remainder ties break by partition id (deterministic re-planning)
    assert(capped(Map(0 -> 0L, 1 -> 0L), Map(0 -> 4L, 1 -> 4L), 3)
      === Map(0 -> 2L, 1 -> 1L))
  }

  test("maxOffsetsPerTrigger paces the stream: a 12-row topic at cap 4 " +
    "takes 3 micro-batches and loses nothing") {
    val dir = freshDir()
    val ckpt = Files.createTempDirectory("graft_log_cap_ckpt").toString
    GraftLog.append(spark, dir, batch(
      (0 until 8).map(i => (0, i.toLong, s"a$i", i.toString, 1L)) ++
        (0 until 4).map(i => (1, i.toLong, s"b$i", i.toString, 1L))))
    val sink = "graftlog_cap_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format("graftlog")
      .option("maxOffsetsPerTrigger", "4").load(dir)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table(sink).count() === 12)
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches === 3, s"expected 3 capped batches, saw $batches")
    // per-batch admission never exceeded the cap
    assert(q.recentProgress.forall(_.numInputRows <= 4))
    spark.catalog.dropTempView(sink)
  }

  test("a capped stream stopped MID-CATCH-UP resumes at the " +
    "checkpointed capped offset: no replay, no gap, caps still honored") {
    // MicroBatchStream-contract level (Trigger.Once bypasses admission
    // control by design, so an engine-driven mid-catch-up stop isn't
    // deterministic): drive the offsets exactly like the engine does,
    // with a NEW stream instance per "restart" fed only the serialized
    // checkpoint JSON.
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = freshDir()
    GraftLog.append(spark, dir, batch(
      (0 until 12).map(i => (0, i.toLong, s"k$i", i.toString, 1L))))
    def freshStream() = new GraftLogScan(dir, "earliest", "latest",
      Some(5L), None, spark).toMicroBatchStream("unused")
    val s1 = freshStream()
    val o0 = s1.initialOffset()
    assert(o0.json() === """{"0":0}""")
    val s1ac = s1.asInstanceOf[
      org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
    val o1 = s1ac.latestOffset(o0, s1ac.getDefaultReadLimit)
    assert(o1.json() === """{"0":5}""", "first capped batch = 5 rows")
    // CRASH after committing batch 1: only o1's JSON survives (the
    // checkpoint). A new instance must resume exactly there.
    val s2 = freshStream()
    val o1r = s2.deserializeOffset(o1.json())
    val s2ac = s2.asInstanceOf[
      org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
    val o2 = s2ac.latestOffset(o1r, s2ac.getDefaultReadLimit)
    assert(o2.json() === """{"0":10}""", "resume honors the cap, no replay")
    val o3 = s2ac.latestOffset(o2, s2ac.getDefaultReadLimit)
    assert(o3.json() === """{"0":12}""", "final remainder batch")
    // the re-planned (o1, o2] window reads EXACTLY rows 5..9
    val parts = s2.planInputPartitions(o1r, o2)
    val reader = new GraftLogReaderFactory
    val got = parts.flatMap { p =>
      val r = reader.createReader(p)
      Iterator.continually(r).takeWhile(_.next())
        .map(_.get().getLong(1)).toList
    }.sorted
    assert(got.toSeq === (5L until 10L))
  }

  test("Trigger.AvailableNow pins the head at start, drains in capped " +
    "batches, stops, and leaves later appends for the next run") {
    val dir = freshDir()
    val ckpt = Files.createTempDirectory("graft_log_an_ckpt").toString
    val out = Files.createTempDirectory("graft_log_an_out").toString + "/sink"
    GraftLog.append(spark, dir, batch(
      (0 until 9).map(i => (0, i.toLong, s"k$i", i.toString, 1L))))
    def run(): Unit = {
      val q = spark.readStream.format("graftlog")
        .option("maxOffsetsPerTrigger", "4").load(dir)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query did not stop")
    }
    run()
    assert(spark.read.parquet(out).count() === 9)
    // rows landing after the run wait for the NEXT run (bounded catch-up)
    GraftLog.append(spark, dir, batch(Seq((0, 0L, "late", "x", 2L))))
    run()
    assert(spark.read.parquet(out).count() === 10)
  }

  test("distributed producer: df.write.format(\"graftlog\") appends " +
    "executor-side in (partition, offset) order; a second write continues") {
    val dir = freshDir()
    val rows = (0 until 100).map(i =>
      (i % 4, i.toLong, s"k$i", s"v$i", 1000L + i))
    rows.toDF("partition", "offset", "key", "value", "ts")
      .select(col("partition").cast("int"), col("offset").cast("long"),
        col("key"), col("value"), col("ts").cast("long"))
      .repartition(8) // writer's required clustering re-plans this
      .write.format("graftlog").mode("append").save(dir)
    val got = spark.read.format("graftlog").load(dir)
      .orderBy("partition", "offset")
      .select("partition", "offset", "key").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (pid, rs) => rs.sortBy(_._2).zipWithIndex.map {
        case ((_, _, k, _, _), j) => (pid, j.toLong, k) }
    }
    assert(got.toSeq === expect)
    // second write continues each partition's offsets
    Seq((0, 0L, "extra", "e", 1L))
      .toDF("partition", "offset", "key", "value", "ts")
      .select(col("partition").cast("int"), col("offset").cast("long"),
        col("key"), col("value"), col("ts").cast("long"))
      .write.format("graftlog").mode("append").save(dir)
    assert(spark.read.format("graftlog").load(dir)
      .filter(col("partition") === 0).count() === 26)
  }

  test("batch offset windows: startingOffsets/endingOffsets JSON maps " +
    "slice an exact per-partition range; minPartitions splits a hot " +
    "partition without changing content") {
    val dir = freshDir()
    GraftLog.append(spark, dir, batch(
      (0 until 10).map(i => (0, i.toLong, s"a$i", i.toString, 1L)) ++
        (0 until 4).map(i => (1, i.toLong, s"b$i", i.toString, 1L))))
    // window [2, 7) on p0, [1, latest) on p1
    val win = spark.read.format("graftlog")
      .option("startingOffsets", """{"0":2,"1":1}""")
      .option("endingOffsets", """{"0":7,"1":4}""")
      .load(dir)
      .select("partition", "offset").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sorted
    assert(win.toSeq ===
      (2L until 7).map(o => (0, o)) ++ (1L until 4).map(o => (1, o)))
    // minPartitions: a 2-partition topic fans out to >= 8 read splits,
    // content identical (chunks skip to their offset by line count)
    val wide = spark.read.format("graftlog")
      .option("minPartitions", "8").load(dir)
    assert(wide.rdd.getNumPartitions >= 8)
    assert(wide.count() === 14)
    assert(wide.select("offset").as[Long].collect().sum ===
      (0L until 10).sum + (0L until 4).sum)
  }

  test("retention: truncateBefore retires whole segments below the " +
    "watermark, never the newest; offsets stay stable; produce continues") {
    val dir = freshDir()
    GraftLog.append(spark, dir, batch(
      (0 until 3).map(i => (0, i.toLong, s"a$i", "old", 1L))))
    val afterFirst = GraftLog.endOffsets(spark, dir)
    GraftLog.append(spark, dir, batch(
      (0 until 2).map(i => (0, i.toLong, s"b$i", "mid", 2L))))
    GraftLog.append(spark, dir, batch(
      (0 until 2).map(i => (0, i.toLong, s"c$i", "new", 3L))))
    assert(GraftLog.truncateBefore(spark, dir, afterFirst) === 1)
    assert(GraftLog.earliestOffsets(spark, dir) === Map(0 -> 3L))
    assert(GraftLog.endOffsets(spark, dir) === Map(0 -> 7L))
    // survivors keep their ORIGINAL offsets; reads serve from them
    val rows = spark.read.format("graftlog").load(dir)
      .orderBy("offset").select("offset", "key").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((3L, "b0"), (4L, "b1"), (5L, "c0"), (6L, "c1")))
    // a watermark at the head still spares the newest segment (the end
    // offset must survive so produced offsets never collide)
    assert(GraftLog.truncateBefore(spark, dir, Map(0 -> 100L)) === 1)
    assert(GraftLog.endOffsets(spark, dir) === Map(0 -> 7L))
    // produce continues past retirement, offsets dense from the end
    GraftLog.append(spark, dir, batch(Seq((0, 0L, "d", "x", 4L))))
    assert(GraftLog.endOffsets(spark, dir) === Map(0 -> 8L))
    // a stream from earliest serves exactly the survivors
    val ckpt = Files.createTempDirectory("graft_log_ret_ckpt").toString
    val sink = "graftlog_ret_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format("graftlog").load(dir)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table(sink).select("key").as[String].collect().sorted
      .toSeq === Seq("c0", "c1", "d"))
    spark.catalog.dropTempView(sink)
  }

  test("streaming producer: writeStream.format(\"graftlog\") appends " +
    "each micro-batch executor-side; a checkpointed restart continues") {
    implicit val sqlCtx = spark.sqlContext
    val dir = freshDir()
    val ckpt = Files.createTempDirectory("graft_log_sink_ckpt").toString
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Int, Long, String, String, Long)]
    def start() = in.toDF()
      .toDF("partition", "offset", "key", "value", "ts")
      .writeStream.format("graftlog")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q = start()
    in.addData((0, 0L, "a", "1", 1L), (1, 0L, "b", "2", 2L))
    q.processAllAvailable()
    in.addData((0, 1L, "c", "3", 3L))
    q.processAllAvailable()
    q.stop()
    assert(GraftLog.endOffsets(spark, dir) === Map(0 -> 2L, 1 -> 1L))
    // restart on the same checkpoint: no replay, produce continues
    val q2 = start()
    in.addData((1, 1L, "d", "4", 4L))
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.format("graftlog").load(dir)
      .orderBy("partition", "offset").select("partition", "offset", "key")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq === Seq((0, 0L, "a"), (0, 1L, "c"),
      (1, 0L, "b"), (1, 1L, "d")))
  }

  test("RACING distributed writers to the same topic: both land " +
    "completely, offsets stay dense per partition") {
    val dir = freshDir()
    def frame(tag: String) = (0 until 40).map(i =>
        (i % 2, i.toLong, s"$tag-$i", tag, 1L))
      .toDF("partition", "offset", "key", "value", "ts")
      .select(col("partition").cast("int"), col("offset").cast("long"),
        col("key"), col("value"), col("ts").cast("long"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    Seq("w1", "w2").foreach { tag =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try frame(tag).write.format("graftlog").mode("append").save(dir)
          catch { case e: Throwable => errs.add(e) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(180, java.util.concurrent.TimeUnit.SECONDS))
    assert(errs.isEmpty, s"racing writer failed: ${errs.peek()}")
    val got = spark.read.format("graftlog").load(dir)
    assert(got.count() === 80)
    assert(got.select("key").distinct().count() === 80)
    // offsets dense per partition: max = count − 1 and all distinct
    val perPid = got.groupBy("partition")
      .agg(count(lit(1)).as("n"), max("offset").as("mx"),
        countDistinct("offset").as("d")).collect()
    perPid.foreach { r =>
      assert(r.getLong(3) === r.getLong(1), "duplicate offsets")
      assert(r.getLong(2) === r.getLong(1) - 1, "offset gap")
    }
  }
}
