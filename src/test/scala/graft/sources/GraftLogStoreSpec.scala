package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The commit-log store seam: the whole protocol reduces to one
  * atomic create-if-absent publish, and BOTH implementations — the
  * filesystem-native link(2) store and the conditional-put (CAS)
  * store an object-store deployment needs — must arbitrate races
  * identically: exactly one winner, losers throw. */
class GraftLogStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_logstore_spec").toString + "/t"

  private def stores: Seq[(String, () => GraftLogStore)] = Seq(
    "local-fs" -> (() => LocalFsLogStore),
    "in-memory-cas" -> (() => new InMemoryCasLogStore))

  test("publish primitive: N racing publishers of ONE path — exactly " +
      "one wins under BOTH stores; a both-win is impossible") {
    stores.foreach { case (label, mk) =>
      val store = mk()
      val dir = Files.createTempDirectory("graft_pub").toString
      val hconf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(dir, "v00001.manifest")
      val f = p.getFileSystem(hconf)
      (1 to 20).foreach { round =>
        val dest = new org.apache.hadoop.fs.Path(dir, f"r$round%03d.pub")
        val wins = new java.util.concurrent.atomic.AtomicInteger(0)
        val losses = new java.util.concurrent.atomic.AtomicInteger(0)
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val latch = new java.util.concurrent.CountDownLatch(1)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
        (1 to 4).foreach { i =>
          pool.submit(new Runnable {
            override def run(): Unit = try {
              latch.await()
              try { store.publish(f, dest, s"writer-$i"); wins.incrementAndGet() }
              catch {
                case _: GraftTable.ConcurrentCommitException =>
                  losses.incrementAndGet()
              }
            } catch { case e: Throwable => errs.add(e) }
          })
        }
        latch.countDown()
        pool.shutdown()
        assert(pool.awaitTermination(30,
          java.util.concurrent.TimeUnit.SECONDS))
        assert(errs.isEmpty, s"$label round $round: ${errs.peek()}")
        assert(wins.get() === 1,
          s"$label round $round: ${wins.get()} winners (must be exactly 1)")
        assert(losses.get() === 3, s"$label round $round")
      }
      assert(p != null) // silence unused warning paths
    }
  }

  test("the ×50 concurrent-DDL loop holds under the CAS store: a " +
      "loser's schema never publishes under a winner's commit") {
    GraftTable.withLogStore(new InMemoryCasLogStore) {
      val root = freshRoot()
      GraftTable.create(spark, root, spark.range(1, 4).select(
        $"id".as("k"), lit("C").as("c")), "k", nBuckets = 1)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        (1 to 25).foreach { i =>
          val (ca, cb) = (s"a$i", s"b$i")
          GraftTable.evolveAddColumns(spark, root, Seq(
            org.apache.spark.sql.types.StructField(ca,
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField(cb,
              org.apache.spark.sql.types.StringType)))
          val errs =
            new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
          val latch = new java.util.concurrent.CountDownLatch(1)
          val done = new java.util.concurrent.CountDownLatch(2)
          Seq(ca, cb).foreach { c =>
            pool.submit(new Runnable {
              override def run(): Unit =
                try {
                  latch.await()
                  var ok = false
                  while (!ok) {
                    try { GraftTable.dropColumn(spark, root, c); ok = true }
                    catch {
                      case _: GraftTable.ConcurrentCommitException => ()
                    }
                  }
                } catch { case e: Throwable => errs.add(e) }
                finally done.countDown()
            })
          }
          latch.countDown()
          assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS),
            s"round $i timed out")
          assert(errs.isEmpty, s"round $i drop failed: ${errs.peek()}")
          assert(GraftTable.tableSchema(spark, root,
            GraftTable.latestVersion(spark, root)).fieldNames.sorted.toSeq
            === Seq("c", "k"), s"round $i corrupted the schema")
        }
      } finally pool.shutdown()
      assert(GraftTable.read(spark, root).columns.sorted.toSeq ===
        Seq("c", "k"))
    }
  }

  test("ordinary write paths run unchanged under the CAS store — " +
      "create, upsert, property set/reset, tag/retag, time travel") {
    GraftTable.withLogStore(new InMemoryCasLogStore) {
      val root = freshRoot()
      val data = spark.range(1, 1001).select($"id".as("k"),
        ($"id" * 2).as("v"))
      GraftTable.create(spark, root, data, "k", nBuckets = 2)
      GraftTable.upsert(spark, root,
        data.filter($"k" % 7 === 0).withColumn("v", lit(0L)), "k")
      // mutable refs stay settable (they bypass the CAS arbitration)
      GraftTable.setTableProperty(spark, root, "graft.dml.mode", "dv")
      GraftTable.setTableProperty(spark, root, "graft.dml.mode", "cow")
      GraftTable.tag(spark, root, "rc", 0)
      GraftTable.deleteTag(spark, root, "rc")
      GraftTable.tag(spark, root, "rc", 1)
      assert(GraftTable.tags(spark, root)("rc") === 1)
      val want = data.withColumn("v",
        when($"k" % 7 === 0, 0L).otherwise($"v"))
        .as[(Long, Long)].collect().toSeq.sorted
      assert(GraftTable.read(spark, root)
        .as[(Long, Long)].collect().toSeq.sorted === want)
      assert(GraftTable.read(spark, root, Some(0))
        .as[(Long, Long)].collect().toSeq.sorted ===
        data.as[(Long, Long)].collect().toSeq.sorted)
    }
  }


  test("a FAILED CAS materialization releases the claim: the path is " +
      "not wedged for every later retry") {
    val store = new InMemoryCasLogStore
    val dir = Files.createTempDirectory("graft_cas_fail")
    val hconf = spark.sparkContext.hadoopConfiguration
    // a regular FILE where the parent dir should be makes create fail
    val blocker = dir.resolve("sub")
    java.nio.file.Files.write(blocker, "not a dir".getBytes)
    val dest = new org.apache.hadoop.fs.Path(blocker.toString,
      "v00001.manifest")
    val f = dest.getFileSystem(hconf)
    val e = intercept[Throwable](store.publish(f, dest, "x"))
    assert(!e.isInstanceOf[GraftTable.ConcurrentCommitException],
      s"an infrastructure failure is not a commit race: $e")
    // unwedge the filesystem; the SAME store instance must now succeed
    // (a kept claim would throw ConcurrentCommitException forever)
    java.nio.file.Files.delete(blocker)
    java.nio.file.Files.createDirectory(blocker)
    store.publish(f, dest, "x")
    assert(store.publishedCount === 1)
    // and the published path now refuses like any other
    intercept[GraftTable.ConcurrentCommitException](
      store.publish(f, dest, "y"))
  }
}
