package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucket-count evolution (`ALTER TABLE … SET LAYOUT HASH BUCKETS n`)
  * and the deliberate conflicted branch merge
  * (`MERGE BRANCH … OVERWRITE`). */
class GraftRebucketSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(): String =
    Files.createTempDirectory("graft_rebucket_spec").toString

  private def rows(n: Int) = spark.range(1, n + 1)
    .select($"id".as("k"), ($"id" % 13).as("g"), ($"id" * 3).as("v"))

  private def checksum(root: String): Long =
    GraftTable.read(spark, root)
      .agg(sum(xxhash64($"k", $"g", $"v"))).first().getLong(0)

  test("8 -> 32 rebucket: checksums preserved, point lookup prunes " +
      "to ~1/32, old snapshots keep the OLD count (no mixed layout)") {
    val base = freshBase()
    val root = s"$base/t"
    GraftTable.create(spark, root, rows(20000), "k", nBuckets = 8,
      hashLayout = true)
    // a DV and a pending eqdel must FOLD IN, not leak through
    GraftTable.deleteWhereDv(spark, root, $"k" % 97 === 5)
    GraftTable.appendUpsert(spark, root,
      rows(20000).filter($"k" % 89 === 7).withColumn("v", lit(-1L)), "k")
    val before = checksum(root)
    val vOld = GraftTable.latestVersion(spark, root)
    val cat = "grbk" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val res = spark.sql(
      s"ALTER TABLE $cat.t SET LAYOUT HASH BUCKETS 32").collect()(0)
    val vNew = res.getLong(0).toInt
    assert(checksum(root) === before, "content must survive the rebucket")
    assert(GraftTable.hashLayout(spark, root, vNew) === Some(32))
    assert(GraftTable.hashLayout(spark, root, vOld) === Some(8),
      "an old snapshot must keep the count its files were written at")
    assert(!GraftTable.hasLiveEqDels(spark, root, vNew),
      "the rewrite resolves pending eqdels")
    val all = GraftTable.snapshotFileLedger(spark, root, vNew).size
    assert(all >= 32, s"expected >= 32 mono-bucket files, got $all")
    val one = GraftTable.prunedFileCountKeys(spark, root, Seq(777L))
    assert(one <= math.max(1, all / 16),
      s"a point probe opened $one of $all files after rebucket")
    assert(spark.sql(s"SELECT v FROM $cat.t WHERE k = 777")
      .as[Long].head() === 777L * 3)
  }

  test("rebucketed tables SPJ-join with zero exchanges at the new " +
      "count; a range-bucketed table can ADOPT the layout") {
    val base = freshBase()
    // `l` is born hash(4); `r` is born RANGE-bucketed — both end at 16
    GraftTable.create(spark, s"$base/l", rows(8000), "k", nBuckets = 4,
      hashLayout = true)
    GraftTable.create(spark, s"$base/r",
      rows(8000).withColumnRenamed("v", "w").drop("g"), "k", nBuckets = 4)
    GraftTable.setHashBuckets(spark, s"$base/l", "k", 16)
    GraftTable.setHashBuckets(spark, s"$base/r", "k", 16)
    val cat = "grbj" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val j = spark.sql(s"SELECT l.g, count(*) AS n, sum(l.v + r.w) AS s " +
        s"FROM $cat.l l JOIN $cat.r r ON l.k = r.k GROUP BY l.g")
      val got = j.orderBy("g").collect().toSeq
      val smjs = j.queryExecution.executedPlan.collect {
        case jn: org.apache.spark.sql.execution.joins.SortMergeJoinExec => jn
      }
      assert(smjs.nonEmpty)
      assert(smjs.forall(_.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e
      }.isEmpty), "post-rebucket SPJ must run with zero exchanges")
      val l = rows(8000); val r = rows(8000).withColumnRenamed("v", "w")
      val want = l.as("l").join(r.as("r"), $"l.k" === $"r.k")
        .groupBy($"l.g".as("g"))
        .agg(count(lit(1)).as("n"), sum($"l.v" + $"r.w").as("s"))
        .orderBy("g").collect().toSeq
      assert(got === want)
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("an incremental MV over a STRING-keyed source refreshes " +
      "exactly (the change feed joins raw string keys)") {
    val base = freshBase()
    val src = s"$base/src"
    val data = spark.range(1, 2001).select(
      concat(lit("u-"), lpad($"id".cast("string"), 8, "0")).as("k"),
      ($"id" % 9).as("g"), ($"id" * 5).as("v"))
    GraftTable.create(spark, src, data, "k", nBuckets = 4)
    GraftMv.create(spark, s"$base/mv", src, "g",
      Seq(MvAgg("count", "", "n"), MvAgg("sum", "v", "sv")))
    GraftTable.upsert(spark, src,
      data.filter($"g" === 4).withColumn("v", lit(-1L)), "k")
    GraftTable.deleteWhere(spark, src, $"g" === 7, "k")
    val (_, dirty) = GraftMv.refresh(spark, s"$base/mv")
    assert(dirty > 0)
    val got = GraftMv.read(spark, s"$base/mv")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val want = GraftTable.read(spark, src).groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === want)
  }

  test("a branch forked BEFORE a rebucket keeps writing its base-era " +
      "layout; its merge lands at the evolved count") {
    val base = freshBase()
    val root = s"$base/t"
    val data = rows(4000)
    GraftTable.create(spark, root, data, "k", nBuckets = 4,
      hashLayout = true)
    GraftTable.createBranch(spark, root, "wip")
    GraftTable.setHashBuckets(spark, root, "k", 16) // main evolves
    // the branch writes against its FROZEN base era (old count) —
    // version-aware layout resolution keeps its files consistent
    GraftTable.upsertBranch(spark, root, "wip",
      data.filter($"k" % 97 === 1).withColumn("v", lit(-1L)), "k")
    assert(GraftTable.readBranch(spark, root, "wip")
      .filter($"v" === -1L).count() ===
      data.filter($"k" % 97 === 1).count())
    // merge onto the evolved main: one CDC commit, files at the NEW
    // count (no conflicts — main's rebucket changed no row values)
    GraftTable.mergeBranch(spark, root, "wip") match {
      case Right((v, n)) =>
        assert(n > 0)
        assert(GraftTable.hashLayout(spark, root, v) === Some(16))
        // every live file still parses a bucket id — the SPJ contract
        // survives a branch merge across the evolution
        assert(GraftTable.snapshotFileLedger(spark, root, v).forall(e =>
          GraftTable.fileBucket(e._1).isDefined))
      case Left(c) => fail(s"unexpected conflicts: $c")
    }
    val want = data.withColumn("v",
      when($"k" % 97 === 1, -1L).otherwise($"v"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(GraftTable.read(spark, root)
      .as[(Long, Long, Long)].collect().toSeq.sorted === want)
  }

  test("layout sidecars survive vacuum by the schema rule: the head " +
      "count resolves, a TAGGED pre-rebucket snapshot keeps its own") {
    val base = freshBase()
    val root = s"$base/t"
    GraftTable.create(spark, root, rows(3000), "k", nBuckets = 4,
      hashLayout = true)
    GraftTable.tag(spark, root, "old", 0)
    GraftTable.setHashBuckets(spark, root, "k", 16) // v1
    // churn past the retention horizon
    (1 to 4).foreach { i =>
      GraftTable.upsert(spark, root,
        rows(3000).filter($"k" % 50 === i).withColumn("v", lit(-i.toLong)),
        "k")
    }
    GraftTable.vacuum(spark, root, retainVersions = 2)
    assert(GraftTable.hashLayout(spark, root,
      GraftTable.latestVersion(spark, root)) === Some(16),
      "the head must keep resolving the evolved count after vacuum")
    assert(GraftTable.hashLayout(spark, root, 0) === Some(4),
      "the tagged pre-rebucket snapshot must keep its create count")
    assert(GraftTable.read(spark, root, Some(0)).count() === 3000,
      "the pinned snapshot stays readable")
  }

  test("MERGE BRANCH ... OVERWRITE: the conflicted merge refuses by " +
      "default and publishes branch-wins when asked") {
    val base = freshBase()
    val root = s"$base/t"
    val data = rows(2000)
    GraftTable.create(spark, root, data, "k", nBuckets = 2)
    GraftTable.createBranch(spark, root, "wip")
    // branch and main BOTH change key 42 (conflict), each changes a
    // private key too
    GraftTable.upsertBranch(spark, root, "wip",
      data.filter($"k".isin(42L, 100L)).withColumn("v", lit(-42L)), "k")
    GraftTable.upsert(spark, root,
      data.filter($"k".isin(42L, 200L)).withColumn("v", lit(-7L)), "k")
    assert(GraftTable.mergeBranch(spark, root, "wip") ===
      Left(1L), "the default must refuse the conflicted key")
    val cat = "grbm" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val e = intercept[IllegalStateException] {
      spark.sql(s"MERGE BRANCH wip INTO $cat.t")
    }
    assert(e.getMessage.contains("OVERWRITE"))
    spark.sql(s"MERGE BRANCH wip INTO $cat.t OVERWRITE")
    // branch wins on 42 and 100; main's own 200 survives
    val got = GraftTable.read(spark, root)
      .filter($"k".isin(42L, 100L, 200L))
      .select("k", "v").as[(Long, Long)].collect().toMap
    assert(got === Map(42L -> -42L, 100L -> -42L, 200L -> -7L))
  }


  test("RESTORE to a pre-rebucket version re-pins the restored era's " +
      "layout: point probes keep hitting through bucket pruning") {
    val base = freshBase()
    val root = s"$base/t"
    GraftTable.create(spark, root, rows(4000), "k", nBuckets = 4,
      hashLayout = true)
    val before = checksum(root)
    GraftTable.setHashBuckets(spark, root, "k", 16)
    GraftTable.upsert(spark, root,
      rows(4000).filter($"k" <= 10).withColumn("v", lit(-5L)), "k")
    val v = GraftTable.restore(spark, root, 0)
    assert(GraftTable.hashLayout(spark, root, v) === Some(4),
      "the restored head must resolve the restored era's bucket count")
    assert(GraftTable.hashLayout(spark, root, v - 1) === Some(16),
      "the pre-restore snapshot keeps the evolved count")
    assert(checksum(root) === before)
    // probes map at the restored count - a head that kept resolving 16
    // over mod-4 files would silently drop most of these
    val cat = "grst" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val ks = (1L to 4000L by 97).toSeq
    val got = spark.sql(
      s"SELECT k, v FROM $cat.t WHERE k IN (${ks.mkString(",")})")
      .as[(Long, Long)].collect().toMap
    assert(got === ks.map(k => k -> k * 3).toMap)
    // post-restore writes land in the restored era and stay readable
    GraftTable.upsert(spark, root,
      rows(4000).filter($"k" === 777L).withColumn("v", lit(-9L)), "k")
    assert(spark.sql(s"SELECT v FROM $cat.t WHERE k = 777")
      .as[Long].head() === -9L)
  }

  test("RESTORE to a pre-ADOPTION version clears the layout: no " +
      "bucket pruning or partition reporting over unbucketed files") {
    val base = freshBase()
    val root = s"$base/t"
    GraftTable.create(spark, root, rows(3000), "k", nBuckets = 4) // range
    GraftTable.setHashBuckets(spark, root, "k", 8) // adopt
    val v = GraftTable.restore(spark, root, 0)
    assert(GraftTable.hashLayout(spark, root, v) === None,
      "the restored era had NO hash layout")
    val cat = "grsn" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val ks = (1L to 3000L by 83).toSeq
    val got = spark.sql(
      s"SELECT k, v FROM $cat.t WHERE k IN (${ks.mkString(",")})")
      .as[(Long, Long)].collect().toMap
    assert(got === ks.map(k => k -> k * 3).toMap)
  }

  test("branch fresh files bucket in the BASE era even when main's " +
      "FIRST post-fork commit is the rebucket") {
    import scala.jdk.CollectionConverters._
    def dataFiles(root: String): Set[String] = {
      val d = java.nio.file.Paths.get(root, "data")
      if (!java.nio.file.Files.exists(d)) Set.empty
      else {
        val s = java.nio.file.Files.walk(d)
        try s.iterator().asScala.map(_.toString)
          .filter(_.endsWith(".parquet")).toSet
        finally s.close()
      }
    }
    val base = freshBase()
    val root = s"$base/t"
    val data = rows(4000)
    GraftTable.create(spark, root, data, "k", nBuckets = 4,
      hashLayout = true)
    GraftTable.createBranch(spark, root, "wip")
    GraftTable.setHashBuckets(spark, root, "k", 16)
    val beforeFiles = dataFiles(root)
    GraftTable.upsertBranch(spark, root, "wip",
      data.filter($"k" % 97 === 1).withColumn("v", lit(-1L)), "k")
    val fresh = (dataFiles(root) -- beforeFiles).toSeq
    assert(fresh.nonEmpty)
    // every fresh file is a mono-bucket file whose rows hash to its id
    // at the BASE count (4), not main's evolved count (16)
    fresh.foreach { p =>
      val b = GraftTable.fileBucket(p)
      assert(b.exists(_ < 4), s"$p must carry a base-era bucket id")
      val ks = spark.read.parquet(p).select("k").as[Long].collect()
      assert(ks.nonEmpty && ks.forall(k =>
        GraftTable.bucketOfKey(k, 4) === b.get),
        s"$p rows must hash to bucket ${b.get} at the BASE count (4)")
    }
    assert(GraftTable.readBranch(spark, root, "wip")
      .filter($"v" === -1L).count() === data.filter($"k" % 97 === 1).count())
  }
}
