package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partition transform ⊕ hash layout COMPOSITION (round 17, Iceberg's
  * multi-field spec `[days(ts), bucket(n, key)]`): one layout gives a
  * 100 TB fact BOTH shuffle-free storage-partitioned key joins (every
  * file mono-bucket) and time pruning (each bucket splits into files
  * covering narrow transform ranges). */
class GraftComposedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(): String =
    Files.createTempDirectory("graft_composed_spec").toString

  /** 16 calendar days × 4000 keys. */
  private def rows(n: Int) = spark.range(1, n + 1).select(
    $"id".as("k"),
    timestamp_seconds(($"id" % 16) * 86400 + 3600).as("ts"),
    ($"id" * 3).as("v"))

  test("create with BOTH days(ts) and hash layout: files stay " +
      "mono-bucket (SPJ contract) AND carry narrow per-file day " +
      "ranges (time pruning contract)") {
    val base = freshBase()
    val root = s"$base/t"
    GraftTable.create(spark, root, rows(4000), "k", nBuckets = 4,
      partitioning = Some(DaysPartition("ts")), hashLayout = true)
    val entries = GraftTable.snapshotFileLedger(spark, root,
      GraftTable.latestVersion(spark, root))
    assert(entries.size > 4, "each bucket should split along the transform")
    assert(entries.forall(e => GraftTable.fileBucket(e._1).isDefined),
      "every file must stay mono-bucket")
    // bucket purity: rows of each file hash to its bucket id
    entries.foreach { e =>
      val ks = spark.read.parquet(s"$root/${e._1}")
        .select("k").as[Long].collect()
      val b = GraftTable.fileBucket(e._1).get
      assert(ks.forall(k => GraftTable.bucketOfKey(k, 4) === b))
    }
    // time pruning: one day's predicate through the pval axis opens a
    // fraction of the files (runtime-pval form, the DPP surface)
    val all = GraftTable.snapshotFilesWithDvs(spark, root,
      GraftTable.latestVersion(spark, root)).size
    val oneDay = GraftTable.snapshotFilesWithDvs(spark, root,
      GraftTable.latestVersion(spark, root),
      pvalValues = Some(Array(5L))).size
    assert(oneDay <= math.max(1, all / 4),
      s"one day's pval opened $oneDay of $all files")
    // point lookup still bucket-prunes
    val one = GraftTable.prunedFileCountKeys(spark, root, Seq(777L))
    assert(one < all, "a point probe must bucket-prune under composition")
  }

  test("composed SPJ: two co-bucketed composed tables join with zero " +
      "exchanges; upserts keep both contracts") {
    val base = freshBase()
    GraftTable.create(spark, s"$base/l", rows(4000), "k", nBuckets = 4,
      partitioning = Some(DaysPartition("ts")), hashLayout = true)
    GraftTable.create(spark, s"$base/r",
      rows(4000).withColumnRenamed("v", "w").drop("ts"), "k",
      nBuckets = 4, hashLayout = true)
    // an upsert through the composed layout keeps mono-bucket naming
    GraftTable.upsert(spark, s"$base/l",
      rows(4000).filter($"k" % 97 === 1).withColumn("v", lit(-1L)), "k")
    val entries = GraftTable.snapshotFileLedger(spark, s"$base/l",
      GraftTable.latestVersion(spark, s"$base/l"))
    assert(entries.forall(e => GraftTable.fileBucket(e._1).isDefined))
    val cat = "gcmp" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val old = confs.map { case (kk, _) => kk -> spark.conf.getOption(kk) }
    try {
      confs.foreach { case (kk, vv) => spark.conf.set(kk, vv) }
      val j = spark.sql(s"SELECT count(*) AS n, sum(l.v + r.w) AS s " +
        s"FROM $cat.l l JOIN $cat.r r ON l.k = r.k")
      val smjs = j.queryExecution.executedPlan.collect {
        case jn: org.apache.spark.sql.execution.joins.SortMergeJoinExec => jn
      }
      assert(smjs.nonEmpty)
      assert(smjs.forall(_.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e
      }.isEmpty), "composed-layout SPJ must run with zero exchanges")
      val lDf = rows(4000).withColumn("v",
        when($"k" % 97 === 1, -1L).otherwise($"v"))
      val rDf = rows(4000).withColumnRenamed("v", "w")
      val want = lDf.as("l").join(rDf.as("r"), $"l.k" === $"r.k")
        .agg(count(lit(1)).as("n"), sum($"l.v" + $"r.w").as("s"))
        .collect()(0)
      assert(j.collect()(0) === want)
    } finally old.foreach {
      case (kk, Some(vv)) => spark.conf.set(kk, vv)
      case (kk, None) => spark.conf.unset(kk)
    }
  }

  test("a hash-layout table ADOPTS a transform (and a transformed " +
      "table adopts the layout via rebucket) — both end composed") {
    val base = freshBase()
    // hash-first, transform adopted
    GraftTable.create(spark, s"$base/a", rows(3000), "k", nBuckets = 4,
      hashLayout = true)
    GraftTable.setPartitioning(spark, s"$base/a", DaysPartition("ts"))
    GraftTable.upsert(spark, s"$base/a",
      rows(3000).filter($"k" % 50 === 1).withColumn("v", lit(-2L)), "k")
    val aV = GraftTable.latestVersion(spark, s"$base/a")
    assert(GraftTable.hashLayout(spark, s"$base/a", aV) === Some(4))
    assert(GraftTable.partitionSpec(spark, s"$base/a", aV).isDefined)
    assert(GraftTable.snapshotFileLedger(spark, s"$base/a", aV)
      .forall(e => GraftTable.fileBucket(e._1).isDefined))
    // transform-first, layout adopted via SET LAYOUT HASH BUCKETS
    GraftTable.create(spark, s"$base/b", rows(3000), "k", nBuckets = 4,
      partitioning = Some(DaysPartition("ts")))
    GraftTable.setHashBuckets(spark, s"$base/b", "k", 8)
    val bV = GraftTable.latestVersion(spark, s"$base/b")
    assert(GraftTable.hashLayout(spark, s"$base/b", bV) === Some(8))
    assert(GraftTable.snapshotFileLedger(spark, s"$base/b", bV)
      .forall(e => GraftTable.fileBucket(e._1).isDefined))
    // content survives both adoptions
    assert(GraftTable.read(spark, s"$base/b")
      .agg(sum(xxhash64($"k", $"v"))).first().getLong(0) ===
      rows(3000).agg(sum(xxhash64($"k", $"v"))).first().getLong(0))
  }
}
