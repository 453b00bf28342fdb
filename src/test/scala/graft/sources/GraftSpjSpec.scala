package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** HASH LAYOUT + STORAGE-PARTITIONED JOINS.
  *
  * A table created with `hashLayout = true` lands every row in the
  * file of its `pmod(xxhash64(key as long), n)` bucket — mono-bucket
  * files under `data/vNNNNN-x/b<id>/` — and the DSv2 scan reports
  * `KeyGroupedPartitioning(bucket(n, key))`. Two co-layout tables then
  * join with ZERO exchanges on either side (Spark's SPJ), and an
  * equality lookup prunes to the one bucket's files. These specs pin
  * the physical contract (mono-bucket files), the plan (no Exchange,
  * no Broadcast), the answers (vs plain computation), and the
  * layout's survival across the DML/maintenance surface. */
class GraftSpjSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(): String =
    Files.createTempDirectory("graft_spj_spec").toString

  private def mkHash(root: String, n: Int, rows: Int,
      buckets: Int = 4): Unit =
    GraftTable.create(spark, root,
      spark.range(1, rows + 1).select(
        $"id".as("k"), concat(lit("r"), $"id").as("name"),
        ($"id" * 7).as("v")),
      "k", nBuckets = buckets, hashLayout = true)

  private def bucketConfs[T](f: => T): T = {
    val pairs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hash layout writes mono-bucket files whose path names the bucket") {
    val root = freshBase() + "/t"
    mkHash(root, n = 4, rows = 500)
    val files = GraftTable.snapshotFilesWithDvs(spark, root, 0)
    assert(files.nonEmpty)
    // every file sits under a b<id>/ segment
    assert(files.forall(t =>
      GraftTable.fileBucket(t._1.getPath.toUri.getPath).isDefined))
    // and holds ONLY rows hashing to that bucket
    files.foreach { t =>
      val p = t._1.getPath.toUri.getPath
      val b = GraftTable.fileBucket(p).get
      val got = spark.read.parquet(p)
        .select(pmod(xxhash64($"k".cast("long")), lit(4)).cast("int"))
        .distinct().as[Int].collect().toSeq
      assert(got == Seq(b), s"file $p holds buckets $got")
    }
    // content identical to an equivalent range-layout table
    assert(GraftTable.read(spark, root).orderBy("k").collect().toSeq ===
      spark.range(1, 501).select($"id".as("k"),
        concat(lit("r"), $"id").as("name"), ($"id" * 7).as("v"))
        .orderBy("k").collect().toSeq)
  }

  test("co-bucketed SQL join runs with ZERO exchanges and exact results") {
    val base = freshBase()
    mkHash(base + "/a", n = 4, rows = 400)
    mkHash(base + "/b", n = 4, rows = 300)
    spark.conf.set("spark.sql.catalog.gspj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj.base", base)
    bucketConfs {
      val j = spark.sql(
        "SELECT a.k, a.v AS av, b.v AS bv FROM gspj.a a " +
          "JOIN gspj.b b ON a.k = b.k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join must not shuffle either side:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        "broadcast disabled: the shuffle-free plan must be the SPJ")
      val rows = j.collect().sortBy(_.getLong(0))
      assert(rows.length === 300)
      assert(rows.forall(r => r.getLong(1) == r.getLong(0) * 7 &&
        r.getLong(2) == r.getLong(0) * 7))
    }
  }

  test("equality lookup prunes to the key's single bucket") {
    val root = freshBase() + "/t"
    mkHash(root, n = 8, rows = 2000, buckets = 8)
    val all = GraftTable.snapshotFilesWithDvs(spark, root, 0)
    val hit = GraftTable.snapshotFilesWithDvs(spark, root, 0,
      keyRange = Some((1234L, 1234L)))
    assert(all.size >= 8)
    assert(hit.size < all.size)
    val wantB = GraftTable.bucketOfKey(1234L, 8)
    assert(hit.forall(t =>
      GraftTable.fileBucket(t._1.getPath.toUri.getPath).contains(wantB)))
    // runtime key SETS prune to their buckets' union the same way
    val hit2 = GraftTable.snapshotFilesWithDvs(spark, root, 0,
      keyValues = Some(Array(10L, 20L, 30L)))
    val wantBs = Set(10L, 20L, 30L).map(GraftTable.bucketOfKey(_, 8))
    assert(hit2.forall(t => wantBs.contains(
      GraftTable.fileBucket(t._1.getPath.toUri.getPath).get)))
    // and the SQL answer through the scan stays exact
    val base = new java.io.File(root).getParent
    spark.conf.set("spark.sql.catalog.gspj2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj2.base", base)
    assert(spark.sql("SELECT name FROM gspj2.t WHERE k = 1234")
      .as[String].head() === "r1234")
  }

  test("DML keeps the layout: MoR DELETE + upsert stay mono-bucket and SPJ-joinable") {
    val base = freshBase()
    mkHash(base + "/a", n = 4, rows = 400)
    mkHash(base + "/b", n = 4, rows = 400)
    // MoR delete on one side (DVs), CoW-ish upsert on the other
    GraftTable.deleteWhereDv(spark, base + "/a", $"k" > 350)
    GraftTable.upsert(spark, base + "/b",
      Seq((5L, "upd", -1L)).toDF("k", "name", "v"), "k")
    // every live file still parses a bucket
    val la = GraftTable.latestVersion(spark, base + "/a")
    val lb = GraftTable.latestVersion(spark, base + "/b")
    val fa = GraftTable.snapshotFilesWithDvs(spark, base + "/a", la)
    assert(fa.forall(t =>
      GraftTable.fileBucket(t._1.getPath.toUri.getPath).isDefined))
    assert(fa.exists(_._2.nonEmpty), "the DV delete must have left a DV")
    assert(GraftTable.snapshotFilesWithDvs(spark, base + "/b", lb)
      .forall(t => GraftTable.fileBucket(t._1.getPath.toUri.getPath).isDefined))
    spark.conf.set("spark.sql.catalog.gspj3", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj3.base", base)
    bucketConfs {
      val j = spark.sql(
        "SELECT a.k, b.name AS bn FROM gspj3.a a JOIN gspj3.b b " +
          "ON a.k = b.k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"SPJ must survive DVs and rewrites:\n$plan")
      val rows = j.collect().sortBy(_.getLong(0))
      assert(rows.length === 350) // 400 minus the 50 deleted
      assert(rows.map(_.getLong(0)).toSeq === (1L to 350L))
      assert(rows.find(_.getLong(0) == 5L).get.getString(1) === "upd")
    }
  }

  test("OPTIMIZE (DV absorption) keeps the layout and the plan") {
    val base = freshBase()
    mkHash(base + "/t", n = 4, rows = 300)
    GraftTable.deleteWhereDv(spark, base + "/t", $"k".between(10, 40))
    val absorbed = GraftTable.absorbDvs(spark, base + "/t", "k")
    assert(absorbed._2 > 0, "at least one DV'd file must absorb")
    val v = GraftTable.latestVersion(spark, base + "/t")
    val fs2 = GraftTable.snapshotFilesWithDvs(spark, base + "/t", v)
    assert(fs2.forall(t =>
      GraftTable.fileBucket(t._1.getPath.toUri.getPath).isDefined))
    assert(fs2.forall(_._2.isEmpty))
    assert(GraftTable.read(spark, base + "/t").count() === 269)
  }

  test("refusals: z-order, non-integral key (transform now COMPOSES " +
      "with the layout — see GraftComposedLayoutSpec)") {
    val base = freshBase()
    // transform + layout at create COMPOSES since round 17: files stay
    // mono-bucket AND split along the transform — just prove it lands
    GraftTable.create(spark, base + "/x1",
      Seq((1L, java.sql.Date.valueOf("2024-01-01"))).toDF("k", "d"),
      "k", partitioning = Some(DaysPartition("d")), hashLayout = true)
    assert(GraftTable.hashLayout(spark, base + "/x1").isDefined &&
      GraftTable.partitionSpec(spark, base + "/x1",
        GraftTable.latestVersion(spark, base + "/x1")).isDefined)
    // non-integral, non-string key (string keys hash-ledger since
    // round 16 — see GraftStringKeySpec)
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, base + "/x2",
        Seq((1.5, 1L)).toDF("k", "v"), "k", hashLayout = true)
    }
    mkHash(base + "/t", n = 4, rows = 100)
    // z-order rewrite
    intercept[IllegalArgumentException] {
      GraftTable.optimizeZOrder(spark, base + "/t", "k", "k", "v", 100L)
    }
  }

  test("partition-value mismatch: one side pruned to a bucket subset " +
      "still joins shuffle-free (pushPartValues fills the gaps)") {
    val base = freshBase()
    mkHash(base + "/a", n = 8, rows = 800, buckets = 8)
    mkHash(base + "/b", n = 8, rows = 800, buckets = 8)
    spark.conf.set("spark.sql.catalog.gspj6", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj6.base", base)
    bucketConfs {
      // the IN list statically prunes side a to ≤3 buckets; side b
      // keeps all 8 — partition values diverge and
      // pushPartValues.enabled must reconcile them without a shuffle
      val j = spark.sql(
        "SELECT a.k, b.v AS bv FROM gspj6.a a JOIN gspj6.b b " +
          "ON a.k = b.k WHERE a.k IN (10, 20, 30)")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-subset SPJ must not shuffle:\n$plan")
      val rows = j.collect().sortBy(_.getLong(0))
      assert(rows.map(_.getLong(0)).toSeq === Seq(10L, 20L, 30L))
      assert(rows.forall(r => r.getLong(1) == r.getLong(0) * 7))
    }
  }

  test("GROUP BY on the layout key aggregates without a shuffle") {
    val base = freshBase()
    mkHash(base + "/t", n = 4, rows = 600)
    spark.conf.set("spark.sql.catalog.gspj5", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj5.base", base)
    bucketConfs {
      val a = spark.sql(
        "SELECT k, sum(v) AS sv, count(*) AS n FROM gspj5.t GROUP BY k")
      val plan = a.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"key-grouped storage satisfies the aggregation's distribution:\n" +
          plan)
      val rows = a.collect()
      assert(rows.length === 600)
      assert(rows.forall(r => r.getLong(1) == r.getLong(0) * 7 &&
        r.getLong(2) == 1L))
    }
  }

  test("equality deletes on a hash table: pending keys mask through " +
      "the SPJ read; resolution restores the clean plan") {
    val base = freshBase()
    mkHash(base + "/a", n = 4, rows = 300)
    mkHash(base + "/b", n = 4, rows = 300)
    // append-only upsert: fresh bucketed files + a pending key list
    GraftTable.appendUpsert(spark, base + "/a",
      Seq((7L, "eq7", -7L), (301L, "new301", 1L)).toDF("k", "name", "v"),
      "k")
    spark.conf.set("spark.sql.catalog.gspj7", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj7.base", base)
    bucketConfs {
      val j = spark.sql("SELECT a.k, a.name AS an FROM gspj7.a a " +
        "JOIN gspj7.b b ON a.k = b.k")
      // the eqdel-masked split still carries its bucket key: the join
      // stays shuffle-free even while keys pend
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"SPJ must survive pending equality deletes:\n$plan")
      val rows = j.collect().sortBy(_.getLong(0))
      assert(rows.length === 300) // 301 is not in b
      assert(rows.find(_.getLong(0) == 7L).get.getString(1) === "eq7",
        "the eqdel upsert's postimage must serve; the retired row must not")
    }
    // resolve + absorb: layout intact, content identical
    GraftTable.resolveEqDels(spark, base + "/a", "k")
    GraftTable.absorbDvs(spark, base + "/a", "k")
    val v = GraftTable.latestVersion(spark, base + "/a")
    assert(GraftTable.snapshotFilesWithDvs(spark, base + "/a", v).forall(t =>
      GraftTable.fileBucket(t._1.getPath.toUri.getPath).isDefined))
    assert(GraftTable.read(spark, base + "/a")
      .filter($"k" === 7).select("name").as[String].head() === "eq7")
  }

  test("change feed over a hash table: the CDC stream a replica " +
      "replays is exact across bucketed rewrites") {
    val base = freshBase()
    mkHash(base + "/t", n = 4, rows = 200)
    GraftTable.upsert(spark, base + "/t",
      Seq((5L, "u5", -5L), (201L, "new", 1L)).toDF("k", "name", "v"), "k")
    GraftTable.deleteWhereDv(spark, base + "/t", $"k" === 10)
    val feed = GraftTable.changes(spark, base + "/t", 0, 2, "k")
    val byOp = feed.groupBy("_change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp.getOrElse("insert", 0L) === 1L)
    assert(byOp.getOrElse("update", 0L) === 1L)
    assert(byOp.getOrElse("delete", 0L) === 1L)
    assert(feed.filter($"_change" === "update")
      .select("name").as[String].head() === "u5")
  }

  test("metadata-served aggregates and SQL CREATE carry the layout") {
    val base = freshBase()
    spark.conf.set("spark.sql.catalog.gspj4", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj4.base", base)
    spark.sql("CREATE TABLE gspj4.h (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('key' = 'k', 'buckets' = '4', 'layout' = 'hash')")
    spark.sql("INSERT INTO gspj4.h SELECT id AS k, id * 3 AS v " +
      "FROM range(1, 201)")
    assert(GraftTable.hashLayout(spark, base + "/h") === Some(4))
    val v = GraftTable.latestVersion(spark, base + "/h")
    assert(GraftTable.snapshotFilesWithDvs(spark, base + "/h", v)
      .forall(t => GraftTable.fileBucket(t._1.getPath.toUri.getPath).isDefined))
    // metadata-served count over the bucketed layout stays exact
    assert(spark.sql("SELECT count(*) FROM gspj4.h").as[Long].head() === 200)
    assert(spark.sql("SELECT sum(v) FROM gspj4.h").as[Long].head() ===
      (1L to 200L).map(_ * 3).sum)
    // the layout surfaces in $properties (DESCRIBE-style tooling)
    assert(spark.sql("SELECT value FROM gspj4.`h$properties` " +
      "WHERE property = 'graft.layout'").as[String].head() === "hash(4)")
  }
}
