package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** NON-INTEGRAL (string) table keys — the hash-ledger mode real CDC
  * streams need (UUID / natural-identifier keys): per-file stats hold
  * xxhash64(key), files range-bucket by hash (narrow disjoint
  * intervals → sharp point pruning), and EVERY row-level operation
  * still compares the raw key — a hash collision can cost an extra
  * file read, never a wrong row. */
class GraftStringKeySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_strkey_spec").toString

  /** uuid-ish string keys over a deterministic domain */
  private def rows(n: Int): DataFrame =
    spark.range(1, n + 1).select(
      concat(lit("id-"), lpad(conv(col("id") * 2654435761L, 10, 16), 12, "0"))
        .as("k"),
      (col("id") % 20).as("g"),
      (col("id") * 7).as("v"))

  private def sortedTuples(df: DataFrame): Seq[(String, Long, Long)] =
    df.select("k", "g", "v").as[(String, Long, Long)].collect().toSeq.sorted

  test("create + read round-trips; the ledger is hash-mode; point " +
      "probes open a small fraction of the files") {
    val d = freshDir()
    val data = rows(4000)
    GraftTable.create(spark, s"$d/t", data, "k", nBuckets = 8)
    assert(GraftTable.keyColumn(spark, s"$d/t").contains("k"))
    assert(sortedTuples(GraftTable.read(spark, s"$d/t")) ===
      sortedTuples(data))
    val all = GraftTable.snapshotFileLedger(spark, s"$d/t", 0).size
    assert(all >= 8, s"expected >= 8 range-bucketed files, got $all")
    val probe = data.select("k").as[String].head()
    val opened = GraftTable.prunedFileCountKeysAny(spark, s"$d/t", Seq(probe))
    assert(opened <= math.max(1, all / 4),
      s"a point probe opened $opened of $all files — hash range " +
        "bucketing should keep stat intervals narrow")
    // the typed point read returns exactly the filter-equivalent rows
    val got = GraftTable.readPointKeys(spark, s"$d/t", "k", Seq(probe))
    assert(sortedTuples(got) === sortedTuples(data.filter($"k" === probe)))
  }

  test("readRange refuses over a hash-ledgered key") {
    val d = freshDir()
    GraftTable.create(spark, s"$d/t", rows(50), "k", nBuckets = 2)
    val e = intercept[IllegalArgumentException] {
      GraftTable.readRange(spark, s"$d/t", "k", 0L, 10L)
    }
    assert(e.getMessage.contains("hash-ledgered"))
  }

  test("CoW upsert merges by the RAW key: updates win, inserts land, " +
      "untouched rows carry") {
    val d = freshDir()
    val data = rows(2000)
    GraftTable.create(spark, s"$d/t", data, "k", nBuckets = 4)
    val batch = data.filter($"g" === 3).withColumn("v", $"v" + 100000L)
      .unionByName(Seq(("brand-new-key", 99L, 1L)).toDF("k", "g", "v"))
    GraftTable.upsert(spark, s"$d/t", batch, "k")
    val want = data.filter($"g" =!= 3)
      .unionByName(data.filter($"g" === 3).withColumn("v", $"v" + 100000L))
      .unionByName(Seq(("brand-new-key", 99L, 1L)).toDF("k", "g", "v"))
    assert(sortedTuples(GraftTable.read(spark, s"$d/t")) ===
      sortedTuples(want))
  }

  test("CDC apply (CoW and MoR): upsert/replace/delete by raw key " +
      "converge to the same relational answer") {
    Seq("cow", "dv").foreach { mode =>
      val d = freshDir()
      val data = rows(1500)
      GraftTable.create(spark, s"$d/t", data, "k", nBuckets = 4)
      GraftTable.setTableProperty(spark, s"$d/t", "graft.dml.mode", mode)
      val ups = data.filter($"g" === 5).withColumn("v", lit(-1L))
        .withColumn("_op", lit("upsert"))
      val dels = data.filter($"g" === 7)
        .withColumn("_op", lit("delete"))
      val ins = Seq(("fresh-1", 50L, 5L), ("fresh-2", 51L, 6L))
        .toDF("k", "g", "v").withColumn("_op", lit("replace"))
      GraftTable.applyCdcBatch(spark, s"$d/t",
        ups.unionByName(dels).unionByName(ins), "k")
      val want = data.filter($"g" =!= 5 && $"g" =!= 7)
        .unionByName(data.filter($"g" === 5).withColumn("v", lit(-1L)))
        .unionByName(Seq(("fresh-1", 50L, 5L), ("fresh-2", 51L, 6L))
          .toDF("k", "g", "v"))
      assert(sortedTuples(GraftTable.read(spark, s"$d/t")) ===
        sortedTuples(want), s"mode=$mode diverged")
    }
  }

  test("equality deletes on string keys: append-only upsert retires " +
      "raw keys; resolveEqDels converts to DVs; content unchanged") {
    val d = freshDir()
    val data = rows(1200)
    GraftTable.create(spark, s"$d/t", data, "k", nBuckets = 4)
    // CDC batch: re-key 1/5 of the rows to new values, delete a slice
    val repl = data.filter($"g" === 4).withColumn("v", $"v" * 10L)
      .withColumn("_op", lit("replace"))
    val dels = data.filter($"g" === 9).withColumn("_op", lit("delete"))
    val (v1, nKeys) = GraftTable.appendUpsert(spark, s"$d/t",
      repl.unionByName(dels), "k", opCol = Some("_op"))
    assert(v1 === 1 && nKeys > 0)
    assert(GraftTable.hasLiveEqDels(spark, s"$d/t", 1))
    val want = data.filter($"g" =!= 4 && $"g" =!= 9)
      .unionByName(data.filter($"g" === 4).withColumn("v", $"v" * 10L))
    assert(sortedTuples(GraftTable.read(spark, s"$d/t")) ===
      sortedTuples(want), "pending-eqdel read must mask by raw key")
    // resolution pays the deferred read once; content identical after
    val (v2, touched, resolved) =
      GraftTable.resolveEqDels(spark, s"$d/t", "k")
    assert(v2 === 2 && touched > 0 && resolved > 0)
    assert(!GraftTable.hasLiveEqDels(spark, s"$d/t", 2))
    assert(sortedTuples(GraftTable.read(spark, s"$d/t")) ===
      sortedTuples(want))
    // the SQL scan path masks identically (executor-side key sets)
    val cat = "gsk" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", d)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t")
      .as[Long].head() === want.count())
  }

  test("SQL scan under PENDING eqdels masks by raw string key " +
      "(executor-side key sets, no resolve)") {
    val d = freshDir()
    val data = rows(800)
    GraftTable.create(spark, s"$d/t", data, "k", nBuckets = 4)
    val dels = data.filter($"g" === 2).withColumn("_op", lit("delete"))
    GraftTable.appendUpsert(spark, s"$d/t", dels, "k", opCol = Some("_op"))
    val cat = "gskp" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", d)
    assert(GraftTable.hasLiveEqDels(spark, s"$d/t", 1))
    assert(spark.sql(s"SELECT sum(v) AS s FROM $cat.t").as[Long].head() ===
      data.filter($"g" =!= 2).agg(sum("v")).as[Long].head())
  }

  test("string keys with tab/newline refuse at the eqdel ingest") {
    val d = freshDir()
    GraftTable.create(spark, s"$d/t", rows(50), "k", nBuckets = 2)
    val bad = Seq(("evil\tkey", 1L, 1L)).toDF("k", "g", "v")
    val e = intercept[IllegalArgumentException] {
      GraftTable.appendUpsert(spark, s"$d/t", bad, "k")
    }
    assert(e.getMessage.contains("tab/newline"))
  }

  test("hash layout on a string key: zero-exchange SPJ join and " +
      "bucket-pruned SQL point lookup") {
    val d = freshDir()
    val left = rows(3000)
    val right = rows(3000).withColumnRenamed("v", "w").drop("g")
    GraftTable.create(spark, s"$d/l", left, "k", nBuckets = 8,
      hashLayout = true)
    GraftTable.create(spark, s"$d/r", right, "k", nBuckets = 8,
      hashLayout = true)
    val cat = "gskh" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", d)
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
      assert(smjs.nonEmpty, "expected a sort-merge join")
      assert(smjs.forall(_.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e
      }.isEmpty), "SPJ on a string key must run with zero exchanges " +
        "under the join")
      val want = left.as("l")
        .join(right.as("r"), $"l.k" === $"r.k")
        .groupBy($"l.g".as("g"))
        .agg(count(lit(1)).as("n"), sum($"l.v" + $"r.w").as("s"))
        .orderBy("g").collect().toSeq
      assert(got === want)
      // bucket-pruned point lookup: 1 key → ~1/8 of the files
      val all = GraftTable.snapshotFileLedger(spark, s"$d/l", 0).size
      val probe = left.select("k").as[String].head()
      val one = GraftTable.prunedFileCountKeysAny(spark, s"$d/l", Seq(probe))
      assert(all >= 8 && one <= math.max(1, all / 4),
        s"point probe opened $one of $all bucketed files")
      assert(spark.sql(
        s"SELECT v FROM $cat.l WHERE k = '$probe'").as[Long].head() ===
        left.filter($"k" === probe).select("v").as[Long].head())
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("shallow clone carries the hash-ledger marker; merge-on-read " +
      "delete + optimize keep raw-key content") {
    val d = freshDir()
    val data = rows(900)
    GraftTable.create(spark, s"$d/t", data, "k", nBuckets = 4)
    GraftTable.cloneTable(spark, s"$d/t", s"$d/c")
    assert(GraftTable.keyColumn(spark, s"$d/c").contains("k"))
    // the clone's own upsert must probe in the HASH domain — wrong
    // mode would mis-prune against the inherited hash stats
    GraftTable.upsert(spark, s"$d/c",
      data.filter($"g" === 1).withColumn("v", lit(0L)), "k")
    val wantC = data.filter($"g" =!= 1)
      .unionByName(data.filter($"g" === 1).withColumn("v", lit(0L)))
    assert(sortedTuples(GraftTable.read(spark, s"$d/c")) ===
      sortedTuples(wantC))
    // DV delete + optimize on the original
    GraftTable.deleteWhereDv(spark, s"$d/t", $"g" === 6)
    val want = data.filter($"g" =!= 6)
    assert(sortedTuples(GraftTable.read(spark, s"$d/t")) ===
      sortedTuples(want))
    GraftTable.optimize(spark, s"$d/t", "k", targetRows = 1000000L)
    assert(sortedTuples(GraftTable.read(spark, s"$d/t")) ===
      sortedTuples(want))
  }
}
