package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Leaf-column file skipping (round 17, the Delta default): every
  * write ledgers per-file [min, max] for every integral/date/timestamp
  * non-key column (plus the existing per-column null counts), and the
  * scan prunes files on predicates over ANY such column — not just the
  * key, Z-order, transform, or declared bloom columns. */
class GraftLeafStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_leafstats_spec").toString + "/t"

  /** v correlates with k, so key-ranged files carry narrow v ranges;
    * ts ascends with k; nv is NULL for the low-key files. */
  private def rows(n: Int) = spark.range(1, n + 1).select(
    $"id".as("k"),
    ($"id" * 3).as("v"),
    timestamp_seconds($"id" * 3600).as("ts"),
    to_date(timestamp_seconds($"id" * 86400)).as("d"),
    when($"id" <= 2500, lit(null).cast("long")).otherwise($"id").as("nv"))

  private def pruned(root: String,
      colRanges: Map[String, (Long, Long)] = Map.empty,
      isNull: Set[String] = Set.empty,
      isNotNull: Set[String] = Set.empty): Int =
    GraftTable.snapshotFilesWithDvs(spark, root,
      GraftTable.latestVersion(spark, root),
      colRanges = colRanges, isNullCols = isNull,
      isNotNullCols = isNotNull).size

  test("an integral secondary-column range predicate prunes to the " +
      "covering files; results stay exact (SQL end to end)") {
    val base = Files.createTempDirectory("graft_leafstats_sql").toString
    val root = s"$base/t"
    GraftTable.create(spark, root, rows(20000), "k", nBuckets = 8)
    val all = pruned(root)
    assert(all >= 8)
    // v = 3k ∈ [3, 60000]; one narrow slice should hit ~1 of 8 files
    val few = pruned(root, colRanges = Map("v" -> (9000L, 9300L)))
    assert(few <= math.max(1, all / 4),
      s"v-range should prune to a few files, opened $few of $all")
    // a no-op interval keeps everything (never wrongly prunes)
    assert(pruned(root, colRanges = Map("v" -> (Long.MinValue,
      Long.MaxValue))) === all)
    // end to end through the SQL scan: same rows as an unpruned filter
    val cat = "glfs" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val got = spark.sql(
      s"SELECT k, v FROM $cat.t WHERE v >= 9000 AND v <= 9300")
      .as[(Long, Long)].collect().toSeq.sorted
    val want = rows(20000).filter($"v" >= 9000 && $"v" <= 9300)
      .select("k", "v").as[(Long, Long)].collect().toSeq.sorted
    assert(got === want && got.nonEmpty)
  }

  test("timestamp and date predicates prune through their epoch-domain " +
      "ledgers") {
    val root = freshRoot()
    GraftTable.create(spark, root, rows(20000), "k", nBuckets = 8)
    val all = pruned(root)
    // one hour-window = one slice of the ascending ts domain
    val tsLo = 9000L * 3600L * 1000000L // epoch micros
    val tsHi = 9300L * 3600L * 1000000L
    val fewTs = pruned(root, colRanges = Map("ts" -> (tsLo, tsHi)))
    assert(fewTs <= math.max(1, all / 4), s"ts pruned to $fewTs of $all")
    val fewD = pruned(root, colRanges = Map("d" -> (9000L, 9100L)))
    assert(fewD <= math.max(1, all / 4), s"d pruned to $fewD of $all")
  }

  test("IS NULL prunes null-free files; IS NOT NULL prunes all-NULL " +
      "files; a DV'd file still prunes soundly") {
    val base = Files.createTempDirectory("graft_leafstats_null").toString
    val root = s"$base/t"
    GraftTable.create(spark, root, rows(20000), "k", nBuckets = 8)
    val all = pruned(root)
    // nv: NULL iff k <= 2500 — exactly the low-key file(s)
    val nullFiles = pruned(root, isNull = Set("nv"))
    assert(nullFiles <= math.max(1, all / 4),
      s"IS NULL opened $nullFiles of $all")
    val notNullFiles = pruned(root, isNotNull = Set("nv"))
    assert(notNullFiles < all, "all-NULL files must prune for IS NOT NULL")
    // correctness through SQL on both predicates
    val cat = "glfn" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.t WHERE nv IS NULL")
      .as[Long].head() === 2500L)
    assert(spark.sql(
      s"SELECT count(*) AS c FROM $cat.t WHERE nv IS NOT NULL")
      .as[Long].head() === 17500L)
    // DV some rows out of the v-slice files, then re-check exactness
    GraftTable.deleteWhereDv(spark, root, $"v" >= 9000 && $"v" <= 9150)
    val got = spark.sql(
      s"SELECT k FROM $cat.t WHERE v >= 9000 AND v <= 9300")
      .as[Long].collect().toSeq.sorted
    assert(got === (3051L to 3100L).toSeq, "DV-masked + pruned read " +
      "must serve exactly the live rows")
  }

  test("files written BEFORE the ledger existed are never skipped " +
      "(missing line = keep)") {
    val root = freshRoot()
    GraftTable.create(spark, root, rows(1000), "k", nBuckets = 2)
    // simulate a pre-ledger survivor by pruning on a column whose
    // stats we strip: use a column name that never ledgers (string)
    // — strings are unledgered, so any claimed range keeps everything
    val all = pruned(root)
    assert(pruned(root, colRanges = Map("nosuch" -> (0L, 1L))) === all)
  }


  test("min/max over ANY ledgered column serve from METADATA (not " +
      "just key/z-order/transform columns); all-NULL columns refuse " +
      "to metadata-serve but answer exactly") {
    val base = Files.createTempDirectory("graft_leafstats_agg").toString
    val root = s"$base/t"
    GraftTable.create(spark, root, rows(5000), "k", nBuckets = 4)
    val cat = "glfa" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val q = spark.sql(
      s"SELECT min(v) AS mn, max(v) AS mx, count(*) AS c FROM $cat.t")
    assert(q.queryExecution.executedPlan.toString
      .contains("servedAggregates"),
      "a secondary-column min/max must serve from the #minmax ledger")
    assert(q.as[(Long, Long, Long)].head() === ((3L, 15000L, 5000L)))
    // nv is NULL for k <= 2500: min/max still exact through the mixed
    // (some files all-NULL) ledger
    val q2 = spark.sql(s"SELECT min(nv) AS mn, max(nv) AS mx FROM $cat.t")
    assert(q2.as[(Long, Long)].head() === ((2501L, 5000L)))
    // an entirely-NULL column: metadata refuses, the scan answers NULL
    GraftTable.create(spark, s"$base/allnull",
      spark.range(1, 100).select($"id".as("k"),
        lit(null).cast("long").as("z")), "k", nBuckets = 2)
    assert(spark.sql(s"SELECT min(z) AS mn FROM $cat.allnull")
      .collect()(0).isNullAt(0))
  }
}
