package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** MULTI-COLUMN and GRAIN group keys for materialized views — the
  * reference's own cube shape (time×product×location) — plus the
  * provably-safe rewrite widening: residual conjuncts over bare group
  * columns post-filter the MV read. */
class GraftMvMultiSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_mv_multi_spec").toString

  /** 4 rows per calendar day, 8 customers. */
  private def src(n: Int): DataFrame = spark.range(1, n + 1).select(
    $"id".as("k"),
    ($"id" % 8).as("cust"),
    timestamp_seconds($"id" * 21600).as("ts"),
    ($"id" * 3).as("cents"))

  private def recompute(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.groupBy($"cust",
        floor(unix_timestamp($"ts").cast("double") / 86400.0).cast("long")
          .as("day"))
      .agg(count(lit(1)).as("n"), sum("cents").as("sv"))
      .select("cust", "day", "n", "sv")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted

  test("multi-column + grain group (cust, days(ts)): delta refresh " +
      "converges over upserts, inserts, deletes, group birth and death") {
    val d = freshDir()
    val data = src(400)
    GraftTable.create(spark, s"$d/src", data, "k", nBuckets = 2)
    GraftMv.createGrouped(spark, s"$d/mv", s"$d/src",
      Seq(MvGroup("cust", "cust"), MvGroup("day", "days(ts)")),
      Seq(MvAgg("count", "", "n"), MvAgg("sum", "cents", "sv")))
    // reprice, insert a new day, kill one (cust, day) group entirely
    GraftTable.upsert(spark, s"$d/src",
      data.filter($"k" % 13 === 2).withColumn("cents", lit(-5L)), "k")
    GraftTable.upsert(spark, s"$d/src",
      data.filter($"k" % 17 === 3)
        .withColumn("k", $"k" + 100000L)
        .withColumn("ts", timestamp_seconds(lit(999L * 86400))), "k")
    GraftTable.deleteWhere(spark, s"$d/src", $"k" <= 4, "k")
    val (_, dirty) = GraftMv.refresh(spark, s"$d/mv")
    assert(dirty > 0)
    assert(GraftMv.refresh(spark, s"$d/mv")._2 === 0L, "no-op must be free")
    val got = GraftMv.read(spark, s"$d/mv")
      .select("cust", "day", "n", "sv")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === recompute(GraftTable.read(spark, s"$d/src")))
  }

  test("multi-group min/max: dirty-tuple re-aggregation surfaces the " +
      "runner-up per (cust, day)") {
    val d = freshDir()
    val data = src(200)
    GraftTable.create(spark, s"$d/src", data, "k", nBuckets = 2)
    GraftMv.createGrouped(spark, s"$d/mvm", s"$d/src",
      Seq(MvGroup("cust", "cust"), MvGroup("day", "days(ts)")),
      Seq(MvAgg("max", "cents", "mx"), MvAgg("min", "cents", "mn")))
    // delete each (cust, day)'s current maximum row: k ≡ 3 (mod 4) is
    // the largest id of each day-quarter — drop a slice of them
    GraftTable.deleteWhere(spark, s"$d/src",
      $"k" % 4 === 3 && $"k" < 100, "k")
    GraftMv.refresh(spark, s"$d/mvm")
    val got = GraftMv.read(spark, s"$d/mvm")
      .select("cust", "day", "mx", "mn")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val want = GraftTable.read(spark, s"$d/src")
      .groupBy($"cust",
        floor(unix_timestamp($"ts").cast("double") / 86400.0).cast("long")
          .as("day"))
      .agg(max("cents").as("mx"), min("cents").as("mn"))
      .select("cust", "day", "mx", "mn")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === want)
  }

  test("SQL surface: CREATE MATERIALIZED VIEW ... GROUP BY cust, " +
      "days(ts) — grain aliased in the select list; REFRESH converges") {
    val d = freshDir()
    val data = src(300)
    GraftTable.create(spark, s"$d/src", data, "k", nBuckets = 2)
    val cat = "gmvm" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", d)
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mv AS " +
      s"SELECT cust, days(ts) AS day, count(*) AS n, sum(cents) AS sv " +
      s"FROM $cat.src GROUP BY cust, days(ts)")
    GraftTable.upsert(spark, s"$d/src",
      data.filter($"k" % 11 === 5).withColumn("cents", lit(7L)), "k")
    val dirty = spark.sql(s"REFRESH MATERIALIZED VIEW $cat.mv")
      .collect()(0).getLong(1)
    assert(dirty > 0)
    val got = GraftMv.read(spark, s"$d/mv")
      .select("cust", "day", "n", "sv")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === recompute(GraftTable.read(spark, s"$d/src")))
    // a grain group missing its select-list alias refuses loudly
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"CREATE MATERIALIZED VIEW $cat.mv2 AS " +
        s"SELECT cust, count(*) AS n FROM $cat.src GROUP BY cust, days(ts)")
    }
    assert(e.getMessage.contains("alias"))
  }

  test("transparent rewrite serves a multi-column (bare) grouping " +
      "set in any order; group-count mismatch never rewrites") {
    val d = freshDir()
    val data = src(300).withColumn("region", $"k" % 3)
    GraftTable.create(spark, s"$d/src", data, "k", nBuckets = 2)
    GraftMv.createGrouped(spark, s"$d/mv", s"$d/src",
      Seq(MvGroup("cust", "cust"), MvGroup("region", "region")),
      Seq(MvAgg("count", "", "n"), MvAgg("sum", "cents", "sv")))
    val cat = "gmvr2" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", d)
    spark.conf.set("spark.graft.mv.rewrite.views", s"$d/mv")
    try {
      // REVERSED group order in the query — grouping sets are sets
      val q = spark.sql(s"SELECT region, cust, count(*) AS c, " +
        s"sum(cents) AS s FROM $cat.src GROUP BY region, cust")
      assert(q.queryExecution.executedPlan.toString.contains(s"$d/mv"))
      val want = data.groupBy("region", "cust")
        .agg(count(lit(1)).as("c"), sum("cents").as("s"))
        .orderBy("region", "cust").collect().toSeq
      assert(q.orderBy("region", "cust").collect().toSeq === want)
      // grouping by a SUBSET serves by ROLLUP since round 17 — and
      // counts roll up as sum(n), never double-counting
      val q2 = spark.sql(
        s"SELECT cust, count(*) AS c FROM $cat.src GROUP BY cust")
      assert(q2.queryExecution.executedPlan.toString.contains(s"$d/mv"))
      assert(q2.orderBy("cust").collect().toSeq ===
        data.groupBy("cust").agg(count(lit(1)).as("c"))
          .orderBy("cust").collect().toSeq)
    } finally spark.conf.unset("spark.graft.mv.rewrite.views")
  }

  test("transparent rewrite matches a GRAIN group expression " +
      "(floor(unix_timestamp/86400)) and stays off when stale") {
    val d = freshDir()
    val data = src(300)
    GraftTable.create(spark, s"$d/src", data, "k", nBuckets = 2)
    GraftMv.createGrouped(spark, s"$d/mv", s"$d/src",
      Seq(MvGroup("cust", "cust"), MvGroup("day", "days(ts)")),
      Seq(MvAgg("count", "", "n"), MvAgg("sum", "cents", "sv")))
    val cat = "gmvr3" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", d)
    spark.conf.set("spark.graft.mv.rewrite.views", s"$d/mv")
    try {
      // 86400.0D: the D suffix keeps the division in DOUBLE — a bare
      // 86400.0 parses as DECIMAL in SQL and floors to a decimal,
      // which is a different (and differently-typed) expression than
      // the days() transform computes
      val grain = "floor(unix_timestamp(ts) / 86400.0D)"
      val q = spark.sql(s"SELECT cust, $grain AS day, count(*) AS c, " +
        s"sum(cents) AS s FROM $cat.src GROUP BY cust, $grain")
      assert(q.queryExecution.executedPlan.toString.contains(s"$d/mv"),
        "the grain grouping must serve from the MV:\n" +
          q.queryExecution.optimizedPlan.toString)
      val want = recompute(data)
      assert(q.select($"cust", $"day".cast("long"), $"c", $"s")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted === want)
      // stale: one more commit, same query — left alone
      GraftTable.upsert(spark, s"$d/src",
        data.limit(1).withColumn("k", lit(777777L)), "k")
      val q2 = spark.sql(s"SELECT cust, $grain AS day, count(*) AS c " +
        s"FROM $cat.src GROUP BY cust, $grain")
      assert(!q2.queryExecution.optimizedPlan.toString.contains(s"$d/mv"))
    } finally spark.conf.unset("spark.graft.mv.rewrite.views")
  }

  test("rewrite widening: extra conjuncts over BARE group columns " +
      "post-filter the MV read; anything else refuses") {
    val d = freshDir()
    val data = src(300)
    GraftTable.create(spark, s"$d/src", data, "k", nBuckets = 2)
    GraftMv.createGrouped(spark, s"$d/mv", s"$d/src",
      Seq(MvGroup("cust", "cust")),
      Seq(MvAgg("count", "", "n"), MvAgg("sum", "cents", "sv")))
    GraftMv.createGrouped(spark, s"$d/mvf", s"$d/src",
      Seq(MvGroup("cust", "cust")),
      Seq(MvAgg("count", "", "n")), filter = Some("cents > 60"))
    val cat = "gmvw" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", d)
    spark.conf.set("spark.graft.mv.rewrite.views", s"$d/mv,$d/mvf")
    try {
      // UNFILTERED MV + group-column WHERE → served with a post-filter
      val q = spark.sql(s"SELECT cust, count(*) AS c, sum(cents) AS s " +
        s"FROM $cat.src WHERE cust IN (2, 5, 7) GROUP BY cust")
      assert(q.queryExecution.executedPlan.toString.contains(s"$d/mv"),
        "group-column residual must serve from the MV")
      val want = data.filter($"cust".isin(2, 5, 7)).groupBy("cust")
        .agg(count(lit(1)).as("c"), sum("cents").as("s"))
        .orderBy("cust").collect().toSeq
      assert(q.orderBy("cust").collect().toSeq === want)
      // FILTERED MV + its own predicate + a group-column conjunct →
      // served from the filtered MV with the residual applied
      val q2 = spark.sql(s"SELECT cust, count(*) AS c FROM $cat.src " +
        s"WHERE cents > 60 AND cust = 3 GROUP BY cust")
      assert(q2.queryExecution.executedPlan.toString.contains(s"$d/mvf"),
        "filtered MV + group residual must serve:\n" +
          q2.queryExecution.optimizedPlan.toString)
      val want2 = data.filter($"cents" > 60 && $"cust" === 3)
        .groupBy("cust").agg(count(lit(1)).as("c")).collect().toSeq
      assert(q2.collect().toSeq === want2)
      // a NON-group-column residual must never serve
      val q3 = spark.sql(s"SELECT cust, count(*) AS c FROM $cat.src " +
        s"WHERE k % 2 = 0 GROUP BY cust")
      assert(q3.queryExecution.optimizedPlan.toString.contains(s"$cat.src"))
      // and a filtered MV whose predicate the query does NOT carry
      // must never serve, residual or not
      val q4 = spark.sql(s"SELECT cust, count(*) AS c FROM $cat.src " +
        s"WHERE cust = 3 GROUP BY cust")
      assert(!q4.queryExecution.optimizedPlan.toString.contains(s"$d/mvf"),
        "the filtered MV must not serve a query missing its predicate")
    } finally spark.conf.unset("spark.graft.mv.rewrite.views")
  }

  test("NULL group values (a grain over a nullable ts) refresh " +
      "correctly through BOTH planes — the encoded key joins where " +
      "a plain column join would treat NULL ≠ NULL") {
    val d = freshDir()
    // every 5th row has NULL ts → NULL day grain
    val data = src(200).withColumn("ts",
      when($"k" % 5 === 0, lit(null).cast("timestamp")).otherwise($"ts"))
    GraftTable.create(spark, s"$d/src", data, "k", nBuckets = 2)
    GraftMv.createGrouped(spark, s"$d/mv", s"$d/src",
      Seq(MvGroup("cust", "cust"), MvGroup("day", "days(ts)")),
      Seq(MvAgg("count", "", "n"), MvAgg("sum", "cents", "sv")))
    GraftMv.createGrouped(spark, s"$d/mvm", s"$d/src",
      Seq(MvGroup("cust", "cust"), MvGroup("day", "days(ts)")),
      Seq(MvAgg("max", "cents", "mx")))
    // mutate rows INSIDE the null-day groups and around them
    GraftTable.upsert(spark, s"$d/src",
      data.filter($"k" % 10 === 0).withColumn("cents", lit(-3L)), "k")
    GraftTable.deleteWhere(spark, s"$d/src", $"k" % 25 === 5, "k")
    GraftMv.refresh(spark, s"$d/mv")
    GraftMv.refresh(spark, s"$d/mvm")
    def want(agg: String): Seq[(Long, Option[Long], Long)] =
      GraftTable.read(spark, s"$d/src")
        .groupBy($"cust",
          floor(unix_timestamp($"ts").cast("double") / 86400.0)
            .cast("long").as("day"))
        .agg((if (agg == "n") count(lit(1)) else max("cents")).as("x"))
        .select("cust", "day", "x")
        .as[(Long, Option[Long], Long)].collect().toSeq.sorted
    assert(GraftMv.read(spark, s"$d/mv").select("cust", "day", "n")
      .as[(Long, Option[Long], Long)].collect().toSeq.sorted === want("n"),
      "delta plane diverged on NULL-day groups")
    assert(GraftMv.read(spark, s"$d/mvm").select("cust", "day", "mx")
      .as[(Long, Option[Long], Long)].collect().toSeq.sorted === want("mx"),
      "re-agg plane diverged on NULL-day groups")
    // and a second refresh is still a no-op (no phantom dirty tuples)
    assert(GraftMv.refresh(spark, s"$d/mv")._2 === 0L)
  }

  test("DROP MATERIALIZED VIEW removes definition + backing table, " +
      "un-arms the rewrite, refuses plain tables, allows re-create") {
    val d = freshDir()
    GraftTable.create(spark, s"$d/src", src(100), "k", nBuckets = 2)
    GraftMv.create(spark, s"$d/mv", s"$d/src", "cust",
      Seq(MvAgg("count", "", "n")))
    val cat = "gmvd" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", d)
    spark.conf.set("spark.graft.mv.rewrite.views", s"$d/mv")
    try {
      assert(spark.sql(s"SELECT cust, count(*) AS c FROM $cat.src " +
        "GROUP BY cust").queryExecution.executedPlan.toString
        .contains(s"$d/mv"))
      assert(spark.sql(s"DROP MATERIALIZED VIEW $cat.mv")
        .collect()(0).getInt(0) === 1)
      // the registered candidate stops resolving; the query re-plans
      // against the source — never an error
      val q = spark.sql(s"SELECT cust, count(*) AS c FROM $cat.src " +
        "GROUP BY cust")
      assert(!q.queryExecution.executedPlan.toString.contains(s"$d/mv"))
      assert(q.count() === 8)
      // a plain table refuses through the MV verb
      val e = intercept[Exception] {
        spark.sql(s"DROP MATERIALIZED VIEW $cat.src")
      }
      assert(e.getMessage.contains("refuses plain tables"))
      assert(GraftTable.read(spark, s"$d/src").count() === 100)
      // same path is re-creatable
      GraftMv.create(spark, s"$d/mv", s"$d/src", "cust",
        Seq(MvAgg("sum", "cents", "sv")))
      assert(GraftMv.read(spark, s"$d/mv").count() === 8)
    } finally spark.conf.unset("spark.graft.mv.rewrite.views")
  }

  test("composite MV key is exact tuple identity: adjacent string " +
      "group values never merge") {
    val d = freshDir()
    // groups ("ab","c") vs ("a","bc") — a naive concat would collide
    val data = Seq(
      (1L, "ab", "c", 10L), (2L, "a", "bc", 20L), (3L, "ab", "c", 30L))
      .toDF("k", "g1", "g2", "v")
    GraftTable.create(spark, s"$d/src", data, "k", nBuckets = 1)
    GraftMv.createGrouped(spark, s"$d/mv", s"$d/src",
      Seq(MvGroup("g1", "g1"), MvGroup("g2", "g2")),
      Seq(MvAgg("count", "", "n"), MvAgg("sum", "v", "sv")))
    val got = GraftMv.read(spark, s"$d/mv")
      .as[(String, String, Long, Long)].collect().toSeq.sorted
    assert(got === Seq(("a", "bc", 1L, 20L), ("ab", "c", 2L, 40L)))
    // and the delta plane keeps them apart
    GraftTable.upsert(spark, s"$d/src",
      Seq((4L, "a", "bc", 5L)).toDF("k", "g1", "g2", "v"), "k")
    GraftMv.refresh(spark, s"$d/mv")
    val got2 = GraftMv.read(spark, s"$d/mv")
      .as[(String, String, Long, Long)].collect().toSeq.sorted
    assert(got2 === Seq(("a", "bc", 2L, 25L), ("ab", "c", 2L, 40L)))
  }


  test("composite key injectivity: group values containing the " +
      "separator / NUL / escape char never merge distinct tuples") {
    val d = freshDir()
    val data = Seq(
      (1L, "a\u001Fb", "c", 10L),
      (2L, "a", "b\u001Fc", 20L), // would collide with row 1 unescaped
      (3L, "\u0000", "x", 5L),     // would collide with NULL unescaped
      (4L, null.asInstanceOf[String], "x", 7L),
      (5L, "a\u0010", "\u0010b", 9L)) // the escape char itself
      .toDF("k", "g1", "g2", "v")
    GraftTable.create(spark, s"$d/src", data, "k", nBuckets = 2)
    GraftMv.createGrouped(spark, s"$d/mv", s"$d/src",
      Seq(MvGroup("g1", "g1"), MvGroup("g2", "g2")),
      Seq(MvAgg("count", "", "n"), MvAgg("sum", "v", "sv")))
    def want() = GraftTable.read(spark, s"$d/src").groupBy("g1", "g2")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .as[(Option[String], Option[String], Long, Long)]
      .collect().toSeq.sorted
    def got() = GraftMv.read(spark, s"$d/mv")
      .as[(Option[String], Option[String], Long, Long)]
      .collect().toSeq.sorted
    assert(got().size === 5, "5 distinct tuples - no collision merging")
    assert(got() === want())
    // refresh plane: same-group insert, reprice, and a group death all
    // key through the SAME escaped encoding as create
    GraftTable.upsert(spark, s"$d/src",
      Seq((6L, "a\u001Fb", "c", 100L), (2L, "a", "b\u001Fc", -20L))
        .toDF("k", "g1", "g2", "v"), "k")
    GraftTable.deleteWhere(spark, s"$d/src", $"k" === 3L, "k")
    GraftMv.refresh(spark, s"$d/mv")
    assert(got() === want())
  }

  test("a single bare NULLABLE group keys through the encoded key: " +
      "NULL groups aggregate, delta-refresh, and die exactly") {
    val d = freshDir()
    val data = spark.range(1, 301).select(
      $"id".as("k"),
      when($"id" % 5 === 0, lit(null).cast("long"))
        .otherwise($"id" % 3).as("g"),
      ($"id" * 2).as("v"))
    GraftTable.create(spark, s"$d/src", data, "k", nBuckets = 2)
    GraftMv.create(spark, s"$d/mv", s"$d/src", "g",
      Seq(MvAgg("count", "", "n"), MvAgg("sum", "v", "sv"))) // delta plane
    GraftMv.create(spark, s"$d/mvx", s"$d/src", "g",
      Seq(MvAgg("max", "v", "mx"))) // re-aggregation plane
    def want() = GraftTable.read(spark, s"$d/src").groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .as[(Option[Long], Long, Long)].collect().toSeq.sorted
    def got() = GraftMv.read(spark, s"$d/mv")
      .as[(Option[Long], Long, Long)].collect().toSeq.sorted
    def wantX() = GraftTable.read(spark, s"$d/src").groupBy("g")
      .agg(max("v").as("mx"))
      .as[(Option[Long], Long)].collect().toSeq.sorted
    def gotX() = GraftMv.read(spark, s"$d/mvx")
      .as[(Option[Long], Long)].collect().toSeq.sorted
    assert(got() === want())
    assert(got().exists(_._1.isEmpty), "the NULL group must be served")
    assert(gotX() === wantX())
    // reprice rows of the NULL group (k % 10 == 0 implies k % 5 == 0)
    GraftTable.upsert(spark, s"$d/src",
      data.filter($"k" % 10 === 0).withColumn("v", lit(-3L)), "k")
    GraftMv.refresh(spark, s"$d/mv"); GraftMv.refresh(spark, s"$d/mvx")
    assert(got() === want()); assert(gotX() === wantX())
    // group DEATH: every NULL-group row deleted - the group vanishes
    GraftTable.deleteWhere(spark, s"$d/src", $"g".isNull, "k")
    GraftMv.refresh(spark, s"$d/mv"); GraftMv.refresh(spark, s"$d/mvx")
    assert(got() === want()); assert(gotX() === wantX())
    assert(!got().exists(_._1.isEmpty), "the NULL group died with its rows")
  }

  test("SQL grains with commas parse: GROUP BY truncate(w, col) " +
      "creates, refreshes, and serves") {
    val d = freshDir()
    val data = src(200)
    GraftTable.create(spark, s"$d/src", data, "k", nBuckets = 2)
    val cat = "gmvt" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", d)
    spark.sql(s"CREATE MATERIALIZED VIEW $cat.mvt AS " +
      s"SELECT truncate(100, cents) AS cb, count(*) AS n, " +
      s"sum(cents) AS sv FROM $cat.src GROUP BY truncate(100, cents)")
    def want() = GraftTable.read(spark, s"$d/src")
      .groupBy(PartitionTransform.parse("truncate(100,cents)")
        .valueCol.as("cb"))
      .agg(count(lit(1)).as("n"), sum("cents").as("sv"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    def got() = GraftMv.read(spark, s"$d/mvt")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got() === want())
    GraftTable.upsert(spark, s"$d/src",
      data.filter($"k" % 7 === 3).withColumn("cents", lit(12345L)), "k")
    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.mvt")
    assert(got() === want())
  }


  test("TIME-HIERARCHY rollup: an MV at (cust, days(ts)) serves " +
      "GROUP BY months(ts) / years(ts); truncate grains widen to " +
      "multiple widths; non-multiples refuse") {
    val d = freshDir()
    val data = src(400)
    GraftTable.create(spark, s"$d/src", data, "k", nBuckets = 2)
    GraftMv.createGrouped(spark, s"$d/mv", s"$d/src",
      Seq(MvGroup("cust", "cust"), MvGroup("day", "days(ts)")),
      Seq(MvAgg("count", "", "n"), MvAgg("sum", "cents", "sv")))
    GraftMv.createGrouped(spark, s"$d/mvt", s"$d/src",
      Seq(MvGroup("cb", "truncate(100,cents)")),
      Seq(MvAgg("count", "", "n")))
    val cat = "gmvh" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", d)
    spark.conf.set("spark.graft.mv.rewrite.views", s"$d/mv,$d/mvt")
    def served(q: DataFrame, mv: String): Boolean =
      q.queryExecution.executedPlan.toString.contains(s"$d/$mv")
    try {
      val t = spark.table(s"$cat.src")
      val months = PartitionTransform.parse("months(ts)").valueCol
      val years = PartitionTransform.parse("years(ts)").valueCol
      // months from a days-grain MV
      val q1 = t.groupBy($"cust", months.as("mon"))
        .agg(count(lit(1)).as("c"), sum($"cents").as("s"))
      assert(served(q1, "mv"), "months must roll up from the days MV")
      val want1 = data.groupBy($"cust", months.as("mon"))
        .agg(count(lit(1)).as("c"), sum($"cents").as("s"))
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      assert(q1.as[(Long, Long, Long, Long)].collect().toSeq.sorted
        === want1)
      // years, with cust rolled up too
      val q2 = t.groupBy(years.as("yr"))
        .agg(count(lit(1)).as("c"), sum($"cents").as("s"))
      assert(served(q2, "mv"), "years must roll up from the days MV")
      assert(q2.as[(Long, Long, Long)].collect().toSeq.sorted ===
        data.groupBy(years.as("yr"))
          .agg(count(lit(1)).as("c"), sum($"cents").as("s"))
          .as[(Long, Long, Long)].collect().toSeq.sorted)
      // truncate(100) widens to truncate(500)
      val t500 = PartitionTransform.parse("truncate(500,cents)").valueCol
      val q3 = t.groupBy(t500.as("cb")).agg(count(lit(1)).as("c"))
      assert(served(q3, "mvt"), "truncate(500) must widen truncate(100)")
      assert(q3.as[(Long, Long)].collect().toSeq.sorted ===
        data.groupBy(t500.as("cb")).agg(count(lit(1)).as("c"))
          .as[(Long, Long)].collect().toSeq.sorted)
      // a NON-multiple width must refuse (250 % 100 != 0)
      val t250 = PartitionTransform.parse("truncate(250,cents)").valueCol
      val q4 = t.groupBy(t250.as("cb")).agg(count(lit(1)).as("c"))
      assert(!served(q4, "mvt"), "truncate(250) must refuse")
      assert(q4.as[(Long, Long)].collect().toSeq.sorted ===
        data.groupBy(t250.as("cb")).agg(count(lit(1)).as("c"))
          .as[(Long, Long)].collect().toSeq.sorted)
    } finally spark.conf.unset("spark.graft.mv.rewrite.views")
  }
}
