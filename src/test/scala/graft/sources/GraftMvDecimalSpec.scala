package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** DECIMAL measures in materialized views: create derives the
  * (precision, scale) from the source column, maintains the exact
  * UNSCALED long ledger, and [[GraftMv.read]] reconstructs values at
  * exactly Spark's own aggregate result type — while FLOAT/DOUBLE and
  * over-wide decimals REFUSE at create (the old behavior silently
  * cast to long, truncating the reference's own DECIMAL(10,2)
  * measure). */
class GraftMvDecimalSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_mv_decimal_spec").toString

  /** keyed rows with an EXACT DECIMAL(10,2) price: cents/100 (the
    * double division is exact below 2^52 and the 2-digit cast lands on
    * the intended value), NULL on k%7==3. */
  private def src(n: Int) = spark.range(1, n + 1).select(
    $"id".as("k"),
    ($"id" % 13).as("g"),
    when($"id" % 7 === 3, lit(null))
      .otherwise(($"id" * 19 + 7).cast("double") / 100.0)
      .cast("decimal(10,2)").as("price"))

  private def recompute(root: String) =
    GraftTable.read(spark, root).groupBy("g")
      .agg(sum("price").as("rev"), min("price").as("lo"),
        max("price").as("hi"), avg("price").cast("double").as("ap"))

  test("create REFUSES a double measure and an over-wide decimal, " +
      "naming the column and the workaround") {
    val d = freshDir()
    GraftTable.create(spark, s"$d/src",
      spark.range(1, 50).select($"id".as("k"), ($"id" % 5).as("g"),
        ($"id" * 1.5).as("dv"),
        lit("1234567890123456789.12").cast("decimal(21,2)").as("wide")),
      "k", nBuckets = 1)
    val e1 = intercept[RuntimeException] {
      GraftMv.create(spark, s"$d/mv1", s"$d/src", "g",
        Seq(MvAgg("sum", "dv", "s")))
    }
    assert(e1.getMessage.contains("dv") &&
      e1.getMessage.toLowerCase.contains("cents"))
    val e2 = intercept[IllegalArgumentException] {
      GraftMv.create(spark, s"$d/mv2", s"$d/src", "g",
        Seq(MvAgg("max", "wide", "m")))
    }
    assert(e2.getMessage.contains("wide") && e2.getMessage.contains("18"))
    // neither refusal left a half-created MV behind
    val f = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!GraftMv.defExists(f, s"$d/mv1") &&
      !GraftMv.defExists(f, s"$d/mv2"))
  }

  test("a DECIMAL(10,2) measure serves EXACT sums/min/max at Spark's " +
      "own aggregate types, through create and delta refresh") {
    val d = freshDir()
    GraftTable.create(spark, s"$d/src", src(400), "k", nBuckets = 2)
    GraftMv.create(spark, s"$d/mv", s"$d/src", "g",
      Seq(MvAgg("sum", "price", "rev"), MvAgg("min", "price", "lo"),
        MvAgg("max", "price", "hi"), MvAgg("avg", "price", "ap")))
    val got0 = GraftMv.read(spark, s"$d/mv")
    // result types are the aggregate's own: sum → DECIMAL(20,2),
    // min/max → DECIMAL(10,2), avg → the engine's double quotient
    val byName = got0.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("rev") === org.apache.spark.sql.types.DecimalType(20, 2))
    assert(byName("lo") === org.apache.spark.sql.types.DecimalType(10, 2))
    assert(byName("hi") === org.apache.spark.sql.types.DecimalType(10, 2))
    assert(byName("ap") === org.apache.spark.sql.types.DoubleType)
    def check(): Unit = {
      val got = GraftMv.read(spark, s"$d/mv")
        .select($"g", $"rev", $"lo", $"hi", $"ap").orderBy("g")
        .collect().toSeq
      val want = recompute(s"$d/src").orderBy("g").collect().toSeq
      assert(got.map(r => (r.getLong(0), r.getDecimal(1), r.getDecimal(2),
        r.getDecimal(3))) === want.map(r => (r.getLong(0), r.getDecimal(1),
        r.getDecimal(2), r.getDecimal(3))))
      // Spark's decimal Average rounds its quotient at scale s+4
      // before the double cast; the MV serves the exact quotient —
      // they agree to the 5e-7 that rounding allows
      got.zip(want).foreach { case (a, b) =>
        assert(math.abs(a.getDouble(4) - b.getDouble(4)) < 1e-6) }
    }
    check()
    // updates (price changes cross group boundaries), a new group,
    // deletes killing one group — the ± delta stays exact in cents
    GraftTable.upsert(spark, s"$d/src",
      spark.range(1, 31).select($"id".as("k"), lit(3L).as("g"),
        (($"id" * 101 + 49).cast("double") / 100.0)
          .cast("decimal(10,2)").as("price"))
        .unionByName(spark.range(900, 905).select($"id".as("k"),
          lit(99L).as("g"),
          lit("123456.78").cast("decimal(10,2)").as("price"))), "k")
    GraftTable.deleteWhere(spark, s"$d/src", col("g") === 7, "k")
    val (v, dirty) = GraftMv.refresh(spark, s"$d/mv")
    assert(v === 2 && dirty > 0)
    check()
  }

  test("sum over decimal keeps SQL NULL-exactness: a group whose last " +
      "non-null price leaves serves NULL, not 0.00") {
    val d = freshDir()
    val rows = Seq((1L, 1L, "11.11"), (2L, 1L, null), (10L, 2L, "5.00"))
      .toDF("k", "g", "p0")
      .select($"k", $"g", $"p0".cast("decimal(10,2)").as("price"))
    GraftTable.create(spark, s"$d/src", rows, "k", nBuckets = 1)
    GraftMv.create(spark, s"$d/mv", s"$d/src", "g",
      Seq(MvAgg("sum", "price", "rev")))
    GraftTable.deleteWhere(spark, s"$d/src", col("k") === 1, "k")
    GraftMv.refresh(spark, s"$d/mv")
    val g1 = GraftMv.read(spark, s"$d/mv").filter($"g" === 1).collect()(0)
    assert(g1.isNullAt(1), s"expected NULL rev, got $g1")
  }

  test("transparent rewrite serves a decimal sum EXACTLY (matching " +
      "result type) on both the bijective and the rollup path; avg " +
      "over decimal refuses and falls back to the source") {
    val d = freshDir()
    GraftTable.create(spark, s"$d/src", src(400).withColumn("g2",
      $"k" % 3), "k", nBuckets = 2)
    GraftMv.createGrouped(spark, s"$d/mv", s"$d/src",
      Seq(MvGroup("g", "g"), MvGroup("g2", "g2")),
      Seq(MvAgg("sum", "price", "rev"), MvAgg("min", "price", "lo"),
        MvAgg("avg", "price", "ap")))
    val cat = "gmvd" + TestIds.next()
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", d)
    spark.conf.set("spark.graft.mv.rewrite.views", s"$d/mv")
    try {
      // bijective: GROUP BY g, g2 — served from the MV's stored rows
      val q1 = spark.sql(s"SELECT g, g2, sum(price) AS rev, " +
        s"min(price) AS lo FROM $cat.src GROUP BY g, g2")
      assert(q1.queryExecution.executedPlan.toString.contains(s"$d/mv"))
      val want1 = GraftTable.read(spark, s"$d/src").groupBy("g", "g2")
        .agg(sum("price").as("rev"), min("price").as("lo"))
        .orderBy("g", "g2").collect().toSeq
      assert(q1.orderBy("g", "g2").collect().toSeq === want1)
      // rollup: GROUP BY g — the ledger re-aggregates in exact longs,
      // MakeDecimal reconstructs at sum's own DECIMAL(20,2)
      val q2 = spark.sql(
        s"SELECT g, sum(price) AS rev FROM $cat.src GROUP BY g")
      assert(q2.queryExecution.executedPlan.toString.contains(s"$d/mv"))
      assert(q2.schema("rev").dataType ===
        org.apache.spark.sql.types.DecimalType(20, 2))
      val want2 = GraftTable.read(spark, s"$d/src").groupBy("g")
        .agg(sum("price").as("rev")).orderBy("g").collect().toSeq
      assert(q2.orderBy("g").collect().toSeq === want2)
      // avg over decimal: REFUSES the rewrite (Spark's decimal Average
      // promotion is not re-derived) — the source answers, correctly
      val q3 = spark.sql(
        s"SELECT g, avg(price) AS ap FROM $cat.src GROUP BY g")
      assert(!q3.queryExecution.executedPlan.toString.contains(s"$d/mv"))
      val want3 = GraftTable.read(spark, s"$d/src").groupBy("g")
        .agg(avg("price").as("ap")).orderBy("g").collect().toSeq
      assert(q3.orderBy("g").collect().toSeq === want3)
    } finally {
      spark.conf.unset("spark.graft.mv.rewrite.views")
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.base")
    }
  }
}
