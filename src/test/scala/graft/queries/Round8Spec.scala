package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-8: warehouse write-path operators (diff / merge / incremental
  * maintenance), the ANALYZE profiler, and the curation additions.
  * Each test pins a property the DuckDB gate can't observe — algebraic
  * conservation laws, equivalence to an independent Spark formulation,
  * or quality bounds of an approximation. */
class Round8Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q200: profiler stats are internally consistent; doc_id is a key") {
    val rows = MaintenanceQueries.q200ColumnStats.run(spark, dir).collect()
    assert(rows.length === 5)
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    val nRows = byCol("doc_id").getLong(1)
    rows.foreach { r =>
      assert(r.getLong(2) === 0L) // no nulls in the synthetic corpus
      assert(r.getLong(3) <= nRows) // ndv bounded by rows
      assert(r.getDouble(6) > 0.0) // avg_len
    }
    // primary key: every doc_id distinct
    assert(byCol("doc_id").getLong(3) === nRows)
    // a categorical column is low-cardinality
    assert(byCol("lang").getLong(3) < 10)
  }

  test("q201: statuses partition the union keyspace and match the mods") {
    val d = MaintenanceQueries.q201SnapshotDiff.run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = graft.Tables.orders(spark, dir).select("o_orderkey")
    def n(c: org.apache.spark.sql.Column) = keys.filter(c).count()
    val k = col("o_orderkey")
    assert(d("added") === n(k % 97 === 0 && k % 89 =!= 0))
    assert(d("deleted") === n(k % 89 === 0 && k % 97 =!= 0))
    assert(d("changed") === n(k % 13 === 0 && k % 97 =!= 0 && k % 89 =!= 0))
    assert(d.values.sum === n(k % 97 =!= 0 || k % 89 =!= 0))
  }

  test("q204: merge actions conserve the target and source row sets") {
    val a = MaintenanceQueries.q204MergeUpsert.run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nCust = graft.Tables.customer(spark, dir).count()
    val srcKeys = graft.Tables.orders(spark, dir)
      .select(col("o_custkey")).distinct()
    val nShifted = srcKeys.filter(col("o_custkey") % 50 === 0).count()
    // every target row lands in exactly one matched/untouched class
    assert(a.getOrElse("updated", 0L) + a.getOrElse("deleted", 0L) +
      a.getOrElse("untouched", 0L) === nCust)
    // every shifted source key is an insert
    assert(a.getOrElse("inserted", 0L) === nShifted)
  }

  test("q205: frequency-table quantiles equal percentile_disc") {
    graft.Tables.lineitem(spark, dir).createOrReplaceTempView("li_r8")
    val expected = spark.sql(
      """SELECT l_returnflag,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
        |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75,
        |  percentile_disc(0.95) WITHIN GROUP (ORDER BY l_quantity) AS p95
        |FROM li_r8 GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val got = MlPrep.q205GroupQuantiles.run(spark, dir)
      .select("l_returnflag", "p25", "p50", "p75", "p95").collect()
    assert(got.toSeq === expected.toSeq)
  }

  test("q206: int8 quantization keeps high exact-search recall") {
    val rows = VectorQueries.q206QuantizedRecall.run(spark, dir).collect()
    assert(rows.length === 10)
    rows.foreach(r => assert(r.getLong(1) >= 0L && r.getLong(1) <= 5L))
    val avg = rows.map(_.getLong(1)).sum / 50.0
    assert(avg >= 0.8, s"avg recall@5 $avg below 0.8")
  }

  test("q207: incremental merge equals direct recompute") {
    val merged = MaintenanceQueries.q207IncrementalAgg.run(spark, dir)
      .collect().toSeq
    val direct = graft.Tables.orders(spark, dir)
      .select((col("o_custkey") % 100).as("bucket"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"), sum("c").as("cents_sum"),
        max("c").as("max_cents"))
      .orderBy("bucket").collect().toSeq
    assert(merged === direct)
    assert(merged.nonEmpty)
  }

  test("q202/q203/q208: curation outputs satisfy their bounds") {
    val boiler = Curation.q202BoilerplateShingles.run(spark, dir).collect()
    boiler.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3)) // boiler_total <= sh_total
      assert(r.getLong(6) <= r.getLong(1)) // flagged_docs <= n_docs
    }
    val dsir = Curation.q203DsirImportance.run(spark, dir).collect()
    assert(dsir.map(_.getInt(0)).toSeq === (1 to dsir.length))
    assert(dsir.forall(_.getString(3) != "en"))
    val scores = dsir.map(_.getLong(5))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val ov = Curation.q208SourceOverlap.run(spark, dir).collect()
    ov.foreach { r =>
      val (va, vb, common) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(common <= math.min(va, vb))
      val j = r.getDouble(5)
      assert(j > 0.0 && j <= 1.0)
    }
  }
}
