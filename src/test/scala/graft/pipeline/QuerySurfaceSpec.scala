package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL-surface tests over the full reference pipeline (skipped if the
  * reference CSV is absent). */
class QuerySurfaceSpec extends SparkSpec {

  private val csv = "/root/reference/Sales_January_2019.csv"
  private def available = new java.io.File(csv).exists()

  private lazy val r = {
    val res = Pipeline.run(spark, csv)
    QuerySurface.register(res)
    res
  }

  test("revenue by city matches DataFrame-side computation") {
    assume(available)
    r // force pipeline + view registration
    val sqlTop = QuerySurface.revenueByCity(spark).first()
    val dfTop = r.cleansed
      .groupBy("city")
      .agg(round(sum(col("price_each") * col("quantity_ordered")), 2).as("revenue"))
      .orderBy(col("revenue").desc).first()
    assert(sqlTop.getString(0) === dfTop.getString(0))
    assert(sqlTop.getAs[java.math.BigDecimal]("revenue") ===
      dfTop.getAs[java.math.BigDecimal]("revenue"))
  }

  test("fact-table monthly rollup conserves revenue") {
    assume(available)
    r
    val monthly = QuerySurface.revenueByMonth(spark).collect()
    assert(monthly.map(_.getAs[String]("month_id")).toSeq === Seq("M001", "M002"))
    val factUnits = monthly.map(_.getAs[Long]("units")).sum
    val cleansedUnits = r.cleansed.agg(sum("quantity_ordered")).first().getLong(0)
    assert(factUnits === cleansedUnits)
  }

  test("top products non-empty and ordered") {
    assume(available)
    r
    val top = QuerySurface.topProducts(spark, 5).collect()
    assert(top.length === 5)
    assert(top.map(_.getAs[Long]("units")).toSeq.reverse ===
      top.map(_.getAs[Long]("units")).toSeq.sorted)
  }

  test("the reference's correlated as-of subquery runs verbatim via spark.sql") {
    assume(available)
    r
    val asof = QuerySurface.asOfPriceSql(spark)
    assert(asof.count() === 9671L)
    assert(asof.filter(col("price_each").isNull).count() === 0L)
  }
}
