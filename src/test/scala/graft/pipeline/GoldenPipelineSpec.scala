package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden end-to-end on the reference's own input file, asserting the
  * invariants measured in SURVEY §0/§5 (counts measured directly from
  * /root/reference/Sales_January_2019.csv and the reference DDL
  * semantics). Skips when the reference checkout is absent. */
class GoldenPipelineSpec extends SparkSpec {

  private val csv = "/root/reference/Sales_January_2019.csv"
  private def available = new java.io.File(csv).exists()

  private lazy val r = Pipeline.run(spark, csv)

  test("landing: 9,723 data lines") {
    assume(available)
    assert(r.landing.count() === 9723L)
  }

  test("invalid: 42 rows = 16 repeated headers + 26 all-empty") {
    assume(available)
    assert(r.invalid.count() === 42L)
  }

  test("cleansed: 9,671 rows after DISTINCT (10 exact dupes removed)") {
    assume(available)
    assert(r.cleansed.count() === 9671L)
  }

  test("product_dimension: 19 products, all Y/I (one price each)") {
    assume(available)
    val pd = r.productDim.collect()
    assert(pd.length === 19)
    assert(pd.forall(_.getAs[String]("active_status") == "Y"))
    assert(pd.forall(_.getAs[String]("action_flag") == "I"))
    val ids = pd.map(_.getAs[String]("product_id")).sorted
    assert(ids.head === "P000001" && ids.last === "P000019")
  }

  test("location_dimension: 9,160 distinct full addresses") {
    assume(available)
    assert(r.locationDim.count() === 9160L)
    assert(r.locationDim.select("location_id").distinct().count() === 9160L)
  }

  test("time_dimension: 32 contiguous days 2019-01-01..2019-02-01") {
    assume(available)
    val td = r.timeDim.orderBy("time_desc").collect()
    assert(td.length === 32)
    assert(td.head.getAs[java.sql.Date]("time_desc").toString === "2019-01-01")
    assert(td.last.getAs[java.sql.Date]("time_desc").toString === "2019-02-01")
    assert(td.head.getAs[String]("time_id") === "D20190101")
    // Jan 2019 spans ISO weeks 1..5; Feb 1 is still week 5
    assert(td.map(_.getAs[String]("week_id")).distinct.length === 5)
    assert(td.map(_.getAs[String]("month_id")).distinct.sorted === Array("M001", "M002"))
    assert(td.map(_.getAs[String]("quarter_id")).distinct === Array("Q001"))
    assert(td.map(_.getAs[String]("year_id")).distinct === Array("Y2019"))
  }

  test("fact_table: dense cube 32 x 19 x 9160 with conserved quantity") {
    assume(available)
    val fact = r.fact.cache()
    try {
      assert(fact.count() === 32L * 19L * 9160L)
      val factQty = fact.agg(sum("quantity_ordered")).first().getLong(0)
      val cleansedQty = r.cleansed.agg(sum("quantity_ordered")).first().getLong(0)
      assert(factQty === cleansedQty)
      // as-of price: every sold cell carries a non-null price
      assert(fact.filter(col("price_each").isNull).count() === 0L)
    } finally fact.unpersist()
  }

  test("referenceQuirks mode reproduces the reference's label bytes") {
    assume(available)
    val td = TimeDim(r.cleansed, referenceQuirks = true).orderBy("time_desc").collect()
    def at(d: String) = td.find(_.getAs[java.sql.Date]("time_desc").toString == d).get
    // 'D' || TO_CHAR(date, 'YYYYDDMM') — day before month (TimeDimension.sql:193)
    assert(at("2019-01-22").getAs[String]("time_id") === "D20192201")
    assert(at("2019-02-01").getAs[String]("time_id") === "D20190102")
    // 'H' || TO_CHAR(date, 'YYYY-HH') — HH of midnight is constantly 12
    // (TimeDimension.sql:133)
    assert(td.forall(_.getAs[String]("half_year_desc") == "H2019-12"))
    // non-quirk labels are untouched
    assert(at("2019-01-01").getAs[String]("month_id") === "M001")
  }

  test("sparse fact mode: order-grain rows, no amplification") {
    assume(available)
    val sparse = FactBuilder(r.cleansed, r.productDim, r.locationDim, r.timeDim,
      dense = false)
    assert(sparse.count() === 9671L)
    assert(sparse.agg(sum("quantity_ordered")).first().getLong(0) ===
      r.cleansed.agg(sum("quantity_ordered")).first().getLong(0))
  }
}
