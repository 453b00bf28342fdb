package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** SCD2 semantics per FIXTURES.md §3 and the cursor trace in
  * ProductDim's scaladoc (ref: ProductDimension.sql:52-141). */
class ProductDimSpec extends SparkSpec {

  private def cleansedOf(rows: (String, String, String)*): org.apache.spark.sql.DataFrame = {
    val schema = StructType(Seq(
      StructField("product", StringType),
      StructField("price_each", DecimalType(10, 2)),
      StructField("order_date", TimestampType)))
    val data = rows.map { case (n, p, d) =>
      Row(n, new java.math.BigDecimal(p), Timestamp.valueOf(d + " 00:00:00"))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data.toSeq), schema)
  }

  private lazy val dim = ProductDim(cleansedOf(
    ("Widget", "10.00", "2019-01-01"),
    ("Widget", "10.00", "2019-01-03"), // same version, later date — ignored (min)
    ("Widget", "12.00", "2019-01-15"),
    ("Widget", "11.00", "2019-02-01"),
    ("Gadget", "5.00", "2019-01-02")
  )).collect().map(r => (
    r.getAs[String]("product_name"),
    r.getAs[java.math.BigDecimal]("price_each").toString,
    r.getAs[java.sql.Date]("last_update_date").toString,
    r.getAs[String]("active_status"),
    r.getAs[String]("action_flag"),
    r.getAs[String]("product_id")))

  test("one row per (name, price) version with min first-seen date") {
    assert(dim.length === 4)
    assert(dim.count(_._1 == "Widget") === 3)
    assert(dim.find(t => t._1 == "Widget" && t._2 == "10.00").get._3 === "2019-01-01")
  }

  test("only the latest version is active") {
    val widget = dim.filter(_._1 == "Widget")
    assert(widget.filter(_._4 == "Y").map(_._2) === Array("11.00"))
    assert(widget.count(_._4 == "N") === 2)
  }

  test("single-version name stays Y/I") {
    val g = dim.find(_._1 == "Gadget").get
    assert((g._4, g._5) === ("Y", "I"))
  }

  test("2019-01-01 initial-load guard keeps first version's 'I'") {
    val v1 = dim.find(t => t._1 == "Widget" && t._2 == "10.00").get
    assert((v1._4, v1._5) === ("N", "I")) // demoted but guard blocks 'U'
    val v2 = dim.find(t => t._1 == "Widget" && t._2 == "12.00").get
    assert((v2._4, v2._5) === ("N", "U"))
    val v3 = dim.find(t => t._1 == "Widget" && t._2 == "11.00").get
    assert((v3._4, v3._5) === ("Y", "U"))
  }

  test("product_id is dense_rank by name, shared across versions") {
    assert(dim.filter(_._1 == "Gadget").map(_._6).toSet === Set("P000001"))
    assert(dim.filter(_._1 == "Widget").map(_._6).toSet === Set("P000002"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (
      r.getAs[String]("product_id"),
      r.getAs[String]("product_name"),
      r.getAs[java.math.BigDecimal]("price_each").toString,
      r.getAs[java.sql.Date]("last_update_date").toString,
      r.getAs[String]("active_status"),
      r.getAs[String]("action_flag"))).toSet

  // merge ≡ rebuild, the operator's contract: new version of an
  // existing name (demotes the old active), a brand-new name (dense
  // ranks shift), a duplicate of a stored version with a LATER date
  // (ignored — min wins), and an untouched name passing through.
  test("incremental merge equals full rebuild") {
    val history = Seq(
      ("Widget", "10.00", "2019-01-05"),
      ("Widget", "12.00", "2019-01-15"),
      ("Gadget", "5.00", "2019-01-02"))
    val batch = Seq(
      ("Widget", "11.00", "2019-02-01"), // new version, demotes 12.00
      ("Widget", "10.00", "2019-03-01"), // stored version, later date — no-op
      ("Apple", "1.00", "2019-02-03")) // new name, shifts Gadget/Widget ranks
    val merged = ProductDim.merge(ProductDim(cleansedOf(history: _*)),
      cleansedOf(batch: _*))
    val rebuilt = ProductDim(cleansedOf(history ++ batch: _*))
    assert(rows(merged) === rows(rebuilt))
    assert(rows(merged).exists(t => t._2 == "Apple" && t._1 == "P000001"))
  }

  test("merging an empty batch leaves the dimension unchanged") {
    val current = ProductDim(cleansedOf(
      ("Widget", "10.00", "2019-01-05"),
      ("Gadget", "5.00", "2019-01-02")))
    val merged = ProductDim.merge(current, cleansedOf())
    assert(rows(merged) === rows(current))
  }
}
