package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

/** Router/normalizer unit tests over the FIXTURES.md §1 dirty-row
  * variants: repeated header, all-empty line, exact duplicates,
  * multi-item basket, NULL order_id backfill, Portland OR/ME split. */
class CleanseSpec extends SparkSpec {

  private lazy val fixture: String = {
    val csv =
      """Order ID,Product,Quantity Ordered,Price Each,Order Date,Purchase Address
        |141234,iPhone,1,700,01/22/19 21:25,"944 Walnut St, Boston, MA 02215"
        |141235,USB-C Charging Cable,2,11.95,01/17/19 13:33,"185 Maple St, Portland, OR 97035"
        |141236,Wired Headphones,1,11.99,01/07/19 11:27,"83 7th St, Portland, ME 04101"
        |Order ID,Product,Quantity Ordered,Price Each,Order Date,Purchase Address
        |,,,,,
        |141237,27in FHD Monitor,1,149.99,01/05/19 17:20,"172 Church St, New York City, NY 10001"
        |141237,AAA Batteries (4-pack),3,2.99,01/05/19 17:20,"172 Church St, New York City, NY 10001"
        |141238,Google Phone,1,600,01/30/19 00:01,"11 2nd St, Seattle, WA 98101"
        |141238,Google Phone,1,600,01/30/19 00:01,"11 2nd St, Seattle, WA 98101"
        |,Flatscreen TV,1,300,01/11/19 09:00,"50 Pine St, Dallas, TX 75001"
        |""".stripMargin
    val dir = Files.createTempDirectory("cleanse_fixture")
    val f = dir.resolve("mixed.csv")
    Files.writeString(f, csv)
    f.toString
  }

  private lazy val result = Cleanse(Ingest.load(spark, fixture))
  private lazy val cleansedRows = result.cleansed.collect()

  test("row conservation: valid + invalid = input (pre-dedup)") {
    val landing = Ingest.load(spark, fixture)
    assert(landing.count() === 10) // 11 lines - real header
    assert(result.invalid.count() === 2) // repeated header + all-empty
    // 8 valid candidates, 1 exact duplicate removed by DISTINCT
    assert(result.cleansed.count() === 7)
  }

  test("repeated header routes to invalid via cast failure") {
    val inv = result.invalid.collect().map(_.toSeq)
    assert(inv.exists(_.contains("Product")))
  }

  test("all-empty line routes to invalid via null check") {
    assert(result.invalid.collect().exists(r => (0 until 6).forall(r.isNullAt)))
  }

  test("address split: street/city/state/postal") {
    val boston = cleansedRows.find(_.getAs[Int]("order_id") == 141234).get
    assert(boston.getAs[String]("street") === "944 Walnut St")
    assert(boston.getAs[String]("city") === "Boston")
    assert(boston.getAs[String]("state") === "MA")
    assert(boston.getAs[String]("postal") === "02215")
  }

  test("Portland OR and Portland ME stay distinct") {
    val states = cleansedRows.filter(_.getAs[String]("city") == "Portland")
      .map(_.getAs[String]("state")).toSet
    assert(states === Set("OR", "ME"))
  }

  test("multi-item basket keeps both rows") {
    assert(cleansedRows.count(_.getAs[Int]("order_id") == 141237) === 2)
  }

  test("order_date parses to midnight timestamp") {
    val r = cleansedRows.find(_.getAs[Int]("order_id") == 141234).get
    assert(r.getAs[java.sql.Timestamp]("order_date").toString === "2019-01-22 00:00:00.0")
  }

  test("NULL order_id backfilled above max existing id") {
    val tv = cleansedRows.find(_.getAs[String]("product") == "Flatscreen TV").get
    assert(tv.getAs[Int]("order_id") === 1) // maxExisting=0 + row_number 1
    val tv2 = Cleanse(Ingest.load(spark, fixture), maxExistingOrderId = 500000)
      .cleansed.filter("product = 'Flatscreen TV'").collect().head
    assert(tv2.getAs[Int]("order_id") === 500001)
  }

  test("price cast to DECIMAL(10,2)") {
    val r = cleansedRows.find(_.getAs[Int]("order_id") == 141235).get
    assert(r.getAs[java.math.BigDecimal]("price_each").toString === "11.95")
  }
}
