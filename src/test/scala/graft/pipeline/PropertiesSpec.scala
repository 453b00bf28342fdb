package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** Property-based invariants (SURVEY §5.3) over generated dirty CSVs:
  * row conservation through the router, dedup idempotence, as-of
  * correctness, cube cardinality/mass conservation. Small generator
  * budgets — each property builds Spark jobs. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Sample a generator deterministically (fixed seeds — reproducible
    * CI) and run the property on each sample. */
  private def forSamples[A](gen: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val seed = org.scalacheck.rng.Seed(i.toLong * 7919)
      gen.apply(Gen.Parameters.default.withSize(12), seed)
        .foreach(body)
    }

  private val products = Seq("iPhone", "Cable", "Monitor", "Batteries")
  private val addrs = Seq(
    "944 Walnut St, Boston, MA 02215",
    "185 Maple St, Portland, OR 97035",
    "83 7th St, Portland, ME 04101")

  private val rowGen: Gen[(String, String, String, String, String, String)] =
    Gen.oneOf(
      // valid row
      for {
        id <- Gen.choose(100000, 999999)
        p <- Gen.oneOf(products)
        q <- Gen.choose(1, 9)
        pr <- Gen.choose(100, 99999)
        day <- Gen.choose(1, 28)
        a <- Gen.oneOf(addrs)
      } yield (id.toString, p, q.toString, (pr / 100.0).toString,
        f"01/$day%02d/19 10:30", a),
      // header repeat (cast failure)
      Gen.const(("Order ID", "Product", "Quantity Ordered", "Price Each",
        "Order Date", "Purchase Address")),
      // all-null line
      Gen.const((null: String, null: String, null: String, null: String,
        null: String, null: String)),
      // null id, otherwise valid (backfill path)
      for {
        p <- Gen.oneOf(products); a <- Gen.oneOf(addrs)
      } yield (null, p, "1", "9.99", "01/05/19 09:00", a))

  private def landingOf(rows: Seq[(String, String, String, String, String, String)]) = {
    val schema = Schemas.landing
    val data = rows.map(t => Row(t._1, t._2, t._3, t._4, t._5, t._6))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
  }

  test("router conserves rows: |valid pre-dedup| + |invalid| = |input|") {
    forSamples(Gen.nonEmptyListOf(rowGen)) { rows =>
      val landing = landingOf(rows)
      val routed = Cleanse(landing)
      // re-derive the pre-dedup valid count from the router predicate
      val invalid = routed.invalid.count()
      val validPre = rows.count { t =>
        val required = Seq(t._2, t._3, t._4, t._5, t._6)
        required.forall(_ != null) && t._2 != "Product"
      }
      assert(invalid + validPre === rows.size)
    }
  }

  test("cleanse is idempotent on its own output shape: distinct stays fixed") {
    forSamples(Gen.nonEmptyListOf(rowGen)) { rows =>
      val c = Cleanse(landingOf(rows)).cleansed
      assert(c.count() === c.dropDuplicates().count())
    }
  }

  test("as-of interval join picks max(last_update_date <= probe)") {
    val versionGen = for {
      n <- Gen.choose(1, 4)
      days <- Gen.pick(n, 1 to 25)
    } yield days.toSeq.sorted
    forSamples(for { d <- versionGen; p <- Gen.choose(1, 28) } yield (d, p), 8) { case (days, probeDay) =>
      val dim = days.zipWithIndex.map { case (d, i) =>
        ("widget", new java.math.BigDecimal(s"$i.99"),
          java.sql.Date.valueOf(f"2019-01-$d%02d"))
      }.toDF("product_name", "price_each", "last_update_date")
      val probe = java.sql.Date.valueOf(f"2019-01-$probeDay%02d")
      val got = FactBuilder.priceIntervals(dim)
        .filter(col("valid_from") <= lit(probe) and
          (col("valid_to").isNull or col("valid_to") > lit(probe)))
        .collect()
      val expected = days.filter(_ <= probeDay).lastOption
      expected match {
        case None => assert(got.isEmpty)
        case Some(d) =>
          assert(got.length === 1)
          assert(got.head.getAs[java.sql.Date]("valid_from").toString ===
            f"2019-01-$d%02d")
      }
    }
  }

  test("dense cube: |T|x|P|x|L| rows and conserved quantity mass") {
    forSamples(for { o <- Gen.choose(2, 5); p <- Gen.choose(1, 3) } yield (o, p), 3) { case (nOrders, nProducts) =>
      val rows = (1 to nOrders).flatMap { o =>
        (1 to nProducts).map { p =>
          (s"${100 + o}", s"prod$p", "2", "5.00",
            f"01/${(o % 5) + 1}%02d/19 12:00", addrs(o % addrs.length))
        }
      }
      val r = Cleanse(landingOf(rows.map(t =>
        (t._1, t._2, t._3, t._4, t._5, t._6))))
      val cleansed = r.cleansed.cache()
      val loc = LocationDim(cleansed)
      val time = TimeDim(cleansed)
      val prod = ProductDim(cleansed)
      val fact = FactBuilder(cleansed, prod, loc, time)
      assert(fact.count() === time.count() * prod.count() * loc.count())
      assert(fact.agg(sum("quantity_ordered")).first().getLong(0) ===
        cleansed.agg(sum("quantity_ordered")).first().getLong(0))
      cleansed.unpersist()
    }
  }
}
