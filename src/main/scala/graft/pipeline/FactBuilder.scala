package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J1-J5/W3/P10 — fact build (ref: FactTable.sql:2-115).
  *
  * Stage 1 joins cleansed to the product dimension by name and attaches
  * the as-of price: the reference's correlated scalar subquery "latest
  * price_each with last_update_date <= order_date" (FactTable.sql:18-27)
  * is decorrelated into an interval join — each SCD2 version gets
  * [valid_from, valid_to) from a lead() window, and an order row
  * matches the single version whose interval contains its date. The
  * dims are broadcast, so the fact side never shuffles for stages 1-3.
  *
  * The final fact keeps the reference's dense-cube semantics
  * (time × product × location LEFT JOIN stage3 + COALESCE(qty, 0),
  * FactTable.sql:78-110) behind `dense = true`. The cube amplifies
  * ~575× at reference scale and is catastrophic at 100 TB — `dense =
  * false` yields the sparse fact (stage 3 enriched with hierarchy ids),
  * with cube-style analysis left to GROUP BY ... WITH CUBE over it
  * (SURVEY §7.4-4).
  */
object FactBuilder {

  /** SCD2 versions → [valid_from, valid_to) intervals per name.
    * Ordered by (date, price): when two versions share a first-seen
    * date the lower-priced one gets an empty [d, d) interval and the
    * higher-priced one wins — the same tiebreak as the SCD2 active
    * flag and the reference subquery's ORDER BY ... DESC LIMIT 1. */
  def priceIntervals(productDim: DataFrame): DataFrame = {
    val byName = Window.partitionBy("product_name")
      .orderBy("last_update_date", "price_each")
    productDim.select(
      col("product_name").as("pi_name"),
      col("price_each").as("pi_price"),
      col("last_update_date").as("valid_from"),
      lead("last_update_date", 1).over(byName).as("valid_to"))
  }

  def apply(cleansed: DataFrame, productDim: DataFrame, locationDim: DataFrame,
            timeDim: DataFrame, dense: Boolean = true): DataFrame = {
    // Stage 1 — ⋈ product by name (INNER, one row per SCD2 *version*,
    // faithfully matching FactTable.sql:29-34) + as-of price.
    val pd1 = productDim.select(col("product_id"), col("product_name"))
    val intervals = priceIntervals(productDim)
    val s1 = cleansed
      .join(broadcast(pd1), cleansed("product") === pd1("product_name"), "inner")
      .join(broadcast(intervals),
        cleansed("product") === intervals("pi_name") and
          intervals("valid_from") <= cleansed("order_date").cast("date") and
          (intervals("valid_to").isNull or
            intervals("valid_to") > cleansed("order_date").cast("date")),
        "left")
      .select(
        col("order_id"), col("product_id"), col("product"),
        col("pi_price").as("price_each"),
        col("quantity_ordered"), col("order_date"),
        col("street"), col("city"), col("state"), col("postal"))

    // Stage 2 — ⋈ location on the 4-part natural key (FactTable.sql:46-53).
    // The right leg's columns are renamed EXPLICITLY (loc_*): locationDim
    // shares lineage with cleansed, so `s1("postal") === loc("postal")`
    // can self-resolve both sides to ONE attribute — today a benign
    // "trivially true equals predicate" warning, but the exact pattern
    // that silently becomes a cross-join + post-filter if the analyzer
    // ever collapses them. Unique names make the join unambiguous.
    val loc = locationDim.select(col("location_id").as("loc_location_id"),
      col("street_name").as("loc_street"), col("city_name").as("loc_city"),
      col("state_name").as("loc_state"), col("postal").as("loc_postal"))
    val s2 = s1.join(broadcast(loc),
      s1("street") === col("loc_street") and s1("city") === col("loc_city") and
        s1("state") === col("loc_state") and s1("postal") === col("loc_postal"),
      "inner")
      .select(s1("order_id"), s1("product_id"), s1("product"), s1("price_each"),
        s1("quantity_ordered"), s1("order_date").cast("date").as("order_date"),
        col("loc_location_id").as("location_id"),
        s1("street"), s1("city"), s1("state"), s1("postal"))

    // Stage 3 — ⋈ time on the day (FactTable.sql:70-75); time_desc
    // renamed for the same self-lineage reason as stage 2.
    val t = timeDim.select(col("time_id").as("t_time_id"),
      col("time_desc").as("t_time_desc"))
    val s3 = s2.join(broadcast(t), s2("order_date") === col("t_time_desc"),
      "inner")
      .select(col("order_id"), col("product_id"), col("product"),
        col("price_each"), col("quantity_ordered"),
        col("t_time_id").as("time_id"), col("order_date"), col("location_id"),
        col("street"), col("city"), col("state"), col("postal"))

    if (!dense) return sparseFact(s3, timeDim, locationDim)

    // Dense cube — time × product × location ⟕ stage3 (FactTable.sql:78-110).
    // Stage3 is order-sized (≪ cube) ⇒ broadcast the left join: the cube
    // build is then entirely shuffle-free narrow work over the generated
    // cross product.
    val s3k = s3.select(col("time_id").as("f_time_id"),
      col("product_id").as("f_product_id"),
      col("location_id").as("f_location_id"), col("quantity_ordered"))
    val cube = timeDim
      .crossJoin(productDim.select("product_id", "product_name", "price_each"))
      .crossJoin(locationDim)
    cube.join(broadcast(s3k),
      cube("product_id") === s3k("f_product_id") and
        cube("time_id") === s3k("f_time_id") and
        cube("location_id") === s3k("f_location_id"),
      "left")
      .select(
        col("time_id"), col("product_id"),
        col("product_name").as("product"), col("price_each"),
        coalesce(col("quantity_ordered"), lit(0)).as("quantity_ordered"),
        col("time_desc").as("order_date"),
        col("week_id"), col("month_id"), col("quarter_id"),
        col("half_year_id"), col("year_id"),
        col("location_id"), col("street_name"), col("street_id"),
        col("city_name"), col("city_id"), col("state_name"), col("state_id"),
        col("postal"))
  }

  /** Dense cube or sparse fact, chosen by the Catalyst size-guard rule
    * ([[graft.plans.CubeGuard]] + [[graft.plans.ResolveCubeGuard]],
    * SURVEY §7.4-4) from the optimizer's own cardinality estimate —
    * cross-join stats multiply, so the dense branch's estimated bytes
    * explode exactly when the cube would. Requires a session with
    * `graft.plans.GraftExtensions` installed (QueryDef.sessionConfs). */
  def applyGuarded(spark: org.apache.spark.sql.SparkSession,
                   cleansed: DataFrame, productDim: DataFrame,
                   locationDim: DataFrame, timeDim: DataFrame,
                   thresholdBytes: BigInt = BigInt(4) << 30): DataFrame =
    graft.plans.CubeGuard.guarded(spark,
      apply(cleansed, productDim, locationDim, timeDim, dense = true),
      apply(cleansed, productDim, locationDim, timeDim, dense = false),
      thresholdBytes)

  /** Sparse fact: stage-3 rows enriched with the time hierarchy ids and
    * location surrogate levels — schema-identical to the dense cube (so
    * the size guard can swap them), same analytical power via
    * GROUP BY/CUBE, no 575× amplification. Zero-quantity cells are
    * simply absent. */
  private def sparseFact(s3: DataFrame, timeDim: DataFrame,
                         locationDim: DataFrame): DataFrame = {
    // Hierarchy columns renamed before the join: s3's lineage already
    // contains timeDim/locationDim, so reusing their column refs would
    // be ambiguous.
    val th = timeDim.select(col("time_id").as("th_time_id"),
      col("week_id").as("th_week_id"), col("month_id").as("th_month_id"),
      col("quarter_id").as("th_quarter_id"),
      col("half_year_id").as("th_half_year_id"),
      col("year_id").as("th_year_id"))
    val lh = locationDim.select(col("location_id").as("lh_location_id"),
      col("street_name").as("lh_street_name"), col("street_id").as("lh_street_id"),
      col("city_name").as("lh_city_name"), col("city_id").as("lh_city_id"),
      col("state_name").as("lh_state_name"), col("state_id").as("lh_state_id"))
    s3.join(broadcast(th), s3("time_id") === th("th_time_id"), "inner")
      .join(broadcast(lh), s3("location_id") === lh("lh_location_id"), "inner")
      .select(s3("time_id"), s3("product_id"), s3("product"), s3("price_each"),
        s3("quantity_ordered"), s3("order_date"),
        col("th_week_id").as("week_id"), col("th_month_id").as("month_id"),
        col("th_quarter_id").as("quarter_id"),
        col("th_half_year_id").as("half_year_id"),
        col("th_year_id").as("year_id"),
        s3("location_id"),
        col("lh_street_name").as("street_name"), col("lh_street_id").as("street_id"),
        col("lh_city_name").as("city_name"), col("lh_city_id").as("city_id"),
        col("lh_state_name").as("state_name"), col("lh_state_id").as("state_id"),
        s3("postal"))
  }
}
