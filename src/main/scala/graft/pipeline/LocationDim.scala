package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F4/W2/J6/P5/P6/S7 — snowflake-collapsed location dimension
  * (ref: LocationDimension.sql:2-184), set-based.
  *
  * The reference walks cleansed with a cursor doing lookup-before-
  * insert per level with COUNT(*)+1 surrogate counters (O(n²), ref:
  * LocationDimension.sql:76-133). Level natural keys, taken from its
  * WHERE clauses:
  *   state  = (state_name, postal)          (LocationDimension.sql:91)
  *   city   = (city_name, state-level key)  (LocationDimension.sql:108)
  *   street = (street_name, city-level key) (LocationDimension.sql:125)
  * so each level is really keyed by its full ancestor chain — we derive
  * all three with `dropDuplicates` + `dense_rank` in one pass.
  *
  * Documented deviations (SURVEY §7.4):
  *  - IDs ordered by natural key, not cursor-encounter order (the
  *    reference's own final L-ids are not reproducible bit-for-bit);
  *  - LPAD width 6 everywhere (the reference's 3-digit pads silently
  *    truncate past 999 — real collision at its own 9,160 streets).
  *
  * Scale: surrogate ranks use [[graft.operators.GlobalRank]] — the
  * two-phase range-partitioned form, so ID assignment survives 10⁹
  * distinct addresses without a single-partition sort. Output columns
  * exactly match location_dimension (ref: LocationDimension.sql:62-72).
  */
object LocationDim {

  /** Zero-pad to 6 but never truncate: LPAD cuts longer strings, which
    * would silently collide IDs past 999,999 (plausible location counts
    * at 100 TB). */
  private def padId(prefix: String, rank: org.apache.spark.sql.Column) = {
    val s = rank.cast("string")
    concat(lit(prefix), when(length(s) < 6, lpad(s, 6, "0")).otherwise(s))
  }

  def apply(cleansed: DataFrame): DataFrame = {
    import graft.operators.GlobalRank
    val triples = cleansed
      .select("street", "city", "state", "postal")
      .dropDuplicates()

    val withIds = Seq[(String, Seq[String])](
      "state_rk"  -> Seq("state", "postal"),
      "city_rk"   -> Seq("city", "state", "postal"),
      "street_rk" -> Seq("street", "city", "state", "postal")
    ).foldLeft(triples) { case (df, (out, keys)) =>
      GlobalRank.denseRank(df, out, keys.map(col): _*)
    }
      .withColumn("state_id", padId("SA", col("state_rk")))
      .withColumn("city_id", padId("CT", col("city_rk")))
      .withColumn("street_id", padId("ST", col("street_rk")))
      .drop("state_rk", "city_rk", "street_rk")

    GlobalRank.rowNumber(withIds, "loc_rk",
        col("street_id"), col("city_id"), col("state_id"))
      .withColumn("location_id", padId("L", col("loc_rk")))
      .select(
        col("location_id"),
        col("street_id"),
        col("street").as("street_name"),
        col("city_id"),
        col("city").as("city_name"),
        col("state_id"),
        col("state").as("state_name"),
        col("postal"),
        concat_ws("", col("street"), lit(", "), col("city"), lit(", "),
          col("state"), lit(" "), col("postal")).as("full_address"))
  }
}
