package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A2/G1/G2/P8/P9/J7 — calendar-hierarchy time dimension
  * (ref: TimeDimension.sql:2-260), set-based.
  *
  * The reference loops a generate_series date spine with six mutable
  * counters assigning level IDs in date order (ref:
  * TimeDimension.sql:103-205). Equivalent set-based derivation: compute
  * each level's group key per day, then `dense_rank` over the spine —
  * identical IDs without row-at-a-time state.
  *
  * Spine: `sequence(min, max, interval 1 day)` + explode — Spark's
  * native equivalent of generate_series (ref: TimeDimension.sql:49-50).
  *
  * Documented label deviations (SURVEY §7.4-3; ID *shapes* kept).
  * By default sane labels are emitted; `referenceQuirks = true`
  * reproduces the reference's two byte-level label quirks for users
  * who diff dimension dumps during migration:
  *  - day/time_id 'D'+yyyyMMdd; quirks mode emits the reference's
  *    'D'+YYYYDDMM — day-before-month (TimeDimension.sql:193);
  *  - half_year_desc 'H'+yyyy-half; quirks mode emits the reference's
  *    'YYYY-HH', where HH is the 12-hour clock field of midnight ⇒ a
  *    constant "-12" (TimeDimension.sql:133).
  * Deviations kept in BOTH modes (not byte-reproducible by design):
  *  - week_desc 'W'+ISO-week+yy (ref labels with TO_CHAR 'WW' of the
  *    first day the ISO week was *encountered* — loop-order state,
  *    TimeDimension.sql:186);
  *  - every day is assigned to its quarter/half-year even when the
  *    spine does not start on a boundary (the reference only creates
  *    quarter/half rows when the loop crosses Jan/Apr/Jul/Oct 1, and
  *    its inner joins silently drop leading days otherwise).
  */
object TimeDim {

  /** 'W001'-shaped IDs (reference's 3-digit pads) — but never truncate:
    * LPAD cuts strings longer than the target, which would silently
    * collide IDs past rank 999 (a ~20-year spine has >999 weeks). */
  private def padId(prefix: String, rank: org.apache.spark.sql.Column) = {
    val s = rank.cast("string")
    concat(lit(prefix), when(length(s) < 3, lpad(s, 3, "0")).otherwise(s))
  }

  /** Build from the cleansed table's order_date range. */
  def apply(cleansed: DataFrame, referenceQuirks: Boolean = false): DataFrame = {
    val spine = cleansed
      .agg(min(col("order_date").cast("date")).as("lo"),
        max(col("order_date").cast("date")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
    fromSpine(spine, referenceQuirks)
  }

  /** Build from an explicit day spine (column `d` of DateType). */
  def fromSpine(spine: DataFrame, referenceQuirks: Boolean = false): DataFrame = {
    val yy = date_format(col("d"), "yy")
    // Numeric group keys — NOT string concat: "1995-10" sorts before
    // "1995-2" lexicographically, which would scramble dense_rank IDs
    // on multi-year spines.
    val keyed = spine
      .withColumn("year_key", year(col("d")))
      .withColumn("half_key", year(col("d")) * 10 + when(month(col("d")) <= 6, 1).otherwise(2))
      .withColumn("quarter_key", year(col("d")) * 10 + quarter(col("d")))
      .withColumn("month_key", year(col("d")) * 100 + month(col("d")))
      // ISO week can belong to the previous/next year — key by the
      // week's Monday so Dec 29..Jan 4 spans stay one group
      // (EXTRACT(WEEK) in the reference is ISO too).
      .withColumn("week_key", date_trunc("week", col("d")).cast("date"))

    val dayId =
      if (referenceQuirks) concat(lit("D"), date_format(col("d"), "yyyyddMM"))
      else concat(lit("D"), date_format(col("d"), "yyyyMMdd"))
    val halfDesc =
      if (referenceQuirks) concat(lit("H"), year(col("d")), lit("-12"))
      else concat(lit("H"), year(col("d")), lit("-"),
        when(month(col("d")) <= 6, 1).otherwise(2))
    keyed
      .withColumn("time_id", dayId)
      .withColumn("week_id", padId("W", dense_rank().over(Window.orderBy("week_key"))))
      .withColumn("week_desc",
        concat(lit("W"), lpad(weekofyear(col("d")).cast("string"), 2, "0"), yy))
      .withColumn("month_id", padId("M", dense_rank().over(Window.orderBy("month_key"))))
      .withColumn("month_desc", concat(lit("M"), date_format(col("d"), "MMyy")))
      .withColumn("quarter_id", padId("Q", dense_rank().over(Window.orderBy("quarter_key"))))
      .withColumn("quarter_desc", concat(lit("Q"), quarter(col("d")), yy))
      .withColumn("half_year_id", padId("H", dense_rank().over(Window.orderBy("half_key"))))
      .withColumn("half_year_desc", halfDesc)
      .withColumn("year_id", concat(lit("Y"), year(col("d"))))
      .withColumn("year_desc", year(col("d")).cast("string"))
      .select(
        col("time_id"), col("d").as("time_desc"),
        col("week_id"), col("week_desc"),
        col("month_id"), col("month_desc"),
        col("quarter_id"), col("quarter_desc"),
        col("half_year_id"), col("half_year_desc"),
        col("year_id"), col("year_desc"))
  }
}
