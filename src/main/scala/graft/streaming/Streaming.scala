package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DateType, DecimalType, IntegerType, TimestampType}
import graft.pipeline.Schemas

/** Structured Streaming surface (stretch beyond the batch-only
  * reference, SURVEY §2.10): streaming cleanse, watermarked windowed
  * aggregation, session windows, and custom per-key state.
  *
  * Scale design: every operator here is keyed-state over a shuffled
  * key (event_type / user_id) with watermark-bounded state — no
  * unbounded buffers; the cleanse route is stateless and fuses into
  * the source scan.
  */
object Streaming {

  final case class Routed(valid: DataFrame, invalid: DataFrame)

  /** Streaming variant of the batch cleanse router (F1/F2): identical
    * null- and cast-failure routing, stateless ⇒ works on any
    * readStream source with the landing schema. Differences from batch
    * (both forced by streaming semantics): no max+1 order-id backfill
    * (cross-row state) — NULL ids get a content-hash surrogate
    * (negative to stay out of the real id space); no global DISTINCT —
    * exact dedup is the downstream `dropDuplicatesWithinWatermark`
    * call, keyed on the content hash. */
  def cleanseStream(landing: DataFrame): Routed = {
    val requiredCols =
      Seq("product", "quantity_ordered", "price_each", "order_date", "purchase_address")
    val nullRouted = requiredCols.map(col(_).isNull).reduce(_ or _)
    val typed = landing
      .withColumn("order_id_t", col("order_id").cast(IntegerType))
      .withColumn("quantity_t", col("quantity_ordered").cast(IntegerType))
      .withColumn("price_t", col("price_each").cast(DecimalType(10, 2)))
      .withColumn("date_t",
        to_timestamp(col("order_date"), graft.pipeline.Cleanse.dateLayout)
          .cast(DateType).cast(TimestampType))
    val castFailed =
      (col("order_id").isNotNull and col("order_id_t").isNull) or
        col("quantity_t").isNull or col("price_t").isNull or col("date_t").isNull

    val invalid = typed.filter(nullRouted or (!nullRouted and castFailed))
      .select(Schemas.rawColumns.map(col): _*)
    val addr = col("purchase_address")
    def part(c: org.apache.spark.sql.Column, i: Int) =
      coalesce(split(c, ",").getItem(i - 1), lit(""))
    def subPart(c: org.apache.spark.sql.Column, i: Int) =
      coalesce(split(c, " ").getItem(i - 1), lit(""))
    val statePostal = trim(part(addr, 3))
    val valid = typed.filter(!nullRouted and !castFailed)
      .select(
        coalesce(col("order_id_t"),
          (-(pmod(xxhash64(col("product"), col("order_date"), col("purchase_address")),
            lit(2000000000L)) + 1)).cast(IntegerType)).as("order_id"),
        trim(col("product")).as("product"),
        col("quantity_t").as("quantity_ordered"),
        col("price_t").as("price_each"),
        col("date_t").as("order_date"),
        part(trim(addr), 1).as("street"),
        trim(part(addr, 2)).as("city"),
        subPart(statePostal, 1).as("state"),
        subPart(statePostal, 2).as("postal"))
    Routed(valid, invalid)
  }

  /** Watermarked tumbling-window aggregation over the events stream:
    * 5-minute windows by event_type, 10-minute late-data bound. State
    * per (window, type) only — bounded by watermark eviction. */
  def windowedEventAggs(events: DataFrame,
                        window_ : String = "5 minutes",
                        watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Gap-based session windows (native session_window): the streaming
    * form of q19's batch sessionization. */
  def sessionizedEvents(events: DataFrame,
                        gap: String = "30 minutes",
                        watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double,
                               errors: Long)

  /** Custom keyed state via flatMapGroupsWithState: per-user running
    * totals + error counts, emitted on every batch (Update mode).
    * The KeyValueGroupedDataset state pattern for logic the built-in
    * aggregates can't express (conditional counters here; in general
    * arbitrary per-key machines). */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0, 0L))
          var n = prev.n_events
          var tot = prev.total_value
          var err = prev.errors
          rows.foreach { e =>
            n += 1; tot += e.value
            if (e.event_type == "error") err += 1
          }
          val next = UserRunning(uid, n, math.round(tot * 100).toDouble / 100, err)
          state.update(next)
          Iterator(next)
      }
  }
}
