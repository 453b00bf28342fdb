package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, IntegerType, TimestampType}

/** F1/F2/G3/P1-P4/A5/S6 — validate, route, normalize, dedup
  * (ref: Cleansing.sql:2-128), set-based instead of the reference's
  * row-at-a-time cursor.
  *
  * Row routing contract (never abort the job on a bad row):
  *  - any NULL in product/quantity/price/date/address → invalid
  *    (ref: Cleansing.sql:37-54);
  *  - any typed cast failure (non-ANSI cast → NULL stands in for the
  *    reference's per-row EXCEPTION handler) → invalid
  *    (ref: Cleansing.sql:87-106);
  *  - NULL order_id alone is NOT invalid — it is backfilled
  *    max_order_id + row_number (ref: Cleansing.sql:56-61).
  *
  * The routing/normalization core (`route`/`normalized`) is stateless
  * and shared verbatim by the streaming cleanse
  * ([[graft.streaming.Streaming.cleanseStream]]) — only the order-id
  * strategy differs between batch and stream.
  *
  * Scale: one narrow pass over the input computes both routes (the
  * parent is cached by the caller if both outputs are consumed); the
  * only shuffle is the final exact-dedup (`dropDuplicates`), which is
  * a hash repartition on all 9 columns with map-side combine.
  */
object Cleanse {

  final case class Result(cleansed: DataFrame, invalid: DataFrame)

  private val requiredCols =
    Seq("product", "quantity_ordered", "price_each", "order_date", "purchase_address")

  /** Timestamp layout of the raw feed. The reference passes
    * 'MM-DD-YY HH24:MI' and relies on Postgres' lenient separator
    * matching against `01/22/19 21:25`-style data (Cleansing.sql:78);
    * Spark parses strictly, so we use the real layout. */
  val dateLayout = "MM/dd/yy HH:mm"

  /** Postgres SPLIT_PART returns '' (not NULL) for a missing part —
    * coalesce keeps malformed addresses flowing to cleansed with empty
    * components exactly like the reference. */
  private def part(c: Column, i: Int): Column =
    coalesce(split(c, ",").getItem(i - 1), lit(""))
  private def subPart(c: Column, i: Int): Column =
    coalesce(split(c, " ").getItem(i - 1), lit(""))

  /** Shared router core: attach typed casts (`*_t` columns) and split
    * the input into (valid-typed, invalid-raw). Stateless — safe on
    * both batch and streaming frames. */
  private[graft] def route(landing: DataFrame): (DataFrame, DataFrame) = {
    val nullRouted = requiredCols.map(col(_).isNull).reduce(_ or _)
    val typed = landing
      .withColumn("order_id_t", col("order_id").cast(IntegerType))
      .withColumn("quantity_t", col("quantity_ordered").cast(IntegerType))
      .withColumn("price_t", col("price_each").cast(DecimalType(10, 2)))
      .withColumn("date_t",
        to_timestamp(col("order_date"), dateLayout).cast(DateType).cast(TimestampType))
    val castFailed =
      (col("order_id").isNotNull and col("order_id_t").isNull) or
        col("quantity_t").isNull or col("price_t").isNull or col("date_t").isNull
    val invalid = typed
      .filter(nullRouted or (!nullRouted and castFailed))
      .select(Schemas.rawColumns.map(col): _*)
    val valid = typed.filter(!nullRouted and !castFailed)
    (valid, invalid)
  }

  /** Shared normalization projection (P1/P2 address split + trims)
    * over a routed valid-typed frame, with the caller-chosen order-id
    * column. */
  private[graft] def normalized(validTyped: DataFrame, orderId: Column): DataFrame = {
    val addr = col("purchase_address")
    val statePostal = trim(part(addr, 3))
    validTyped.select(
      orderId.cast(IntegerType).as("order_id"),
      trim(col("product")).as("product"),
      col("quantity_t").as("quantity_ordered"),
      col("price_t").as("price_each"),
      col("date_t").as("order_date"),
      part(trim(addr), 1).as("street"),
      trim(part(addr, 2)).as("city"),
      subPart(statePostal, 1).as("state"),
      subPart(statePostal, 2).as("postal"))
  }

  /** @param seedDf optional ONE-ROW frame whose first column is the
    *   id seed (e.g. the batch's own max id) — joined in-plan via a
    *   broadcast cross join so no driver round-trip splits the plan;
    *   combined with `maxExistingOrderId` via greatest. */
  def apply(landing: DataFrame, maxExistingOrderId: Int = 0,
            seedDf: Option[DataFrame] = None): Result = {
    val (valid, invalid) = route(landing)

    // G3 — backfill NULL order_ids with max_order_id + sequence. The
    // reference numbers them in cursor encounter order; we use a
    // deterministic sort over the full natural row content (documented
    // deviation, SURVEY §7.4-1). Only the (rare) NULL-id subset is
    // ranked, via the two-phase GlobalRank (no single-partition sort
    // even if "rare" means 10⁸ rows at 100 TB).
    val hasId = valid.filter(col("order_id_t").isNotNull)
      .withColumn("order_id_f", col("order_id_t"))
    val seed = seedDf match {
      case Some(s) =>
        greatest(lit(maxExistingOrderId),
          coalesce(col(s.columns.head).cast(IntegerType), lit(0)))
      case None => lit(maxExistingOrderId)
    }
    val noIdBase = valid.filter(col("order_id_t").isNull)
    val noIdSeeded = seedDf.fold(noIdBase)(s => noIdBase.crossJoin(broadcast(s)))
    val noId = graft.operators.GlobalRank.rowNumber(noIdSeeded, "__rn",
        col("product"), col("order_date"), col("purchase_address"),
        col("quantity_ordered"), col("price_each"))
      .withColumn("order_id_f", (seed + col("__rn")).cast(IntegerType))
      .drop("__rn" +: seedDf.map(_.columns.head).toSeq: _*)
    val withId = hasId.unionByName(noId)

    val cleansed = normalized(withId, col("order_id_f"))
      .dropDuplicates() // A5 — SELECT DISTINCT * (ref: Cleansing.sql:118-122)

    Result(cleansed, invalid)
  }
}
