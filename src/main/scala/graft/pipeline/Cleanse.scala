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

  def apply(landing: DataFrame, maxExistingOrderId: Int = 0): Result = {
    val nullRouted = requiredCols.map(col(_).isNull).reduce(_ or _)

    // Typed casts; non-ANSI cast yields NULL on failure (engine-wide
    // contract, QueryDef.sessionConfs).
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

    // G3 — backfill NULL order_ids with max_order_id + sequence. The
    // reference numbers them in cursor encounter order; we use a
    // deterministic sort on the natural row content (documented
    // deviation, SURVEY §7.4-1). Only the (rare) NULL-id subset pays
    // the single-partition window — the main flow stays narrow.
    val hasId = valid.filter(col("order_id_t").isNotNull)
      .withColumn("order_id_f", col("order_id_t"))
    val noId = valid.filter(col("order_id_t").isNull)
      .withColumn("order_id_f",
        lit(maxExistingOrderId) + row_number().over(
          Window.orderBy("product", "order_date", "purchase_address")))
    val withId = hasId.unionByName(noId)

    // P1/P2 — address split (ref: Cleansing.sql:65-68) + trims.
    val addr = col("purchase_address")
    val statePostal = trim(part(addr, 3))
    val cleansed = withId.select(
      col("order_id_f").cast(IntegerType).as("order_id"),
      trim(col("product")).as("product"),
      col("quantity_t").as("quantity_ordered"),
      col("price_t").as("price_each"),
      col("date_t").as("order_date"),
      part(trim(addr), 1).as("street"),
      trim(part(addr, 2)).as("city"),
      subPart(statePostal, 1).as("state"),
      subPart(statePostal, 2).as("postal")
    ).dropDuplicates() // A5 — SELECT DISTINCT * (ref: Cleansing.sql:118-122)

    Result(cleansed, invalid)
  }
}
