package graft.pipeline

import org.apache.spark.sql.types._

/** Fixed schemas of the warehouse pipeline (SURVEY §1).
  *
  * Landing/invalid/to_process are schema-on-read: six TEXT columns
  * (ref: Import.sql:15-22,32-39,50-57) so a malformed row can never
  * fail the scan — bad values are routed later by [[Cleanse]].
  */
object Schemas {

  val rawColumns: Seq[String] = Seq(
    "order_id", "product", "quantity_ordered",
    "price_each", "order_date", "purchase_address")

  /** All-string schema-on-read landing schema (ref: Import.sql:15-22). */
  val landing: StructType =
    StructType(rawColumns.map(StructField(_, StringType, nullable = true)))

  /** Typed cleansed schema (ref: Import.sql:68-78). order_date is a
    * TIMESTAMP that always holds midnight — the reference casts the
    * parsed timestamp to DATE and stores it back into a TIMESTAMP
    * column (Cleansing.sql:78). */
  val cleansed: StructType = StructType(Seq(
    StructField("order_id", IntegerType),
    StructField("product", StringType),
    StructField("quantity_ordered", IntegerType),
    StructField("price_each", DecimalType(10, 2)),
    StructField("order_date", TimestampType),
    StructField("street", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("postal", StringType)))
}
