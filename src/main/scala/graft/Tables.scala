package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic parquet tables
  * (`/root/testdata/sf*`, see TESTDATA.md). One parquet file per table.
  *
  * All loads are plain `spark.read.parquet` scans so Catalyst can push
  * filters/projections into the columnar reader; no caching here — the
  * query layer decides what to cache.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) in parquet — read as epoch-nanos
    * long (legacy.parquet.nanosAsLong) and converted to a microsecond
    * timestamp with exact integer FLOOR division: a double division
    * would lose precision (epoch-nanos exceed 2^53), and `div` alone
    * truncates toward zero, which would shift pre-1970 timestamps
    * +1µs. Subtracting the non-negative remainder first makes the
    * division exact for any sign. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros((ts - (((ts % 1000) + 1000) % 1000)) div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (SQL entry path). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
