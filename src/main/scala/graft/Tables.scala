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
  /** Canonicalize an event-time column to TIMESTAMP (µs precision,
    * session timezone pinned UTC — QueryDef.sessionConfs) regardless of
    * how the parquet writer encoded it. Upstream producers have shipped
    * this column three different ways across testdata refreshes, so the
    * engine's contract is: normalize ONCE at the source boundary; no
    * downstream operator ever sees a non-TIMESTAMP event time.
    *
    *  - `LongType`: TIMESTAMP(NANOS) parquet read as epoch-nanos longs
    *    (legacy.parquet.nanosAsLong). Converted with exact integer FLOOR
    *    division: a double division would lose precision (epoch-nanos
    *    exceed 2^53), and `div` alone truncates toward zero, which would
    *    shift pre-1970 timestamps +1µs. Subtracting the non-negative
    *    remainder first makes the division exact for any sign.
    *  - `TimestampNTZType`: timestamp[us] with no timezone (what
    *    pandas/pyarrow write by default). The cast reinterprets the
    *    wall-clock in the session timezone; with the session pinned to
    *    UTC this is lossless — identical micros value.
    *  - `TimestampType` / `DateType`: already instant-typed; dates
    *    widen to midnight UTC. */
  def toUtcTimestamp(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    df.schema(colName).dataType match {
      case LongType => df.withColumn(colName, expr(
        s"timestamp_micros(($colName - ((($colName % 1000) + 1000) % 1000)) div 1000)"))
      case TimestampNTZType | DateType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"column $colName: cannot canonicalize ${other.simpleString} to TIMESTAMP")
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    toUtcTimestamp(load(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (SQL entry path). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
