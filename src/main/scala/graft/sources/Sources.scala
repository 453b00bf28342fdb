package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2.1): schema-on-read CSV (the
  * reference's only input format), parquet (the engine's canonical
  * storage), and JSON lines — each with explicit-schema reads so a bad
  * record can never fail a scan (PERMISSIVE + all declared columns).
  *
  * Write-side scale knobs:
  *  - `partitionBy` → directory-partitioned layout; partition pruning
  *    turns date/tenant filters into file skips at 100 TB;
  *  - bucketed writes (`bucketBy` via `saveAsTable`) co-locate join
  *    keys so repeated large-table joins skip their shuffles.
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true,
              options: Map[String, String] = Map.empty): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .options(options)
      .schema(schema)
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("mode", "PERMISSIVE").schema(schema).json(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeParquet(df: DataFrame, path: String,
                   partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               options: Map[String, String] = Map.empty): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString)
      .options(options).csv(path)

  /** Options that make a CSV round-trip LOSSLESS for free text: quoted
    * embedded newlines survive (`multiLine` read), and NULL vs
    * empty-string stay distinct (explicit `nullValue` sentinel — the
    * format's default maps both to the empty string on write). The
    * reference ingests exclusively from CSV, so this is its data
    * fidelity contract; q188 gates it byte-for-byte. */
  val losslessCsv: Map[String, String] =
    Map("nullValue" -> "\\N", "escape" -> "\"", "multiLine" -> "true")

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC — the other columnar warehouse format Spark ships natively;
    * same pushdown/pruning behavior as parquet (predicates reach the
    * scan, see SourcesSpec). */
  def writeOrc(df: DataFrame, path: String,
               partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }

  /** Bucketed managed table: co-locates `bucketCols` so equi-joins and
    * aggregations on them skip the shuffle entirely (requires a
    * warehouse-backed table, hence saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
