package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 — CSV bulk load into the all-string landing frame
  * (ref: Import.sql:83-91).
  *
  * The all-string schema means the scan itself can never fail on a bad
  * row (mirrors Postgres COPY into TEXT columns): repeated header lines
  * and `,,,,,` lines land as ordinary rows and are routed by
  * [[Cleanse]]. Spark's `header=true` skips only the first line of the
  * (first) file, matching COPY's HEADER option; empty unquoted fields
  * read as NULL, matching COPY CSV defaults.
  *
  * Scale: a directory/glob of CSVs splits into one task per file block;
  * no shuffle — the load is embarrassingly parallel.
  */
object Ingest {
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(Schemas.landing)
      .csv(path)
}
