package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8 — orchestration (ref: MotherProcedure.sql:2-25): the `CALL etl`
  * chain import → cleanse → location → time → product → fact as one
  * lazy composition.
  *
  * `cleansed` is cached: it is read by all three dimension builds and
  * the fact build (four consumers), exactly the reuse the reference
  * buys with its materialized staging tables — but nothing else is
  * materialized; Catalyst pipelines each stage (SURVEY §4).
  */
object Pipeline {

  final case class Result(
      landing: DataFrame,
      invalid: DataFrame,
      cleansed: DataFrame,
      locationDim: DataFrame,
      timeDim: DataFrame,
      productDim: DataFrame,
      fact: DataFrame)

  def run(spark: SparkSession, csvPath: String, denseFact: Boolean = true): Result = {
    val landing = Ingest.load(spark, csvPath)
    // Seed the NULL-order_id backfill above the batch's own max id so
    // backfilled ids can never collide with real ones. The reference
    // seeds only from the pre-batch warehouse (Cleansing.sql:16) and
    // CAN collide within a batch — documented deviation (sane fix).
    // The seed is a one-row aggregate joined in-plan (broadcast cross
    // join inside Cleanse) — no driver round-trip splitting the plan.
    val seed = landing.agg(
      org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col("order_id").cast("int")),
        org.apache.spark.sql.functions.lit(0)).as("__seed"))
    val routed = Cleanse(landing, seedDf = Some(seed))
    val cleansed = routed.cleansed.cache()
    val location = LocationDim(cleansed)
    val time = TimeDim(cleansed)
    val product = ProductDim(cleansed)
    val fact = FactBuilder(cleansed, product, location, time, dense = denseFact)
    Result(landing, routed.invalid, cleansed, location, time, product, fact)
  }

  /** Persist every output as parquet under `outDir` (the reference's
    * CREATE TABLE AS materialization, SURVEY §2 S4).
    *
    * @param bucketedFactTable when set, the fact table is ALSO written
    *   as a managed table bucketed+sorted by `location_id` (the fact's
    *   highest-cardinality join/grouping key): downstream location
    *   joins and rollups read co-located buckets and skip their
    *   shuffle — the write-side knob that matters most at 100 TB,
    *   where the fact⋈fact / fact-groupBy shuffle dominates. */
  def runAndSave(spark: SparkSession, csvPath: String, outDir: String,
                 denseFact: Boolean = true,
                 bucketedFactTable: Option[String] = None,
                 factBuckets: Int = 32): Result = {
    val r = run(spark, csvPath, denseFact)
    Seq(
      "invalid" -> r.invalid, "cleansed" -> r.cleansed,
      "location_dimension" -> r.locationDim, "time_dimension" -> r.timeDim,
      "product_dimension" -> r.productDim, "fact_table" -> r.fact
    ).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }
    bucketedFactTable.foreach { table =>
      graft.sources.Sources.writeBucketed(r.fact, table,
        Seq("location_id"), factBuckets)
    }
    r
  }
}
