package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and train/test splitting for
  * training-data pipelines.
  *
  * Membership depends only on the row's id — a 4-hex-digit md5 prefix
  * compared lexicographically against a fraction threshold — so
  * samples are reproducible across runs and engines, stable under
  * repartitioning, join-free, and carry no RNG state (contrast
  * `df.sample`, whose output changes with partitioning). Granularity
  * is 1/65536, which is ample for sampling purposes; the same bucket
  * function drives both operators, so a row's split never disagrees
  * with its sample membership.
  */
object Sampling {

  /** 4-hex-digit bucket in ["0000", "ffff"], uniform over ids. */
  def hashBucket(id: Column): Column = substring(md5(id.cast("string")), 1, 4)

  private def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    f"${math.min(0xffff, math.floor(fraction * 0x10000).toInt)}%04x"
  }

  /** Keep a deterministic ~`fraction` of rows, by id hash. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(hashBucket(col(idCol)) < lit(hexThreshold(fraction)))

  /** Tag every row 'test' (~`testFraction`) or 'train', by id hash. A
    * row's tag is a pure function of its id — re-running the pipeline,
    * repartitioning, or adding columns can never leak rows across the
    * split. `testFraction >= 1.0` tags every row 'test' (the threshold
    * caps at "ffff", which would otherwise leave the 1/65536 of ids in
    * the top bucket tagged 'train' — disagreeing with [[hashSample]]'s
    * keep-everything special case). */
  def trainTestSplit(df: DataFrame, idCol: String, testFraction: Double,
                     splitCol: String = "split"): DataFrame =
    if (testFraction >= 1.0) df.withColumn(splitCol, lit("test"))
    else df.withColumn(splitCol,
      when(hashBucket(col(idCol)) < lit(hexThreshold(testFraction)), "test")
        .otherwise("train"))

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis A-ES): taking the top-k rows by this key is
    * a weighted sample where a row's inclusion odds scale with
    * `weight` (> 0). The classic key is u^(1/w) with u ~ U(0,1); we
    * rank by its logarithm ln(u)/w — order-equivalent (ln is
    * monotone) and numerically tame for large weights where pow
    * underflows. u is id-derived — first 12 md5 hex digits mapped to
    * (h+1)/(2^48+1) ∈ (0,1) — so the draw is a pure row function:
    * reproducible across engines, runs, and partitionings, and the
    * global top-k plans as TakeOrderedAndProject (bounded
    * per-partition heaps, never a global sort). Both factors are
    * exact in doubles (48-bit integers; IEEE division), leaving libm
    * ln as the only cross-engine wobble — ulp-sized, absorbed by
    * rounding the emitted key. */
  def weightedSampleKey(id: Column, weight: Column): Column =
    log((conv(substring(md5(id.cast("string")), 1, 12), 16, 10)
        .cast("double") + 1.0d) / lit(math.pow(2, 48) + 1.0d)) /
      weight.cast("double")
}
