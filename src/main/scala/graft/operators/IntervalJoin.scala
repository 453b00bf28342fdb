package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join without an inequality cross join.
  *
  * A naive overlap join (`a.start <= b.end AND b.start <= a.end`) has
  * no equi-key, so Spark plans it as a broadcast nested loop — O(|A|·|B|)
  * comparisons, a scale killer. This operator discretizes time into
  * fixed-width buckets, explodes each interval to the buckets it
  * covers, equi-joins on the bucket id, and applies the exact overlap
  * predicate as a cheap residual. Comparison volume drops to the pairs
  * that share a bucket — proportional to the true output for
  * bucket widths near the typical interval length.
  *
  * A pair whose intervals share several buckets would surface once per
  * shared bucket; rather than a `distinct` (an extra shuffle over the
  * candidate set), each pair is kept only in the FIRST bucket both
  * intervals cover — `floor(max(a.start, b.start) / width)` — which is
  * computable per-candidate-row, making the join output exactly-once
  * by construction. (Used by q174; the same shape backs as-of and
  * range joins at 100 TB, where the bucket key also becomes the
  * partition key so candidates co-locate.)
  */
object IntervalJoin {

  /** Overlap-join two interval sets on long-typed bounds (closed
    * intervals, any unit — the caller picks epoch micros/seconds).
    *
    * @param a            left intervals with columns `aStart`, `aEnd`
    * @param b            right intervals with columns `bStart`, `bEnd`
    * @param bucketWidth  bucket size in the same unit as the bounds
    * @return candidate pairs passing the exact overlap predicate,
    *         exactly once each, with all columns of both inputs
    */
  def overlapJoin(a: DataFrame, b: DataFrame, bucketWidth: Long,
                  aStart: String = "a_start", aEnd: String = "a_end",
                  bStart: String = "b_start", bEnd: String = "b_end")
  : DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    // exact floor division for non-negative longs: `/` on Columns is
    // DOUBLE division, which can land a hair under an integer quotient
    // at epoch-micro magnitudes; subtracting the remainder first makes
    // the division exact (same trick as Tables.events' nanos→micros)
    def bucketOf(c: org.apache.spark.sql.Column) =
      ((c.cast("long") - pmod(c.cast("long"), w)) / w).cast("long")
    def buckets(s: String, e: String) =
      explode(sequence(bucketOf(col(s)), bucketOf(col(e))))
    val ab = a.withColumn("__bucket", buckets(aStart, aEnd))
    val bb = b.withColumn("__bucket", buckets(bStart, bEnd))
    ab.join(bb, Seq("__bucket"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      // exactly-once: keep the pair only in the first shared bucket
      .filter(col("__bucket") === bucketOf(greatest(col(aStart), col(bStart))))
      .drop("__bucket")
  }
}
