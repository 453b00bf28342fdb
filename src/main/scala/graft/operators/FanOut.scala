package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for expression-amplifying stages.
  *
  * Operators like shingle explode (×50 rows) + salted md5 (×8 hashes)
  * do two orders of magnitude more compute than the scan that feeds
  * them. When the input's FILE layout yields fewer partitions than the
  * session has cores — a single small parquet file reads as one split —
  * that whole amplified stage runs serially, pinned to the input's
  * shape (measured: 3.3 s vs 0.5 s for the sf0.1 shingle table on 32
  * cores). Repartitioning to session parallelism costs one shuffle of
  * the SMALL pre-explosion rows.
  *
  * At scale this is a no-op by construction: a 100 TB corpus reads as
  * tens of thousands of splits, the condition is false, and no shuffle
  * is added where it would actually hurt.
  */
object FanOut {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
