package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the
  * clustering stage of semantic dedup (SemDeDup-style: cluster, then
  * prune near-identical members within each cluster) and of coarse
  * quantizer training at corpus scale.
  *
  * Complement to [[Similarity.trainCentroidArrays]], which trains on a
  * driver-local bounded sample: here BOTH steps are distributed —
  * assignment is a narrow projection against broadcast centroid
  * literals (k codegen'd vec_dot calls per row, no join, no row
  * amplification), and the centroid update is a posexplode +
  * per-(cluster, dim) average, which map-side combines to at most
  * k·dim partial cells per task before one shuffle. Only the model
  * state — k·dim doubles per iteration — ever reaches the driver,
  * exactly like MLlib's implementation strategy.
  *
  * Everything is deterministic so a SQL oracle can replay it:
  * centroids seed from the k lowest-id vectors, distances use the
  * sequential-fold vec_dot kernel, ties break on the lower cluster id,
  * and updated centroids are rounded to 9 decimals (absorbing
  * engine-specific float summation order, the same contract as the
  * PageRank/HITS intermediate rounding).
  */
object KMeans {

  /** dist²(v, c) decomposes as |v|² − 2·v·c + |c|²; for the argmin the
    * |v|² term is constant per row, so assignment ranks on
    * (|c|² − 2·v·c, cluster). */
  private def scoreTo(vec: Column, id: Int, c: Array[Double]): Column = {
    val cNorm2 = c.foldLeft(0.0)((s, x) => s + x * x)
    struct((lit(cNorm2) - lit(2.0) * Similarity.dot(vec, typedLit(c))).as("score"),
      lit(id).as("cluster"))
  }

  /** Assign each row to its nearest centroid (squared-Euclidean, ties
    * to the lower cluster id). Adds `cluster` and `score` columns. */
  def assign(df: DataFrame, cents: Array[(Int, Array[Double])],
             vecCol: String = "embedding"): DataFrame = {
    val best = array_min(array(cents.map { case (id, c) =>
      scoreTo(col(vecCol), id, c)
    }: _*))
    df.withColumn("__best", best)
      .withColumn("cluster", col("__best.cluster"))
      .withColumn("score", col("__best.score"))
      .drop("__best")
  }

  /** Run `iters` Lloyd iterations from the deterministic lowest-id
    * seed; returns the final (possibly < k, if a cluster empties)
    * centroids sorted by cluster id.
    *
    * @param df     input with an id column and a float/double array column
    * @param k      cluster count (seed = the k lowest ids)
    * @param iters  full assign+update rounds after seeding
    */
  def fit(df: DataFrame, k: Int, iters: Int,
          idCol: String = "vec_id", vecCol: String = "embedding")
  : Array[(Int, Array[Double])] = {
    // deterministic seed: the k lowest-id vectors, cluster id = seed rank
    var cents: Array[(Int, Array[Double])] = df
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
      .zipWithIndex.map { case (v, i) => (i, v) }

    for (_ <- 0 until iters) {
      // one shuffle: (cluster, dim) cells after map-side combine
      val updated = assign(df, cents, vecCol)
        .select(col("cluster"), posexplode(col(vecCol).cast("array<double>")))
        .groupBy("cluster", "pos")
        .agg(round(avg(col("col")), 9).as("m"))
        .groupBy("cluster")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("dims"))
        .select(col("cluster"), col("dims.m").as("cv"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      // empty clusters drop out; survivors keep their ids
      cents = updated.sortBy(_._1)
    }
    cents
  }
}
