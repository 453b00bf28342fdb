package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Dot products use `zip_with` + `aggregate` over the array columns —
  * a sequential left fold in double precision, fully codegen'd, no
  * explode (the 64-element loop stays inside one projection, no row
  * amplification). Brute-force top-k is the exactness baseline; the
  * LSH-bucketed variant is the scale path: random-hyperplane signs are
  * derived from md5 (deterministic, seedless), candidates only within
  * matching buckets.
  */
object Similarity {

  /** Sequential-fold dot product in double precision — the native
    * codegen'd [[graft.functions.VecDot]] expression (the equivalent
    * `aggregate(zip_with(...))` HOF formulation is interpreted and
    * ~10-30× slower on all-pairs scans; fold order and therefore IEEE
    * results are identical). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecDot.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k neighbors for each query vector.
    *
    * @param queries  (qid, qvec)
    * @param corpus   (cid, cvec)
    * Scale: corpus partitions stream against broadcast queries (hint the
    * smaller side); the only wide exchange is the per-query top-k
    * window, shuffled by qid.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "qid", qVec: String = "qvec",
                     cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    // norms depend on one row — precompute before the pair join so the
    // O(Q×N) hot loop does one dot product per pair, not three
    val q = queries.withColumn("qn", norm(col(qVec)))
    val c = corpus.withColumn("cn", norm(col(cVec)))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", dot(col(qVec), col(cVec)) / (col("qn") * col("cn")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(qId).orderBy(col("cos").desc, col(cId).asc)))
      .filter(col("rank") <= k)
      .select(col(qId), col("rank"), col(cId).as("neighbor_id"), col("cos"))
  }

  /** Deterministic random-hyperplane sign for (plane p, dim i):
    * parity of the first md5 hex digit of "p:i". */
  private def planeSign(p: Int, dim: Column): Column = {
    val nib = instr(lit("0123456789abcdef"),
      substring(md5(concat(lit(p + ":"), dim)), 1, 1)) - 1
    when(nib % 2 === 1, 1.0).otherwise(-1.0)
  }

  /** LSH bucket key: concatenated signs of `planes` random-hyperplane
    * projections. Vectors in the same bucket are likely neighbors. */
  def lshBucket(vec: Column, dims: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dims - 1)),
          (x, i) => x.cast("double") * planeSign(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** IVF-style approximate top-k without a training step: `nCentroids`
    * corpus vectors chosen deterministically (lowest ids) act as the
    * coarse quantizer; every corpus vector is assigned to its nearest
    * centroid (one broadcast pass), and each query probes the
    * `nProbe` nearest centroid cells. Compared to LSH this adapts to
    * the data's actual geometry; compared to brute force it scans
    * ~nProbe/nCentroids of the corpus. At real scale the centroid set
    * would come from k-means — the assignment/probe dataflow (the
    * Spark-shaped part) is identical. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              qId: String = "qid", qVec: String = "qvec",
              cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    val centroids = corpus.orderBy(col(cId)).limit(nCentroids)
      .select(col(cId).as("centroid_id"), col(cVec).as("centroid_vec"))
      .withColumn("centroid_n", norm(col("centroid_vec")))
    val cN = corpus.withColumn("cn", norm(col(cVec)))
    val qN = queries.withColumn("qn", norm(col(qVec)))
    // assign corpus vectors to their nearest centroid (precomputed norms)
    val assigned = cN.crossJoin(broadcast(centroids))
      .withColumn("c_sim",
        dot(col(cVec), col("centroid_vec")) / (col("cn") * col("centroid_n")))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(cId).orderBy(col("c_sim").desc, col("centroid_id").asc)))
      .filter(col("c_rank") === 1)
      .select(col(cId), col(cVec), col("cn"), col("centroid_id").as("cell"))
    // each query probes its nProbe nearest cells
    val probes = qN.crossJoin(broadcast(centroids))
      .withColumn("q_sim",
        dot(col(qVec), col("centroid_vec")) / (col("qn") * col("centroid_n")))
      .withColumn("q_rank", row_number().over(
        Window.partitionBy(qId).orderBy(col("q_sim").desc, col("centroid_id").asc)))
      .filter(col("q_rank") <= nProbe)
      .select(col(qId), col(qVec), col("qn"), col("centroid_id").as("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", dot(col(qVec), col(cVec)) / (col("qn") * col("cn")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(qId).orderBy(col("cos").desc, col(cId).asc)))
      .filter(col("rank") <= k)
      .select(col(qId), col("rank"), col(cId).as("neighbor_id"), col("cos"))
  }

  /** Approximate top-k: candidates restricted to the query's LSH
    * bucket plus all Hamming-distance-1 buckets (multi-probe — on
    * near-uniform vectors single-bucket recall collapses; probing the
    * `planes` adjacent buckets recovers most of it for a
    * (planes+1)/2^planes fraction of the corpus compared). The bucket
    * equi-join replaces the cross join — at N corpus vectors the
    * compare count drops ~2^planes/(planes+1)-fold. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dims: Int, planes: Int = 4,
              qId: String = "qid", qVec: String = "qvec",
              cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    val base = queries.withColumn("bucket0", lshBucket(col(qVec), dims, planes))
    val flip = (i: Int) => concat(
      substring(col("bucket0"), 1, i),
      when(substring(col("bucket0"), i + 1, 1) === "1", "0").otherwise("1"),
      substring(col("bucket0"), i + 2, planes - i - 1))
    val probes = array((col("bucket0") +: (0 until planes).map(flip)): _*)
    val qb = base
      .withColumn("bucket", explode(probes))
      .withColumn("qn", norm(col(qVec)))
      .drop("bucket0")
    val cb = corpus
      .withColumn("bucket", lshBucket(col(cVec), dims, planes))
      .withColumn("cn", norm(col(cVec)))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", dot(col(qVec), col(cVec)) / (col("qn") * col("cn")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(qId).orderBy(col("cos").desc, col(cId).asc)))
      .filter(col("rank") <= k)
      .select(col(qId), col("rank"), col(cId).as("neighbor_id"), col("cos"))
  }
}
