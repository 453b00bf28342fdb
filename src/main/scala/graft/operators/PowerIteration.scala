package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA by POWER ITERATION — the dominant eigenvector of
  * the (centered, unnormalized) covariance `Zᵀ Z`, computed without
  * ever materializing a matrix: each iteration is two distributed
  * matrix-vector products (`y = Z v`, `w = Zᵀ y`) expressed as
  * explode → broadcast-join → hash-aggregate. At 100 TB the only
  * state that ever leaves the executors is the dim-sized vector and
  * two scalar maxima per iteration.
  *
  * EXACT cross-engine determinism (the engine-wide discipline applied
  * to linear algebra): inputs quantize to integer micros
  * (`x6 = round(x·10⁶)`), centering is done in the n-scaled integer
  * form `z = n·x6 − Σx6` (no rational means), every product
  * `z·v6`/`z·y6` stays below 2⁵³ so the double multiply is EXACT, and
  * each product quantizes to `round(·/10³)` BEFORE the order-free
  * integer sum. Vectors renormalize to max-abs 10⁶ each half-step.
  * Every number the oracle sees is therefore bit-reproducible.
  *
  * Magnitude budget (|x| < 1, n ≤ 10⁶ rows, d ≤ 1024):
  * x6 ≤ 10⁶, S ≤ n·10⁶, z ≤ 2n·10⁶, z·v6 ≤ 2n·10¹² (< 2⁵³ for
  * n ≤ 4·10³; larger corpora should raise the /10³ quantizer — the
  * scale knob is explicit, not implicit float error). */
object PowerIteration {

  /** Returns the final max-abs-10⁶-normalized eigenvector estimate as
    * (dim index → v6) after `iters` iterations from the uniform
    * vector, plus the per-iteration pre-normalization max |w| (a
    * growth/convergence diagnostic). `emb` needs (idCol, vecCol). */
  def dominantEigenvector(emb: DataFrame, dims: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")
    : (Array[Long], Seq[Long]) = {
    val z = buildZ(emb, idCol, vecCol)
    try iterate(z, dims, iters, orthoTo = None)
    finally z.unpersist()
  }

  /** TOP-2 components: the dominant eigenvector, then DEFLATED power
    * iteration for the second — after each normalization the iterate
    * is Gram-Schmidt-orthogonalized against the (quantized) first
    * component and re-normalized, all in the same integer discipline
    * (the projection coefficient is a ratio of ≤ 64·10¹² integer dot
    * products; the subtraction quantizes per component). Shares ONE
    * cached Z materialization across both components. */
  def topTwoEigenvectors(emb: DataFrame, dims: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")
    : (Array[Long], Array[Long]) = {
    val z = buildZ(emb, idCol, vecCol)
    try {
      val (v1, _) = iterate(z, dims, iters, orthoTo = None)
      val (v2, _) = iterate(z, dims, iters, orthoTo = Some(v1))
      (v1, v2)
    } finally z.unpersist()
  }

  /** Centered, micro-quantized, n-scaled design matrix as (r, i, z),
    * cached and materialized. Callers unpersist. */
  private def buildZ(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val x6 = emb.select(col(idCol).as("r"), posexplode(col(vecCol))
        .as(Seq("i", "x")))
      .select(col("r"), col("i"),
        round(col("x").cast("double") * 1e6, 0).cast("long").as("x6"))
    val n = emb.count()
    val s = x6.groupBy("i").agg(sum("x6").as("s6"))
    val z = x6.join(broadcast(s), "i")
      .select(col("r"), col("i"),
        (lit(n) * col("x6") - col("s6")).as("z"))
      .cache()
    z.count() // materialize once; every iteration reuses it
    z
  }

  private def roundL(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def iterate(z: DataFrame, dims: Int, iters: Int,
      orthoTo: Option[Array[Long]]): (Array[Long], Seq[Long]) = {
    val spark = z.sparkSession
    import spark.implicits._
    var v6 = Array.fill(dims)(1000000L)
    // a uniform start can be parallel to v1; orthogonalize it first so
    // the deflated iteration never starts in the removed subspace
    orthoTo.foreach { v1 => v6 = orthonormalize(v6, v1) }
    val growth = scala.collection.mutable.ListBuffer.empty[Long]
    for (_ <- 1 to iters) {
      val vMap = map_from_arrays(
        typedLit((0 until dims).toList), typedLit(v6.toList))
      // cache y for the half-step: the maxY action and the Zᵀy join both
      // consume it, and without the cache each would recompute y = Zv
      // from Z (two full passes per iteration instead of one)
      val y = z
        .select(col("r"),
          round((col("z") * element_at(vMap, col("i"))).cast("double") / 1e3,
            0).cast("long").as("t"))
        .groupBy("r").agg(sum("t").as("y"))
        .cache()
      val w = try {
        val maxY = y.agg(max(abs(col("y")))).as[Long].collect().headOption
          .getOrElse(throw new IllegalArgumentException(
            "power iteration needs a non-empty input (0 rows)"))
        require(maxY > 0,
          "power iteration degenerate: Zv = 0 — input has zero variance " +
            "(all rows identical) or v lies in the null space")
        val y6 = y.select(col("r"),
          round(lit(1e6) * (col("y").cast("double") / lit(maxY.toDouble)), 0)
            .cast("long").as("y6"))
        z.join(y6, "r")
          .select(col("i"),
            round((col("z") * col("y6")).cast("double") / 1e3, 0)
              .cast("long").as("t"))
          .groupBy("i").agg(sum("t").as("w"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      } finally y.unpersist()
      val maxW = (0 until dims).map(i => math.abs(w.getOrElse(i, 0L))).max
      require(maxW > 0,
        "power iteration degenerate: ZᵀZv = 0 — input has zero variance")
      growth += maxW
      v6 = Array.tabulate(dims)(i =>
        roundL(1e6 * (w.getOrElse(i, 0L).toDouble / maxW.toDouble)))
      orthoTo.foreach { v1 => v6 = orthonormalize(v6, v1) }
    }
    (v6, growth.toList)
  }

  /** Gram-Schmidt step + max-abs-10⁶ renormalization, quantized:
    * `v − round(((v·v1)/(v1·v1)) · v1_i)`, dot products exact int64
    * (≤ dims·10¹²). */
  private def orthonormalize(v: Array[Long], v1: Array[Long]): Array[Long] = {
    val dv = v.indices.map(i => v(i) * v1(i)).sum
    val d1 = v1.indices.map(i => v1(i) * v1(i)).sum
    val coef = dv.toDouble / d1.toDouble
    val o = Array.tabulate(v.length)(i => v(i) - roundL(coef * v1(i)))
    val mx = o.map(math.abs).max
    require(mx > 0, "deflated iterate vanished: input has rank 1")
    Array.tabulate(v.length)(i => roundL(1e6 * (o(i).toDouble / mx.toDouble)))
  }

  /** Project every row onto a (nano-quantized) direction: the same
    * centered integer form and quantization as one E-step of
    * [[dominantEigenvector]] — `score_r = Σ_i round(z_ri·v6_i/10³)` —
    * so the scores are bit-reproducible and ready for exact
    * aggregation. Returns (idCol, score). */
  def projectScores(emb: DataFrame, v6: Array[Long],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dims = v6.length
    val x6 = emb.select(col(idCol).as("r"), posexplode(col(vecCol))
        .as(Seq("i", "x")))
      .select(col("r"), col("i"),
        round(col("x").cast("double") * 1e6, 0).cast("long").as("x6"))
    val n = emb.count()
    val s = x6.groupBy("i").agg(sum("x6").as("s6"))
    val vMap = map_from_arrays(
      typedLit((0 until dims).toList), typedLit(v6.toList))
    x6.join(broadcast(s), "i")
      .select(col("r"),
        round(((lit(n) * col("x6") - col("s6")) * element_at(vMap, col("i")))
          .cast("double") / 1e3, 0).cast("long").as("t"))
      .groupBy("r").agg(sum("t").as("score"))
  }
}
