package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Dot products use the native codegen'd [[graft.functions.VecDot]]
  * expression — a sequential left fold in double precision compiled
  * into whole-stage codegen (no explode: the 64-element loop stays
  * inside one projection, no row amplification). Brute-force top-k is
  * the exactness baseline; LSH buckets and IVF cells are the scale
  * paths: both turn the all-pairs cross join into an equi-join on a
  * bucket/cell key, with a probe knob that trades recall for scan
  * fraction (probe-all ⇒ provably identical to brute force).
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
    topK(scored, k, qId, cId)
  }

  /** Filtered (predicate-constrained) exact top-k: neighbors must
    * match the query on `filterKeys` — the production retrieval shape
    * ("top-k similar WHERE lang = X / tenant = Y"). The filter is an
    * EQUI-join key, so the pair generation is hash-partitioned by the
    * key instead of a crossJoin against the whole corpus: at 100 TB
    * each query scores only its key's partition slice, and the same
    * bounded-heap top-k reduction applies before the exchange. Queries
    * broadcast (they are the small side by construction). */
  def filteredTopK(queries: DataFrame, corpus: DataFrame,
                   filterKeys: Seq[String], k: Int,
                   qId: String = "qid", qVec: String = "qvec",
                   cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    require(filterKeys.nonEmpty, "filterTopK without keys is bruteForceTopK")
    val q = queries.withColumn("qn", norm(col(qVec)))
    val c = corpus.withColumn("cn", norm(col(cVec)))
    val scored = c.join(broadcast(q), filterKeys)
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", dot(col(qVec), col(cVec)) / (col("qn") * col("cn")))
    topK(scored, k, qId, cId)
  }

  private def topK(scored: DataFrame, k: Int, qId: String, cId: String): DataFrame = {
    // native bounded-heap reduction first: each scan partition keeps at
    // most k candidates per query BEFORE the exchange, so the rank
    // window sorts k·queries survivor rows, never the full O(Q×N)
    // scored set (which the old window-only plan shuffled and sorted
    // wholesale — the classic 100 TB top-k trap)
    val reduced = graft.plans.TopK.topKPerGroup(scored,
      Seq(col(qId)), Seq(col("cos").desc, col(cId).asc), k)
    reduced
      .withColumn("rank", row_number().over(
        Window.partitionBy(qId).orderBy(col("cos").desc, col(cId).asc)))
      .select(col(qId), col("rank").cast("long").as("rank"),
        col(cId).as("neighbor_id"), col("cos"))
  }

  /** Deterministic ±1 random-hyperplane signs, precomputed ONCE on the
    * driver: sign(p, i) = parity of the first md5 hex digit of "p:i" —
    * the same derivation the previous in-plan formulation used, minus
    * the planes×dims md5 digests *per row* (256 digests/row at
    * dims=64, planes=4, and inside an interpreted HOF at that). The
    * matrix depends only on (dims, planes), so it ships to executors
    * as literal arrays and the projection is a codegen'd vec_dot. */
  private[operators] def planeSigns(dims: Int, planes: Int): Array[Array[Double]] =
    Array.tabulate(planes) { p =>
      Array.tabulate(dims) { i =>
        val d = MessageDigest.getInstance("MD5")
          .digest(s"$p:$i".getBytes(StandardCharsets.UTF_8))
        if (((d(0) >> 4) & 0xf) % 2 == 1) 1.0 else -1.0
      }
    }

  /** LSH bucket key: concatenated signs of `planes` random-hyperplane
    * projections. Vectors in the same bucket are likely neighbors.
    * Bucket values are bit-identical to the pre-constant-folded
    * version (same signs, same sequential fold order). */
  def lshBucket(vec: Column, dims: Int, planes: Int): Column = {
    val signs = planeSigns(dims, planes)
    val bits = (0 until planes).map { p =>
      when(dot(vec, typedLit(signs(p))) >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Spherical k-means centroids (Lloyd's iterations with cosine
    * assignment and normalized-mean update — Dhillon & Modha 2001),
    * trained on a bounded deterministic sample. A coarse quantizer is
    * MODEL STATE: its quality depends on seeing the corpus's cluster
    * structure, not every row, so training reads a `sampleCap`-bounded
    * sample and the Lloyd iterations run on the driver over that
    * sample — k×dims×cap doubles of local math, ZERO distributed
    * passes beyond the one sampling scan. (The previous formulation
    * ran each iteration as a full-corpus `posexplode` — a 64×-row-
    * amplified scan ×3 iterations ×every query that trained; at 100 TB
    * that is 3 extra full-table passes per top-k query.)
    *
    * Sampling is the engine's deterministic md5-order trick (same
    * family as [[Sampling.hashBucket]]): rows ordered by
    * (md5(id), id) are a uniform pseudo-random permutation, and
    * `orderBy.limit` plans as TakeOrderedAndProject — a size-(cap)
    * bounded heap per partition, one narrow scan, no shuffle of the
    * corpus and no RNG state. Same ids ⇒ same sample ⇒ same centroids,
    * on any partitioning, any cluster, any run.
    *
    * @return (centroid_id, centroid_vec: array<double>) — unit-norm
    * @param iters 0 ⇒ just the normalized seed vectors
    * @param sampleCap max vectors collected for training (cap×dims
    *                  doubles of driver memory — 16k×64 ≈ 8 MB)
    */
  def trainCentroids(corpus: DataFrame, nCentroids: Int, iters: Int = 3,
                     cId: String = "cid", cVec: String = "cvec",
                     sampleCap: Int = 16384): DataFrame =
    centroidsDf(corpus.sparkSession,
      trainCentroidArrays(corpus, nCentroids, iters, cId, cVec, sampleCap))

  private def l2normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** See [[trainCentroids]] — returns the unit-norm centroid arrays
    * themselves so consumers can embed them as plan literals, train
    * ONCE per corpus, and share one quantizer across queries (the
    * `centroids` parameter of [[ivfTopK]] / [[cosineNearDupPairs]]). */
  def trainCentroidArrays(corpus: DataFrame, nCentroids: Int, iters: Int = 3,
                          cId: String = "cid", cVec: String = "cvec",
                          sampleCap: Int = 16384): Array[(Int, Array[Double])] = {
    require(sampleCap >= nCentroids, s"sampleCap $sampleCap < nCentroids $nCentroids")
    // the ONLY distributed work: one narrow scan, per-partition bounded
    // heaps, cap rows to the driver (model state, not data collection)
    val sample: Array[Array[Double]] = corpus
      .select(md5(col(cId).cast("string")).as("__rnd"),
        col(cId).cast("string").as("__sid"),
        col(cVec).cast("array<double>").as("__v"))
      .orderBy(col("__rnd"), col("__sid"))
      .limit(sampleCap)
      .select(col("__v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)

    var cents: Array[(Int, Array[Double])] = sample.take(nCentroids)
      .map(l2normalize)
      .zipWithIndex.map { case (v, i) => (i, v) }

    val normed = sample.map(l2normalize)
    for (_ <- 0 until iters) {
      // local Lloyd iteration over the sample: assign to max-dot cell
      // (ties → lower cell id), update = normalized per-cell sum;
      // empty cells keep their previous centroid
      val sums = scala.collection.mutable.Map.empty[Int, Array[Double]]
      normed.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        cents.foreach { case (id, cv) =>
          var d = 0.0; var i = 0
          val n = math.min(v.length, cv.length)
          while (i < n) { d += v(i) * cv(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = id }
        }
        val acc = sums.getOrElseUpdate(best, new Array[Double](v.length))
        var i = 0
        while (i < math.min(v.length, acc.length)) { acc(i) += v(i); i += 1 }
      }
      cents = cents.map { case (id, old) =>
        (id, sums.get(id).map(l2normalize).getOrElse(old))
      }
    }
    cents
  }

  private def centroidsDf(spark: SparkSession,
                          cents: Array[(Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    cents.toSeq.toDF("centroid_id", "centroid_vec")
  }

  /** Per-row centroid ranking as ONE narrow projection: an array of
    * (−dot, cell, ‖μ‖) structs, ascending-sorted, so element 0 is the
    * max-cosine cell (centroids are unit-norm ⇒ argmax dot ≡ argmax
    * cosine; ties break on the lower cell id, matching the previous
    * window formulation). The k dot products are codegen'd vec_dot
    * against literal arrays — no centroid join, no shuffle, no row
    * amplification. */
  private def cellRanking(vec: Column, cents: Array[(Int, Array[Double])]): Column =
    array_sort(array(cents.map { case (id, v) =>
      struct((dot(vec, typedLit(v)) * lit(-1.0)).as("negdot"),
        lit(id).as("cell"), lit(math.sqrt(v.map(x => x * x).sum)).as("mun"))
    }: _*))

  /** IVF-style approximate top-k: a spherical-k-means coarse quantizer
    * ([[trainCentroids]]; `trainIters = 0` degrades to the
    * deterministic lowest-id seed), every corpus vector assigned to
    * its nearest centroid cell (one broadcast pass), each query
    * probing its `nProbe` nearest cells. Compared to LSH this adapts
    * to the data's actual geometry; compared to brute force it scans
    * ~nProbe/nCentroids of the corpus. `nProbe = nCentroids` probes
    * every cell and is provably identical to [[bruteForceTopK]] —
    * regardless of the quantizer, so `centroids` may be anything.
    *
    * @param centroids precomputed quantizer ([[trainCentroidArrays]])
    *                  — pass it to train ONCE per corpus and share the
    *                  model across every query touching that corpus;
    *                  None trains on a bounded sample here. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4, trainIters: Int = 3,
              qId: String = "qid", qVec: String = "qvec",
              cId: String = "cid", cVec: String = "cvec",
              centroids: Option[Array[(Int, Array[Double])]] = None): DataFrame = {
    val cents = centroids.getOrElse(
      trainCentroidArrays(corpus, nCentroids, trainIters, cId, cVec))
    // cell assignment / probing are narrow projections against the
    // literal centroid matrix — the only exchange is the candidate join
    val assigned = corpus
      .withColumn("cn", norm(col(cVec)))
      .withColumn("cell", cellRanking(col(cVec), cents)(0)("cell"))
      .select(col(cId), col(cVec), col("cn"), col("cell"))
    // each query probes its nProbe nearest cells
    val probes = queries
      .withColumn("qn", norm(col(qVec)))
      .withColumn("cell", explode(transform(
        slice(cellRanking(col(qVec), cents), 1, nProbe), s => s("cell"))))
      .select(col(qId), col(qVec), col("qn"), col("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col(qId) =!= col(cId))
      .withColumn("cos", dot(col(qVec), col(cVec)) / (col("qn") * col("cn")))
    topK(scored, k, qId, cId)
  }

  /** Approximate top-k via LSH buckets. Default probing is the query's
    * bucket plus all Hamming-distance-1 buckets (multi-probe — on
    * near-uniform vectors single-bucket recall collapses; probing the
    * `planes` adjacent buckets recovers most of it for a
    * (planes+1)/2^planes fraction of the corpus compared). The bucket
    * equi-join replaces the cross join — at N corpus vectors the
    * compare count drops ~2^planes/(planes+1)-fold.
    * `probeAll = true` probes every one of the 2^planes buckets: each
    * corpus vector then matches exactly one probe, so the candidate
    * set is all Q×N pairs and the result is provably identical to
    * [[bruteForceTopK]] (the oracle-checkable configuration). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dims: Int, planes: Int = 4,
              probeAll: Boolean = false,
              qId: String = "qid", qVec: String = "qvec",
              cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    val base = queries.withColumn("bucket0", lshBucket(col(qVec), dims, planes))
    val flip = (i: Int) => concat(
      substring(col("bucket0"), 1, i),
      when(substring(col("bucket0"), i + 1, 1) === "1", "0").otherwise("1"),
      substring(col("bucket0"), i + 2, planes - i - 1))
    val probes =
      if (probeAll) {
        val all = (0 until (1 << planes)).map(b =>
          (planes - 1 to 0 by -1).map(i => (b >> i) & 1).mkString)
        typedLit(all)
      } else array((col("bucket0") +: (0 until planes).map(flip)): _*)
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
    topK(scored, k, qId, cId)
  }

  /** IVF-PQ search — the composed billion-vector serving plan: a
    * coarse quantizer routes each query to its `nProbe` nearest cells,
    * an ASYMMETRIC-DISTANCE scan ranks the cells' PQ CODES (two
    * subspace codebooks; per candidate the cost is two broadcast-map
    * lookups and one add — the full vector is never touched), the
    * best `shortlist` candidates are re-ranked with exact cosine on
    * their real vectors, and the top `k` survive.
    *
    * Scale shape: the ADC scan reads (id, cell, code_lo, code_hi) —
    * a ~10-byte row regardless of dimensionality, which is the entire
    * point of PQ at 10⁹ vectors — joined to broadcast probes keyed by
    * cell; the LUTs are per-query literal-centroid projections
    * (constant-folded codebooks, no join); only `shortlist` rows per
    * query ever touch full vectors again. Both ranking stages go
    * through the native bounded-heap [[graft.plans.TopK]] reduction.
    *
    * Everything is deterministic (lowest-id k-means seeds, 9-decimal
    * centroid rounding, (score, id) tie-breaks) so a SQL oracle can
    * replay the whole pipeline — the q254 gate does, at all SFs. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int, dims: Int,
                m: Int = 8, shortlist: Int = 64, nCoarse: Int = 4,
                nProbe: Int = 2, pqK: Int = 4, iters: Int = 1,
                qId: String = "qid", qVec: String = "qvec",
                cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    require(dims % m == 0, s"ivfPqTopK needs $m | $dims subspaces")
    val sub = dims / m
    def n2(c: Array[Double]) = c.foldLeft(0.0)((s, x) => s + x * x)
    def subSlice(v: Column, j: Int) = slice(v, j * sub + 1, sub)
    // deterministic training: coarse quantizer on full vectors, one PQ
    // codebook per subspace (m small subspaces — not two big halves —
    // is what makes the ADC estimate track true distance)
    val coarse = KMeans.fit(corpus, nCoarse, iters, cId, cVec)
    val books = (0 until m).map { j =>
      KMeans.fit(corpus.select(col(cId), subSlice(col(cVec), j).as("v")),
        pqK, iters, cId, "v")
    }
    // encode: cell + m sub-codes; the codes table is what a deployment
    // would persist (q241's table-served layout) — vectors drop out
    val codes = books.zipWithIndex.foldLeft(
      KMeans.assign(corpus, coarse, cVec)
        .withColumnRenamed("cluster", "cell").drop("score")) {
      case (df, (book, j)) =>
        KMeans.assign(df.withColumn("__sub", subSlice(col(cVec), j)),
          book, "__sub")
          .withColumnRenamed("cluster", s"code_$j").drop("score", "__sub")
    }.select(col(cId) +: col("cell") +:
      (0 until m).map(j => col(s"code_$j")): _*)
    // query side: probe ranking + per-subspace ADC lookup tables, all
    // pure projections against the literal codebooks
    val cellScores = sort_array(array(coarse.map { case (id, c) =>
      struct((lit(n2(c)) - lit(2.0) * dot(col(qVec), typedLit(c))).as("score"),
        lit(id).as("cell"))
    }: _*))
    def lut(cents: Array[(Int, Array[Double])], qSub: Column) =
      map_from_arrays(typedLit(cents.map(_._1)),
        array(cents.map { case (_, c) =>
          lit(n2(c)) - lit(2.0) * dot(qSub, typedLit(c))
        }: _*))
    val probes = (0 until m).foldLeft(
      queries.withColumn("qn", norm(col(qVec)))) { (df, j) =>
        df.withColumn(s"lut_$j", lut(books(j), subSlice(col(qVec), j)))
      }
      .withColumn("cell", explode(transform(
        slice(cellScores, 1, nProbe), s => s("cell"))))
      .select(col(qId) +: col(qVec) +: col("qn") +: col("cell") +:
        (0 until m).map(j => col(s"lut_$j")): _*)
    // ADC scan over codes in the probed cells: m map lookups + adds
    val adcScored = codes.join(broadcast(probes), Seq("cell"))
      .filter(col(qId) =!= col(cId))
      .withColumn("adc", (0 until m).map(j =>
        element_at(col(s"lut_$j"), col(s"code_$j"))).reduce(_ + _))
    val short = graft.plans.TopK.topKPerGroup(adcScored, Seq(col(qId)),
      Seq(col("adc").asc, col(cId).asc), shortlist)
      .select(col(qId), col(qVec), col("qn"), col(cId))
    // exact re-rank of the shortlist only
    val rer = short.join(
      corpus.select(col(cId), col(cVec)).withColumn("cn", norm(col(cVec))),
      cId)
      .withColumn("cos", dot(col(qVec), col(cVec)) / (col("qn") * col("cn")))
    topK(rer, k, qId, cId)
  }

  /** Exact cosine-threshold near-duplicate pairs WITHOUT a cartesian
    * product: IVF cells + angular triangle-inequality cell-pair
    * pruning.
    *
    * Every vector joins its nearest centroid cell; per cell we record
    * the max angular radius r. For vectors a∈cell_i, b∈cell_j the
    * angular triangle inequality gives
    *   angle(a,b) ≥ angle(μ_i,μ_j) − r_i − r_j,
    * so a cell pair can contain a qualifying pair (cos ≥ t, i.e.
    * angle ≤ arccos t) only if angle(μ_i,μ_j) − r_i − r_j ≤ arccos t.
    * All other cell pairs are pruned before any vector pair is
    * compared. Candidates come from an equi-join against the tiny
    * admissible (cell_a, cell_b) list (broadcast); the final exact
    * cosine filter makes the output provably identical to the
    * all-pairs baseline (which survives as the spec/DuckDB oracle).
    * On clustered corpora pruning removes most cell pairs; the worst
    * case (uniform vectors, radii ≈ π/2) degrades to the same compare
    * count as brute force — but never to a CartesianProduct plan node,
    * and the exchange is keyed by cell, so it partitions. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
                         nCentroids: Int = 16, trainIters: Int = 3,
                         cId: String = "cid", cVec: String = "cvec",
                         centroids: Option[Array[(Int, Array[Double])]] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val angleOf = (c: Column) => acos(least(greatest(c, lit(-1.0)), lit(1.0)))
    // output is threshold-exact for ANY quantizer (assignment, radii,
    // and pruning all derive from the same cents), so a shared
    // precomputed model is always safe
    val cents = centroids.getOrElse(
      trainCentroidArrays(corpus, nCentroids, trainIters, cId, cVec))
    // assignment + angle-to-centroid in one narrow projection
    val assigned = corpus
      .withColumn("cn", norm(col(cVec)))
      .withColumn("top", cellRanking(col(cVec), cents)(0))
      .select(col(cId), col(cVec), col("cn"), col("top")("cell").as("cell"),
        angleOf((col("top")("negdot") * lit(-1.0)) /
          (col("cn") * col("top")("mun"))).as("angle"))
    val cellStats = assigned.groupBy("cell").agg(max("angle").as("radius"))
    // μ-pair angles are pure model state — computed on the driver (k²
    // values), joined against the data-derived radii as a tiny DF
    val muPairs = (for {
      (i, vi) <- cents.toSeq; (j, vj) <- cents.toSeq if i <= j
    } yield {
      var d = 0.0; var s = 0; while (s < math.min(vi.length, vj.length)) { d += vi(s) * vj(s); s += 1 }
      val ni = math.sqrt(vi.map(x => x * x).sum); val nj = math.sqrt(vj.map(x => x * x).sum)
      (i, j, math.acos(math.max(-1.0, math.min(1.0, d / (ni * nj)))))
    }).toDF("cell_a", "cell_b", "mu_angle")
    val admissible = muPairs
      .join(cellStats.select(col("cell").as("cell_a"), col("radius").as("ra")), Seq("cell_a"))
      .join(cellStats.select(col("cell").as("cell_b"), col("radius").as("rb")), Seq("cell_b"))
      // 1e-9 slack keeps the bound conservative under float rounding
      .filter(col("mu_angle") - col("ra") - col("rb") <= lit(math.acos(threshold) + 1e-9))
      .select(col("cell_a"), col("cell_b"))
    val left = assigned.select(col("cell").as("cell_a"), col(cId).as("xid"),
      col(cVec).as("xv"), col("cn").as("xn"))
    val right = assigned.select(col("cell").as("cell_b"), col(cId).as("yid"),
      col(cVec).as("yv"), col("cn").as("yn"))
    left.join(broadcast(admissible), Seq("cell_a"))
      .join(right, Seq("cell_b"))
      // cross-cell pairs appear once (cell_a < cell_b); same-cell pairs
      // are ordered by id to keep each unordered pair exactly once
      .filter(col("cell_a") < col("cell_b") || col("xid") < col("yid"))
      .withColumn("cos", dot(col("xv"), col("yv")) / (col("xn") * col("yn")))
      .filter(col("cos") >= threshold)
      .select(least(col("xid"), col("yid")).as("id_a"),
        greatest(col("xid"), col("yid")).as("id_b"), col("cos"))
  }
}
