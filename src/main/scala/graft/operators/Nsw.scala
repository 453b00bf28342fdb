package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed NSW-family graph ANN (the HNSW lineage: Malkov &
  * Yashunin 2016) — the missing index family next to the engine's IVF /
  * IVF-PQ / LSH variants: a layered navigable-small-world graph built
  * as DataFrames, probed by an iterative beam search of equi-joins.
  *
  * HNSW's sequential insert loop does not distribute; the literature's
  * scale-out variants build the layer graphs BULK instead (a blocked
  * kNN graph per layer — e.g. NN-Descent-style construction). This
  * operator follows that shape with the engine's determinism
  * discipline:
  *
  *  - LAYERS: geometric level assignment, but derived from md5 rather
  *    than an RNG — `layer(v) = min(maxLayer, |maximal [0-3] prefix of
  *    md5(id)|)`. Each hex digit lands in [0-3] with probability 1/4,
  *    so P(layer ≥ ℓ) = 4^−ℓ — the HNSW geometric distribution with
  *    M=4 — and the assignment is a pure string function both engines
  *    (and the DuckDB oracle) compute identically.
  *  - QUALITY EDGES, per layer: each member links to its top-`m`
  *    cosine neighbors among SAME-CELL members ([[KMeans]] coarse
  *    cells — the q273 keying), symmetrized. Cell blocking keeps the
  *    candidate pair set ~n·(cellSize) instead of n² — never
  *    all-pairs, the same bound every dedup/ANN path in this engine
  *    observes.
  *  - CONNECTIVITY EDGES, per layer: the id-order path (rank r ↔ r+1
  *    via [[GlobalRank.rowNumber]], two-phase — no data-sized window),
  *    so the graph is connected BY CONSTRUCTION and a beam search can
  *    always escape an isolated cell. Two extra edges per node.
  *
  * Search descends entry → layers, expanding a beam of the freshly
  * discovered candidates each round (joins on the node id — always
  * equi-joins), scoring only visited nodes. `ef ≥ corpus size` is the
  * probe-all contract (the q32/q37 pattern): the candidate set is the
  * whole corpus by definition, so the search provably degenerates to
  * [[Similarity.bruteForceTopK]] — same scoring, same tie-breaks —
  * which is what the oracle gate pins; finite-beam recall is pinned in
  * `SimilaritySpec`. */
object Nsw {

  /** Deterministic geometric layer of a node id (see object doc). */
  def layerCol(id: Column, maxLayer: Int): Column =
    least(lit(maxLayer),
      length(regexp_extract(md5(id.cast("string")), "^[0-3]*", 0)))
      .cast("int")

  /** SKEW GUARD: split every cell above `maxCellSize` members into
    * ⌈size/maxCellSize⌉ deterministic sub-cells (xxhash64 of the node
    * id mod the split count — no RNG), exactly as IVF splits oversize
    * lists. Without it a degenerate [[KMeans]] fit (90% of points in
    * one cell) sends the within-cell candidate join quadratic in THAT
    * cell; with it the pair count is ≤ n·maxCellSize by construction,
    * whatever the fit looks like. Quality edges become more local in
    * split cells — recall is carried by the per-layer id-order
    * connectivity path (always present) plus beam rounds, and the
    * probe-all oracle contract is unaffected (it never touches
    * cells). Input (id, cell, …) → same rows, `cell` re-keyed to a
    * string sub-cell id. */
  private[operators] def capCells(nodes: DataFrame,
      maxCellSize: Int): DataFrame = {
    val splits = nodes.groupBy("cell")
      .agg(count(lit(1)).as("__n"))
      .select(col("cell"),
        greatest(lit(1L),
          ceil(col("__n") / lit(maxCellSize.toDouble)).cast("long"))
          .as("__splits"))
    nodes.join(broadcast(splits), "cell")
      .withColumn("cell",
        concat(col("cell").cast("string"), lit("#"),
          pmod(xxhash64(col("id").cast("string")), col("__splits"))
            .cast("string")))
      .drop("__splits")
  }

  /** Build the layered graph over `corpus` (cId, cVec). Returns the
    * DIRECTED edge list (layer, src, dst) — quality edges both ways
    * plus the id-order path both ways, deduplicated. Edge count is
    * ≤ (2m+2)·Σ|layer ℓ members| with |members| shrinking 4× per
    * layer, so the index is ~2.7·(2m+2)·n edges total at any corpus
    * size. */
  def build(corpus: DataFrame, m: Int, nCells: Int, maxLayer: Int,
            iters: Int = 1,
            cId: String = "cid", cVec: String = "cvec",
            maxCellSize: Int = 4096): DataFrame = {
    val cents = KMeans.fit(corpus, nCells, iters, idCol = cId, vecCol = cVec)
    val nodes = capCells(
      KMeans.assign(corpus, cents, vecCol = cVec)
        .withColumn("layer", layerCol(col(cId), maxLayer))
        .withColumn("nrm", Similarity.norm(col(cVec)))
        .select(col(cId).cast("long").as("id"), col(cVec).as("vec"),
          col("nrm"), col("cluster").as("cell"), col("layer")),
      maxCellSize)
      .cache()
    val perLayer = (0 to maxLayer).map { l =>
      val mem = nodes.filter(col("layer") >= l)
      val a = mem.select(col("id").as("src"), col("vec").as("va"),
        col("nrm").as("na"), col("cell"))
      val b = mem.select(col("id").as("dst"), col("vec").as("vb"),
        col("nrm").as("nb"), col("cell"))
      val scored = a.join(b, Seq("cell")).filter(col("src") =!= col("dst"))
        .withColumn("cos",
          Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      // bounded-heap reduction before the exchange, exact rank after —
      // the engine's standard top-k-per-group shape
      val qual = graft.plans.TopK.topKPerGroup(scored,
          Seq(col("src")), Seq(col("cos").desc, col("dst").asc), m)
        .withColumn("rn", row_number().over(Window.partitionBy("src")
          .orderBy(col("cos").desc, col("dst").asc)))
        .filter(col("rn") <= m)
        .select(col("src"), col("dst"))
      val ranked = GlobalRank.rowNumber(
        mem.select(col("id")), "rk", col("id"))
      val path = ranked.select(col("id").as("src"), col("rk"))
        .join(ranked.select(col("id").as("dst"), (col("rk") - 1).as("rk")),
          "rk")
        .select(col("src"), col("dst"))
      qual.unionByName(qual.select(col("dst").as("src"), col("src").as("dst")))
        .unionByName(path)
        .unionByName(path.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .select(lit(l).as("layer"), col("src"), col("dst"))
    }
    perLayer.reduce(_ unionByName _)
  }

  /** Beam-search top-k. `edges` from [[build]]. `ef ≥ corpus count`
    * takes the probe-all path (≡ brute force, see object doc); finite
    * `ef` runs `roundsPerLayer` beam rounds per layer, beam width 1
    * above layer 0 (HNSW greedy descent) and `ef` at layer 0. Output
    * (qId, rank, neighbor_id, cos) like [[Similarity.bruteForceTopK]]. */
  def topK(queries: DataFrame, corpus: DataFrame, edges: DataFrame,
           k: Int, ef: Int, maxLayer: Int, roundsPerLayer: Int = 3,
           qId: String = "qid", qVec: String = "qvec",
           cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    val n = corpus.count()
    if (ef >= n)
      return Similarity.bruteForceTopK(queries, corpus, k,
        qId, qVec, cId, cVec)
    val c = corpus.select(col(cId).cast("long").as("__cid"), col(cVec),
      Similarity.norm(col(cVec)).as("__cn")).cache()
    val q = queries.select(col(qId), col(qVec),
      Similarity.norm(col(qVec)).as("__qn")).cache()
    // deterministic entry: highest layer, lowest id — one tiny collect
    val entry = c.select(col("__cid"))
      .withColumn("__l", layerCol(col("__cid"), maxLayer))
      .orderBy(desc("__l"), asc("__cid")).limit(1)
      .collect()(0).getLong(0)
    def score(cand: DataFrame): DataFrame = // cand (qId, __cid)
      cand.join(c, "__cid").join(broadcast(q), qId)
        .withColumn("cos",
          Similarity.dot(col(qVec), col(cVec)) / (col("__qn") * col("__cn")))
        .select(col(qId), col("__cid"), col("cos"))
    // eager localCheckpoint, not cache: each round's plan references
    // every prior round's — without truncation the logical plan (and
    // its analysis cost) grows geometrically with beam rounds
    var visited = score(
      q.select(col(qId)).withColumn("__cid", lit(entry)))
      .localCheckpoint(true)
    for (l <- maxLayer to 0 by -1) {
      val e = edges.filter(col("layer") === l)
        .select(col("src").as("__cid"), col("dst"))
        .localCheckpoint(true) // truncate the build DAG once per layer
      val bw = if (l > 0) 1 else ef
      // round 1's frontier: the best bw found so far (they are layer-ℓ
      // members whenever they came from a layer above — HNSW's layer
      // nesting); later rounds expand only the freshly discovered beam
      var frontier = visited
        .withColumn("__rn", row_number().over(Window.partitionBy(qId)
          .orderBy(col("cos").desc, col("__cid").asc)))
        .filter(col("__rn") <= bw).select(col(qId), col("__cid"))
      var round = 0
      var exhausted = false
      while (round < roundsPerLayer && !exhausted) {
        round += 1
        val cand = frontier.join(e, "__cid")
          .select(col(qId), col("dst").as("__cid")).distinct()
          .join(visited.select(col(qId), col("__cid")),
            Seq(qId, "__cid"), "left_anti")
        val fresh = score(cand).localCheckpoint(true)
        if (fresh.isEmpty) exhausted = true
        else {
          visited = visited.unionByName(fresh).localCheckpoint(true)
          frontier = fresh
            .withColumn("__rn", row_number().over(Window.partitionBy(qId)
              .orderBy(col("cos").desc, col("__cid").asc)))
            .filter(col("__rn") <= bw).select(col(qId), col("__cid"))
        }
      }
    }
    val out = visited
      .filter(col("__cid") =!= col(qId)) // never report the query itself
      .withColumn("rank", row_number().over(Window.partitionBy(qId)
        .orderBy(col("cos").desc, col("__cid").asc)))
      .filter(col("rank") <= k)
      .select(col(qId), col("rank").cast("long").as("rank"),
        col("__cid").as("neighbor_id"), col("cos"))
    out
  }
}
