package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // near 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Array(0.0f, 0.9f, 0.2f))   // near 2
  ).toDF("vec_id", "embedding")

  private def q(ids: Long*) = vecs.filter($"vec_id".isin(ids: _*))
    .select($"vec_id".as("qid"), $"embedding".as("qvec"))
  private def c = vecs.select($"vec_id".as("cid"), $"embedding".as("cvec"))

  test("cosine kernel: identity 1, orthogonal 0, opposite -1") {
    val r = vecs.as("x").crossJoin(vecs.as("y"))
      .select(col("x.vec_id").as("i"), col("y.vec_id").as("j"),
        Similarity.cosine(col("x.embedding"), col("y.embedding")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(r((0L, 0L)) - 1.0) < 1e-12)
    assert(math.abs(r((0L, 2L))) < 1e-12)
    assert(math.abs(r((0L, 3L)) + 1.0) < 1e-12)
  }

  test("brute-force top-k ranks by cosine desc") {
    val top = Similarity.bruteForceTopK(q(0L), c, k = 2).collect()
      .sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Long]("neighbor_id"))
    assert(top === Array(1L, 2L))
  }

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
      r.getAs[Long]("neighbor_id"))).toSet

  test("probe-all lsh is identical to brute force") {
    val truth = asTuples(Similarity.bruteForceTopK(q(0L, 2L, 4L), c, k = 3))
    val lsh = asTuples(Similarity.lshTopK(q(0L, 2L, 4L), c, k = 3, dims = 3,
      planes = 4, probeAll = true))
    assert(lsh === truth)
  }

  test("probe-all ivf (k-means quantizer) is identical to brute force") {
    val truth = asTuples(Similarity.bruteForceTopK(q(0L, 2L, 4L), c, k = 3))
    val ivf = asTuples(Similarity.ivfTopK(q(0L, 2L, 4L), c, k = 3,
      nCentroids = 3, nProbe = 3))
    assert(ivf === truth)
  }

  test("k-means centroids are unit-norm and deterministic across runs") {
    def train() = Similarity.trainCentroids(c, nCentroids = 3, iters = 3)
      .orderBy(col("centroid_id")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toVector)
    val a = train()
    val b = train()
    assert(a.toSeq === b.toSeq)
    a.foreach { case (_, v) =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("one shared quantizer drives both IVF consumers with exact results") {
    // train ONCE (the 100 TB pattern: quantizer = model state, paid one
    // bounded sampling scan per corpus, not per query)
    val cents = Similarity.trainCentroidArrays(c, nCentroids = 3, iters = 3)
    val truth = asTuples(Similarity.bruteForceTopK(q(0L, 2L, 4L), c, k = 3))
    val ivf = asTuples(Similarity.ivfTopK(q(0L, 2L, 4L), c, k = 3,
      nCentroids = 3, nProbe = 3, centroids = Some(cents)))
    assert(ivf === truth)
    val t = 0.5
    val baseline = c.as("x").crossJoin(c.as("y"))
      .filter(col("x.cid") < col("y.cid"))
      .withColumn("cos", Similarity.cosine(col("x.cvec"), col("y.cvec")))
      .filter(col("cos") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pruned = Similarity.cosineNearDupPairs(c, threshold = t,
      nCentroids = 3, centroids = Some(cents))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pruned === baseline)
  }

  test("probe-all results are training-invariant even at a tiny sample cap") {
    val truth = asTuples(Similarity.bruteForceTopK(q(0L, 2L, 4L), c, k = 3))
    // sampleCap = nCentroids: the quantizer sees 3 of 5 vectors — recall
    // under probe-all must not depend on quantizer quality
    val cents = Similarity.trainCentroidArrays(c, nCentroids = 3, iters = 3,
      sampleCap = 3)
    val ivf = asTuples(Similarity.ivfTopK(q(0L, 2L, 4L), c, k = 3,
      nCentroids = 3, nProbe = 3, centroids = Some(cents)))
    assert(ivf === truth)
  }

  test("pruned near-dup pairs equal the all-pairs baseline") {
    val t = 0.5
    val baseline = c.as("x").crossJoin(c.as("y"))
      .filter(col("x.cid") < col("y.cid"))
      .withColumn("cos", Similarity.cosine(col("x.cvec"), col("y.cvec")))
      .filter(col("cos") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet // x.cid, y.cid
    val pruned = Similarity.cosineNearDupPairs(c, threshold = t, nCentroids = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pruned === baseline)
    assert(pruned.nonEmpty) // fixture has near-dup pairs (0,1) and (2,4)
  }

  test("lsh top-k recall covers true nearest neighbor for most queries") {
    val truth = Similarity.bruteForceTopK(q(0L, 2L), c, k = 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("neighbor_id")).toMap
    val approx = Similarity.lshTopK(q(0L, 2L), c, k = 1, dims = 3, planes = 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("neighbor_id")).toMap
    // with 1 plane buckets are coarse halves — the true NN (cos 0.99)
    // lands in the same half-space as its query
    assert(approx.get(0L).contains(truth(0L)) || approx.get(2L).contains(truth(2L)))
  }

  test("ivf top-k finds the true NN when its cell is probed") {
    val truth = Similarity.bruteForceTopK(q(0L, 2L), c, k = 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("neighbor_id")).toMap
    // 5 corpus vectors, 5 centroids, probe all ⇒ must equal brute force
    val ivf = Similarity.ivfTopK(q(0L, 2L), c, k = 1, nCentroids = 5, nProbe = 5)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("neighbor_id")).toMap
    assert(ivf === truth)
  }

  test("lsh bucket key is deterministic across invocations") {
    val b1 = vecs.select(Similarity.lshBucket($"embedding", 3, 4).as("b")).collect()
    val b2 = vecs.select(Similarity.lshBucket($"embedding", 3, 4).as("b")).collect()
    assert(b1.map(_.getString(0)).toSeq === b2.map(_.getString(0)).toSeq)
  }

  test("table-backed IVF index: probing one cell opens a file subset (q241's skip path)") {
    val root = java.nio.file.Files.createTempDirectory("ann_tbl_spec")
      .toString + "/tbl"
    // 4 well-separated cells along dimension 0 so assignment is stable
    val pts = spark.range(0, 400).select(
      $"id".as("vec_id"),
      org.apache.spark.sql.functions.array(
        ($"id" % 4 * 100).cast("float"), ($"id" % 7).cast("float"),
        ($"id" % 5).cast("float")).as("embedding"))
    val cents = Similarity.trainCentroidArrays(
      pts.select($"vec_id".as("cid"), $"embedding".as("cvec")), nCentroids = 4,
      iters = 4)
    val assigned = graft.operators.KMeans.assign(pts, cents)
      .select($"cluster".cast("long").as("cell"), $"vec_id", $"embedding")
    graft.sources.GraftTable.create(spark, root, assigned, "cell", nBuckets = 4)
    val total = graft.sources.GraftTable
      .prunedFileCount(spark, root, Long.MinValue, Long.MaxValue)
    val cells = assigned.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(cells.length >= 2, "need multiple populated cells")
    // each single-cell probe opens strictly fewer files than the index
    cells.foreach { c =>
      val opened = graft.sources.GraftTable.prunedFileCount(spark, root, c, c)
      assert(opened >= 1 && opened < total, s"cell $c opened $opened of $total")
      // and returns exactly that cell's vectors
      val got = graft.sources.GraftTable.readRange(spark, root, "cell", c, c)
        .select("vec_id").as[Long].collect().toSet
      val want = assigned.filter($"cell" === c)
        .select("vec_id").as[Long].collect().toSet
      assert(got === want)
    }
  }

  test("incremental IVF index: upserted vectors land in their cell's key " +
    "range and single-cell probes still skip files (q273's shape)") {
    val root = java.nio.file.Files.createTempDirectory("ann_incr_spec")
      .toString + "/tbl"
    val cellBase = 1099511627776L
    val pts = spark.range(0, 400).select(
      $"id".as("vec_id"),
      org.apache.spark.sql.functions.array(
        ($"id" % 4 * 100).cast("float"), ($"id" % 7).cast("float"),
        ($"id" % 5).cast("float")).as("embedding"))
    val old = pts.filter($"vec_id" % 2 === 0)
    val cents = Similarity.trainCentroidArrays(
      old.select($"vec_id".as("cid"), $"embedding".as("cvec")),
      nCentroids = 4, iters = 4)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      graft.operators.KMeans.assign(df, cents).select(
        ($"cluster".cast("long") * cellBase + $"vec_id").as("k"),
        $"vec_id", $"embedding")
    graft.sources.GraftTable.create(spark, root, keyed(old), "k", nBuckets = 4)
    graft.sources.GraftTable.upsert(spark, root,
      keyed(pts.filter($"vec_id" % 2 === 1)), "k")
    // all 400 vectors served, none duplicated
    val all = (0 until 4).map(c =>
      graft.sources.GraftTable.readRange(spark, root, "k",
        c * cellBase, (c + 1) * cellBase - 1))
      .reduce(_ unionAll _)
    assert(all.select("vec_id").distinct().count() === 400)
    assert(all.count() === 400)
    // single-cell probes open a strict file subset post-upsert
    val total = graft.sources.GraftTable
      .prunedFileCount(spark, root, Long.MinValue, Long.MaxValue)
    val cells = keyed(pts).select(($"k" / cellBase).cast("long").as("c"))
      .distinct().collect().map(_.getLong(0)).sorted
    assert(cells.length >= 2)
    cells.foreach { c =>
      val opened = graft.sources.GraftTable.prunedFileCount(spark, root,
        c * cellBase, (c + 1) * cellBase - 1)
      assert(opened >= 1 && opened < total, s"cell $c opened $opened of $total")
    }
  }

  test("ivf-pq: probe-all + full shortlist is exact; approximate recall holds") {
    // deterministic synthetic corpus: 200 16-dim vectors
    val n = 200; val dims = 16
    val corpus = spark.range(n).select($"id".as("cid"),
      transform(sequence(lit(0), lit(dims - 1)), d =>
        sin($"id" * 37 + d * 13).cast("float")).as("cvec"))
    val queries = corpus.filter($"cid" < 8)
      .select($"cid".as("qid"), $"cvec".as("qvec"))
    val truth = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select($"qid", $"rank", $"neighbor_id")
    // probe-all + shortlist >= corpus: the pipeline degenerates to
    // exact search (every candidate reranked with exact cosine)
    val exact = Similarity.ivfPqTopK(queries, corpus, k = 5, dims = dims,
      m = 4, shortlist = n, nCoarse = 4, nProbe = 4, pqK = 4)
      .select($"qid", $"rank", $"neighbor_id")
    assert(exact.orderBy("qid", "rank").collect().toSeq ===
      truth.orderBy("qid", "rank").collect().toSeq)
    // the approximate configuration keeps a measured recall floor
    val approx = Similarity.ivfPqTopK(queries, corpus, k = 5, dims = dims,
      m = 4, shortlist = 32, nCoarse = 4, nProbe = 2, pqK = 4)
      .select($"qid", $"neighbor_id")
    val hits = approx.join(truth.select($"qid", $"neighbor_id"),
      Seq("qid", "neighbor_id")).count()
    assert(hits >= 20, s"recall@5 over 8 queries: $hits/40 hits")
  }

  // planted clustered corpus for the NSW tests: `nc` well-separated
  // clusters, `per` members each, deterministic within-cluster jitter
  private def plantedClusters(nc: Int, per: Int, dims: Int) = {
    val n = nc * per
    spark.range(n).select($"id".as("cid"),
      transform(sequence(lit(0), lit(dims - 1)), d =>
        (when(d === ($"id" % nc).cast("int"), 10.0).otherwise(0.0)
          + sin($"id" * 31 + d * 7) * 0.3).cast("float")).as("cvec"))
  }

  test("nsw build: layers are geometric and deterministic, every layer " +
    "graph is connected via the id-order path, degrees are bounded") {
    val corpus = plantedClusters(nc = 6, per = 30, dims = 12)
    val maxLayer = 2; val m = 3
    val edges = Nsw.build(corpus, m = m, nCells = 6, maxLayer = maxLayer)
      .cache()
    val layers = corpus.select($"cid",
      Nsw.layerCol($"cid", maxLayer).as("l")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // geometric shrink: layer>=1 members ≈ 1/4 of the corpus
    val n1 = layers.values.count(_ >= 1)
    assert(n1 > 0 && n1 < layers.size / 2, s"layer>=1 count $n1")
    (0 to maxLayer).foreach { l =>
      val memIds = layers.filter(_._2 >= l).keys.toSeq.sorted
      val e = edges.filter($"layer" === l)
        .select($"src", $"dst").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // members only
      assert(e.flatMap(p => Seq(p._1, p._2)).toSet.subsetOf(memIds.toSet))
      // the id-order path edges are present in both directions
      memIds.sliding(2).filter(_.size == 2).foreach { w =>
        assert(e.contains((w(0), w(1))) && e.contains((w(1), w(0))),
          s"layer $l missing path edge ${w(0)}<->${w(1)}")
      }
      // connectivity by union-find over the collected edge list
      val idx = memIds.zipWithIndex.toMap
      val parent = Array.tabulate(memIds.size)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      e.foreach { case (a, b) =>
        val (ra, rb) = (find(idx(a)), find(idx(b)))
        if (ra != rb) parent(ra) = rb
      }
      assert(memIds.indices.map(find).distinct.size === 1,
        s"layer $l graph is disconnected")
      // out-degree ≤ 2m + 2 (symmetrized top-m can double, path adds 2)
      val deg = e.groupBy(_._1).map(_._2.length)
      assert(deg.max <= 2 * m + 2, s"layer $l max degree ${deg.max}")
    }
    // determinism: a rebuild is edge-identical
    val again = Nsw.build(corpus, m = m, nCells = 6, maxLayer = maxLayer)
    assert(again.collect().toSet === edges.collect().toSet)
    edges.unpersist()
  }

  test("nsw search: ef >= corpus is exactly brute force; finite beam " +
    "keeps a measured recall floor on clustered data") {
    val corpus = plantedClusters(nc = 6, per = 30, dims = 12)
    val queries = corpus.filter($"cid" % 37 === 0)
      .select($"cid".as("qid"), $"cvec".as("qvec"))
    val maxLayer = 2
    val edges = Nsw.build(corpus, m = 4, nCells = 6, maxLayer = maxLayer)
      .cache()
    val truth = Similarity.bruteForceTopK(queries, corpus, k = 10)
    // probe-all: candidate set is the whole corpus by definition
    val exact = Nsw.topK(queries, corpus, edges, k = 10, ef = 200,
      maxLayer = maxLayer)
    assert(exact.orderBy("qid", "rank").collect().toSeq ===
      truth.orderBy("qid", "rank").collect().toSeq)
    // finite beam: recall@10 over the planted clusters
    val approx = Nsw.topK(queries, corpus, edges, k = 10, ef = 16,
      maxLayer = maxLayer, roundsPerLayer = 4)
    val nq = queries.count()
    val hits = approx.select($"qid", $"neighbor_id")
      .join(truth.select($"qid", $"neighbor_id"), Seq("qid", "neighbor_id"))
      .count()
    assert(hits >= nq * 10 * 7 / 10,
      s"nsw recall@10: $hits of ${nq * 10}")
    edges.unpersist()
  }

  test("nsw skew guard: a degenerate cell assignment (90% in one cell) " +
    "is split so candidate pairs stay near-linear, and the build still " +
    "serves exact probe-all search") {
    // 90% of points share one direction → k-means piles them into one
    // cell; capCells must split it so the within-cell join is bounded
    val n = 300
    val corpus = spark.range(n).select($"id".as("cid"),
      transform(sequence(lit(0), lit(11)), d =>
        (when(lit(true) && $"id" % 10 === 0,
          when(d === ($"id" % 3 + 1).cast("int"), 10.0).otherwise(0.0))
          .otherwise(when(d === 0, 10.0).otherwise(0.0))
          + sin($"id" * 13 + d * 5) * 0.05).cast("float")).as("cvec"))
    val maxCell = 32
    // the guard itself: no sub-cell may exceed the cap
    val cents = KMeans.fit(corpus, k = 4, iters = 2,
      idCol = "cid", vecCol = "cvec")
    val nodes = KMeans.assign(corpus, cents, vecCol = "cvec")
      .select($"cid".cast("long").as("id"), $"cluster".as("cell"))
    val rawMax = nodes.groupBy("cell").count()
      .agg(max("count")).as[Long].head()
    assert(rawMax > maxCell,
      s"fixture broken: biggest raw cell $rawMax not above cap $maxCell")
    val capped = Nsw.capCells(nodes, maxCell)
    val sizes = capped.groupBy("cell").count().select($"count".as[Long])
      .collect()
    // xxhash64 split is hash-balanced, not exact: allow 2× headroom but
    // prove the quadratic blowup is gone (raw cell was ~270)
    assert(sizes.max <= 2L * maxCell,
      s"sub-cell of ${sizes.max} exceeds cap $maxCell")
    // candidate-pair bound: Σ size² ≤ (2·cap)·n — near-linear, vs the
    // ~rawMax² ≈ 73k pairs the unguarded join would do in one cell
    val pairSum = sizes.map(s => s * s).sum
    assert(pairSum <= 2L * maxCell * n,
      s"pair count $pairSum not linear-bounded")
    // determinism: the split is a pure hash of ids
    assert(Nsw.capCells(nodes, maxCell).collect().toSet
      === capped.collect().toSet)
    // and the guarded build still satisfies the probe-all contract
    val edges = Nsw.build(corpus, m = 3, nCells = 4, maxLayer = 2,
      maxCellSize = maxCell)
    val queries = corpus.filter($"cid" % 97 === 0)
      .select($"cid".as("qid"), $"cvec".as("qvec"))
    val exact = Nsw.topK(queries, corpus, edges, k = 5, ef = n + 1,
      maxLayer = 2)
    val truth = Similarity.bruteForceTopK(queries, corpus, k = 5)
    assert(exact.orderBy("qid", "rank").collect().toSeq ===
      truth.orderBy("qid", "rank").collect().toSeq)
  }
}
