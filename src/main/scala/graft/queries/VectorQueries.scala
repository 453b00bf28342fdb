package graft.queries

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.operators.Similarity

/** Similarity search over the embeddings table (64-dim float vectors).
  * The oracle computes dot products with the same sequential left-fold
  * order and double promotion as the Spark side (list_transform +
  * list_sum over pre-zipped products) so the IEEE results agree. */
object VectorQueries {

  /** Same sequential-fold order and double promotion as
    * [[Similarity.dot]] — verified to match Spark's `aggregate` fold
    * bit-for-bit. `a`/`b` must expose an `embedding` list column. */
  private val cosSql =
    """list_sum(list_transform(a.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      | / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |  * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  /** Shared oracle for every exact top-5 configuration (brute force,
    * probe-all LSH, probe-all IVF): they are provably the same query,
    * just different physical plans. */
  private val topKOracle =
    s"""WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT a.qid, b.vec_id AS neighbor_id,
       |    $cosSql AS cos
       |  FROM q a JOIN embeddings b ON b.vec_id <> a.qid)
       |SELECT qid, rank, neighbor_id, round(cos, 4) AS cos FROM (
       |  SELECT qid, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** Brute-force exact cosine top-5 for the first 10 vectors as
    * queries. The rank itself (not the float) is the compared output —
    * sims are rounded to 4 decimals for display. */
  val q30AnnBruteForce = GraftQuery(
    "q30_ann_brute_force",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.bruteForceTopK(queries, corpus, k = 5)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy("qid", "rank")
    },
    Some(topKOracle))

  /** Pairwise cosine for a small id range — the exactness check on the
    * dot-product kernel itself (raw doubles, no ranking). */
  val q31CosinePairs = GraftQuery(
    "q31_cosine_pairs",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val a = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Similarity.cosine(col("va"), col("vb")), 6).as("cos"))
        .orderBy("id_a", "id_b")
    },
    Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            |  round($cosSql, 6) AS cos
            |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            |WHERE a.vec_id < 20 AND b.vec_id < 20
            |ORDER BY id_a, id_b""".stripMargin))

  /** LSH-bucketed top-k in the oracle-checkable probe-all
    * configuration: probing all 2^planes buckets makes the candidate
    * set every (q, c) pair, so the result is provably ≡ brute force
    * and the DuckDB oracle applies — while the executed plan is the
    * scale path's bucket equi-join (constant-folded hyperplane signs
    * + codegen'd vec_dot), not a cross join. The approximate
    * multi-probe configuration (Hamming-1 probing, ~(planes+1)/2^planes
    * of the corpus compared) is recall-tested in `SimilaritySpec`. */
  val q32AnnLsh = GraftQuery(
    "q32_ann_lsh",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.lshTopK(queries, corpus, k = 5, dims = 64, planes = 4, probeAll = true)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy("qid", "rank")
    },
    Some(topKOracle))

  /** IVF top-k in the oracle-checkable probe-all configuration
    * (`nProbe = nCentroids` scans every cell ⇒ provably ≡ brute
    * force) over a spherical-k-means coarse quantizer. The plan is
    * the scale path's cell equi-join; the approximate nProbe<k
    * configuration is recall-tested in `SimilaritySpec`. */
  val q37AnnIvf = GraftQuery(
    "q37_ann_ivf",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.ivfTopK(queries, corpus, k = 5, nCentroids = 16, nProbe = 16)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy("qid", "rank")
    },
    Some(topKOracle))

  /** Embedding-cosine near-duplicate pairs (the vector-space dedup
    * path): every distinct pair with cosine ≥ 0.4, computed WITHOUT a
    * cartesian product — IVF cells + angular triangle-inequality
    * cell-pair pruning ([[Similarity.cosineNearDupPairs]]), provably
    * identical to the all-pairs baseline, which survives only as the
    * DuckDB oracle below (and in `SimilaritySpec`). */
  val q38EmbeddingNearDup = GraftQuery(
    "q38_embedding_neardup",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.cosineNearDupPairs(corpus, threshold = 0.4, nCentroids = 16)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .orderBy("id_a", "id_b")
    },
    Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            |  round($cosSql, 6) AS cos
            |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            |WHERE $cosSql >= 0.4
            |ORDER BY id_a, id_b""".stripMargin))

  /** Embedding preprocessing: L2 norm + symmetric int8 quantization
    * (scale = max|x|/127, half-up rounding spelled as floor(x/s + .5)
    * so both engines round identically — a bare cast truncates in
    * Spark but rounds in DuckDB). Emits per-vector scalars (norm,
    * scale, max reconstruction error, quantized checksum) — the
    * calibration numbers a serving pipeline tracks. */
  val q57EmbeddingQuantize = GraftQuery(
    "q57_embedding_quantize",
    (s, dir) => {
      val x = col("embedding")
      val maxAbs = array_max(transform(x, e => abs(e.cast("double"))))
      val scale = maxAbs / 127.0
      val q = transform(x, e => floor(e.cast("double") / scale + 0.5))
      val err = array_max(zip_with(x, q, (e, qq) =>
        abs(e.cast("double") - qq * scale)))
      Tables.embeddings(s, dir)
        .filter(col("vec_id") < 50)
        .select(col("vec_id"),
          round(Similarity.norm(x), 6).as("l2_norm"),
          round(scale, 9).as("scale"),
          round(err, 9).as("max_err"),
          aggregate(q, lit(0.0), (a, b) => a + b).cast("long").as("q_checksum"))
        .orderBy("vec_id")
    },
    Some("""WITH s1 AS (
           |  SELECT vec_id, embedding,
           |    list_max(list_transform(embedding, e -> abs(CAST(e AS DOUBLE)))) / 127.0 AS scale
           |  FROM embeddings WHERE vec_id < 50),
           |s2 AS (
           |  SELECT vec_id, embedding, scale,
           |    list_transform(embedding, e -> floor(CAST(e AS DOUBLE) / scale + 0.5)) AS q
           |  FROM s1)
           |SELECT vec_id,
           |  round(sqrt(list_sum(list_transform(embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))), 6) AS l2_norm,
           |  round(scale, 9) AS scale,
           |  round(list_max(list_transform(embedding, (e, i) -> abs(CAST(e AS DOUBLE) - q[i] * scale))), 9) AS max_err,
           |  CAST(list_sum(q) AS BIGINT) AS q_checksum
           |FROM s2 ORDER BY vec_id""".stripMargin))

  /** Per-label mean embedding (class centroids) — the mean-pooling
    * pass behind label prototypes, cluster seeding, and embedding
    * drift monitoring. posexplode keeps the whole computation one
    * map-side-combinable (label, dim) aggregation: 64× row
    * amplification of narrow (int, int, double) rows, partial avg on
    * the map side, one shuffle of ≤ labels×dims rows — no collect,
    * no per-label scan. round(6) absorbs float sum-order noise. */
  val q103LabelCentroids = GraftQuery(
    "q103_label_centroids",
    (s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim").cast("long").as("dim"))
        .agg(count(lit(1)).as("n_vecs"),
          round(avg(col("v").cast("double")), 6).as("centroid"))
        .orderBy("label", "dim"),
    Some("""SELECT label, i.g - 1 AS dim, count(*) AS n_vecs,
           |  round(avg(CAST(embedding[i.g] AS DOUBLE)), 6) AS centroid
           |FROM embeddings, LATERAL (SELECT unnest(generate_series(1, 64)) g) i
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Embedding outliers: per label, the 3 vectors least similar to
    * their class centroid — the mislabeled-data / noisy-example audit
    * run before training on labeled embeddings. Everything stays in
    * exploded (label, dim) space: centroid avg, then one equi-join and
    * a per-vector dot/norm aggregation — no per-label array
    * materialization, no cartesian — and the per-label bottom-3 rides
    * the native TopKPerGroup operator. */
  val q109EmbeddingOutliers = GraftQuery(
    "q109_embedding_outliers",
    (s, dir) => {
      val ex = Tables.embeddings(s, dir)
        .select(col("label"), col("vec_id"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .withColumn("v", col("v").cast("double"))
      val cent = ex.groupBy("label", "dim").agg(avg("v").as("c"))
      val per = ex.join(cent, Seq("label", "dim"))
        .groupBy("label", "vec_id")
        .agg(sum(col("v") * col("c")).as("dot"),
          sum(col("v") * col("v")).as("v2"),
          sum(col("c") * col("c")).as("c2"))
        .withColumn("cos", col("dot") / (sqrt(col("v2")) * sqrt(col("c2"))))
      graft.plans.TopK.topKPerGroup(per, Seq(col("label")),
          Seq(col("cos").asc, col("vec_id").asc), 3)
        .select(col("label"), col("vec_id"),
          round(col("cos"), 6).as("cos_to_centroid"))
        .orderBy("label", "vec_id")
    },
    Some("""WITH ex AS (
           |  SELECT label, vec_id, i.g - 1 AS dim,
           |    CAST(embedding[i.g] AS DOUBLE) AS v
           |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, 64)) g) i),
           |cent AS (SELECT label, dim, avg(v) AS c FROM ex GROUP BY 1, 2),
           |per AS (
           |  SELECT e.label, e.vec_id, sum(e.v * c.c) AS dot,
           |    sum(e.v * e.v) AS v2, sum(c.c * c.c) AS c2
           |  FROM ex e JOIN cent c ON e.label = c.label AND e.dim = c.dim
           |  GROUP BY 1, 2),
           |r AS (
           |  SELECT label, vec_id, dot / (sqrt(v2) * sqrt(c2)) AS cos,
           |    row_number() OVER (PARTITION BY label
           |                       ORDER BY dot / (sqrt(v2) * sqrt(c2)) ASC,
           |                                vec_id ASC) AS rn
           |  FROM per)
           |SELECT label, vec_id, round(cos, 6) AS cos_to_centroid
           |FROM r WHERE rn <= 3 ORDER BY label, vec_id""".stripMargin))

  /** Filtered exact top-3: neighbors constrained to the query's label
    * — the production retrieval shape ("top-k similar WHERE lang/
    * tenant = X"). The label is an equi-join key, so the plan scores
    * each query against its label slice only (hash join, bounded-heap
    * reduction) — never the crossJoin of q30. Exact, so the oracle is
    * the same ranked-window SQL with the label constraint. */
  val q165FilteredAnn = GraftQuery(
    "q165_filtered_ann",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label"))
      val corpus = emb.select(col("vec_id").as("cid"),
        col("embedding").as("cvec"), col("label"))
      Similarity.filteredTopK(queries, corpus, Seq("label"), k = 3)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy("qid", "rank")
    },
    Some(s"""WITH q AS (SELECT vec_id AS qid, embedding, label
            |          FROM embeddings WHERE vec_id < 10),
            |scored AS (
            |  SELECT a.qid, b.vec_id AS neighbor_id,
            |    $cosSql AS cos
            |  FROM q a JOIN embeddings b
            |    ON b.vec_id <> a.qid AND b.label = a.label)
            |SELECT qid, rank, neighbor_id, round(cos, 4) AS cos FROM (
            |  SELECT qid, neighbor_id, cos,
            |    row_number() OVER (PARTITION BY qid
            |      ORDER BY cos DESC, neighbor_id ASC) AS rank
            |  FROM scored)
            |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin))

  /** Recall of int8-quantized similarity search against exact search —
    * the eval an embedding-store rollout runs before switching its
    * corpus to a compressed representation: both the corpus and the
    * queries are scalar-quantized (q57's per-vector int8 scheme),
    * top-5 neighbors are computed in the quantized space, and each
    * query reports how many of its EXACT top-5 survive (recall@5).
    *
    * Scale: two bounded-heap top-k searches (the same plan as q30 —
    * at scale the quantized side runs the IVF/LSH path, with 4× less
    * vector I/O from int8 storage, which is the point) plus an
    * equi-join of two k-sized result sets per query. Determinism: the
    * dequantized values are pure IEEE arithmetic on table floats —
    * floor(x/scale + 0.5)·scale — and the dot-product fold order
    * matches DuckDB's list_sum, so ranks agree exactly; ties break on
    * neighbor id in both engines. */
  val q206QuantizedRecall = GraftQuery(
    "q206_quantized_recall",
    (s, dir) => {
      val x = col("embedding")
      val scale = array_max(transform(x, e => abs(e.cast("double")))) / 127.0
      val deqCol = transform(x, e =>
        floor(e.cast("double") / scale + lit(0.5)) * scale)
      val emb = Tables.embeddings(s, dir)
      val deq = emb.select(col("vec_id"), deqCol.as("dq"))
      def topk(df: org.apache.spark.sql.DataFrame, vcol: String) = {
        val queries = df.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col(vcol).as("qvec"))
        val corpus = df.select(col("vec_id").as("cid"), col(vcol).as("cvec"))
        Similarity.bruteForceTopK(queries, corpus, k = 5)
      }
      val exact = topk(emb, "embedding").select("qid", "neighbor_id")
      val quant = topk(deq, "dq")
        .select(col("qid"), col("neighbor_id").as("q_neighbor"))
      exact.join(quant,
          exact("qid") === quant("qid") &&
            exact("neighbor_id") === quant("q_neighbor"), "left_outer")
        .groupBy(exact("qid").as("qid"))
        .agg(sum(when(col("q_neighbor").isNotNull, 1L).otherwise(0L))
          .as("n_overlap"))
        .select(col("qid"), col("n_overlap"),
          round(col("n_overlap") / 5.0, 2).as("recall_at_5"))
        .orderBy("qid")
    },
    Some(s"""WITH deq AS (
            |  SELECT vec_id, list_transform(embedding, e ->
            |    floor(CAST(e AS DOUBLE) /
            |      (list_max(list_transform(embedding,
            |         f -> abs(CAST(f AS DOUBLE)))) / 127.0) + 0.5)
            |    * (list_max(list_transform(embedding,
            |         f -> abs(CAST(f AS DOUBLE)))) / 127.0)) AS dq
            |  FROM embeddings),
            |exact AS (
            |  SELECT qid, neighbor_id FROM (
            |    SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
            |      row_number() OVER (PARTITION BY a.vec_id
            |        ORDER BY $cosSql DESC, b.vec_id ASC) AS rank
            |    FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
            |    WHERE a.vec_id < 10)
            |  WHERE rank <= 5),
            |quant AS (
            |  SELECT qid, neighbor_id FROM (
            |    SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
            |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
            |        list_sum(list_transform(a.dq, (x, i) -> x * b.dq[i]))
            |        / (sqrt(list_sum(list_transform(a.dq, x -> x * x)))
            |         * sqrt(list_sum(list_transform(b.dq, x -> x * x))))
            |        DESC, b.vec_id ASC) AS rank
            |    FROM deq a JOIN deq b ON b.vec_id <> a.vec_id
            |    WHERE a.vec_id < 10)
            |  WHERE rank <= 5)
            |SELECT e.qid,
            |  CAST(COALESCE(sum(CASE WHEN q.neighbor_id IS NOT NULL
            |    THEN 1 END), 0) AS BIGINT) AS n_overlap,
            |  round(COALESCE(sum(CASE WHEN q.neighbor_id IS NOT NULL
            |    THEN 1 END), 0) / 5.0, 2) AS recall_at_5
            |FROM exact e LEFT JOIN quant q
            |  ON q.qid = e.qid AND q.neighbor_id = e.neighbor_id
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Product quantization (Jégou et al. 2011, the IVF-PQ building
    * block): split each 64-dim vector into 2 subspaces of 32 dims,
    * train a 4-centroid codebook PER SUBSPACE (distributed Lloyd's,
    * q176's deterministic seed-and-round contract), and encode every
    * vector as its pair of nearest-centroid codes — 64 floats become
    * 2 small ints, the compression that makes billion-vector ANN fit
    * in serving memory. Emits each vector's code pair and exact
    * reconstruction error (per-subspace |v|²+score, summed in fixed
    * order so the oracle's fold matches bit-for-bit).
    *
    * Scale: codebook training is the k·dim-per-iteration KMeans
    * machinery (only 2·4·32 doubles ever reach the driver); encoding
    * is a narrow projection against broadcast centroid literals —
    * 2·4 codegen'd vec_dot calls per row, no join, no shuffle beyond
    * the final order. The oracle replays both subspace trainings in
    * SQL CTEs (q176's pattern, twice, on list slices). */
  val q218ProductQuantization = GraftQuery(
    "q218_product_quantization",
    (s, dir) => {
      import graft.operators.KMeans
      val emb = Tables.embeddings(s, dir)
      val lo = emb.select(col("vec_id"), expr("slice(embedding, 1, 32)").as("embedding"))
      val hi = emb.select(col("vec_id"), expr("slice(embedding, 33, 32)").as("embedding"))
      def encode(df: org.apache.spark.sql.DataFrame, tag: String) = {
        val cents = KMeans.fit(df, k = 4, iters = 1)
        KMeans.assign(df, cents)
          .select(col("vec_id"),
            col("cluster").cast("long").as(s"code_$tag"),
            (Similarity.dot(col("embedding"), col("embedding"))
              + col("score")).as(s"err_$tag"))
      }
      encode(lo, "lo").join(encode(hi, "hi"), "vec_id")
        .select(col("vec_id"), col("code_lo"), col("code_hi"),
          round(col("err_lo") + col("err_hi"), 6).as("recon_err"))
        .orderBy("vec_id")
    },
    Some("""WITH lo AS (
           |  SELECT vec_id, list_transform(embedding[1:32],
           |    x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
           |hi AS (
           |  SELECT vec_id, list_transform(embedding[33:64],
           |    x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
           |lo_c0 AS (SELECT CAST(vec_id AS INTEGER) AS cl, v AS cv
           |          FROM lo WHERE vec_id < 4),
           |lo_s1 AS (
           |  SELECT e.vec_id, e.v, c.cl,
           |    list_sum(list_transform(c.cv, x -> x * x))
           |      - 2 * list_sum(list_transform(e.v, (x, i) -> x * c.cv[i]))
           |      AS score
           |  FROM lo e CROSS JOIN lo_c0 c),
           |lo_a1 AS (SELECT vec_id, v, cl FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY score, cl) AS rn FROM lo_s1) WHERE rn = 1),
           |lo_e1 AS (SELECT cl, unnest(list_transform(v,
           |           (x, i) -> {'i': i, 'x': x})) AS u FROM lo_a1),
           |lo_u1 AS (SELECT cl, u.i AS i, round(avg(u.x), 9) AS m
           |          FROM lo_e1 GROUP BY cl, u.i),
           |lo_c1 AS (SELECT cl, list(m ORDER BY i) AS cv FROM lo_u1 GROUP BY cl),
           |lo_s2 AS (
           |  SELECT e.vec_id, e.v, c.cl,
           |    list_sum(list_transform(c.cv, x -> x * x))
           |      - 2 * list_sum(list_transform(e.v, (x, i) -> x * c.cv[i]))
           |      AS score
           |  FROM lo e CROSS JOIN lo_c1 c),
           |lo_a2 AS (SELECT vec_id, cl, score,
           |    list_sum(list_transform(v, x -> x * x)) AS n2 FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY score, cl) AS rn FROM lo_s2) WHERE rn = 1),
           |hi_c0 AS (SELECT CAST(vec_id AS INTEGER) AS cl, v AS cv
           |          FROM hi WHERE vec_id < 4),
           |hi_s1 AS (
           |  SELECT e.vec_id, e.v, c.cl,
           |    list_sum(list_transform(c.cv, x -> x * x))
           |      - 2 * list_sum(list_transform(e.v, (x, i) -> x * c.cv[i]))
           |      AS score
           |  FROM hi e CROSS JOIN hi_c0 c),
           |hi_a1 AS (SELECT vec_id, v, cl FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY score, cl) AS rn FROM hi_s1) WHERE rn = 1),
           |hi_e1 AS (SELECT cl, unnest(list_transform(v,
           |           (x, i) -> {'i': i, 'x': x})) AS u FROM hi_a1),
           |hi_u1 AS (SELECT cl, u.i AS i, round(avg(u.x), 9) AS m
           |          FROM hi_e1 GROUP BY cl, u.i),
           |hi_c1 AS (SELECT cl, list(m ORDER BY i) AS cv FROM hi_u1 GROUP BY cl),
           |hi_s2 AS (
           |  SELECT e.vec_id, e.v, c.cl,
           |    list_sum(list_transform(c.cv, x -> x * x))
           |      - 2 * list_sum(list_transform(e.v, (x, i) -> x * c.cv[i]))
           |      AS score
           |  FROM hi e CROSS JOIN hi_c1 c),
           |hi_a2 AS (SELECT vec_id, cl, score,
           |    list_sum(list_transform(v, x -> x * x)) AS n2 FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY score, cl) AS rn FROM hi_s2) WHERE rn = 1)
           |SELECT l.vec_id, CAST(l.cl AS BIGINT) AS code_lo,
           |  CAST(h.cl AS BIGINT) AS code_hi,
           |  round((l.n2 + l.score) + (h.n2 + h.score), 6) AS recon_err
           |FROM lo_a2 l JOIN hi_a2 h USING (vec_id)
           |ORDER BY vec_id""".stripMargin))

  /** Gate-lifetime temp dirs, swept by one static shutdown hook — the
    * SourceQueries/MaintenanceQueries contract. */
  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  locally {
    sys.addShutdownHook {
      tempDirs.forEach(f =>
        org.apache.commons.io.FileUtils.deleteQuietly(f): Unit)
    }: Unit
  }
  private def newTempDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    tempDirs.add(dir)
    dir.getAbsolutePath
  }

  /** ANN index PERSISTED IN THE TABLE FORMAT and served through its
    * file-skipping reads — the disk-backed vector-serving shape: IVF
    * cell assignments (q176's deterministic centroid contract) are
    * written as a [[graft.sources.GraftTable]] RANGE-BUCKETED BY CELL,
    * so probing a cell is a `readRange(cell, c, c)` that opens only
    * that cell's file(s) via manifest stats — at 100 TB an nprobe=2
    * query touches 2/K of the index files instead of the index. The
    * gate serves with nprobe = ALL cells through the pruned path, which
    * is provably the exact search (q37's argument), so the oracle is
    * the shared brute-force top-5; per-cell file-count pruning is
    * pinned in SimilaritySpec, which a logical replay can't see. */
  val q241TableServedAnn = GraftQuery(
    "q241_table_served_ann",
    (s, dir) => {
      val root = newTempDir("graft_ann_tbl") + "/tbl"
      val emb = Tables.embeddings(s, dir)
      val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val cents = Similarity.trainCentroidArrays(corpus, nCentroids = 8)
      val assigned = graft.operators.KMeans.assign(emb, cents)
        .select(col("cluster").cast("long").as("cell"), col("vec_id"),
          col("embedding"))
      graft.sources.GraftTable.create(s, root, assigned, "cell", nBuckets = 8)
      val served = (0 until 8)
        .map(c => graft.sources.GraftTable.readRange(s, root, "cell",
          c.toLong, c.toLong))
        .reduce(_ unionAll _)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(queries, served, k = 5)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy("qid", "rank")
    },
    Some(topKOracle))

  /** One-iteration k-means replay as DuckDB CTEs over `src(vec_id, v)`:
    * seeds = the k lowest ids (cluster id = vec_id, which IS the seed
    * rank on a contiguous id space), assignment by the |c|² − 2·v·c
    * decomposition with (score, cl) tie-break, update = per-(cluster,
    * dim) average rounded to 9 decimals — exactly
    * [[graft.operators.KMeans.fit]]'s contract (the q218 pattern,
    * factored so q254 can replay THREE codebooks without triplicating
    * the SQL). Exposes `${p}_c1` (trained centroids). */
  private def km1Sql(src: String, p: String, k: Int): String =
    s"""${p}_c0 AS (SELECT CAST(vec_id AS INTEGER) AS cl, v AS cv
       |  FROM $src WHERE vec_id < $k),
       |${p}_s1 AS (
       |  SELECT a.vec_id, a.v, c.cl,
       |    list_sum(list_transform(c.cv, x -> x * x))
       |      - 2 * list_sum(list_transform(a.v, (x, i) -> x * c.cv[i]))
       |      AS score
       |  FROM $src a CROSS JOIN ${p}_c0 c),
       |${p}_a1 AS (SELECT vec_id, v, cl FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score, cl) AS rn FROM ${p}_s1) WHERE rn = 1),
       |${p}_u1 AS (SELECT cl, u.i AS i, round(avg(u.x), 9) AS m FROM (
       |    SELECT cl, unnest(list_transform(v, (x, i) -> {'i': i, 'x': x}))
       |      AS u FROM ${p}_a1) GROUP BY cl, u.i),
       |${p}_c1 AS (SELECT cl, list(m ORDER BY i) AS cv
       |  FROM ${p}_u1 GROUP BY cl)""".stripMargin

  /** Final nearest-centroid assignment of `src(vec_id, v)` against
    * `${p}_c1`, emitted as `$out(vec_id, $codeCol)`. */
  private def assign1Sql(src: String, p: String, out: String,
      codeCol: String): String =
    s"""${out}_s AS (
       |  SELECT a.vec_id, c.cl,
       |    list_sum(list_transform(c.cv, x -> x * x))
       |      - 2 * list_sum(list_transform(a.v, (x, i) -> x * c.cv[i]))
       |      AS score
       |  FROM $src a CROSS JOIN ${p}_c1 c),
       |$out AS (SELECT vec_id, cl AS $codeCol FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score, cl) AS rn FROM ${out}_s) WHERE rn = 1)""".stripMargin

  /** IVF-PQ search, oracle-replayed END TO END: coarse quantizer (k=4,
    * 1 deterministic Lloyd iteration), two 32-dim PQ codebooks (k=4
    * each, the q218 construction), nProbe=2 cell routing, an
    * asymmetric-distance scan of the CODES inside the probed cells
    * (per-candidate cost: two LUT lookups + one add — the full vector
    * is never touched until re-rank), a top-20 ADC shortlist, and an
    * exact-cosine re-rank to top-5. Output rows carry `in_exact_top5`
    * vs the brute-force truth (the q30 oracle), so the gate pins BOTH
    * the approximate pipeline's determinism and its measured recall —
    * the DuckDB side replays every stage (three k-means replays, the
    * ADC join, both rankings) and must agree bit-for-bit. */
  val q254IvfPqSearch = GraftQuery(
    "q254_ivf_pq_search",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val approx = Similarity.ivfPqTopK(queries, corpus, k = 5, dims = 64,
        m = 8, shortlist = 64, nCoarse = 4, nProbe = 2, pqK = 8, iters = 1)
      val truth = Similarity.bruteForceTopK(queries, corpus, k = 5)
        .select(col("qid"), col("neighbor_id")).withColumn("hit", lit(1L))
      approx.join(truth, Seq("qid", "neighbor_id"), "left")
        .select(col("qid"), col("rank"), col("neighbor_id"),
          round(col("cos"), 4).as("cos"),
          coalesce(col("hit"), lit(0L)).as("in_exact_top5"))
        .orderBy("qid", "rank")
    },
    Some({
      val m = 8; val sub = 8
      def sl(j: Int) = s"[${j * sub + 1}:${(j + 1) * sub}]"
      val subSrcs = (0 until m).map(j =>
        s"e$j AS (SELECT vec_id, v${sl(j)} AS v FROM e)").mkString(",\n")
      val subKm = (0 until m).map(j => km1Sql(s"e$j", s"b$j", 8)).mkString(",\n")
      val subAssign = (0 until m).map(j =>
        assign1Sql(s"e$j", s"b$j", s"code$j", "code")).mkString(",\n")
      val subLuts = (0 until m).map(j =>
        s"""lut$j AS (
           |  SELECT a.qid, c.cl AS code,
           |    list_sum(list_transform(c.cv, x -> x * x))
           |      - 2 * list_sum(list_transform(a.v${sl(j)}, (x, i) -> x * c.cv[i]))
           |      AS d
           |  FROM q a CROSS JOIN b${j}_c1 c)""".stripMargin).mkString(",\n")
      val codeJoins = (0 until m).map(j =>
        s"""  JOIN code$j c$j ON c$j.vec_id = cf.vec_id
           |  JOIN lut$j l$j ON l$j.qid = p.qid AND l$j.code = c$j.code"""
          .stripMargin).mkString("\n")
      val adcSum = (0 until m).map(j => s"l$j.d").mkString(" + ")
      s"""WITH e AS (SELECT vec_id,
            |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            |  FROM embeddings),
            |$subSrcs,
            |${km1Sql("e", "co", 4)},
            |$subKm,
            |${assign1Sql("e", "co", "cellof", "cell")},
            |$subAssign,
            |q AS (SELECT vec_id AS qid, v FROM e WHERE vec_id < 10),
            |qp AS (
            |  SELECT a.qid, c.cl,
            |    list_sum(list_transform(c.cv, x -> x * x))
            |      - 2 * list_sum(list_transform(a.v, (x, i) -> x * c.cv[i]))
            |      AS score
            |  FROM q a CROSS JOIN co_c1 c),
            |probe AS (SELECT qid, cl AS cell FROM (
            |    SELECT *, row_number() OVER (PARTITION BY qid
            |      ORDER BY score, cl) AS rn FROM qp) WHERE rn <= 2),
            |$subLuts,
            |cand AS (
            |  SELECT p.qid, cf.vec_id AS cid, $adcSum AS adc
            |  FROM probe p
            |  JOIN cellof cf ON cf.cell = p.cell
            |$codeJoins
            |  WHERE cf.vec_id <> p.qid),
            |short AS (SELECT qid, cid FROM (
            |    SELECT *, row_number() OVER (PARTITION BY qid
            |      ORDER BY adc, cid) AS rn FROM cand) WHERE rn <= 64),
            |rer AS (
            |  SELECT s.qid, s.cid,
            |    list_sum(list_transform(a.v, (x, i) -> x * b.v[i]))
            |      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
            |         * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos
            |  FROM short s
            |  JOIN e a ON a.vec_id = s.qid
            |  JOIN e b ON b.vec_id = s.cid),
            |sys AS (SELECT qid, cid, cos,
            |    row_number() OVER (PARTITION BY qid
            |      ORDER BY cos DESC, cid) AS rank
            |  FROM rer),
            |truth AS (SELECT qid, neighbor_id FROM (
            |    SELECT a.qid, b.vec_id AS neighbor_id,
            |      row_number() OVER (PARTITION BY a.qid ORDER BY
            |        list_sum(list_transform(a.v, (x, i) -> x * b.v[i]))
            |          / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
            |             * sqrt(list_sum(list_transform(b.v, x -> x * x))))
            |          DESC, b.vec_id) AS rank
            |    FROM q a JOIN e b ON b.vec_id <> a.qid) WHERE rank <= 5)
            |SELECT s.qid AS qid, CAST(s.rank AS BIGINT) AS rank,
            |  s.cid AS neighbor_id, round(s.cos, 4) AS cos,
            |  CAST(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END
            |    AS BIGINT) AS in_exact_top5
            |FROM sys s LEFT JOIN truth t
            |  ON t.qid = s.qid AND t.neighbor_id = s.cid
            |WHERE s.rank <= 5
            |ORDER BY s.qid, rank""".stripMargin
    }))

  /** INCREMENTAL ANN INDEX MAINTENANCE — the freshness problem every
    * vector store has: new vectors must become searchable WITHOUT
    * retraining or rebuilding. The index is a [[graft.sources
    * .GraftTable]] keyed by `cell·2⁴⁰ + vec_id` — unique per row, yet
    * range-clustered by IVF cell in the HIGH bits, so per-cell probes
    * stay file-pruned `readRange`s AND incremental upserts rewrite
    * only the files whose key interval their cells touch (pruned
    * copy-on-write, not a rebuild). Centroids train on the INITIAL
    * half of the corpus and are FROZEN; two later arrival batches
    * assign against them and upsert. Serving probes all cells (the
    * q241 exactness trick), so the gate's oracle is the full-corpus
    * brute force: a hash match proves the maintained index serves
    * old + new vectors exactly — none lost, none duplicated.
    * `SimilaritySpec` pins that single-cell probes skip files after
    * the incremental commits. */
  val q273IncrementalAnnIndex = GraftQuery(
    "q273_incremental_ann_index",
    (s, dir) => {
      val root = newTempDir("graft_ann_incr") + "/tbl"
      val emb = Tables.embeddings(s, dir)
      val cellBase = 1099511627776L // 2^40
      val old = emb.filter(col("vec_id") % 2 === 0)
      val cents = Similarity.trainCentroidArrays(
        old.select(col("vec_id").as("cid"), col("embedding").as("cvec")),
        nCentroids = 8)
      def keyed(df: org.apache.spark.sql.DataFrame) =
        graft.operators.KMeans.assign(df, cents).select(
          (col("cluster").cast("long") * cellBase + col("vec_id")).as("k"),
          col("vec_id"), col("embedding"))
      graft.sources.GraftTable.create(s, root, keyed(old), "k", nBuckets = 8)
      graft.sources.GraftTable.upsert(s, root,
        keyed(emb.filter(col("vec_id") % 4 === 1)), "k")
      graft.sources.GraftTable.upsert(s, root,
        keyed(emb.filter(col("vec_id") % 4 === 3)), "k")
      val served = (0 until 8).map { c =>
        graft.sources.GraftTable.readRange(s, root, "k",
          c * cellBase, (c + 1) * cellBase - 1)
      }.reduce(_ unionAll _)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(queries, served, k = 5)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy("qid", "rank")
    },
    Some(topKOracle))

  /** Shared oracle chain for the power-iteration family (q274/q279):
    * micro-quantized inputs, n-scaled centering, three quantized
    * y=Zv / w=Zᵀy rounds. Ends at `z(r, i, z)`, `v3(i, v6)`, and
    * `mw3(m)`. */
  private def pcaIterSql(k: Int): String = {
    val prev = if (k == 1) "v0" else s"v${k - 1}"
    s"""y$k AS MATERIALIZED (
       |  SELECT z.r, CAST(sum(CAST(round(CAST(z.z * v.v6 AS DOUBLE)
       |    / 1e3) AS BIGINT)) AS BIGINT) AS y
       |  FROM z JOIN $prev v ON v.i = z.i GROUP BY 1),
       |my$k AS (SELECT max(abs(y)) AS m FROM y$k),
       |y6_$k AS MATERIALIZED (
       |  SELECT r, CAST(round(1e6 * (CAST(y AS DOUBLE) /
       |    CAST((SELECT m FROM my$k) AS DOUBLE))) AS BIGINT) AS y6
       |  FROM y$k),
       |w$k AS MATERIALIZED (
       |  SELECT z.i, CAST(sum(CAST(round(CAST(z.z * y6_$k.y6 AS DOUBLE)
       |    / 1e3) AS BIGINT)) AS BIGINT) AS w
       |  FROM z JOIN y6_$k USING (r) GROUP BY 1),
       |mw$k AS (SELECT max(abs(w)) AS m FROM w$k),
       |v$k AS MATERIALIZED (
       |  SELECT i, CAST(round(1e6 * (CAST(w AS DOUBLE) /
       |    CAST((SELECT m FROM mw$k) AS DOUBLE))) AS BIGINT) AS v6
       |  FROM w$k)""".stripMargin
  }

  private def pcaChainSql: String =
    s"""x6 AS MATERIALIZED (
       |  SELECT vec_id AS r, u.u.i - 1 AS i,
       |    CAST(round(CAST(u.u.x AS DOUBLE) * 1e6) AS BIGINT) AS x6
       |  FROM (SELECT vec_id, unnest(list_transform(embedding,
       |      (x, i) -> {'i': i, 'x': x})) AS u FROM embeddings) u),
       |nn AS (SELECT count(*) AS n FROM embeddings),
       |s AS MATERIALIZED (
       |  SELECT i, CAST(sum(x6) AS BIGINT) AS s6 FROM x6 GROUP BY 1),
       |z AS MATERIALIZED (
       |  SELECT x6.r, x6.i,
       |    CAST((SELECT n FROM nn) * x6.x6 - s.s6 AS BIGINT) AS z
       |  FROM x6 JOIN s ON s.i = x6.i),
       |v0 AS (SELECT CAST(t.range AS INTEGER) AS i,
       |  CAST(1000000 AS BIGINT) AS v6 FROM range(64) t),
       |${pcaIterSql(1)},
       |${pcaIterSql(2)},
       |${pcaIterSql(3)}"""
      .stripMargin

  /** One Gram-Schmidt + renormalize step against `pc` (the q280
    * deflation), reading `src(i, v6)` and emitting `out(i, v6)`. */
  private def pcaOrthoSql(src: String, pc: String, out: String): String =
    s"""${out}_d AS (
       |  SELECT CAST(sum(q.v6 * p.v6) AS BIGINT) AS dv,
       |    CAST(sum(p.v6 * p.v6) AS BIGINT) AS d1
       |  FROM $src q JOIN $pc p USING (i)),
       |${out}_o AS (
       |  SELECT q.i, q.v6 - CAST(round((CAST((SELECT dv FROM ${out}_d)
       |    AS DOUBLE) / CAST((SELECT d1 FROM ${out}_d) AS DOUBLE)) * p.v6)
       |    AS BIGINT) AS vo
       |  FROM $src q JOIN $pc p USING (i)),
       |${out}_m AS (SELECT max(abs(vo)) AS m FROM ${out}_o),
       |$out AS MATERIALIZED (
       |  SELECT i, CAST(round(1e6 * (CAST(vo AS DOUBLE) /
       |    CAST((SELECT m FROM ${out}_m) AS DOUBLE))) AS BIGINT) AS v6
       |  FROM ${out}_o)""".stripMargin

  /** One DEFLATED power-iteration round for q280: y/w against
    * `$prev(i, v6)`, normalize to `u${k}raw`, then orthogonalize
    * against `v3` (the first component) into `u$k`. */
  private def pca2IterSql(k: Int): String = {
    val prev = if (k == 1) "u0" else s"u${k - 1}"
    s"""y2_$k AS MATERIALIZED (
       |  SELECT z.r, CAST(sum(CAST(round(CAST(z.z * v.v6 AS DOUBLE)
       |    / 1e3) AS BIGINT)) AS BIGINT) AS y
       |  FROM z JOIN $prev v ON v.i = z.i GROUP BY 1),
       |my2_$k AS (SELECT max(abs(y)) AS m FROM y2_$k),
       |y62_$k AS MATERIALIZED (
       |  SELECT r, CAST(round(1e6 * (CAST(y AS DOUBLE) /
       |    CAST((SELECT m FROM my2_$k) AS DOUBLE))) AS BIGINT) AS y6
       |  FROM y2_$k),
       |w2_$k AS MATERIALIZED (
       |  SELECT z.i, CAST(sum(CAST(round(CAST(z.z * y62_$k.y6 AS DOUBLE)
       |    / 1e3) AS BIGINT)) AS BIGINT) AS w
       |  FROM z JOIN y62_$k USING (r) GROUP BY 1),
       |mw2_$k AS (SELECT max(abs(w)) AS m FROM w2_$k),
       |u${k}raw AS MATERIALIZED (
       |  SELECT i, CAST(round(1e6 * (CAST(w AS DOUBLE) /
       |    CAST((SELECT m FROM mw2_$k) AS DOUBLE))) AS BIGINT) AS v6
       |  FROM w2_$k),
       |${pcaOrthoSql(s"u${k}raw", "v3", s"u$k")}""".stripMargin
  }

  /** TOP-2 PCA — the dominant component plus DEFLATED power iteration
    * for the second ([[graft.operators.PowerIteration
    * .topTwoEigenvectors]]): each second-component iteration
    * normalizes and then Gram-Schmidt-orthogonalizes against the
    * quantized first component, all inside the same integer
    * discipline, sharing one cached Z materialization. The oracle
    * replays BOTH chains — six distributed mat-vec rounds plus four
    * orthogonalizations — bit-for-bit. `PowerIterationSpec` pins the
    * planted two-axis recovery and near-orthogonality. */
  val q280TopTwoPca = GraftQuery(
    "q280_top_two_pca",
    (s, dir) => {
      val (v1, v2) = graft.operators.PowerIteration
        .topTwoEigenvectors(Tables.embeddings(s, dir), dims = 64, iters = 3)
      import s.implicits._
      (v1.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) } ++
        v2.zipWithIndex.map { case (v, i) => (2L, i.toLong, v) }).toSeq
        .toDF("pc", "dim", "v6")
        .orderBy("pc", "dim")
    },
    Some(s"""WITH $pcaChainSql,
            |uni AS (SELECT CAST(t.range AS INTEGER) AS i,
            |  CAST(1000000 AS BIGINT) AS v6 FROM range(64) t),
            |${pcaOrthoSql("uni", "v3", "u0")},
            |${pca2IterSql(1)},
            |${pca2IterSql(2)},
            |${pca2IterSql(3)}
            |SELECT CAST(pc AS BIGINT) AS pc, CAST(i AS BIGINT) AS dim, v6
            |FROM (SELECT 1 AS pc, i, v6 FROM v3
            |      UNION ALL SELECT 2, i, v6 FROM u3)
            |ORDER BY pc, dim""".stripMargin))

  /** DISTRIBUTED PCA BY POWER ITERATION
    * ([[graft.operators.PowerIteration]]): dominant eigenvector of the
    * centered covariance via three `y = Zv` / `w = Zᵀy` rounds — each
    * an explode → broadcast-join → hash-aggregate, never a
    * materialized matrix; only the dim-sized vector and two scalar
    * maxima leave the executors per iteration. All arithmetic follows
    * the integer-micros discipline (products exact below 2⁵³,
    * quantized before every order-free sum), so the oracle replays
    * all three iterations as CTE chains and must agree bit-for-bit.
    * `PowerIterationSpec` pins the semantics: the distributed path
    * equals a dense local replay, and a planted dominant axis is
    * recovered. */
  val q274PowerIterationPca = GraftQuery(
    "q274_power_iteration_pca",
    (s, dir) => {
      val (v6, growth) = graft.operators.PowerIteration
        .dominantEigenvector(Tables.embeddings(s, dir), dims = 64, iters = 3)
      import s.implicits._
      v6.zipWithIndex.map { case (v, i) =>
        (i.toLong, v, growth.last)
      }.toSeq.toDF("dim", "v6", "final_max_w")
        .orderBy("dim")
    },
    Some(s"""WITH $pcaChainSql
            |SELECT CAST(v3.i AS BIGINT) AS dim, v3.v6,
            |  CAST((SELECT m FROM mw3) AS BIGINT) AS final_max_w
            |FROM v3 ORDER BY dim""".stripMargin))

  /** FEATURE-CORRELATION AUDIT — exact pairwise Pearson correlation
    * between embedding dimensions (the redundancy check run before
    * feature selection / whitening): micro-quantized inputs make
    * every moment an exact int64 (`n·Σxy`, `Sx·Sy`, and their
    * difference all bounded inside the budget documented in
    * [[graft.operators.PowerIteration]]), so the only floats are the
    * two final square roots — deterministic on both engines. Shape:
    * per-dim moments are one hash-aggregate; cross moments come from
    * the position self-join on the row id (per-row work is d², the
    * aggregated state is d²-sized — independent of corpus size).
    * Output: the top-10 most-correlated pairs. */
  val q275CorrelationAudit = GraftQuery(
    "q275_correlation_audit",
    (s, dir) => {
      val x6 = Tables.embeddings(s, dir)
        .select(col("vec_id").as("r"),
          posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("r"), col("i"),
          round(col("x").cast("double") * 1e6, 0).cast("long").as("x6"))
      val n = Tables.embeddings(s, dir).count()
      val mom = x6.groupBy("i").agg(
        sum("x6").as("sx"), sum(col("x6") * col("x6")).as("sxx"))
      val cross = x6.as("a").join(x6.as("b"),
          col("a.r") === col("b.r") && col("a.i") < col("b.i"))
        .groupBy(col("a.i").as("i"), col("b.i").as("j"))
        .agg(sum(col("a.x6") * col("b.x6")).as("sxy"))
      val momI = mom.select(col("i"), col("sx").as("sx_i"),
        col("sxx").as("sxx_i"))
      val momJ = mom.select(col("i").as("j"), col("sx").as("sx_j"),
        col("sxx").as("sxx_j"))
      cross.join(broadcast(momI), "i").join(broadcast(momJ), "j")
        .withColumn("num", lit(n) * col("sxy") - col("sx_i") * col("sx_j"))
        .withColumn("d_i", lit(n) * col("sxx_i") - col("sx_i") * col("sx_i"))
        .withColumn("d_j", lit(n) * col("sxx_j") - col("sx_j") * col("sx_j"))
        .withColumn("corr", round(col("num").cast("double") /
          (sqrt(col("d_i").cast("double")) * sqrt(col("d_j").cast("double"))),
          9))
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("corr"))
        .orderBy(abs(col("corr")).desc, col("i"), col("j"))
        .limit(10)
    },
    Some("""WITH x6 AS MATERIALIZED (
           |  SELECT vec_id AS r, u.u.i - 1 AS i,
           |    CAST(round(CAST(u.u.x AS DOUBLE) * 1e6) AS BIGINT) AS x6
           |  FROM (SELECT vec_id, unnest(list_transform(embedding,
           |      (x, i) -> {'i': i, 'x': x})) AS u FROM embeddings) u),
           |nn AS (SELECT count(*) AS n FROM embeddings),
           |mom AS MATERIALIZED (
           |  SELECT i, CAST(sum(x6) AS BIGINT) AS sx,
           |    CAST(sum(x6 * x6) AS BIGINT) AS sxx
           |  FROM x6 GROUP BY 1),
           |cross_m AS MATERIALIZED (
           |  SELECT a.i AS i, b.i AS j, CAST(sum(a.x6 * b.x6) AS BIGINT) AS sxy
           |  FROM x6 a JOIN x6 b ON b.r = a.r AND a.i < b.i
           |  GROUP BY 1, 2),
           |c AS (
           |  SELECT cm.i, cm.j,
           |    round(CAST((SELECT n FROM nn) * cm.sxy - mi.sx * mj.sx
           |        AS DOUBLE) /
           |      (sqrt(CAST((SELECT n FROM nn) * mi.sxx - mi.sx * mi.sx
           |          AS DOUBLE)) *
           |       sqrt(CAST((SELECT n FROM nn) * mj.sxx - mj.sx * mj.sx
           |          AS DOUBLE))), 9) AS corr
           |  FROM cross_m cm JOIN mom mi ON mi.i = cm.i
           |    JOIN mom mj ON mj.i = cm.j)
           |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, corr
           |FROM c ORDER BY abs(corr) DESC, i, j LIMIT 10""".stripMargin))

  /** HARD-NEGATIVE MINING — the triplet-construction step of every
    * embedding-training pipeline: for each anchor, the most-similar
    * SAME-label vector is the positive and the most-similar
    * DIFFERENT-label vector is the hard negative; the triplet margin
    * `cos(pos) − cos(neg)` and the violation flag (negative within
    * 0.05 of the positive) are what the training loop consumes. Shape:
    * anchors broadcast against the corpus scan (the bruteForceTopK
    * pair generation), then ONE aggregation with conditional struct
    * extrema — no window, no per-label self-join; at 100 TB the
    * per-anchor state is two structs. Selection happens on raw cosine
    * doubles (identical on both engines); rounding is display-only. */
  val q278HardNegatives = GraftQuery(
    "q278_hard_negatives",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val anchors = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("cid"),
        col("label").as("clabel"), col("embedding").as("cvec"))
      val scored = corpus.crossJoin(broadcast(anchors))
        .filter(col("qid") =!= col("cid"))
        .withColumn("cos", Similarity.cosine(col("qvec"), col("cvec")))
      scored.groupBy("qid", "qlabel")
        .agg(
          max(when(col("clabel") === col("qlabel"),
            struct(col("cos"), col("cid")))).as("pos"),
          max(when(col("clabel") =!= col("qlabel"),
            struct(col("cos"), col("cid")))).as("neg"))
        // an anchor whose label has no same-label (or no other-label)
        // peer has no pos/neg pair; the oracle's INNER JOIN of pos and
        // neg drops it, so drop it here too — both engines agree by
        // construction on any label distribution
        .filter(col("pos").isNotNull && col("neg").isNotNull)
        .select(col("qid"), col("qlabel").cast("long").as("qlabel"),
          col("pos.cid").as("pos_id"), round(col("pos.cos"), 6).as("pos_cos"),
          col("neg.cid").as("neg_id"), round(col("neg.cos"), 6).as("neg_cos"),
          round(col("pos.cos") - col("neg.cos"), 6).as("margin"),
          (col("neg.cos") + 0.05 > col("pos.cos")).as("violated"))
        .orderBy("qid")
    },
    Some(s"""WITH scored AS (
            |  SELECT a.vec_id AS qid, a.label AS qlabel,
            |    b.vec_id AS cid, b.label AS clabel,
            |    $cosSql AS cos
            |  FROM (SELECT * FROM embeddings WHERE vec_id < 20) a
            |  JOIN embeddings b ON b.vec_id <> a.vec_id),
            |pos AS (
            |  SELECT qid, qlabel, cid AS pos_id, cos AS pos_cos FROM (
            |    SELECT *, row_number() OVER (PARTITION BY qid
            |      ORDER BY cos DESC, cid DESC) AS rn
            |    FROM scored WHERE clabel = qlabel) WHERE rn = 1),
            |neg AS (
            |  SELECT qid, cid AS neg_id, cos AS neg_cos FROM (
            |    SELECT *, row_number() OVER (PARTITION BY qid
            |      ORDER BY cos DESC, cid DESC) AS rn
            |    FROM scored WHERE clabel <> qlabel) WHERE rn = 1)
            |SELECT p.qid, CAST(p.qlabel AS BIGINT) AS qlabel,
            |  p.pos_id, round(p.pos_cos, 6) AS pos_cos,
            |  n.neg_id, round(n.neg_cos, 6) AS neg_cos,
            |  round(p.pos_cos - n.neg_cos, 6) AS margin,
            |  n.neg_cos + 0.05 > p.pos_cos AS violated
            |FROM pos p JOIN neg n ON n.qid = p.qid
            |ORDER BY p.qid""".stripMargin))

  /** PCA PROJECTION AUDIT — project the corpus onto the trained
    * dominant component ([[graft.operators.PowerIteration
    * .projectScores]]: one more quantized E-step, map-only against the
    * broadcast direction) and profile the scores per label: does the
    * principal axis of variance carry label structure? Per-label
    * count, exact integer score mass, and extrema are all order-free
    * integer sums of the bit-reproducible scores. Oracle: the shared
    * q274 chain plus the projection and label join. */
  val q279PcaProjection = GraftQuery(
    "q279_pca_projection",
    (s, dir) => {
      import graft.operators.PowerIteration
      val emb = Tables.embeddings(s, dir)
      val (v6, _) = PowerIteration.dominantEigenvector(emb, 64, iters = 3)
      PowerIteration.projectScores(emb, v6)
        .join(emb.select(col("vec_id").as("r"), col("label")), "r")
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n"),
          sum("score").as("sum_score"),
          min("score").as("min_score"), max("score").as("max_score"))
        .orderBy("label")
    },
    Some(s"""WITH $pcaChainSql,
            |proj AS MATERIALIZED (
            |  SELECT z.r, CAST(sum(CAST(round(CAST(z.z * v.v6 AS DOUBLE)
            |    / 1e3) AS BIGINT)) AS BIGINT) AS score
            |  FROM z JOIN v3 v ON v.i = z.i GROUP BY 1)
            |SELECT CAST(e.label AS BIGINT) AS label, count(*) AS n,
            |  CAST(sum(p.score) AS BIGINT) AS sum_score,
            |  min(p.score) AS min_score, max(p.score) AS max_score
            |FROM proj p JOIN embeddings e ON e.vec_id = p.r
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** WHITENED 2-D EMBEDDING COORDINATES — the dimensionality-reduction
    * payoff of the PCA family: every vector projected onto BOTH
    * trained components (two quantized map-only E-steps), plus the
    * EXACT Pearson correlation between the two coordinates, computed
    * q275-style from integer moments on centi-rescaled scores (the
    * rescale keeps n·Σs₁s₂ inside int64 — the documented budget
    * knob). The correlation is the CONVERGENCE DIAGNOSTIC: the
    * directions are orthogonal by construction, but their projections
    * decorrelate only as the iterates converge to true eigenvectors —
    * on this near-flat synthetic spectrum 3 iterations leave a
    * measured residual (≈ −0.16 at sf0.001), honestly reported; on a
    * SEPARATED spectrum the same pipeline decorrelates, pinned on
    * planted data in `Round9Spec`. */
  val q281WhitenedCoords = GraftQuery(
    "q281_whitened_coords",
    (s, dir) => {
      import graft.operators.PowerIteration
      val emb = Tables.embeddings(s, dir)
      val (v1, v2) = PowerIteration
        .topTwoEigenvectors(emb, dims = 64, iters = 3)
      val s1 = PowerIteration.projectScores(emb, v1)
        .withColumnRenamed("score", "s1")
      val s2 = PowerIteration.projectScores(emb, v2)
        .withColumnRenamed("score", "s2")
      val coords = s1.join(s2, "r")
        .select(col("r"),
          round(col("s1").cast("double") / 1e8, 0).cast("long").as("c1"),
          round(col("s2").cast("double") / 1e8, 0).cast("long").as("c2"))
        .cache()
      val n = emb.count()
      val m = coords.agg(
        sum("c1").as("sx"), sum("c2").as("sy"),
        sum(col("c1") * col("c1")).as("sxx"),
        sum(col("c2") * col("c2")).as("syy"),
        sum(col("c1") * col("c2")).as("sxy")).collect().head
      val (sx, sy, sxx, syy, sxy) =
        (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3), m.getLong(4))
      val corr = BigDecimal((n * sxy - sx * sy).toDouble /
          (math.sqrt((n * sxx - sx * sx).toDouble) *
            math.sqrt((n * syy - sy * sy).toDouble)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      coords.join(emb.select(col("vec_id").as("r"), col("label")), "r")
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n"),
          sum("c1").as("sum_c1"), sum("c2").as("sum_c2"),
          min("c1").as("min_c1"), max("c1").as("max_c1"))
        .withColumn("coord_corr", lit(corr))
        .orderBy("label")
    },
    Some(s"""WITH $pcaChainSql,
            |uni AS (SELECT CAST(t.range AS INTEGER) AS i,
            |  CAST(1000000 AS BIGINT) AS v6 FROM range(64) t),
            |${pcaOrthoSql("uni", "v3", "u0")},
            |${pca2IterSql(1)},
            |${pca2IterSql(2)},
            |${pca2IterSql(3)},
            |p1 AS MATERIALIZED (
            |  SELECT z.r, CAST(sum(CAST(round(CAST(z.z * v.v6 AS DOUBLE)
            |    / 1e3) AS BIGINT)) AS BIGINT) AS s1
            |  FROM z JOIN v3 v ON v.i = z.i GROUP BY 1),
            |p2 AS MATERIALIZED (
            |  SELECT z.r, CAST(sum(CAST(round(CAST(z.z * v.v6 AS DOUBLE)
            |    / 1e3) AS BIGINT)) AS BIGINT) AS s2
            |  FROM z JOIN u3 v ON v.i = z.i GROUP BY 1),
            |coords AS MATERIALIZED (
            |  SELECT p1.r,
            |    CAST(round(CAST(s1 AS DOUBLE) / 1e8) AS BIGINT) AS c1,
            |    CAST(round(CAST(s2 AS DOUBLE) / 1e8) AS BIGINT) AS c2
            |  FROM p1 JOIN p2 ON p2.r = p1.r),
            |mom AS (
            |  SELECT CAST(sum(c1) AS BIGINT) AS sx,
            |    CAST(sum(c2) AS BIGINT) AS sy,
            |    CAST(sum(c1 * c1) AS BIGINT) AS sxx,
            |    CAST(sum(c2 * c2) AS BIGINT) AS syy,
            |    CAST(sum(c1 * c2) AS BIGINT) AS sxy,
            |    count(*) AS n
            |  FROM coords)
            |SELECT CAST(e.label AS BIGINT) AS label, count(*) AS n,
            |  CAST(sum(c.c1) AS BIGINT) AS sum_c1,
            |  CAST(sum(c.c2) AS BIGINT) AS sum_c2,
            |  min(c.c1) AS min_c1, max(c.c1) AS max_c1,
            |  (SELECT round(CAST(n * sxy - sx * sy AS DOUBLE) /
            |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
            |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 9) FROM mom)
            |    AS coord_corr
            |FROM coords c JOIN embeddings e ON e.vec_id = c.r
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** MATRYOSHKA (MRL) TRUNCATION EVAL — retrieval recall when only a
    * PREFIX of each embedding is kept (the deployment decision
    * matryoshka-trained models exist for: how many dims can serving
    * drop?): exact top-5 by cosine at dims 8/16/64 against the
    * full-dim truth, recall@5 per dim. Set overlaps are pure integer
    * counts; the cosine rankings reuse [[Similarity.bruteForceTopK]]
    * (bounded-heap per partition, broadcast queries) over `slice`d
    * vectors — identical index-order dot products on both engines, so
    * ranks match exactly and the d = 64 row is a built-in recall-1.0
    * sanity anchor. */
  val q267MatryoshkaRecall = GraftQuery(
    "q267_matryoshka_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nQ = 20
      def topAtDim(d: Int) = {
        val q = emb.filter(col("vec_id") < nQ)
          .select(col("vec_id").as("qid"),
            slice(col("embedding"), 1, d).as("qvec"))
        val c = emb.select(col("vec_id").as("cid"),
          slice(col("embedding"), 1, d).as("cvec"))
        Similarity.bruteForceTopK(q, c, k = 5)
          .select(col("qid"), col("neighbor_id"))
      }
      val truth = topAtDim(64)
      Seq(8, 16, 64).map { d =>
        topAtDim(d).join(truth, Seq("qid", "neighbor_id"))
          .groupBy().agg(count(lit(1)).as("n_hits"))
          .select(lit(d).cast("long").as("dim"), col("n_hits"),
            round(col("n_hits").cast("double") / (nQ * 5), 9)
              .as("recall_at_5"))
      }.reduce(_ union _).orderBy("dim")
    },
    Some {
      def cosAt(d: Int) =
        s"""list_sum(list_transform(a.embedding[1:$d],
           |      (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           |    / (sqrt(list_sum(list_transform(a.embedding[1:$d],
           |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           |     * sqrt(list_sum(list_transform(b.embedding[1:$d],
           |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
      val tops = Seq(8, 16, 64).map { d =>
        s"""top$d AS MATERIALIZED (
           |  SELECT qid, neighbor_id FROM (
           |    SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${cosAt(d)} DESC, b.vec_id ASC) AS rank
           |    FROM (SELECT * FROM embeddings WHERE vec_id < 20) a
           |    JOIN embeddings b ON b.vec_id <> a.vec_id)
           |  WHERE rank <= 5)""".stripMargin
      }.mkString(",\n")
      s"""WITH $tops
         |SELECT CAST(d.d AS BIGINT) AS dim,
         |  CAST(count(*) AS BIGINT) AS n_hits,
         |  round(CAST(count(*) AS DOUBLE) / 100, 9) AS recall_at_5
         |FROM (SELECT 8 AS d UNION ALL SELECT 16 UNION ALL SELECT 64) d
         |JOIN (
         |  SELECT 8 AS d, t.qid, t.neighbor_id FROM top8 t
         |    JOIN top64 u ON u.qid = t.qid AND u.neighbor_id = t.neighbor_id
         |  UNION ALL
         |  SELECT 16, t.qid, t.neighbor_id FROM top16 t
         |    JOIN top64 u ON u.qid = t.qid AND u.neighbor_id = t.neighbor_id
         |  UNION ALL
         |  SELECT 64, t.qid, t.neighbor_id FROM top64 t
         |) h ON h.d = d.d
         |GROUP BY 1 ORDER BY 1""".stripMargin
    })

  /** NSW-FAMILY GRAPH ANN INDEX BUILD ([[graft.operators.Nsw]]) —
    * layered navigable-small-world adjacency as data: md5-geometric
    * layer assignment (P(layer ≥ ℓ) = 4^−ℓ, a pure string function),
    * per-layer cell-blocked top-3 cosine neighbors (k-means cells,
    * never all-pairs), symmetrized, plus the id-order connectivity
    * path. The gate outputs per-layer node counts, edge counts, and an
    * order-free md5 checksum over the full directed edge list — and
    * the oracle REPLAYS THE ENTIRE BUILD (k-means via the q218/q254
    * fragments, layer regexes, blocked kNN ranking, path ranks,
    * symmetrize + dedup) so Spark and DuckDB must agree on every edge
    * of every layer. */
  val q283NswIndexBuild = GraftQuery(
    "q283_nsw_index_build",
    (s, dir) => {
      import graft.operators.Nsw
      val emb = Tables.embeddings(s, dir)
      val corpus = emb.select(col("vec_id").as("cid"),
        col("embedding").as("cvec"))
      val edges = Nsw.build(corpus, m = 3, nCells = 4, maxLayer = 2,
        iters = 1)
      val mem = emb.select(col("vec_id").as("id"))
        .withColumn("layer", Nsw.layerCol(col("id"), 2))
        .select(col("id"), explode(sequence(lit(0), col("layer"))).as("l"))
      val nodeStats = mem.groupBy("l").agg(count(lit(1)).as("n_nodes"))
      val edgeStats = edges.groupBy(col("layer").as("l"))
        .agg(count(lit(1)).as("n_edges"),
          sum(conv(substring(md5(concat_ws("|",
            col("src").cast("string"), col("dst").cast("string"))), 1, 8),
            16, 10).cast("long")).as("edge_sum"))
      nodeStats.join(edgeStats, "l")
        .select(col("l").cast("long").as("layer"), col("n_nodes"),
          col("n_edges"), col("edge_sum"))
        .orderBy("layer")
    },
    Some(s"""WITH e AS (SELECT vec_id,
            |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            |  FROM embeddings),
            |${km1Sql("e", "nsw", 4)},
            |${assign1Sql("e", "nsw", "cellof", "cell")},
            |nodes AS (
            |  SELECT e.vec_id AS id, e.v, c.cell,
            |    LEAST(2, length(regexp_extract(
            |      md5(CAST(e.vec_id AS VARCHAR)), '^[0-3]*'))) AS layer,
            |    sqrt(list_sum(list_transform(e.v, x -> x * x))) AS nrm
            |  FROM e JOIN cellof c ON c.vec_id = e.vec_id),
            |lyr AS (SELECT 0 AS l UNION ALL SELECT 1 UNION ALL SELECT 2),
            |mem AS (SELECT lyr.l, n.* FROM lyr CROSS JOIN nodes n
            |  WHERE n.layer >= lyr.l),
            |pairs AS (
            |  SELECT a.l, a.id AS src, b.id AS dst,
            |    list_sum(list_transform(a.v, (x, i) -> x * b.v[i]))
            |      / (a.nrm * b.nrm) AS cos
            |  FROM mem a JOIN mem b
            |    ON b.l = a.l AND b.cell = a.cell AND b.id <> a.id),
            |qual AS (SELECT l, src, dst FROM (
            |    SELECT *, row_number() OVER (PARTITION BY l, src
            |      ORDER BY cos DESC, dst) AS rn FROM pairs) WHERE rn <= 3),
            |rk AS (SELECT l, id,
            |    row_number() OVER (PARTITION BY l ORDER BY id) AS r
            |  FROM mem),
            |path AS (SELECT a.l, a.id AS src, b.id AS dst
            |  FROM rk a JOIN rk b ON b.l = a.l AND b.r = a.r + 1),
            |edges AS (SELECT DISTINCT l, src, dst FROM (
            |  SELECT l, src, dst FROM qual
            |  UNION ALL SELECT l, dst AS src, src AS dst FROM qual
            |  UNION ALL SELECT l, src, dst FROM path
            |  UNION ALL SELECT l, dst AS src, src AS dst FROM path)),
            |ns AS (SELECT l, count(*) AS n_nodes FROM mem GROUP BY l),
            |es AS (SELECT l, count(*) AS n_edges,
            |    CAST(sum(('0x' || substr(md5(CAST(src AS VARCHAR) || '|' ||
            |      CAST(dst AS VARCHAR)), 1, 8))::BIGINT) AS BIGINT)
            |      AS edge_sum
            |  FROM edges GROUP BY l)
            |SELECT CAST(ns.l AS BIGINT) AS layer, ns.n_nodes, es.n_edges,
            |  es.edge_sum
            |FROM ns JOIN es ON es.l = ns.l ORDER BY layer""".stripMargin))

  /** NSW probe-all search — the q32/q37 exactness pattern for the
    * graph index: `ef ≥ corpus` makes the candidate set the entire
    * corpus by definition, so [[graft.operators.Nsw.topK]] provably
    * degenerates to brute force and must reproduce the shared exact
    * top-5 oracle bit-for-bit (same scoring kernel, same tie-breaks).
    * Finite-beam recall through the REAL traversal is pinned in
    * SimilaritySpec on planted clustered data. */
  val q284NswSearch = GraftQuery(
    "q284_nsw_search",
    (s, dir) => {
      import graft.operators.Nsw
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("cid"),
        col("embedding").as("cvec"))
      val edges = Nsw.build(corpus, m = 3, nCells = 4, maxLayer = 2,
        iters = 1)
      Nsw.topK(queries, corpus, edges, k = 5, ef = Int.MaxValue,
        maxLayer = 2)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy("qid", "rank")
    },
    Some(topKOracle))

  /** HYBRID RETRIEVAL — reciprocal-rank fusion (RRF, K=60: the
    * Cormack/Clarke/Buettcher formulation every production hybrid
    * search ships) of a LEXICAL arm (q169's Okapi BM25 top-20 over the
    * probe-term postings) and a VECTOR arm (exact cosine top-20 for
    * the query doc's own embedding — doc_id and vec_id share the 0–499
    * id space by construction). Each arm contributes
    * `1/(60 + rank)`; an item missing from an arm's top-20 contributes
    * nothing. Contributions are quantized to integer nanos BEFORE the
    * cross-arm sum (the engine-wide order-free-sum convention) and the
    * fused ranking orders on the integer, so both engines agree
    * bit-for-bit.
    *
    * Scale shape: both arms are the proven components — the BM25 arm
    * prunes postings with a broadcast probe join and reduces through
    * the native bounded-heap TopKPerGroup; the vector arm is
    * [[Similarity.bruteForceTopK]] (swap in the IVF/NSW probe for the
    * approximate path — same output contract). The fusion itself is a
    * full-outer equi-join on (query, item) over top-N survivor lists —
    * O(queries·N) rows regardless of corpus size — and the final
    * window is keyed by query over ≤ 2N rows per group. */
  val q288HybridRrf = GraftQuery(
    "q288_hybrid_rrf",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val probes = Seq((1L, "spark"), (1L, "join"), (2L, "window"),
        (2L, "agg"), (2L, "stream"), (3L, "hash"), (3L, "table"))
        .toDF("query_id", "term")
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(graft.functions.Text.tokens(col("text"))).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val dfreq = toks.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      val wt = tf.join(broadcast(probes), Seq("term"))
        .join(dfreq, Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .select(col("query_id"), col("doc_id"),
          round(log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
              (col("df") + lit(0.5))) *
            (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
              col("dl") / col("avgdl"))), 9).as("w"))
      val bmScored = wt.groupBy("query_id", "doc_id")
        .agg(round(sum(col("w")), 6).as("score"))
      val lex = graft.plans.TopK.topKPerGroup(bmScored, Seq(col("query_id")),
          Seq(col("score").desc, col("doc_id").asc), 20)
        .withColumn("lex_rank", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
        .select("query_id", "doc_id", "lex_rank")

      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id").isin(1L, 2L, 3L))
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val vec = Similarity.bruteForceTopK(queries, corpus, k = 20)
        .select(col("qid").as("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("vec_rank"))

      val contrib = (r: org.apache.spark.sql.Column) => coalesce(
        when(r.isNotNull, round(lit(1e9) / (lit(60) + r), 0).cast("long")),
        lit(0L))
      val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf9", contrib(col("lex_rank")) + contrib(col("vec_rank")))
      // bounded by construction: ≤ 40 survivor rows per query feed the window
      fused.withColumn("rank", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("rrf9").desc, col("doc_id").asc)).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("doc_id"),
          round(col("rrf9").cast("double") / 1e9, 9).as("rrf"),
          col("lex_rank"), col("vec_rank"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH probes(query_id, term) AS (VALUES
            |    (CAST(1 AS BIGINT),'spark'),(1,'join'),(2,'window'),
            |    (2,'agg'),(2,'stream'),(3,'hash'),(3,'table')),
            |toks AS (
            |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
            |  FROM documents),
            |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
            |dfreq AS (SELECT term, count(*) AS df
            |          FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
            |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
            |w AS (
            |  SELECT p.query_id, tf.doc_id,
            |    round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
            |      (tf * 2.2) /
            |      (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 9) AS w
            |  FROM tf JOIN probes p USING (term) JOIN dfreq USING (term)
            |    JOIN dl USING (doc_id) CROSS JOIN stats),
            |sc AS (SELECT query_id, doc_id, round(sum(w), 6) AS score
            |       FROM w GROUP BY 1, 2),
            |lex AS (SELECT query_id, doc_id, lex_rank FROM (
            |    SELECT query_id, doc_id,
            |      row_number() OVER (PARTITION BY query_id
            |        ORDER BY score DESC, doc_id ASC) AS lex_rank
            |    FROM sc) WHERE lex_rank <= 20),
            |q AS (SELECT vec_id AS qid, embedding FROM embeddings
            |      WHERE vec_id IN (1, 2, 3)),
            |vs AS (
            |  SELECT a.qid, b.vec_id AS doc_id,
            |    $cosSql AS cos
            |  FROM q a JOIN embeddings b ON b.vec_id <> a.qid),
            |vec AS (SELECT qid AS query_id, doc_id, vec_rank FROM (
            |    SELECT qid, doc_id,
            |      row_number() OVER (PARTITION BY qid
            |        ORDER BY cos DESC, doc_id ASC) AS vec_rank
            |    FROM vs) WHERE vec_rank <= 20),
            |f AS (
            |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
            |    COALESCE(l.doc_id, v.doc_id) AS doc_id,
            |    l.lex_rank, v.vec_rank,
            |    COALESCE(CAST(round(1e9 / (60 + l.lex_rank)) AS BIGINT), 0) +
            |    COALESCE(CAST(round(1e9 / (60 + v.vec_rank)) AS BIGINT), 0) AS rrf9
            |  FROM lex l FULL JOIN vec v
            |    ON v.query_id = l.query_id AND v.doc_id = l.doc_id)
            |SELECT query_id, rank, doc_id,
            |  round(CAST(rrf9 AS DOUBLE) / 1e9, 9) AS rrf, lex_rank, vec_rank
            |FROM (
            |  SELECT *, row_number() OVER (PARTITION BY query_id
            |    ORDER BY rrf9 DESC, doc_id ASC) AS rank
            |  FROM f)
            |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q30AnnBruteForce, q31CosinePairs, q32AnnLsh,
    q37AnnIvf, q38EmbeddingNearDup, q57EmbeddingQuantize, q103LabelCentroids,
    q109EmbeddingOutliers, q165FilteredAnn, q206QuantizedRecall,
    q218ProductQuantization, q241TableServedAnn, q254IvfPqSearch,
    q267MatryoshkaRecall, q273IncrementalAnnIndex, q274PowerIterationPca,
    q275CorrelationAudit, q278HardNegatives, q279PcaProjection,
    q280TopTwoPca, q281WhitenedCoords, q283NswIndexBuild, q284NswSearch,
    q288HybridRrf)
}
