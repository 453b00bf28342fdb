package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.operators.{GlobalRank, Similarity}

/** Model- and retrieval-evaluation metrics — the measurement half of a
  * training-data pipeline (does the cheaper index hurt recall? is the
  * ranker better than chance? is today's number seasonal or anomalous?).
  * Every metric is computed in exact integer / single-division
  * arithmetic so the DuckDB oracle matches bit-for-bit: nDCG weights
  * are hard-coded 1e-9-unit integers (never an in-engine log2), AUC is
  * the Mann-Whitney rank-sum over integer 2×average-ranks, and the
  * seasonal decomposition keeps every residual as an exact integer
  * numerator until the one final division. */
object EvalMetrics {

  /** Int8 symmetric reconstruction (q57's quantizer, decode side):
    * scale = max|x|/127, q = floor(x/scale + 0.5), r = q·scale. */
  private def reconstructed(x: Column): Column = {
    val scale = array_max(transform(x, e => abs(e.cast("double")))) / 127.0
    transform(x, e => floor(e.cast("double") / scale + 0.5) * scale)
  }

  /** 1e9/log2(rank+1) for rank 1..10, rounded to integers OUTSIDE the
    * engines — both sides look the constants up, neither computes a
    * transcendental, so DCG sums stay exact integer arithmetic. */
  private val ndcgWeights: Seq[Long] = Seq(1000000000L, 630929754L,
    500000000L, 430676558L, 386852807L, 356207187L, 333333333L,
    315464877L, 301029996L, 289064826L)
  private val idcg10: Long = ndcgWeights.sum // truth list is always 10 deep

  /** Retrieval-quality evaluation: recall@10 and (binary-relevance)
    * nDCG@10 of int8-quantized retrieval against the exact-cosine
    * ground truth, per probe query. The "system" ranks the corpus by
    * cosine against RECONSTRUCTED (quantize→decode) vectors — the
    * memory-4×-smaller index a serving tier actually searches — and
    * every rank the quantization error flips shows up as a sub-1.0
    * metric. Both retrievals are [[Similarity.bruteForceTopK]] plans
    * (broadcast probes, per-partition bounded heaps before the
    * exchange); the metric join is probe×10 rows against probe×10 —
    * dimension-sized at any corpus scale. */
  val q178RetrievalEval = GraftQuery(
    "q178_retrieval_eval",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val probes = emb.filter(col("vec_id") % 53 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val exact = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val quant = emb.select(col("vec_id").as("cid"),
        reconstructed(col("embedding")).as("cvec"))
      val truth = Similarity.bruteForceTopK(probes, exact, k = 10)
        .select(col("qid"), col("neighbor_id"), lit(1L).as("hit"))
      val sys = Similarity.bruteForceTopK(probes, quant, k = 10)
        .select(col("qid"), col("rank"), col("neighbor_id"))
      val w = typedLit(ndcgWeights)
      sys.join(truth, Seq("qid", "neighbor_id"), "left")
        .withColumn("hit", coalesce(col("hit"), lit(0L)))
        .groupBy("qid")
        .agg(sum(col("hit")).as("n_hit"),
          sum(col("hit") * element_at(w, col("rank").cast("int"))).as("dcg_n"))
        .select(col("qid"), col("n_hit"),
          round(col("n_hit").cast("double") / 10.0, 6).as("recall_at_10"),
          round(col("dcg_n").cast("double") / lit(idcg10.toDouble), 6)
            .as("ndcg_at_10"))
        .orderBy("qid")
    },
    Some(s"""WITH q AS (
            |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
            |  WHERE vec_id % 53 = 0),
            |sc AS (
            |  SELECT vec_id, embedding,
            |    list_max(list_transform(embedding,
            |      e -> abs(CAST(e AS DOUBLE)))) / 127.0 AS scale
            |  FROM embeddings),
            |r AS (
            |  SELECT vec_id, list_transform(embedding,
            |    e -> floor(CAST(e AS DOUBLE) / scale + 0.5) * scale) AS rv
            |  FROM sc),
            |tscored AS (
            |  SELECT a.qid, b.vec_id AS neighbor_id,
            |    list_sum(list_transform(a.qe,
            |      (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            |    / (sqrt(list_sum(list_transform(a.qe,
            |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            |     * sqrt(list_sum(list_transform(b.embedding,
            |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
            |  FROM q a JOIN embeddings b ON b.vec_id <> a.qid),
            |truth AS (
            |  SELECT qid, neighbor_id FROM (
            |    SELECT qid, neighbor_id, row_number() OVER (
            |      PARTITION BY qid ORDER BY cos DESC, neighbor_id ASC) AS rank
            |    FROM tscored) WHERE rank <= 10),
            |sscored AS (
            |  SELECT a.qid, b.vec_id AS neighbor_id,
            |    list_sum(list_transform(a.qe,
            |      (x, i) -> CAST(x AS DOUBLE) * b.rv[i]))
            |    / (sqrt(list_sum(list_transform(a.qe,
            |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            |     * sqrt(list_sum(list_transform(b.rv, x -> x * x)))) AS cos
            |  FROM q a JOIN r b ON b.vec_id <> a.qid),
            |sys AS (
            |  SELECT qid, neighbor_id, rank FROM (
            |    SELECT qid, neighbor_id, row_number() OVER (
            |      PARTITION BY qid ORDER BY cos DESC, neighbor_id ASC) AS rank
            |    FROM sscored) WHERE rank <= 10)
            |SELECT s.qid,
            |  CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_hit,
            |  round(CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL
            |    THEN 1 ELSE 0 END) AS DOUBLE) / 10.0, 6) AS recall_at_10,
            |  round(CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL
            |    THEN [${ndcgWeights.mkString(", ")}][s.rank]
            |    ELSE 0 END) AS DOUBLE) / $idcg10.0, 6) AS ndcg_at_10
            |FROM sys s LEFT JOIN truth t
            |  ON s.qid = t.qid AND s.neighbor_id = t.neighbor_id
            |GROUP BY s.qid ORDER BY s.qid""".stripMargin))

  /** Grouped AUC (Mann-Whitney / rank-sum form) of order total
    * predicting high-priority status, per market segment — the
    * classifier-evaluation primitive. Ranking runs on the DISTINCT
    * (segment, score) grain: one aggregation collapses ties, a
    * cumulative window over the collapsed grain yields each group's
    * min-rank, and 2×average-rank stays an exact integer
    * (2·r_min + ties − 1). The only windows sort distinct scores, not
    * rows — at 100 TB the per-row sort the textbook formula implies
    * never happens; AUC itself is one exact-integer expression with a
    * single final division. */
  val q179GroupedAuc = GraftQuery(
    "q179_grouped_auc",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
      val base = o.join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("o_totalprice").as("score"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("label"))
      val grp = base.groupBy("segment", "score")
        .agg(count(lit(1)).as("cnt"), sum(col("label")).as("pos_cnt"))
      // Per-segment exclusive cumsum WITHOUT Window.partitionBy("segment"):
      // TPC-H has 5 market segments and within a segment o_totalprice is
      // near-unique (~n/5 distinct scores per window partition), so a
      // 5-partition window is a full-table sort in 5 tasks at 100×. The
      // two-phase global cumsum keyed (segment, score) range-partitions
      // the sort across ALL tasks; the per-segment offset is then the
      // segment's minimum global cumsum (5 rows, broadcast back).
      val g = GlobalRank.exclusiveCumSum(grp, "gcum", col("cnt"),
        col("segment"), col("score"))
      val segOff = g.groupBy("segment").agg(min(col("gcum")).as("seg_off"))
      val ranked = g.join(broadcast(segOff), Seq("segment"))
        .withColumn("below", col("gcum") - col("seg_off"))
        // 2 × average rank of this tie group = 2(below+1) + (cnt−1)
        .withColumn("ar2", lit(2L) * (col("below") + 1L) + col("cnt") - 1L)
      ranked.groupBy("segment")
        .agg(sum(col("pos_cnt")).as("n_pos"),
          (sum(col("cnt")) - sum(col("pos_cnt"))).as("n_neg"),
          sum(col("pos_cnt") * col("ar2")).as("sum2"))
        .select(col("segment"), col("n_pos"), col("n_neg"),
          when(col("n_pos") > 0 && col("n_neg") > 0,
            round((col("sum2") - col("n_pos") * (col("n_pos") + 1L))
              .cast("double") /
              (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
        .orderBy("segment")
    },
    Some("""WITH base AS (
           |  SELECT c_mktsegment AS segment, o_totalprice AS score,
           |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           |         THEN 1 ELSE 0 END AS label
           |  FROM orders JOIN customer ON o_custkey = c_custkey),
           |r AS (
           |  SELECT segment, label,
           |    2 * rank() OVER (PARTITION BY segment ORDER BY score)
           |      + count(*) OVER (PARTITION BY segment, score) - 1 AS ar2
           |  FROM base)
           |SELECT segment,
           |  CAST(sum(label) AS BIGINT) AS n_pos,
           |  CAST(sum(1 - label) AS BIGINT) AS n_neg,
           |  CASE WHEN sum(label) > 0 AND sum(1 - label) > 0 THEN
           |    round(CAST(sum(CASE WHEN label = 1 THEN ar2 ELSE 0 END)
           |        - sum(label) * (sum(label) + 1) AS DOUBLE)
           |      / (2.0 * sum(label) * sum(1 - label)), 6)
           |  END AS auc
           |FROM r GROUP BY segment ORDER BY segment""".stripMargin))

  /** Additive seasonal decomposition of daily revenue: trend = centered
    * 7-day moving average (complete windows only), weekly seasonal =
    * per-day-of-week mean residual, anomaly = residual − seasonal.
    * Runs entirely on the calendar-bounded day grain (the q138/q151
    * contract: day count doesn't grow with data volume, so the global
    * day-ordered window is dimension-sized at any SF). Revenue is
    * exact integer cents; the 7-day residual stays the exact integer
    * 7·rev − Σ7 (×700 of the dollar value), the seasonal mean keeps an
    * exact integer numerator, and each output is one final division —
    * bit-deterministic across engines. */
  val q180SeasonalDecompose = GraftQuery(
    "q180_seasonal_decompose",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val daily = o.groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
      val spine = o.agg(min(col("o_orderdate").cast("date")).as("lo"),
          max(col("o_orderdate").cast("date")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("day"))
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      val t = spine.join(daily, Seq("day"), "left")
        .withColumn("rev_c", coalesce(col("rev_c"), lit(0L)))
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("sum7", sum(col("rev_c")).over(w7))
        .withColumn("resid_n",
          when(col("n7") === 7, lit(7L) * col("rev_c") - col("sum7")))
        .withColumn("dow", datediff(col("day"), to_date(lit("1970-01-05"))) % 7)
      val sea = t.filter(col("resid_n").isNotNull)
        .groupBy("dow")
        .agg(sum(col("resid_n")).as("sea_num"), count(lit(1)).as("sea_n"))
      t.join(broadcast(sea), Seq("dow"), "left")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("rev_c").cast("double") / 100.0, 2).as("rev"),
          when(col("n7") === 7,
            round(col("sum7").cast("double") / 700.0, 6)).as("trend"),
          when(col("resid_n").isNotNull,
            round(col("sea_num").cast("double") /
              (lit(700.0) * col("sea_n")), 6)).as("seasonal"),
          when(col("resid_n").isNotNull,
            round(col("resid_n").cast("double") / 700.0 -
              col("sea_num").cast("double") / (lit(700.0) * col("sea_n")), 6))
            .as("anomaly"))
        .orderBy("day")
    },
    Some("""WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo,
           |                  CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
           |spine AS (SELECT CAST(unnest(generate_series(lo, hi,
           |            INTERVAL 1 DAY)) AS DATE) AS day FROM b),
           |daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           |            sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
           |          FROM orders GROUP BY 1),
           |t AS (
           |  SELECT spine.day, coalesce(daily.rev_c, 0) AS rev_c,
           |    count(*) OVER w AS n7,
           |    sum(coalesce(daily.rev_c, 0)) OVER w AS sum7,
           |    CASE WHEN count(*) OVER w = 7
           |      THEN 7 * coalesce(daily.rev_c, 0)
           |           - sum(coalesce(daily.rev_c, 0)) OVER w END AS resid_n,
           |    date_diff('day', DATE '1970-01-05', spine.day) % 7 AS dow
           |  FROM spine LEFT JOIN daily ON daily.day = spine.day
           |  WINDOW w AS (ORDER BY spine.day
           |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
           |sea AS (
           |  SELECT dow, sum(resid_n) AS sea_num, count(*) AS sea_n
           |  FROM t WHERE resid_n IS NOT NULL GROUP BY dow)
           |SELECT strftime(t.day, '%Y-%m-%d') AS day,
           |  round(CAST(rev_c AS DOUBLE) / 100.0, 2) AS rev,
           |  CASE WHEN n7 = 7
           |    THEN round(CAST(sum7 AS DOUBLE) / 700.0, 6) END AS trend,
           |  CASE WHEN resid_n IS NOT NULL
           |    THEN round(CAST(sea_num AS DOUBLE) / (700.0 * sea_n), 6)
           |  END AS seasonal,
           |  CASE WHEN resid_n IS NOT NULL
           |    THEN round(CAST(resid_n AS DOUBLE) / 700.0
           |      - CAST(sea_num AS DOUBLE) / (700.0 * sea_n), 6)
           |  END AS anomaly
           |FROM t LEFT JOIN sea ON t.dow = sea.dow
           |ORDER BY day""".stripMargin))

  /** Precision/recall of the MinHash-LSH near-dup detector against
    * exact n-gram Jaccard ground truth — the eval a dedup rollout runs
    * before trusting the approximate path at corpus scale: predicted =
    * q24's banded candidates with estimated Jaccard ≥ 0.5, truth =
    * q26's exact trigram Jaccard ≥ 0.5, confusion counted by a
    * full-outer join of the two pair sets.
    *
    * Scale: both pair sets are produced by the engine's banded /
    * shared-shingle equi-join paths (never doc×doc); the confusion
    * join is pair-set-sized. Ratios are single divisions of exact
    * counts. The oracle replays BOTH detectors in SQL (the q24 and q26
    * oracle machinery composed), so a drift in either path or in the
    * eval logic itself trips the gate. */
  val q210DedupEval = GraftQuery(
    "q210_dedup_eval",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val truth = graft.operators.Dedup
        .ngramJaccardPairs(docs, shingleLen = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), lit(1).as("t"))
      val pred = graft.operators.Dedup
        .minHashCandidatePairs(docs, numHashes = 8, bandSize = 2, shingleLen = 3)
        .filter(col("est_jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), lit(1).as("p"))
      truth.join(pred, Seq("id_a", "id_b"), "full_outer")
        .agg(
          sum(when(col("t").isNotNull && col("p").isNotNull, 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("t").isNull, 1L).otherwise(0L)).as("fp"),
          sum(when(col("p").isNull, 1L).otherwise(0L)).as("fn"))
        .select(col("tp"), col("fp"), col("fn"),
          round(col("tp") / (col("tp") + col("fp")).cast("double"), 6)
            .as("precision"),
          round(col("tp") / (col("tp") + col("fn")).cast("double"), 6)
            .as("recall"),
          round(col("tp") * 2 / (col("tp") * 2 + col("fp") + col("fn"))
            .cast("double"), 6).as("f1"))
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
           |  FROM documents),
           |sh AS (
           |  SELECT DISTINCT doc_id,
           |    ws[i.g] || ' ' || ws[i.g+1] || ' ' || ws[i.g+2] AS s
           |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) g) i
           |  WHERE len(ws) >= 3),
           |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
           |inter AS (
           |  SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter
           |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |truth AS (
           |  SELECT id_a, id_b FROM inter
           |  JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
           |  WHERE inter * 1.0 / (ca.n + cb.n - inter) >= 0.5),
           |mh AS (
           |  SELECT doc_id, h.g AS h, min(md5(h.g || ':' || s)) AS mh
           |  FROM sh, LATERAL (SELECT unnest(generate_series(0, 7)) g) h
           |  GROUP BY doc_id, h.g),
           |bands AS (
           |  SELECT doc_id, h // 2 AS band,
           |         string_agg(mh, '|' ORDER BY h) AS band_key
           |  FROM mh GROUP BY doc_id, h // 2),
           |cands AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.band_key = b.band_key
           |    AND a.doc_id < b.doc_id),
           |pred AS (
           |  SELECT id_a, id_b FROM (
           |    SELECT id_a, id_b,
           |      sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) * 1.0 / 8 AS ej
           |    FROM cands
           |    JOIN mh sa ON sa.doc_id = id_a
           |    JOIN mh sb ON sb.doc_id = id_b AND sa.h = sb.h
           |    GROUP BY id_a, id_b)
           |  WHERE ej >= 0.5),
           |conf AS (
           |  SELECT
           |    CAST(sum(CASE WHEN t.id_a IS NOT NULL AND p.id_a IS NOT NULL
           |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |    CAST(sum(CASE WHEN t.id_a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |      AS fp,
           |    CAST(sum(CASE WHEN p.id_a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |      AS fn
           |  FROM truth t FULL OUTER JOIN pred p
           |    ON t.id_a = p.id_a AND t.id_b = p.id_b)
           |SELECT tp, fp, fn,
           |  round(tp / CAST(tp + fp AS DOUBLE), 6) AS precision,
           |  round(tp / CAST(tp + fn AS DOUBLE), 6) AS recall,
           |  round(tp * 2 / CAST(tp * 2 + fp + fn AS DOUBLE), 6) AS f1
           |FROM conf""".stripMargin))

  /** Distribution-drift monitor: total-variation distance between the
    * order-value histograms of two time periods (before / from
    * 1998-01-01) — the dataset-shift alarm every production pipeline
    * runs on its feature distributions, plus the single bin that
    * contributes most to the drift (where to look first).
    *
    * Scale: one fact scan folds into a BIN-sized histogram (50k$-wide
    * buckets) with map-side combine; everything after runs on dozens
    * of rows. Exactness: per-bin gaps are cross-multiplied exact
    * integers |cnt_a·n_b − cnt_b·n_a| (no per-bin ratio rounding), so
    * TV = Σgap / (2·n_a·n_b) is ONE final division; the top bin is an
    * exact-integer argmax with a bin-id tie-break. */
  val q212DriftMonitor = GraftQuery(
    "q212_drift_monitor",
    (s, dir) => {
      val bins = Tables.orders(s, dir)
        .select((floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            / 5000000L).cast("long").as("bin"),
          (col("o_orderdate").cast("date") < lit("1998-01-01").cast("date"))
            .as("is_a"))
        .groupBy("bin")
        .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("cnt_a"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("cnt_b"))
      val tot = bins.agg(count(lit(1)).as("n_bins"), sum("cnt_a").as("n_a"),
        sum("cnt_b").as("n_b"))
      val scored = bins.crossJoin(broadcast(tot))
        .withColumn("gap", abs(col("cnt_a") * col("n_b")
          - col("cnt_b") * col("n_a")))
      val top = scored.orderBy(col("gap").desc, col("bin").asc).limit(1)
        .select(col("bin").as("top_bin"), col("gap").as("top_gap"))
      scored.groupBy("n_bins", "n_a", "n_b")
        .agg(sum("gap").as("gap_sum"))
        .crossJoin(broadcast(top))
        .select(col("n_bins"), col("n_a"), col("n_b"),
          round(col("gap_sum") / (col("n_a") * col("n_b") * 2).cast("double"),
            6).as("tv_distance"),
          col("top_bin"),
          round(col("top_gap") / (col("n_a") * col("n_b") * 2).cast("double"),
            6).as("top_bin_share"))
    },
    Some("""WITH bins AS (
           |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 5000000
           |      AS bin,
           |    CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1998-01-01'
           |      THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
           |    CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
           |      THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
           |  FROM orders GROUP BY 1),
           |tot AS (
           |  SELECT count(*) AS n_bins, CAST(sum(cnt_a) AS BIGINT) AS n_a,
           |    CAST(sum(cnt_b) AS BIGINT) AS n_b FROM bins),
           |scored AS (
           |  SELECT bin, abs(cnt_a * n_b - cnt_b * n_a) AS gap, n_bins, n_a, n_b
           |  FROM bins CROSS JOIN tot),
           |top AS (
           |  SELECT bin AS top_bin, gap AS top_gap FROM scored
           |  ORDER BY gap DESC, bin ASC LIMIT 1)
           |SELECT n_bins, n_a, n_b,
           |  round(CAST(sum(gap) AS BIGINT)
           |    / CAST(n_a * n_b * 2 AS DOUBLE), 6) AS tv_distance,
           |  top_bin,
           |  round(top_gap / CAST(n_a * n_b * 2 AS DOUBLE), 6)
           |    AS top_bin_share
           |FROM scored CROSS JOIN top
           |GROUP BY n_bins, n_a, n_b, top_bin, top_gap""".stripMargin))

  /** BLEU-2 generation-quality scoring (Papineni et al. 2002): clipped
    * unigram/bigram precision with brevity penalty, per document. The
    * "candidate" is derived deterministically from the reference
    * inside the query — every 7th token substituted with an
    * out-of-vocabulary marker and the last ⌊len/10⌋ tokens truncated —
    * so the metric pipeline (n-gram clipping, the part naive accuracy
    * gets wrong, and the BP term) is exercised against known damage
    * and replayed exactly by the oracle. The eval shape for comparing
    * a generation/repair pass against source text at corpus scale.
    *
    * Scale: n-gram counting is explode + map-side-combined hash
    * aggregation per (doc, gram); clipping is an equi-join of the two
    * count tables on (doc, gram) — never a cross join; everything
    * stays partitioned by doc_id. Each doc's p₁/p₂ are single
    * divisions of exact counts; only BP·√(p₁p₂) touches exp/ln,
    * rounded at 4 dp. */
  val q216BleuEval = GraftQuery(
    "q216_bleu_eval",
    (s, dir) => {
      val t = Tables.documents(s, dir)
        .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("ws"))
        .withColumn("rlen", size(col("ws")).cast("long"))
        .filter(col("rlen") >= 2)
        .withColumn("clen", (col("rlen") - floor(col("rlen") / 10)).cast("long"))
      val candTok =
        """CASE WHEN %s %% 7 = 0 THEN 'zzsubz'
          |ELSE element_at(ws, CAST(%s AS INT)) END""".stripMargin
      val cu = t.select(col("doc_id"), explode(expr(
        s"transform(sequence(1L, clen), p -> ${candTok.format("p", "p")})"))
        .as("w"))
      val ru = t.select(col("doc_id"), explode(col("ws")).as("w"))
      val cb = t.select(col("doc_id"), explode(expr(
        s"""transform(sequence(1L, clen - 1L), p ->
           |  concat(${candTok.format("p", "p")}, ' ',
           |         ${candTok.format("(p + 1)", "(p + 1)")}))""".stripMargin))
        .as("w"))
      val rb = t.select(col("doc_id"), explode(expr(
        """transform(sequence(1L, rlen - 1L), p ->
          |  concat(element_at(ws, CAST(p AS INT)), ' ',
          |         element_at(ws, CAST(p + 1 AS INT))))""".stripMargin)).as("w"))
      def clipped(cand: org.apache.spark.sql.DataFrame,
          ref: org.apache.spark.sql.DataFrame) = {
        val cc = cand.groupBy("doc_id", "w").agg(count(lit(1)).as("cc"))
        val rc = ref.groupBy("doc_id", "w").agg(count(lit(1)).as("rc"))
        cc.join(rc, Seq("doc_id", "w"), "left_outer")
          .groupBy("doc_id")
          .agg(sum(least(col("cc"), coalesce(col("rc"), lit(0L)))).as("clip"),
            sum(col("cc")).as("tot"))
      }
      val u = clipped(cu, ru).select(col("doc_id"),
        col("clip").as("clip1"), col("tot").as("tot1"))
      val b = clipped(cb, rb).select(col("doc_id"),
        col("clip").as("clip2"), col("tot").as("tot2"))
      val pr1 = col("clip1") / col("tot1").cast("double")
      val pr2 = col("clip2") / col("tot2").cast("double")
      val bp = when(col("clen") < col("rlen"),
        exp(lit(1) - col("rlen").cast("double") / col("clen"))).otherwise(lit(1.0))
      t.select(col("doc_id"), col("rlen"), col("clen"))
        .join(u, "doc_id").join(b, "doc_id")
        .select(col("doc_id"), col("rlen").as("ref_len"),
          col("clen").as("cand_len"),
          round(pr1, 6).as("p1"), round(pr2, 6).as("p2"),
          round(bp * exp(lit(0.5) * (log(pr1) + log(pr2))), 4).as("bleu2"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
           |  FROM documents),
           |d AS (
           |  SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS rlen,
           |    CAST(len(ws) - floor(len(ws) / 10) AS BIGINT) AS clen
           |  FROM t WHERE len(ws) >= 2),
           |cu AS (
           |  SELECT doc_id, CASE WHEN p.g % 7 = 0 THEN 'zzsubz'
           |    ELSE ws[p.g] END AS w
           |  FROM d, LATERAL (SELECT unnest(generate_series(1, clen)) g) p),
           |ru AS (
           |  SELECT doc_id, ws[p.g] AS w
           |  FROM d, LATERAL (SELECT unnest(generate_series(1, rlen)) g) p),
           |cb AS (
           |  SELECT doc_id,
           |    (CASE WHEN p.g % 7 = 0 THEN 'zzsubz' ELSE ws[p.g] END)
           |    || ' ' ||
           |    (CASE WHEN (p.g + 1) % 7 = 0 THEN 'zzsubz' ELSE ws[p.g + 1] END)
           |      AS w
           |  FROM d, LATERAL (SELECT unnest(generate_series(1, clen - 1)) g) p),
           |rb AS (
           |  SELECT doc_id, ws[p.g] || ' ' || ws[p.g + 1] AS w
           |  FROM d, LATERAL (SELECT unnest(generate_series(1, rlen - 1)) g) p),
           |u AS (
           |  SELECT cc.doc_id,
           |    CAST(sum(least(cc.c, COALESCE(rc.c, 0))) AS BIGINT) AS clip1,
           |    CAST(sum(cc.c) AS BIGINT) AS tot1
           |  FROM (SELECT doc_id, w, count(*) AS c FROM cu GROUP BY 1, 2) cc
           |  LEFT JOIN (SELECT doc_id, w, count(*) AS c FROM ru GROUP BY 1, 2) rc
           |    ON cc.doc_id = rc.doc_id AND cc.w = rc.w
           |  GROUP BY cc.doc_id),
           |b AS (
           |  SELECT cc.doc_id,
           |    CAST(sum(least(cc.c, COALESCE(rc.c, 0))) AS BIGINT) AS clip2,
           |    CAST(sum(cc.c) AS BIGINT) AS tot2
           |  FROM (SELECT doc_id, w, count(*) AS c FROM cb GROUP BY 1, 2) cc
           |  LEFT JOIN (SELECT doc_id, w, count(*) AS c FROM rb GROUP BY 1, 2) rc
           |    ON cc.doc_id = rc.doc_id AND cc.w = rc.w
           |  GROUP BY cc.doc_id)
           |SELECT d.doc_id, d.rlen AS ref_len, d.clen AS cand_len,
           |  round(u.clip1 / CAST(u.tot1 AS DOUBLE), 6) AS p1,
           |  round(b.clip2 / CAST(b.tot2 AS DOUBLE), 6) AS p2,
           |  round((CASE WHEN d.clen < d.rlen
           |      THEN exp(1 - d.rlen / CAST(d.clen AS DOUBLE)) ELSE 1 END)
           |    * exp(0.5 * (ln(u.clip1 / CAST(u.tot1 AS DOUBLE))
           |               + ln(b.clip2 / CAST(b.tot2 AS DOUBLE)))), 4) AS bleu2
           |FROM d JOIN u USING (doc_id) JOIN b USING (doc_id)
           |ORDER BY doc_id""".stripMargin))

  /** Inter-annotator agreement: Fleiss' κ per source over 3 synthetic
    * annotators (derived from md5 so the oracle reproduces them: each
    * annotator reports the item's base label `doc_id % 3` but flips it
    * with 30% md5-derived noise) — the labeled-data QA gate every
    * RLHF / classification dataset runs before training on human
    * labels.
    *
    * The whole statistic is EXACT-INTEGER until one final division:
    * with N items, n=3 raters, A = Σᵢⱼ n²ᵢⱼ − 3N (the P̄ numerator
    * scaled by 6N) and B = Σⱼ S²ⱼ (squared per-category totals, the
    * P_e numerator scaled by 9N²),
    *   κ = (3N·A − 2B) / (2·(9N² − B))
    * — so no engine-order-dependent float summation exists anywhere
    * (longs overflow only past ~10⁹ items per group; shard groups
    * before that). Per-item counts are one hash aggregation on
    * (doc, label); category totals one more on (source, label). */
  val q217LabelAgreement = GraftQuery(
    "q217_label_agreement",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val labels = base
        .select(col("doc_id"), col("source"),
          explode(array(lit(1), lit(2), lit(3))).as("annot"))
        .withColumn("h",
          conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
            col("annot").cast("string"))), 1, 4), 16, 10).cast("long") % 10)
        .withColumn("t", col("doc_id") % 3)
        .withColumn("label",
          when(col("h") < 3, (col("t") + 1 + col("h") % 2) % 3)
            .otherwise(col("t")))
      val perItem = labels.groupBy("source", "doc_id", "label")
        .agg(count(lit(1)).as("nij"))
      val aTerm = perItem.groupBy("source")
        .agg(sum(col("nij") * col("nij")).as("sumsq"),
          countDistinct("doc_id").as("n_items"),
          sum(when(col("nij") === 3, 1L).otherwise(0L)).as("n_unanimous"))
        .select(col("source"), col("n_items"), col("n_unanimous"),
          (col("sumsq") - lit(3) * col("n_items")).as("a"))
      val bTerm = perItem.groupBy("source", "label")
        .agg(sum("nij").as("sj"))
        .groupBy("source").agg(sum(col("sj") * col("sj")).as("b"))
      aTerm.join(bTerm, "source")
        .select(col("source"), col("n_items"), col("n_unanimous"),
          round(col("a") / (lit(6) * col("n_items")).cast("double"), 6)
            .as("p_bar"),
          round(col("b") / (lit(9) * col("n_items") * col("n_items"))
            .cast("double"), 6).as("p_e"),
          round((lit(3) * col("n_items") * col("a") - lit(2) * col("b")) /
            (lit(2) * (lit(9) * col("n_items") * col("n_items") - col("b")))
              .cast("double"), 6).as("kappa"))
        .orderBy("source")
    },
    Some("""WITH raw AS (
           |  SELECT doc_id, source,
           |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
           |      || CAST(a.annot AS VARCHAR)), 1, 4))::BIGINT % 10 AS h
           |  FROM documents, LATERAL (SELECT unnest([1, 2, 3]) AS annot) a),
           |labels AS (
           |  SELECT doc_id, source,
           |    CASE WHEN h < 3 THEN ((doc_id % 3) + 1 + h % 2) % 3
           |         ELSE doc_id % 3 END AS label
           |  FROM raw),
           |per_item AS (
           |  SELECT source, doc_id, label, count(*) AS nij
           |  FROM labels GROUP BY 1, 2, 3),
           |a_term AS (
           |  SELECT source,
           |    count(DISTINCT doc_id) AS n_items,
           |    CAST(sum(CASE WHEN nij = 3 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_unanimous,
           |    CAST(sum(nij * nij) - 3 * count(DISTINCT doc_id) AS BIGINT) AS a
           |  FROM per_item GROUP BY source),
           |b_term AS (
           |  SELECT source, CAST(sum(sj * sj) AS BIGINT) AS b FROM (
           |    SELECT source, label, sum(nij) AS sj
           |    FROM per_item GROUP BY 1, 2)
           |  GROUP BY source)
           |SELECT a_term.source, n_items, n_unanimous,
           |  round(a / CAST(6 * n_items AS DOUBLE), 6) AS p_bar,
           |  round(b / CAST(9 * n_items * n_items AS DOUBLE), 6) AS p_e,
           |  round((3 * n_items * a - 2 * b) /
           |    CAST(2 * (9 * n_items * n_items - b) AS DOUBLE), 6) AS kappa
           |FROM a_term JOIN b_term USING (source)
           |ORDER BY source""".stripMargin))

  /** CUPED variance reduction (Controlled-experiment Using Pre-Existing
    * Data — the standard industrial A/B-test adjustment): customers are
    * hash-assigned to two arms, the post-period revenue metric is
    * adjusted by its pre-period covariate, `Y' = Y − θ(X − X̄)` with
    * `θ = cov(X,Y)/var(X)` estimated POOLED across arms, and the gate
    * reports per-arm lift before/after plus the variance-reduction
    * ratio. Because the assignment is orthogonal to history, the
    * adjusted means preserve the treatment contrast while shrinking
    * noise — the point of the method.
    *
    * Determinism across engines: every moment (Σx, Σy, Σxy, Σx², n) is
    * accumulated over INTEGER dollars, so the shuffles can reorder
    * rows freely and the sums stay exact; θ and the adjusted means are
    * then single fixed-form double expressions over those exact
    * integers — bit-identical in both engines, rounded once at the
    * output. Scale: two aggregations (per-customer rollup, then moment
    * rollup) and a broadcast of 5 scalars; no data-sized state. */
  val q227CupedAdjustment = GraftQuery(
    "q227_cuped_adjustment",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val per = o.groupBy(col("o_custkey"))
        .agg(
          sum(when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"),
            floor(col("o_totalprice") / 100).cast("long")).otherwise(0L))
            .as("x"),
          sum(when(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"),
            floor(col("o_totalprice") / 100).cast("long")).otherwise(0L))
            .as("y"))
        .withColumn("arm", (col("o_custkey") % 2).cast("long"))
      // exact integer moments per arm; variance/covariance/θ are then
      // FIXED-FORM double expressions over them (no data-order float
      // accumulation anywhere — var_samp over doubles would drift with
      // partitioning and can't be hash-gated cross-engine)
      val arms = per.groupBy("arm").agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val pooled = per.agg(
        count(lit(1)).as("pn"), sum("x").as("psx"), sum("y").as("psy"),
        sum(col("x") * col("y")).as("psxy"), sum(col("x") * col("x")).as("psxx"))
        .select(
          ((col("psxy").cast("double") - col("psx").cast("double") *
            col("psy").cast("double") / col("pn").cast("double")) /
            (col("psxx").cast("double") - col("psx").cast("double") *
              col("psx").cast("double") / col("pn").cast("double"))).as("theta"),
          (col("psx").cast("double") / col("pn").cast("double")).as("xbar"))
      def d(c: String) = col(c).cast("double")
      val vy = (d("syy") * d("n") - d("sy") * d("sy")) / (d("n") * (d("n") - 1))
      val vx = (d("sxx") * d("n") - d("sx") * d("sx")) / (d("n") * (d("n") - 1))
      val cxy = (d("sxy") * d("n") - d("sx") * d("sy")) / (d("n") * (d("n") - 1))
      arms.crossJoin(broadcast(pooled))
        .select(col("arm"), col("n").as("n_users"),
          round(d("sy") / d("n"), 4).as("mean_y"),
          round(d("sy") / d("n") -
            col("theta") * (d("sx") / d("n") - col("xbar")), 4).as("mean_y_adj"),
          round(vy, 2).as("var_y"),
          round(vy - lit(2.0) * col("theta") * cxy +
            col("theta") * col("theta") * vx, 2).as("var_y_adj"))
        .orderBy("arm")
    },
    Some("""WITH per AS (
           |  SELECT o_custkey, o_custkey % 2 AS arm,
           |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
           |      THEN CAST(floor(o_totalprice / 100) AS BIGINT) ELSE 0 END)
           |      AS BIGINT) AS x,
           |    CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
           |      THEN CAST(floor(o_totalprice / 100) AS BIGINT) ELSE 0 END)
           |      AS BIGINT) AS y
           |  FROM orders GROUP BY 1, 2),
           |arms AS (
           |  SELECT arm, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
           |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
           |    CAST(sum(x * x) AS BIGINT) AS sxx,
           |    CAST(sum(y * y) AS BIGINT) AS syy
           |  FROM per GROUP BY arm),
           |t AS (
           |  SELECT (CAST(sum(x * y) AS DOUBLE) - CAST(sum(x) AS DOUBLE) *
           |      CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)) /
           |    (CAST(sum(x * x) AS DOUBLE) - CAST(sum(x) AS DOUBLE) *
           |      CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS theta,
           |    CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS xbar
           |  FROM per)
           |SELECT arm, n AS n_users,
           |  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_y,
           |  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) -
           |    theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - xbar), 4)
           |    AS mean_y_adj,
           |  round((CAST(syy AS DOUBLE) * CAST(n AS DOUBLE) -
           |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
           |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)), 2) AS var_y,
           |  round((CAST(syy AS DOUBLE) * CAST(n AS DOUBLE) -
           |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
           |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) -
           |    2.0 * theta * ((CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE) -
           |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
           |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) +
           |    theta * theta * ((CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE) -
           |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
           |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 2) AS var_y_adj
           |FROM arms CROSS JOIN t ORDER BY arm""".stripMargin))

  /** Poisson-bootstrap confidence intervals for per-priority mean
    * order value — THE distributed bootstrap: classic resampling draws
    * n rows with replacement (a global operation no cluster can do
    * cheaply), while the Poisson trick gives every (row, replicate)
    * pair an independent Poisson(1) weight, turning 40 bootstrap
    * replicates into one EXPLODE + one keyed aggregation that scales
    * like any other groupBy. Weights come from a deterministic
    * md5-uniform inverted through the Poisson(1) CDF (literal
    * thresholds, identical in both engines), so the resample — and
    * therefore the interval — is partitioning-invariant and exactly
    * replayable in SQL. Replicate means reduce through exact integer
    * sums; the 5%/95% interval is the type-7 percentile over the 40
    * means, which both engines interpolate identically. */
  val q235BootstrapCi = GraftQuery(
    "q235_bootstrap_ci",
    (s, dir) => {
      val nRep = 40
      val o = Tables.orders(s, dir).select(col("o_orderpriority").as("priority"),
        col("o_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      // Poisson(1) CDF thresholds: P(X<=k) for k = 0..4
      val rep = o.select(col("priority"), col("o_orderkey"), col("cents"),
          explode(sequence(lit(0), lit(nRep - 1))).as("r"))
        .withColumn("u",
          conv(substring(md5(concat_ws("|", col("o_orderkey"), col("r"))), 1, 8),
            16, 10).cast("double") / lit(4294967296.0))
        .withColumn("w",
          when(col("u") < 0.367879441171, 0L)
            .when(col("u") < 0.735758882343, 1L)
            .when(col("u") < 0.919698602929, 2L)
            .when(col("u") < 0.981011843124, 3L)
            .when(col("u") < 0.996340153173, 4L).otherwise(5L))
      val means = rep.groupBy("priority", "r")
        .agg((sum(col("w") * col("cents")).cast("double") /
          sum(col("w")).cast("double")).as("mean_c"))
      means.groupBy("priority")
        .agg(count(lit(1)).as("n_reps"),
          round(expr("percentile(mean_c, 0.05)") / 100, 2).as("ci_lo"),
          round(expr("percentile(mean_c, 0.5)") / 100, 2).as("ci_mid"),
          round(expr("percentile(mean_c, 0.95)") / 100, 2).as("ci_hi"))
        .orderBy("priority")
    },
    Some("""WITH o AS (
           |  SELECT o_orderpriority AS priority, o_orderkey,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           |  FROM orders),
           |rep AS (
           |  SELECT priority, o_orderkey, cents, r,
           |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' ||
           |      CAST(r AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u
           |  FROM o, LATERAL (SELECT unnest(generate_series(0, 39)) AS r)),
           |w AS (
           |  SELECT priority, r, cents,
           |    CASE WHEN u < 0.367879441171 THEN 0
           |         WHEN u < 0.735758882343 THEN 1
           |         WHEN u < 0.919698602929 THEN 2
           |         WHEN u < 0.981011843124 THEN 3
           |         WHEN u < 0.996340153173 THEN 4 ELSE 5 END AS w
           |  FROM rep),
           |means AS (
           |  SELECT priority, r,
           |    CAST(sum(w * cents) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS mean_c
           |  FROM w GROUP BY priority, r)
           |SELECT priority, count(*) AS n_reps,
           |  round(quantile_cont(mean_c, 0.05) / 100, 2) AS ci_lo,
           |  round(quantile_cont(mean_c, 0.5) / 100, 2) AS ci_mid,
           |  round(quantile_cont(mean_c, 0.95) / 100, 2) AS ci_hi
           |FROM means GROUP BY priority ORDER BY priority""".stripMargin))

  /** ROUGE-L generation eval through the native
    * [[graft.functions.LcsLength]] expression — the in-order-overlap
    * metric q216's clipped-n-gram BLEU cannot express: the candidate
    * here is damaged by BLOCK ROTATION (tokens 8.. moved ahead of
    * 1..7) plus a substitution every 6th position, a transformation
    * that keeps most n-grams intact inside each block (BLEU barely
    * moves) while the longest common subsequence collapses to the
    * larger block — exactly the reorder sensitivity ROUGE-L exists
    * for. LCS runs as a codegen'd two-row DP per document pair;
    * precision/recall/F1 are single divisions of the integer LCS.
    * The oracle recomputes the LCS from first principles with a
    * recursive CTE carrying the DP row as a list (prefix-max
    * formulation) — a different algorithm shape in a different
    * engine agreeing on every cell. Token arrays are capped at 15 so
    * the oracle's O(n·m²) list arithmetic stays gate-priced; the
    * engine-side kernel has no such cap. */
  val q238RougeL = GraftQuery(
    "q238_rouge_l",
    (s, dir) => {
      val t = Tables.documents(s, dir)
        .select(col("doc_id"),
          expr("slice(split(trim(text), ' +'), 1, 15)").as("ref"))
        .withColumn("rlen", size(col("ref")))
        .filter(col("rlen") >= 10)
      val damaged = t
        // block rotation: tokens 8..rlen ahead of 1..7, then every 6th
        // slot replaced with a marker
        .withColumn("rot", expr(
          "concat(slice(ref, 8, rlen - 7), slice(ref, 1, 7))"))
        .withColumn("cand", expr(
          """transform(rot, (w, p) ->
            |  CASE WHEN (p + 1) % 6 = 0 THEN 'xnoisex' ELSE w END)"""
            .stripMargin))
      damaged
        .withColumn("clen", size(col("cand")))
        .withColumn("lcs",
          graft.functions.LcsLength.lcsLength(col("cand"), col("ref")))
        .select(col("doc_id"), col("rlen").cast("long").as("rlen"),
          col("lcs").cast("long").as("lcs"),
          round(col("lcs") / col("clen"), 6).as("rouge_p"),
          round(col("lcs") / col("rlen"), 6).as("rouge_r"),
          round(when(col("lcs") === 0, 0.0).otherwise(
            lit(2.0) * (col("lcs") / col("clen")) * (col("lcs") / col("rlen")) /
              (col("lcs") / col("clen") + col("lcs") / col("rlen"))), 6)
            .as("rouge_f1"))
        .orderBy("doc_id")
    },
    Some("""WITH RECURSIVE t AS (
           |  SELECT doc_id,
           |    list_slice(regexp_split_to_array(trim(text), ' +'), 1, 15) AS ref
           |  FROM documents),
           |base AS (
           |  SELECT doc_id, ref, len(ref) AS rlen FROM t WHERE len(ref) >= 10),
           |dmg AS (
           |  SELECT doc_id, ref, rlen,
           |    list_transform(
           |      list_concat(list_slice(ref, 8, rlen), list_slice(ref, 1, 7)),
           |      (w, p) -> CASE WHEN p % 6 = 0 THEN 'xnoisex' ELSE w END)
           |      AS cand
           |  FROM base),
           |lcs AS (
           |  SELECT doc_id, ref, rlen, cand, 0 AS i,
           |    list_transform(range(rlen + 1), x -> 0) AS dp
           |  FROM dmg
           |  UNION ALL
           |  SELECT doc_id, ref, rlen, cand, i + 1,
           |    list_transform(range(1, rlen + 2), j ->
           |      CASE WHEN j = 1 THEN 0 ELSE
           |        list_max(list_transform(range(2, j + 1), k ->
           |          greatest(dp[k], dp[k-1] +
           |            CASE WHEN cand[i+1] = ref[k-1] THEN 1 ELSE 0 END)))
           |      END)
           |  FROM lcs WHERE i < len(cand)),
           |fin AS (
           |  SELECT doc_id, rlen, len(cand) AS clen,
           |    dp[rlen + 1] AS lcs
           |  FROM lcs WHERE i = len(cand))
           |SELECT doc_id, CAST(rlen AS BIGINT) AS rlen,
           |  CAST(lcs AS BIGINT) AS lcs,
           |  round(CAST(lcs AS DOUBLE) / clen, 6) AS rouge_p,
           |  round(CAST(lcs AS DOUBLE) / rlen, 6) AS rouge_r,
           |  round(CASE WHEN lcs = 0 THEN 0.0 ELSE
           |    2.0 * (CAST(lcs AS DOUBLE) / clen) * (CAST(lcs AS DOUBLE) / rlen) /
           |    (CAST(lcs AS DOUBLE) / clen + CAST(lcs AS DOUBLE) / rlen) END, 6)
           |    AS rouge_f1
           |FROM fin ORDER BY doc_id""".stripMargin))

  /** Calibration curve + per-bin Brier decomposition — the classifier
    * diagnostic q179's AUC cannot see (AUC is rank-only; a perfectly
    * discriminating score can still be wildly miscalibrated). The
    * "probability" is the order's exact global price percentile
    * p = rank/N (the distinct-grain cumulative-window construction of
    * q179 — no per-row sort), the label is urgent/high priority, and
    * each decile bin reports observed frequency vs mean predicted p
    * plus its Brier contribution. Every statistic reduces to exact
    * integer sums over the SHARED denominator N (Σc·num, Σc·num²,
    * Σpos·num, Σpos — reorder-proof), then one fixed-form double
    * expression per bin: bin membership itself is integer arithmetic
    * (floor(10·num/N)), so no float ever decides a boundary. */
  val q245CalibrationBrier = GraftQuery(
    "q245_calibration_brier",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val base = o.select(
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("score"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("y"))
      val grain = base.groupBy("score")
        .agg(count(lit(1)).as("c"), sum("y").as("pos"))
      // The "distinct score grain" is NOT bounded here: o_totalprice is
      // effectively continuous (~99.8% of rows survive the groupBy), so a
      // Window.orderBy("score") cumsum would funnel the whole orders
      // table through one task. Two-phase global cumsum instead: range-
      // partitioned local sorts + broadcast partition offsets.
      val ranked = GlobalRank
        .exclusiveCumSum(grain, "below", col("c"), col("score"))
        .withColumn("num", col("below") + col("c"))
      val totals = ranked.agg(sum("c").as("n_total"))
      val binned = ranked.crossJoin(broadcast(totals))
        .withColumn("bin",
          least(lit(9L), floor(col("num") * 10 / col("n_total")).cast("long")))
        .groupBy("bin")
        .agg(sum("c").as("n"), sum("pos").as("n_pos"),
          sum(col("c") * col("num")).as("s_cn"),
          sum(col("c") * col("num") * col("num")).as("s_cn2"),
          sum(col("pos") * col("num")).as("s_pn"),
          max("n_total").as("nt"))
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      binned.select(col("bin"), col("n"), col("n_pos"),
        round(d(col("s_cn")) / (d(col("nt")) * d(col("n"))), 6).as("mean_p"),
        round(d(col("n_pos")) / d(col("n")), 6).as("frac_pos"),
        // mean((p - y)^2) = (Σc·num²/N² − 2Σpos·num/N + Σpos) / n
        round((d(col("s_cn2")) / (d(col("nt")) * d(col("nt"))) -
          lit(2.0) * d(col("s_pn")) / d(col("nt")) + d(col("n_pos"))) /
          d(col("n")), 6).as("brier_bin"))
        .orderBy("bin")
    },
    Some("""WITH base AS (
           |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS score,
           |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           |      THEN 1 ELSE 0 END AS y
           |  FROM orders),
           |grain AS (
           |  SELECT score, count(*) AS c, CAST(sum(y) AS BIGINT) AS pos
           |  FROM base GROUP BY score),
           |ranked AS (
           |  SELECT score, c, pos,
           |    COALESCE(sum(c) OVER (ORDER BY score
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c
           |      AS num
           |  FROM grain),
           |t AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM grain),
           |binned AS (
           |  SELECT least(9, num * 10 // nt) AS bin, c, pos, num, nt
           |  FROM ranked CROSS JOIN t),
           |m AS (
           |  SELECT bin, CAST(sum(c) AS BIGINT) AS n,
           |    CAST(sum(pos) AS BIGINT) AS n_pos,
           |    CAST(sum(c * num) AS BIGINT) AS s_cn,
           |    CAST(sum(c * num * num) AS BIGINT) AS s_cn2,
           |    CAST(sum(pos * num) AS BIGINT) AS s_pn,
           |    max(nt) AS nt
           |  FROM binned GROUP BY bin)
           |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
           |  round(CAST(s_cn AS DOUBLE) / (CAST(nt AS DOUBLE) *
           |    CAST(n AS DOUBLE)), 6) AS mean_p,
           |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos,
           |  round((CAST(s_cn2 AS DOUBLE) / (CAST(nt AS DOUBLE) *
           |      CAST(nt AS DOUBLE)) -
           |    2.0 * CAST(s_pn AS DOUBLE) / CAST(nt AS DOUBLE) +
           |    CAST(n_pos AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS brier_bin
           |FROM m ORDER BY bin""".stripMargin))

  /** CLUSTERING-AGREEMENT METRICS — Adjusted Rand Index and Normalized
    * Mutual Information between two labelings of the corpus (the
    * cluster-quality eval for embedding/dedup clusterings against
    * ground truth). The "predicted" labeling is the true language with
    * a deterministic 1-in-7 cyclic perturbation, so the metrics sit at
    * a known high-agreement operating point instead of the
    * uninformative ~0 two independent columns would give.
    *
    * Everything before the TWO final divisions is exact integer
    * combinatorics: the contingency table (≤ |langs|² cells — one
    * hash-aggregate over the corpus, never pair-enumeration: C(n,2)
    * pair counts come from the closed form, which is what makes ARI
    * computable at 100 TB), pair sums I/A/B, and ARI as the integer
    * ratio (2IC − 2AB)/((A+B)C − 2AB). NMI's log terms follow the
    * engine-wide ln() nano-quantization convention. */
  val q266ClusterAgreement = GraftQuery(
    "q266_cluster_agreement",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(
        col("lang").as("truth"),
        when(col("n_chars") % 7 === 0,
          when(col("lang") === "de", "en").when(col("lang") === "en", "es")
            .when(col("lang") === "es", "fr").when(col("lang") === "fr", "zh")
            .otherwise("de"))
          .otherwise(col("lang")).as("pred"))
      def pairs2(c: org.apache.spark.sql.Column) = (c * (c - 1) / 2).cast("long")
      val cells = d.groupBy("truth", "pred").agg(count(lit(1)).as("nij"))
      val rowS = cells.groupBy("truth").agg(sum("nij").as("ai"))
      val colS = cells.groupBy("pred").agg(sum("nij").as("bj"))
      val tot = d.groupBy().agg(count(lit(1)).as("n"))
      val iPairs = cells.agg(sum(pairs2(col("nij"))).as("i")).collect().head.getLong(0)
      val aPairs = rowS.agg(sum(pairs2(col("ai"))).as("a")).collect().head.getLong(0)
      val bPairs = colS.agg(sum(pairs2(col("bj"))).as("b")).collect().head.getLong(0)
      val n = tot.collect().head.getLong(0)
      val cPairs = n * (n - 1) / 2
      val ari = BigDecimal(
        (2.0 * iPairs * cPairs - 2.0 * aPairs * bPairs) /
          ((aPairs + bPairs).toDouble * cPairs - 2.0 * aPairs * bPairs))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      // MI and entropies: nano-quantized log terms, order-free int sums
      val mi9 = cells.join(broadcast(rowS), "truth")
        .join(broadcast(colS), "pred").crossJoin(broadcast(tot))
        .select(round(lit(1e9) * (col("nij").cast("double") / col("n")) *
          log((col("n") * col("nij")).cast("double") /
            (col("ai") * col("bj")).cast("double")), 0).cast("long").as("t9"))
        .agg(sum("t9")).collect().head.getLong(0)
      def h9(sums: org.apache.spark.sql.DataFrame, c: String): Long = sums
        .crossJoin(broadcast(tot))
        .select(round(lit(1e9) * (col(c).cast("double") / col("n")) *
          log(col("n").cast("double") / col(c).cast("double")), 0)
          .cast("long").as("t9"))
        .agg(sum("t9")).collect().head.getLong(0)
      val ha9 = h9(rowS, "ai"); val hb9 = h9(colS, "bj")
      val nmi = BigDecimal(mi9.toDouble /
          math.sqrt(ha9.toDouble * hb9.toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      import s.implicits._
      Seq((n, iPairs, aPairs, bPairs, ari, nmi))
        .toDF("n", "i_pairs", "a_pairs", "b_pairs", "ari", "nmi")
    },
    Some("""WITH d AS MATERIALIZED (
           |  SELECT lang AS truth,
           |    CASE WHEN n_chars % 7 = 0 THEN
           |      CASE lang WHEN 'de' THEN 'en' WHEN 'en' THEN 'es'
           |        WHEN 'es' THEN 'fr' WHEN 'fr' THEN 'zh' ELSE 'de' END
           |    ELSE lang END AS pred
           |  FROM documents),
           |cells AS MATERIALIZED (
           |  SELECT truth, pred, count(*) AS nij FROM d GROUP BY 1, 2),
           |rs AS MATERIALIZED (
           |  SELECT truth, CAST(sum(nij) AS BIGINT) AS ai FROM cells GROUP BY 1),
           |cs AS MATERIALIZED (
           |  SELECT pred, CAST(sum(nij) AS BIGINT) AS bj FROM cells GROUP BY 1),
           |tot AS MATERIALIZED (SELECT count(*) AS n FROM d),
           |sums AS MATERIALIZED (
           |  SELECT
           |    (SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) FROM cells)
           |      AS i,
           |    (SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) FROM rs) AS a,
           |    (SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) FROM cs) AS b,
           |    (SELECT CAST(n * (n - 1) // 2 AS BIGINT) FROM tot) AS c,
           |    (SELECT n FROM tot) AS n),
           |mi AS MATERIALIZED (
           |  SELECT CAST(sum(CAST(round(1e9 *
           |      (CAST(nij AS DOUBLE) / t.n) *
           |      ln(CAST(t.n * nij AS DOUBLE) / CAST(rs.ai * cs.bj AS DOUBLE)))
           |    AS BIGINT)) AS BIGINT) AS mi9
           |  FROM cells JOIN rs USING (truth) JOIN cs USING (pred), tot t),
           |ha AS MATERIALIZED (
           |  SELECT CAST(sum(CAST(round(1e9 * (CAST(ai AS DOUBLE) / t.n) *
           |    ln(CAST(t.n AS DOUBLE) / CAST(ai AS DOUBLE))) AS BIGINT))
           |    AS BIGINT) AS h9
           |  FROM rs, tot t),
           |hb AS MATERIALIZED (
           |  SELECT CAST(sum(CAST(round(1e9 * (CAST(bj AS DOUBLE) / t.n) *
           |    ln(CAST(t.n AS DOUBLE) / CAST(bj AS DOUBLE))) AS BIGINT))
           |    AS BIGINT) AS h9
           |  FROM cs, tot t)
           |SELECT CAST(s.n AS BIGINT) AS n, s.i AS i_pairs, s.a AS a_pairs,
           |  s.b AS b_pairs,
           |  round((2.0 * s.i * s.c - 2.0 * s.a * s.b) /
           |    ((s.a + s.b) * 1.0 * s.c - 2.0 * s.a * s.b), 9) AS ari,
           |  round(CAST(mi.mi9 AS DOUBLE) /
           |    sqrt(CAST(ha.h9 AS DOUBLE) * CAST(hb.h9 AS DOUBLE)), 9) AS nmi
           |FROM sums s, mi, ha, hb""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(q178RetrievalEval, q179GroupedAuc, q180SeasonalDecompose,
      q210DedupEval, q212DriftMonitor, q216BleuEval, q217LabelAgreement,
      q227CupedAdjustment, q235BootstrapCi, q238RougeL, q245CalibrationBrier,
      q266ClusterAgreement)
}
