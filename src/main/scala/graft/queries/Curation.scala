package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.operators.{EntityResolution, IntervalJoin, KMeans, Similarity}

/** Data-curation operators a large-scale pipeline runs before training:
  * record linkage, interval analytics, PII scrubbing, and distributed
  * clustering. Each query pairs a scale-shaped Spark plan with a DuckDB
  * oracle that replays the semantics directly (inequality joins,
  * unrolled Lloyd iterations) — the oracle is allowed the naive plan,
  * the engine is not. */
object Curation {

  /** Entity resolution over a deterministically-corrupted registry:
    * every customer name is re-derived with key%3 damage (0 = intact,
    * 1 = last char replaced, 2 = last two chars replaced by three —
    * edit distance 3, past the budget) and resolved back against the
    * clean registry via prefix blocking + Levenshtein ≤ 2.
    *
    * Complements q72 (dictionary-scale fuzzy pairs): this is the
    * row-scale linkage shape — blocked candidates, combinable
    * best-match aggregate, and unmatched rows ROUTED with NULLs rather
    * than dropped. Damage class 1 is genuinely ambiguous (ten
    * canonical names sit at distance 1); the (dist, key) tie-break
    * resolves it identically in both engines. */
  val q173EntityResolution = GraftQuery(
    "q173_entity_resolution",
    (s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
      val dirty = c.select(col("c_custkey").as("dirty_id"),
        when(col("c_custkey") % 3 === 1,
          concat(substring(col("c_name"), 1, 17), lit("X")))
          .when(col("c_custkey") % 3 === 2,
            concat(substring(col("c_name"), 1, 16), lit("ZZZ")))
          .otherwise(col("c_name")).as("dirty_name"))
      val clean = c.select(col("c_custkey").as("clean_key"),
        col("c_name").as("clean_name"))
      EntityResolution.resolve(dirty, clean, substring(_, 1, 16), maxDist = 2)
        .select(col("dirty_id"), col("dirty_name"), col("matched_key"),
          col("dist"))
        .orderBy("dirty_id")
    },
    Some("""WITH dirty AS (
           |  SELECT c_custkey AS dirty_id,
           |    CASE CAST(c_custkey % 3 AS INTEGER)
           |      WHEN 1 THEN substr(c_name, 1, 17) || 'X'
           |      WHEN 2 THEN substr(c_name, 1, 16) || 'ZZZ'
           |      ELSE c_name END AS dirty_name
           |  FROM customer),
           |cand AS (
           |  SELECT d.dirty_id, c.c_custkey,
           |    levenshtein(d.dirty_name, c.c_name) AS dist
           |  FROM dirty d JOIN customer c
           |    ON substr(d.dirty_name, 1, 16) = substr(c.c_name, 1, 16)
           |  WHERE levenshtein(d.dirty_name, c.c_name) <= 2),
           |best AS (
           |  SELECT dirty_id, c_custkey AS matched_key, dist FROM (
           |    SELECT *, row_number() OVER (PARTITION BY dirty_id
           |      ORDER BY dist, c_custkey) AS rn FROM cand)
           |  WHERE rn = 1)
           |SELECT d.dirty_id, d.dirty_name, b.matched_key,
           |  CAST(b.dist AS BIGINT) AS dist
           |FROM dirty d LEFT JOIN best b USING (dirty_id)
           |ORDER BY d.dirty_id""".stripMargin))

  private val epoch2024Us = 1704067200000000L // 2024-01-01 00:00:00 UTC
  private val sixHoursUs = 21600000000L
  private val fourHoursUs = 14400000000L

  /** Interval-overlap join: per-user 30-minute-gap sessions against a
    * sparse window grid (4 open hours every 6, so the residual
    * predicate does real work), bucketed by [[IntervalJoin]] — the
    * executed plan is an equi-join on the 6-hour bucket with an exact
    * residual, never the nested-loop inequality join the oracle runs.
    * Per window: sessions touched, distinct users, total overlap. */
  val q174IntervalOverlap = GraftQuery(
    "q174_interval_overlap",
    (s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val sess = Tables.events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("prev", lag("ts_us", 1).over(byUser))
        .withColumn("new_s",
          when(col("prev").isNull || col("ts_us") - col("prev") > 1800000000L, 1)
            .otherwise(0))
        .withColumn("seq", sum("new_s")
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "seq")
        .agg(min("ts_us").as("a_start"), max("ts_us").as("a_end"))
      val win = s.range(0, 120).select(col("id").as("win_id"),
        (lit(epoch2024Us) + col("id") * sixHoursUs).as("b_start"),
        (lit(epoch2024Us) + col("id") * sixHoursUs + fourHoursUs - 1).as("b_end"))
      IntervalJoin.overlapJoin(sess, win, bucketWidth = sixHoursUs)
        .groupBy("win_id")
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct("user_id").as("n_users"),
          sum(least(col("a_end"), col("b_end"))
            - greatest(col("a_start"), col("b_start"))).as("sum_overlap_us"))
        .withColumn("win_start_sec",
          lit(1704067200L) + col("win_id") * 21600L)
        .select("win_id", "win_start_sec", "n_sessions", "n_users",
          "sum_overlap_us")
        .orderBy("win_id")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events),
           |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
           |        ORDER BY ts_us, event_id) AS prev FROM e),
           |f AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
           |        THEN 1 ELSE 0 END AS ns FROM l),
           |g AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
           |        ORDER BY ts_us, event_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
           |      FROM f),
           |sess AS (SELECT user_id, seq, min(ts_us) AS a_start,
           |         max(ts_us) AS a_end FROM g GROUP BY user_id, seq),
           |win AS (SELECT CAST(i AS BIGINT) AS win_id,
           |         1704067200000000 + i * 21600000000 AS b_start,
           |         1704067200000000 + i * 21600000000 + 14400000000 - 1 AS b_end
           |        FROM generate_series(0, 119) t(i)),
           |j AS (SELECT w.win_id, s.user_id,
           |        least(s.a_end, w.b_end) - greatest(s.a_start, w.b_start) AS ov
           |      FROM sess s JOIN win w
           |        ON s.a_start <= w.b_end AND w.b_start <= s.a_end)
           |SELECT win_id, 1704067200 + win_id * 21600 AS win_start_sec,
           |  count(*) AS n_sessions, count(DISTINCT user_id) AS n_users,
           |  CAST(sum(ov) AS BIGINT) AS sum_overlap_us
           |FROM j GROUP BY win_id ORDER BY win_id""".stripMargin))

  private val emailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  private val phoneRe = """\+1-555-[0-9]{4}"""
  private val ipRe = """10\.[0-9]+\.[0-9]+\.[0-9]+"""

  /** PII redaction over documents: deterministic contact blocks
    * (email, every-fifth-doc a second email, phone, IP) are spliced
    * into each text, then scrubbed with portable regexes (Java and
    * RE2 agree on this subset) in a fixed order. Counts come from the
    * pre-scrub text; the gate hashes the scrubbed output, so a missed
    * occurrence (DuckDB's replace is first-match unless 'g') or an
    * over-greedy pattern fails byte-exactly. Pure codegen'd string
    * expressions — the 100 TB shape is a narrow scan, no UDFs. */
  val q175PiiRedaction = GraftQuery(
    "q175_pii_redaction",
    (s, dir) => {
      val pii = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" reach user"), col("doc_id").cast("string"),
          lit("@mail.example.com"),
          when(col("doc_id") % 5 === 0,
            lit(" cc admin.ops@corp.example.net")).otherwise(lit("")),
          lit(" or call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
          lit(".7")).as("t"))
      val scrubbed = regexp_replace(
        regexp_replace(
          regexp_replace(col("t"), lit(emailRe), lit("<EMAIL>")),
          lit(phoneRe), lit("<PHONE>")),
        lit(ipRe), lit("<IP>"))
      pii.select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("t"), lit(phoneRe), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("t"), lit(ipRe), lit(0)))
          .cast("long").as("n_ips"),
        length(scrubbed).cast("long").as("scrub_len"),
        md5(scrubbed).as("scrub_md5"))
        .orderBy("doc_id")
    },
    Some("""WITH pii AS (
           |  SELECT doc_id, text || ' reach user' || CAST(doc_id AS VARCHAR)
           |    || '@mail.example.com'
           |    || CASE WHEN doc_id % 5 = 0
           |         THEN ' cc admin.ops@corp.example.net' ELSE '' END
           |    || ' or call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           |    || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
           |  FROM documents),
           |scrub AS (
           |  SELECT doc_id, t,
           |    regexp_replace(
           |      regexp_replace(
           |        regexp_replace(t,
           |          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
           |        '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
           |      '10\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g') AS sc
           |  FROM pii)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', 0)) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(t, '\+1-555-[0-9]{4}', 0)) AS BIGINT) AS n_phones,
           |  CAST(len(regexp_extract_all(t, '10\.[0-9]+\.[0-9]+\.[0-9]+', 0)) AS BIGINT) AS n_ips,
           |  CAST(length(sc) AS BIGINT) AS scrub_len,
           |  md5(sc) AS scrub_md5
           |FROM scrub ORDER BY doc_id""".stripMargin))

  /** Distributed k-means (k = 8, lowest-id seed, one full Lloyd
    * update, then the final re-assignment) over the embeddings,
    * reporting each vector's cluster and squared distance. The oracle
    * UNROLLS seed → assign → update → assign as CTEs — argmin via
    * (score, cluster) ranking, centroid update as a per-dimension
    * average rounded to 9 decimals (the engine-neutral contract that
    * absorbs float summation order) — so the distributed assign/update
    * machinery in [[KMeans]] is pinned end-to-end, not just its final
    * labels. Semantic-dedup pipelines run exactly this before
    * within-cluster pruning (q38's IVF cells are the sampled cousin). */
  val q176KmeansClusters = GraftQuery(
    "q176_kmeans_clusters",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = KMeans.fit(emb, k = 8, iters = 1)
      KMeans.assign(emb, cents)
        .select(col("vec_id"),
          col("cluster").cast("long").as("cluster"),
          round(Similarity.dot(col("embedding"), col("embedding"))
            + col("score"), 6).as("dist2"))
        .orderBy("vec_id")
    },
    Some("""WITH c0 AS (
           |  SELECT CAST(vec_id AS INTEGER) AS cl,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
           |  FROM embeddings WHERE vec_id < 8),
           |s1 AS (
           |  SELECT e.vec_id, e.embedding, c.cl,
           |    list_sum(list_transform(c.cv, x -> x * x))
           |      - 2 * list_sum(list_transform(e.embedding,
           |          (x, i) -> CAST(x AS DOUBLE) * c.cv[i])) AS score
           |  FROM embeddings e CROSS JOIN c0 c),
           |a1 AS (SELECT vec_id, embedding, cl FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY score, cl) AS rn FROM s1) WHERE rn = 1),
           |e1 AS (SELECT cl, unnest(list_transform(embedding,
           |         (x, i) -> {'i': i, 'x': CAST(x AS DOUBLE)})) AS u FROM a1),
           |u1 AS (SELECT cl, u.i AS i, round(avg(u.x), 9) AS m
           |       FROM e1 GROUP BY cl, u.i),
           |c1 AS (SELECT cl, list(m ORDER BY i) AS cv FROM u1 GROUP BY cl),
           |s2 AS (
           |  SELECT e.vec_id, e.embedding, c.cl,
           |    list_sum(list_transform(c.cv, x -> x * x))
           |      - 2 * list_sum(list_transform(e.embedding,
           |          (x, i) -> CAST(x AS DOUBLE) * c.cv[i])) AS score
           |  FROM embeddings e CROSS JOIN c1 c),
           |a2 AS (SELECT vec_id, cl, score FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY score, cl) AS rn FROM s2) WHERE rn = 1)
           |SELECT a.vec_id, CAST(a.cl AS BIGINT) AS cluster,
           |  round(list_sum(list_transform(e.embedding,
           |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) + a.score, 6) AS dist2
           |FROM a2 a JOIN embeddings e ON a.vec_id = e.vec_id
           |ORDER BY a.vec_id""".stripMargin))

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    * clusters the corpus (q176's distributed Lloyd's, identical seed
    * and rounding so the oracle replays it), then near-duplicates are
    * sought ONLY within a cluster — the pair join is bounded by
    * Σ cluster_size², never corpus², and at 100 TB you'd compose the
    * in-cluster screen with LSH banding for a second bound. The keep
    * rule is deterministic and chain-free: a vector is dropped iff ANY
    * lower-id vector in its cluster has cosine ≥ 0.4 (`dup_of` = the
    * lowest such id); survivors are the training set. Cosine is
    * rounded to 9 decimals before the threshold test so the keep/drop
    * decision is engine-identical. */
  val q181SemanticDedup = GraftQuery(
    "q181_semantic_dedup",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = KMeans.fit(emb, k = 8, iters = 1)
      val assigned = KMeans.assign(emb, cents)
        .select(col("vec_id"), col("cluster"), col("embedding"))
      val a = assigned.select(col("cluster"), col("vec_id"),
        col("embedding").as("va"))
      val b = assigned.select(col("cluster"), col("vec_id").as("vid_b"),
        col("embedding").as("vb"))
      val dups = a.join(b, Seq("cluster"))
        .filter(col("vid_b") < col("vec_id"))
        .withColumn("cos", round(Similarity.cosine(col("va"), col("vb")), 9))
        .filter(col("cos") >= 0.4)
        .groupBy("vec_id").agg(min(col("vid_b")).as("dup_of"))
      assigned.join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          col("dup_of").isNull.as("kept"), col("dup_of"))
        .orderBy("vec_id")
    },
    Some("""WITH c0 AS (
           |  SELECT CAST(vec_id AS INTEGER) AS cl,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
           |  FROM embeddings WHERE vec_id < 8),
           |s1 AS (
           |  SELECT e.vec_id, e.embedding, c.cl,
           |    list_sum(list_transform(c.cv, x -> x * x))
           |      - 2 * list_sum(list_transform(e.embedding,
           |          (x, i) -> CAST(x AS DOUBLE) * c.cv[i])) AS score
           |  FROM embeddings e CROSS JOIN c0 c),
           |a1 AS (SELECT vec_id, embedding, cl FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY score, cl) AS rn FROM s1) WHERE rn = 1),
           |e1 AS (SELECT cl, unnest(list_transform(embedding,
           |         (x, i) -> {'i': i, 'x': CAST(x AS DOUBLE)})) AS u FROM a1),
           |u1 AS (SELECT cl, u.i AS i, round(avg(u.x), 9) AS m
           |       FROM e1 GROUP BY cl, u.i),
           |c1 AS (SELECT cl, list(m ORDER BY i) AS cv FROM u1 GROUP BY cl),
           |s2 AS (
           |  SELECT e.vec_id, e.embedding, c.cl,
           |    list_sum(list_transform(c.cv, x -> x * x))
           |      - 2 * list_sum(list_transform(e.embedding,
           |          (x, i) -> CAST(x AS DOUBLE) * c.cv[i])) AS score
           |  FROM embeddings e CROSS JOIN c1 c),
           |a2 AS (SELECT vec_id, embedding, cl FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY score, cl) AS rn FROM s2) WHERE rn = 1),
           |dups AS (
           |  SELECT a.vec_id, min(b.vec_id) AS dup_of
           |  FROM a2 a JOIN a2 b ON a.cl = b.cl AND b.vec_id < a.vec_id
           |  WHERE round(
           |    list_sum(list_transform(a.embedding,
           |      (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           |    / (sqrt(list_sum(list_transform(a.embedding,
           |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           |     * sqrt(list_sum(list_transform(b.embedding,
           |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 9) >= 0.4
           |  GROUP BY a.vec_id)
           |SELECT a.vec_id, CAST(a.cl AS BIGINT) AS cluster,
           |  d.dup_of IS NULL AS kept, d.dup_of
           |FROM a2 a LEFT JOIN dups d ON a.vec_id = d.vec_id
           |ORDER BY a.vec_id""".stripMargin))

  /** CCNet/C4-style boilerplate detection: a word 5-gram that recurs
    * across ≥ max(3, 5% of a source's documents) is boilerplate (nav
    * bars, license footers, templated headers), and each document is
    * profiled by how much of it is boilerplate — the per-source report
    * a curation pipeline alerts on before dropping repeated content.
    *
    * Scale: the shingle stream is linear in corpus size; the
    * document-frequency aggregate collapses it to the SHINGLE
    * VOCABULARY; the join-back is a shingle equi-join (never doc×doc);
    * and every ratio is a single division of exact integer counts, so
    * both engines agree bit-for-bit. This is the same
    * hash-agg-then-join-back shape as q123's novelty scan. */
  val q202BoilerplateShingles = GraftQuery(
    "q202_boilerplate_shingles",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val sh = graft.operators.FanOut(docs)
        .select(col("source"), col("doc_id"),
          explode(array_distinct(graft.functions.Text.wordShingles(col("text"), 5)))
            .as("sgl"))
      val nDocs = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val dfreq = sh.groupBy("source", "sgl").agg(count(lit(1)).as("df"))
        .join(broadcast(nDocs), "source")
        .withColumn("is_b",
          col("df") >= greatest(lit(3), ceil(col("n_docs") * 0.05)))
      val perDoc = sh
        .join(dfreq.select("source", "sgl", "is_b"), Seq("source", "sgl"))
        .groupBy("source", "doc_id")
        .agg(count(lit(1)).as("n_sh"),
          sum(when(col("is_b"), 1L).otherwise(0L)).as("n_b"))
      perDoc.groupBy("source")
        .agg(sum("n_sh").as("sh_total"), sum("n_b").as("boiler_total"),
          sum(when(col("n_b") * 2 > col("n_sh"), 1L).otherwise(0L))
            .as("flagged_docs"))
        .join(broadcast(nDocs), "source")
        .join(broadcast(dfreq.groupBy("source")
          .agg(sum(when(col("is_b"), 1L).otherwise(0L))
            .as("n_boiler_shingles"))), "source")
        .select(col("source"), col("n_docs"), col("n_boiler_shingles"),
          col("sh_total"), col("boiler_total"),
          round(col("boiler_total") / col("sh_total").cast("double"), 6)
            .as("boiler_ratio"),
          col("flagged_docs"))
        .orderBy("source")
    },
    Some("""WITH toks AS (
           |  SELECT source, doc_id,
           |    string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |sh AS (
           |  SELECT DISTINCT source, doc_id,
           |    ws[i.g] || ' ' || ws[i.g+1] || ' ' || ws[i.g+2] || ' '
           |      || ws[i.g+3] || ' ' || ws[i.g+4] AS sgl
           |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws)-4)) g) i
           |  WHERE len(ws) >= 5),
           |ndocs AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
           |dfreq AS (
           |  SELECT s.source, s.sgl, count(*) AS df,
           |    count(*) >= greatest(3, ceil(n.n_docs * 0.05)) AS is_b
           |  FROM sh s JOIN ndocs n USING (source) GROUP BY s.source, s.sgl, n.n_docs),
           |per_doc AS (
           |  SELECT s.source, s.doc_id, count(*) AS n_sh,
           |    CAST(sum(CASE WHEN d.is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b
           |  FROM sh s JOIN dfreq d USING (source, sgl) GROUP BY 1, 2),
           |per_src AS (
           |  SELECT source, CAST(sum(n_sh) AS BIGINT) AS sh_total,
           |    CAST(sum(n_b) AS BIGINT) AS boiler_total,
           |    CAST(sum(CASE WHEN n_b * 2 > n_sh THEN 1 ELSE 0 END) AS BIGINT)
           |      AS flagged_docs
           |  FROM per_doc GROUP BY 1),
           |bsh AS (
           |  SELECT source,
           |    CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_boiler_shingles
           |  FROM dfreq GROUP BY 1)
           |SELECT p.source, n.n_docs, b.n_boiler_shingles, p.sh_total,
           |  p.boiler_total,
           |  round(p.boiler_total / CAST(p.sh_total AS DOUBLE), 6)
           |    AS boiler_ratio,
           |  p.flagged_docs
           |FROM per_src p JOIN ndocs n USING (source) JOIN bsh b USING (source)
           |ORDER BY p.source""".stripMargin))

  /** DSIR-style hashed importance weighting: score every non-English
    * document by how English-target-like its hashed-bigram feature
    * distribution is. Word bigrams hash into 256 buckets; each bucket
    * gets an add-one-smoothed log-likelihood ratio between the target
    * (lang = 'en') and raw (everything else) corpora; a raw document's
    * importance is the sum of its features' ratios — the importance-
    * resampling weight from Xie et al.'s DSIR, here surfaced as a
    * top-20 ranking.
    *
    * Scale: two corpus-linear passes (bucket counts, per-doc scores)
    * joined through a 256-row broadcast weight table; no doc×doc work.
    * Exactness: bucket weights are computed with ONE ln over a ratio
    * of exact integer products (< 2^53, so the double argument is
    * identical in both engines) and floored to integer micro-units;
    * per-doc scores are then sums of longs — associative, order-free. */
  val q203DsirImportance = GraftQuery(
    "q203_dsir_importance",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = graft.operators.FanOut(docs)
        .select(col("doc_id"), col("source"), col("lang"),
          explode(graft.functions.Text.wordShingles(col("text"), 2)).as("bg"))
        .withColumn("bucket",
          conv(substring(md5(col("bg")), 1, 6), 16, 10).cast("long") % 256)
      val counts = toks.groupBy("bucket")
        .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_cnt"),
          sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("r_cnt"))
      val totals = counts.agg(sum("t_cnt").as("t_tot"), sum("r_cnt").as("r_tot"))
      val weights = counts.crossJoin(broadcast(totals))
        .select(col("bucket"),
          floor(log((col("t_cnt") + 1) * (col("r_tot") + 256) /
            ((col("r_cnt") + 1) * (col("t_tot") + 256))) * 1e6)
            .cast("long").as("w"))
      val scored = toks.filter(col("lang") =!= "en")
        .join(broadcast(weights), "bucket")
        .groupBy("doc_id", "source", "lang")
        .agg(count(lit(1)).as("n_bigrams"), sum("w").as("score"))
      // top-20 via TakeOrderedAndProject (bounded-heap per partition +
      // driver merge of 20), NOT a global row_number window — the rank
      // column is then attached over the 20 surviving rows only.
      val top20 = scored.orderBy(col("score").desc, col("doc_id").asc).limit(20)
      val rw = Window.orderBy(col("score").desc, col("doc_id").asc)
      top20.withColumn("rank", row_number().over(rw))
        .select("rank", "doc_id", "source", "lang", "n_bigrams", "score")
        .orderBy("rank")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, source, lang,
           |    string_split_regex(trim(text), '\s+') AS ws FROM documents),
           |bigrams AS (
           |  SELECT doc_id, source, lang,
           |    ('0x' || substr(md5(ws[i.g] || ' ' || ws[i.g+1]), 1, 6))::BIGINT
           |      % 256 AS bucket
           |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) g) i
           |  WHERE len(ws) >= 2),
           |counts AS (
           |  SELECT bucket,
           |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS t_cnt,
           |    CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS r_cnt
           |  FROM bigrams GROUP BY 1),
           |totals AS (
           |  SELECT CAST(sum(t_cnt) AS BIGINT) AS t_tot,
           |    CAST(sum(r_cnt) AS BIGINT) AS r_tot FROM counts),
           |weights AS (
           |  SELECT bucket,
           |    CAST(floor(ln(((t_cnt + 1) * (r_tot + 256)) /
           |      CAST((r_cnt + 1) * (t_tot + 256) AS DOUBLE)) * 1e6) AS BIGINT)
           |      AS w
           |  FROM counts CROSS JOIN totals),
           |scored AS (
           |  SELECT b.doc_id, b.source, b.lang, count(*) AS n_bigrams,
           |    CAST(sum(w.w) AS BIGINT) AS score
           |  FROM bigrams b JOIN weights w USING (bucket)
           |  WHERE b.lang <> 'en' GROUP BY 1, 2, 3)
           |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
           |    AS INTEGER) AS rank,
           |  doc_id, source, lang, n_bigrams, score
           |FROM scored QUALIFY rank <= 20 ORDER BY rank""".stripMargin))

  /** Pairwise source-vocabulary overlap: for every pair of sources,
    * the exact Jaccard similarity of their token vocabularies — the
    * corpus-mixing diagnostic that tells a pipeline which sources are
    * near-redundant before weighting them (complement of q24's
    * doc-level MinHash estimate: this is set-exact at the SOURCE
    * grain, where exactness is affordable).
    *
    * Scale: the corpus collapses to a distinct (source, token)
    * vocabulary table first; the pair join is vocabulary-sized and
    * bounded by sources² per token; per-source sizes arrive via a
    * broadcast. No corpus-sized join anywhere. */
  val q208SourceOverlap = GraftQuery(
    "q208_source_overlap",
    (s, dir) => {
      val vocab = Tables.documents(s, dir)
        .select(col("source"), explode(split(
          regexp_replace(lower(col("text")), "[^a-z]+", " "), " ")).as("tok"))
        .filter(col("tok") =!= "").distinct()
      val sizes = vocab.groupBy("source").agg(count(lit(1)).as("vsize"))
      val a = vocab.select(col("source").as("source_a"), col("tok"))
      val b = vocab.select(col("source").as("source_b"), col("tok"))
      a.join(b, "tok").filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_common"))
        .join(broadcast(sizes.select(col("source").as("source_a"),
          col("vsize").as("vocab_a"))), "source_a")
        .join(broadcast(sizes.select(col("source").as("source_b"),
          col("vsize").as("vocab_b"))), "source_b")
        .select(col("source_a"), col("source_b"), col("vocab_a"),
          col("vocab_b"), col("n_common"),
          round(col("n_common") / (col("vocab_a") + col("vocab_b")
            - col("n_common")).cast("double"), 6).as("jaccard"))
        .orderBy("source_a", "source_b")
    },
    Some("""WITH vocab AS (
           |  SELECT DISTINCT source, tok FROM (
           |    SELECT source, unnest(string_split(
           |      regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' ')) AS tok
           |    FROM documents) t
           |  WHERE tok <> ''),
           |sizes AS (SELECT source, count(*) AS vsize FROM vocab GROUP BY 1)
           |SELECT a.source AS source_a, b.source AS source_b,
           |  sa.vsize AS vocab_a, sb.vsize AS vocab_b,
           |  count(*) AS n_common,
           |  round(count(*) / CAST(sa.vsize + sb.vsize - count(*) AS DOUBLE), 6)
           |    AS jaccard
           |FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.source < b.source
           |JOIN sizes sa ON sa.source = a.source
           |JOIN sizes sb ON sb.source = b.source
           |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin))

  /** Jaro-Winkler fuzzy matching through the native [[graft.functions.JaroWinkler]]
    * expression — the record-linkage scorer Spark has no builtin for,
    * pinned cell-for-cell against DuckDB's INDEPENDENT
    * `jaro_winkler_similarity` implementation (the strongest oracle a
    * hand-written string kernel can get: two codebases, one scoreboard).
    *
    * Shape: every 5th part name is deterministically damaged by a
    * character transposition (the error class Jaro-Winkler exists for
    * and Levenshtein-based q173/q72 treat as 2 edits), then resolved
    * against the clean dictionary via BLOCKING — first character +
    * length band, both invariants of the damage — so the candidate
    * volume is Σ|block|² and never |probes|×|parts|; the per-probe
    * best match reduces through a rounded-score tie-break that both
    * engines order identically. At 100 TB the same plan holds: the
    * block key is the equi-join key, and the scorer runs inside
    * whole-stage codegen on candidate pairs only. */
  val q225JaroWinklerMatch = GraftQuery(
    "q225_jaro_winkler_match",
    (s, dir) => {
      val p = Tables.part(s, dir)
      val probes = p.filter(col("p_partkey") % 5 === 0)
        .select(col("p_partkey").as("probe_key"),
          concat(substring(col("p_name"), 1, 2), substring(col("p_name"), 4, 1),
            substring(col("p_name"), 3, 1), expr("substring(p_name, 5)"))
            .as("probe_name"))
      val scored = probes
        .withColumn("blk", substring(col("probe_name"), 1, 1))
        .join(p.withColumn("blk", substring(col("p_name"), 1, 1)), Seq("blk"))
        .filter(abs(length(col("p_name")) - length(col("probe_name"))) <= 1)
        .withColumn("score", graft.functions.JaroWinkler.jaroWinkler(
          col("probe_name"), col("p_name")))
        .filter(col("score") >= 0.95)
        .withColumn("score_e4",
          floor(col("score") * 10000 + lit(0.5)).cast("long"))
      val w = Window.partitionBy("probe_key")
        .orderBy(col("score_e4").desc, col("p_partkey"))
      scored
        .withColumn("rn", row_number().over(w))
        .groupBy("probe_key")
        .agg(count(lit(1)).as("n_matches"),
          sum("score_e4").as("sum_e4"),
          max(when(col("rn") === 1, col("p_partkey"))).cast("long")
            .as("best_key"),
          max(when(col("rn") === 1, col("score_e4"))).as("best_e4"))
        .orderBy("probe_key")
    },
    Some("""WITH probes AS (
           |  SELECT p_partkey AS probe_key,
           |    substr(p_name, 1, 2) || substr(p_name, 4, 1) ||
           |    substr(p_name, 3, 1) || substr(p_name, 5) AS probe_name
           |  FROM part WHERE p_partkey % 5 = 0),
           |scored AS (
           |  SELECT probe_key, p.p_partkey,
           |    CAST(floor(jaro_winkler_similarity(probe_name, p_name) * 10000
           |      + 0.5) AS BIGINT) AS score_e4
           |  FROM probes JOIN part p
           |    ON substr(probe_name, 1, 1) = substr(p_name, 1, 1)
           |    AND abs(length(p_name) - length(probe_name)) <= 1
           |  WHERE jaro_winkler_similarity(probe_name, p_name) >= 0.95),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY probe_key
           |    ORDER BY score_e4 DESC, p_partkey) AS rn
           |  FROM scored)
           |SELECT probe_key, count(*) AS n_matches,
           |  CAST(sum(score_e4) AS BIGINT) AS sum_e4,
           |  CAST(max(CASE WHEN rn = 1 THEN p_partkey END) AS BIGINT) AS best_key,
           |  CAST(max(CASE WHEN rn = 1 THEN score_e4 END) AS BIGINT) AS best_e4
           |FROM ranked GROUP BY probe_key ORDER BY probe_key""".stripMargin))

  /** Typo-tolerant matching through the native
    * [[graft.functions.DamerauLevenshtein]] expression — UNRESTRICTED
    * Damerau-Levenshtein (adjacent swap = ONE edit, transposed blocks
    * re-editable: CA→ABC costs 2), pinned against DuckDB's independent
    * `damerau_levenshtein`. The probes carry a DOUBLE transposition
    * (chars 3↔4 and 10↔11) — 2 DL edits but 4 Levenshtein edits, so a
    * `levenshtein ≤ 2` matcher (q72/q173's scorer) would MISS every
    * probe while the DL matcher recovers them; the gate's dl_self
    * column pins that separation. Blocking: first char + exact length
    * (both transposition-invariant), so candidates are Σ|block|²
    * and the O(n·m) kernel runs on pairs only, inside codegen. */
  val q247DamerauMatch = GraftQuery(
    "q247_damerau_match",
    (s, dir) => {
      val p = Tables.part(s, dir)
      val probes = p.filter(col("p_partkey") % 4 === 0)
        .select(col("p_partkey").as("probe_key"),
          concat(
            substring(col("p_name"), 1, 2),
            substring(col("p_name"), 4, 1), substring(col("p_name"), 3, 1),
            substring(col("p_name"), 5, 5),
            substring(col("p_name"), 11, 1), substring(col("p_name"), 10, 1),
            expr("substring(p_name, 12)")).as("probe_name"))
      // block on the first TWO chars (both damage transpositions start
      // at position 3, so the 2-char prefix is invariant) — an order of
      // magnitude fewer candidate pairs than single-char blocking for
      // the same recall, which is what pays for the O(n·m) kernel
      // length rides the JOIN KEY (it was a post-join filter): the
      // hash join then never materializes length-mismatched pairs at
      // all — same relation (inner equi-join ∘ filter ≡ wider equi-join)
      val scored = probes
        .withColumn("blk", substring(col("probe_name"), 1, 2))
        .withColumn("len", length(col("probe_name")))
        .join(p.withColumn("blk", substring(col("p_name"), 1, 2))
          .withColumn("len", length(col("p_name"))), Seq("blk", "len"))
        .withColumn("dl", graft.functions.DamerauLevenshtein
          .damerauLevenshtein(col("probe_name"), col("p_name")))
        .filter(col("dl") <= 2)
      val w = Window.partitionBy("probe_key")
        .orderBy(col("dl"), col("p_partkey"))
      scored
        .withColumn("rn", row_number().over(w))
        .groupBy("probe_key")
        .agg(count(lit(1)).as("n_matches"),
          sum(col("dl").cast("long")).as("dl_sum"),
          max(when(col("rn") === 1, col("p_partkey"))).cast("long")
            .as("best_key"),
          max(when(col("rn") === 1, col("dl"))).cast("long").as("best_dl"),
          max(when(col("rn") === 1 && col("p_partkey") === col("probe_key"),
            col("dl"))).cast("long").as("dl_self"))
        .orderBy("probe_key")
    },
    Some("""WITH probes AS (
           |  SELECT p_partkey AS probe_key,
           |    substr(p_name, 1, 2) ||
           |    substr(p_name, 4, 1) || substr(p_name, 3, 1) ||
           |    substr(p_name, 5, 5) ||
           |    substr(p_name, 11, 1) || substr(p_name, 10, 1) ||
           |    substr(p_name, 12) AS probe_name
           |  FROM part WHERE p_partkey % 4 = 0),
           |scored AS (
           |  SELECT probe_key, p.p_partkey,
           |    damerau_levenshtein(probe_name, p_name) AS dl
           |  FROM probes JOIN part p
           |    ON substr(probe_name, 1, 2) = substr(p_name, 1, 2)
           |    AND length(p_name) = length(probe_name)
           |  WHERE damerau_levenshtein(probe_name, p_name) <= 2),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY probe_key
           |    ORDER BY dl, p_partkey) AS rn
           |  FROM scored)
           |SELECT probe_key, count(*) AS n_matches,
           |  CAST(sum(dl) AS BIGINT) AS dl_sum,
           |  CAST(max(CASE WHEN rn = 1 THEN p_partkey END) AS BIGINT)
           |    AS best_key,
           |  CAST(max(CASE WHEN rn = 1 THEN dl END) AS BIGINT) AS best_dl,
           |  CAST(max(CASE WHEN rn = 1 AND p_partkey = probe_key THEN dl END)
           |    AS BIGINT) AS dl_self
           |FROM ranked GROUP BY probe_key ORDER BY probe_key""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q173EntityResolution, q174IntervalOverlap,
    q175PiiRedaction, q176KmeansClusters, q181SemanticDedup,
    q202BoilerplateShingles, q203DsirImportance, q208SourceOverlap,
    q225JaroWinklerMatch, q247DamerauMatch)
}
