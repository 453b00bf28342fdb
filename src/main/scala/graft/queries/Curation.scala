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

  val all: Seq[GraftQuery] = Seq(q173EntityResolution, q174IntervalOverlap,
    q175PiiRedaction, q176KmeansClusters, q181SemanticDedup)
}
