package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.{GraftQuery, Tables}

/** Post-training (RLHF/eval) data operations — the curation surface a
  * training-data engine needs AFTER pretraining corpora: functional
  * correctness estimation (pass@k), preference-strength fitting
  * (Bradley-Terry), group-relative reward normalization (the GRPO
  * advantage), and DPO pair construction. All inputs are synthesized
  * DETERMINISTICALLY from the testdata tables via the engine-wide
  * md5-integer convention, and every float that crosses an aggregation
  * boundary is quantized to integer nanos first (1e-9 — the
  * established cross-engine convention), so sums stay order-free and
  * the DuckDB oracles replay bit-for-bit.
  *
  * Scale shapes: pass@k and the GRPO advantage are one hash-aggregate
  * plus map-side arithmetic at the problem/prompt grain (both grains
  * grow with the data — no low-cardinality windows); Bradley-Terry
  * aggregates the match table distributively down to the MODEL-PAIR
  * grain (8×8 here, bounded by the model roster, never the data) and
  * iterates on that driver-sized table — the KMeans/BpeLearn pattern;
  * DPO pairing is a single per-prompt aggregation. */
object PostTraining {

  /** round-half-away-from-zero to 9 decimals — matches DuckDB round(). */
  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The engine-wide 32-bit deterministic hash: first 8 md5 hex chars
    * as a long in [0, 2^32). */
  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** PASS@K — the unbiased estimator over per-problem generation
    * outcomes: `pass@k = 1 − C(n−c, k)/C(n, k)`, computed in the
    * numerically-stable product form `1 − Π_{i<k} (n−c−i)/(n−i)`
    * (OpenAI HumanEval's formulation) entirely inside a SQL
    * `aggregate` HOF — one hash-aggregate to the problem grain, then
    * map-only arithmetic; the problem grain scales with the data.
    * Each generation's verdict is a deterministic integer-threshold
    * draw whose pass rate varies by problem difficulty class, so all
    * three k values see real spread. Estimates are quantized to
    * integer nanos BEFORE the cross-problem mean (order-free integer
    * sum; the only doubles are the per-problem product, identical
    * left-to-right in both engines, and one final division). Problems
    * with n < k are excluded per the estimator's requirement. */
  val q258PassAtK = GraftQuery(
    "q258_pass_at_k",
    (s, dir) => {
      val gens = Tables.orders(s, dir).select(
        (col("o_orderkey") % 500).as("pid"),
        h32(concat_ws("|", col("o_orderkey"), lit("g"))).as("h"))
      val problems = gens
        .withColumn("correct",
          (col("h") < lit(429496730L) + (col("pid") % 10) * 150000000L)
            .cast("long"))
        .groupBy("pid")
        .agg(count(lit(1)).as("n"), sum("correct").as("c"))
      val perK = Seq(1, 5, 10).map { k =>
        val prod = aggregate(sequence(lit(0), lit(k - 1)), lit(1.0),
          (acc, i) => acc * ((col("n") - col("c") - i).cast("double") /
            (col("n") - i).cast("double")))
        problems.filter(col("n") >= k)
          .select(lit(k).cast("long").as("k"),
            round((lit(1.0) - prod) * 1e9, 0).cast("long").as("pass9"))
      }.reduce(_ union _)
      perK.groupBy("k")
        .agg(count(lit(1)).as("n_problems"),
          sum("pass9").as("sum_pass9"))
        .withColumn("mean_pass",
          round(col("sum_pass9").cast("double") /
            col("n_problems").cast("double") / 1e9, 9))
        .orderBy("k")
    },
    Some("""WITH g AS (
           |  SELECT o_orderkey % 500 AS pid,
           |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|g'),
           |      1, 8))::BIGINT AS h
           |  FROM orders),
           |p AS (
           |  SELECT pid, count(*) AS n,
           |    sum(CASE WHEN h < 429496730 + (pid % 10) * 150000000
           |        THEN 1 ELSE 0 END) AS c
           |  FROM g GROUP BY 1),
           |ks AS (SELECT unnest([1, 5, 10]) AS k),
           |pk AS (
           |  SELECT ks.k,
           |    CAST(round((1 - list_reduce(list_transform(range(ks.k),
           |      i -> CAST(p.n - p.c - i AS DOUBLE) / CAST(p.n - i AS DOUBLE)),
           |      (a, b) -> a * b)) * 1e9) AS BIGINT) AS pass9
           |  FROM p, ks WHERE p.n >= ks.k)
           |SELECT CAST(k AS BIGINT) AS k, count(*) AS n_problems,
           |  CAST(sum(pass9) AS BIGINT) AS sum_pass9,
           |  round(CAST(sum(pass9) AS DOUBLE) / count(*) / 1e9, 9) AS mean_pass
           |FROM pk GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Shared oracle CTE chain for the Bradley-Terry fit (q259's match
    * synthesis, directed counts, and 3 MM iterations), ending at
    * `m(a, b, win_a)`, `tot(i, wins, games)`, and `p9(i, p9)` — the
    * nano-quantized final strengths. q271 builds on the same chain. */
  private val btChainSql: String =
    """e AS (
      |  SELECT user_id % 8 AS a,
      |    (user_id % 8 + 1 + event_id % 7) % 8 AS b,
      |    ('0x' || substr(md5(CAST(event_id AS VARCHAR) || '|w'),
      |      1, 8))::BIGINT AS h
      |  FROM events),
      |m AS MATERIALIZED (
      |  SELECT a, b,
      |    CASE WHEN h * (a + b + 2) < (a + 1) * 4294967296 THEN 1
      |         ELSE 0 END AS win_a
      |  FROM e),
      |dir AS MATERIALIZED (
      |  SELECT i, j, count(*) AS n, CAST(sum(wi) AS BIGINT) AS w
      |  FROM (SELECT a AS i, b AS j, win_a AS wi FROM m
      |        UNION ALL
      |        SELECT b AS i, a AS j, 1 - win_a AS wi FROM m)
      |  GROUP BY 1, 2),
      |models AS (SELECT CAST(unnest(range(8)) AS BIGINT) AS i),
      |tot AS MATERIALIZED (
      |  SELECT models.i,
      |    CAST(COALESCE(sum(dir.w), 0) AS BIGINT) AS wins,
      |    CAST(COALESCE(sum(dir.n), 0) AS BIGINT) AS games
      |  FROM models LEFT JOIN dir ON dir.i = models.i GROUP BY 1),
      |p0 AS (SELECT i, 1.0 AS p FROM models),
      |d1 AS (SELECT d.i, CAST(sum(CAST(round(1e9 * d.n /
      |    (pa.p + pb.p)) AS BIGINT)) AS BIGINT) AS d9
      |  FROM dir d JOIN p0 pa ON pa.i = d.i JOIN p0 pb ON pb.i = d.j
      |  GROUP BY 1),
      |p1 AS MATERIALIZED (SELECT t.i, round(CAST(t.wins AS DOUBLE) * 1e9 /
      |    CAST(d1.d9 AS DOUBLE), 9) AS p
      |  FROM tot t JOIN d1 ON d1.i = t.i),
      |d2 AS (SELECT d.i, CAST(sum(CAST(round(1e9 * d.n /
      |    (pa.p + pb.p)) AS BIGINT)) AS BIGINT) AS d9
      |  FROM dir d JOIN p1 pa ON pa.i = d.i JOIN p1 pb ON pb.i = d.j
      |  GROUP BY 1),
      |p2 AS MATERIALIZED (SELECT t.i, round(CAST(t.wins AS DOUBLE) * 1e9 /
      |    CAST(d2.d9 AS DOUBLE), 9) AS p
      |  FROM tot t JOIN d2 ON d2.i = t.i),
      |d3 AS (SELECT d.i, CAST(sum(CAST(round(1e9 * d.n /
      |    (pa.p + pb.p)) AS BIGINT)) AS BIGINT) AS d9
      |  FROM dir d JOIN p2 pa ON pa.i = d.i JOIN p2 pb ON pb.i = d.j
      |  GROUP BY 1),
      |p3 AS MATERIALIZED (SELECT t.i, round(CAST(t.wins AS DOUBLE) * 1e9 /
      |    CAST(d3.d9 AS DOUBLE), 9) AS p
      |  FROM tot t JOIN d3 ON d3.i = t.i),
      |p9 AS MATERIALIZED (
      |  SELECT i, CAST(round(p * 1e9) AS BIGINT) AS p9 FROM p3)"""
      .stripMargin

  /** BRADLEY-TERRY preference-strength fit via Hunter's MM algorithm:
    * matches between 8 models are synthesized with EXACT integer
    * winner draws (`h·(s_a+s_b) < s_a·2^32` — the true strengths are
    * linear, so the fit has a known shape to recover), aggregated
    * DISTRIBUTIVELY down to the model-pair grain, and the 8-row model
    * table iterates on the driver (3 MM steps):
    * `p_i ← W_i / Σ_j n_ij/(p_i+p_j)`, every per-pair term quantized
    * to integer nanos before the (then order-free) sum, each new
    * strength re-quantized to 9 decimals — the oracle replays all
    * three iterations as SQL CTEs and must agree bit-for-bit. Only
    * the roster-sized match matrix ever reaches the driver. */
  /** The distributed match synthesis + roster-sized MM fit shared by
    * q259 and q271: returns the match DataFrame (a, b, win_a), the
    * per-model win/game totals, and the final (9-decimal) strengths
    * after 3 MM iterations. Only the roster²-sized pair matrix ever
    * reaches the driver. */
  private def fitBt(s: SparkSession, dir: String)
    : (DataFrame, Map[Long, Long], Map[Long, Long], Array[Double]) = {
    val matches = Tables.events(s, dir).select(
      (col("user_id") % 8).as("a"),
      ((col("user_id") % 8 + 1 + col("event_id") % 7) % 8).as("b"),
      h32(concat_ws("|", col("event_id"), lit("w"))).as("h"))
      .withColumn("win_a",
        (col("h") * (col("a") + col("b") + 2) <
          (col("a") + 1) * lit(4294967296L)).cast("long"))
    val pairRows = matches
      .select(col("a").as("i"), col("b").as("j"), col("win_a").as("wi"))
      .union(matches.select(col("b").as("i"), col("a").as("j"),
        (lit(1L) - col("win_a")).as("wi")))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum("wi").as("w"))
      .collect()
    val nPair = pairRows.map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val winsDir = pairRows.map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val models = (0L to 7L)
    val wins = models.map(i =>
      i -> models.filter(_ != i).map(j => winsDir.getOrElse((i, j), 0L)).sum)
      .toMap
    val games = models.map(i =>
      i -> models.filter(_ != i).map(j => nPair.getOrElse((i, j), 0L)).sum)
      .toMap
    var p = models.map(_ => 1.0).toArray
    for (_ <- 1 to 3) {
      val next = models.map { i =>
        val denom9 = models.filter(_ != i).map { j =>
          val nij = nPair.getOrElse((i, j.toLong), 0L)
          math.round(1e9 * nij / (p(i.toInt) + p(j.toInt)))
        }.sum
        round9(wins(i) * 1e9 / denom9.toDouble)
      }.toArray
      p = next
    }
    (matches, wins, games, p)
  }

  val q259BradleyTerry = GraftQuery(
    "q259_bradley_terry",
    (s, dir) => {
      val (_, wins, games, p) = fitBt(s, dir)
      val p9 = p.map(x => math.round(x * 1e9))
      val s9 = p9.sum
      import s.implicits._
      (0L to 7L).map(i => (i, wins(i), games(i),
        round9(p9(i.toInt).toDouble / s9.toDouble)))
        .toDF("model", "wins", "games", "strength")
        .orderBy("model")
    },
    Some(s"""WITH $btChainSql
            |SELECT t.i AS model, t.wins, t.games,
            |  round(CAST(p9.p9 AS DOUBLE) /
            |    CAST((SELECT sum(p9) FROM p9) AS DOUBLE), 9) AS strength
            |FROM tot t JOIN p9 ON p9.i = t.i ORDER BY model""".stripMargin))

  /** GRPO-style GROUP-RELATIVE ADVANTAGE: rewards normalized within
    * each prompt group — `(r − μ_g)/σ_g` computed in the exact
    * integer form `(n·r − S)/√(n·Q − S²)` (S = Σr, Q = Σr² — no
    * intermediate float means no catastrophic cancellation and no
    * cross-engine drift; one IEEE sqrt + one division per row, both
    * bit-deterministic), with the zero-variance → 0 guard. The group
    * grain (customer here, prompt in production) grows with the data,
    * so the windows scale; advantages are quantized to integer nanos
    * before every cross-group sum. Per-priority output pins the
    * invariant Σ advantages ≈ 0 within each group (exactly 0 in
    * nanos up to per-row rounding). */
  val q260GrpoAdvantage = GraftQuery(
    "q260_grpo_advantage",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, dir).select(
        col("o_custkey").as("grp"), col("o_orderpriority").as("priority"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("r"))
      val w = Window.partitionBy("grp")
      val stats = o
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("ss", sum("r").over(w))
        .withColumn("qq", sum(col("r") * col("r")).over(w))
      val varTerm = col("n") * col("qq") - col("ss") * col("ss")
      val adv = when(varTerm <= 0, lit(0.0))
        .otherwise((col("n") * col("r") - col("ss")).cast("double") /
          sqrt(varTerm.cast("double")))
      stats.withColumn("adv9", round(adv * 1e9, 0).cast("long"))
        .groupBy("priority")
        .agg(count(lit(1)).as("n_rows"),
          sum("adv9").as("sum_adv9"),
          sum(abs(col("adv9"))).as("sum_abs_adv9"),
          min("adv9").as("min_adv9"), max("adv9").as("max_adv9"))
        .orderBy("priority")
    },
    Some("""WITH o AS (
           |  SELECT o_custkey AS grp, o_orderpriority AS priority,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS r
           |  FROM orders),
           |st AS (
           |  SELECT priority,
           |    count(*) OVER (PARTITION BY grp) AS n,
           |    CAST(sum(r) OVER (PARTITION BY grp) AS BIGINT) AS ss,
           |    CAST(sum(r * r) OVER (PARTITION BY grp) AS BIGINT) AS qq,
           |    r
           |  FROM o),
           |a AS (
           |  SELECT priority,
           |    CASE WHEN n * qq - ss * ss <= 0 THEN CAST(0 AS BIGINT)
           |         ELSE CAST(round(1e9 * CAST(n * r - ss AS DOUBLE) /
           |           sqrt(CAST(n * qq - ss * ss AS DOUBLE))) AS BIGINT)
           |    END AS adv9
           |  FROM st)
           |SELECT priority, count(*) AS n_rows,
           |  CAST(sum(adv9) AS BIGINT) AS sum_adv9,
           |  CAST(sum(abs(adv9)) AS BIGINT) AS sum_abs_adv9,
           |  min(adv9) AS min_adv9, max(adv9) AS max_adv9
           |FROM a GROUP BY 1 ORDER BY 1""".stripMargin))

  /** DPO PAIR CONSTRUCTION: per prompt group, the highest- and
    * lowest-scored candidate become (chosen, rejected); groups need
    * ≥ 2 candidates, ties break on the unique candidate id, and pairs
    * below the preference-margin floor are dropped (a near-tie carries
    * no preference signal — the standard DPO data-quality filter).
    * One per-prompt aggregation (`max_by`/`min_by` shape via struct
    * extrema — no window, no self-join); output profiles the kept
    * pairs per margin band with exact integer reward-gap mass. */
  val q261DpoPairs = GraftQuery(
    "q261_dpo_pairs",
    (s, dir) => {
      val cand = Tables.events(s, dir).select(
        col("user_id").as("grp"), col("event_id"),
        h32(concat_ws("|", col("event_id"), lit("r"))).as("score"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("vc"))
      val pairs = cand.groupBy("grp").agg(
        count(lit(1)).as("n_cand"),
        max(struct(col("score"), col("event_id"), col("vc"))).as("ch"),
        min(struct(col("score"), col("event_id"), col("vc"))).as("rj"))
        .filter(col("n_cand") >= 2)
        .select(col("grp"), col("n_cand"),
          col("ch.score").as("s_ch"), col("rj.score").as("s_rj"),
          (col("ch.vc") - col("rj.vc")).as("vc_gap"))
        .withColumn("margin",
          (col("s_ch") - col("s_rj")).cast("double") / 4294967296.0)
        .filter(col("margin") >= 0.25)
        .withColumn("band", floor(col("margin") * 20).cast("long"))
      pairs.groupBy("band").agg(
        count(lit(1)).as("n_pairs"),
        sum("n_cand").as("n_candidates"),
        sum("vc_gap").as("sum_vc_gap"),
        sum(abs(col("vc_gap"))).as("sum_abs_vc_gap"))
        .orderBy("band")
    },
    Some("""WITH cand AS (
           |  SELECT user_id AS grp, event_id,
           |    ('0x' || substr(md5(CAST(event_id AS VARCHAR) || '|r'),
           |      1, 8))::BIGINT AS score,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
           |  FROM events),
           |ranked AS (
           |  SELECT grp, score, vc,
           |    row_number() OVER (PARTITION BY grp
           |      ORDER BY score DESC, event_id DESC) AS rd,
           |    row_number() OVER (PARTITION BY grp
           |      ORDER BY score ASC, event_id ASC) AS ra,
           |    count(*) OVER (PARTITION BY grp) AS n_cand
           |  FROM cand),
           |pairs AS (
           |  SELECT c.grp, c.n_cand, c.score AS s_ch, r.score AS s_rj,
           |    c.vc - r.vc AS vc_gap,
           |    CAST(c.score - r.score AS DOUBLE) / 4294967296.0 AS margin
           |  FROM (SELECT * FROM ranked WHERE rd = 1) c
           |  JOIN (SELECT * FROM ranked WHERE ra = 1) r ON r.grp = c.grp
           |  WHERE c.n_cand >= 2),
           |kept AS (
           |  SELECT CAST(floor(margin * 20) AS BIGINT) AS band, n_cand, vc_gap
           |  FROM pairs WHERE margin >= 0.25)
           |SELECT band, count(*) AS n_pairs,
           |  CAST(sum(n_cand) AS BIGINT) AS n_candidates,
           |  CAST(sum(vc_gap) AS BIGINT) AS sum_vc_gap,
           |  CAST(sum(abs(vc_gap)) AS BIGINT) AS sum_abs_vc_gap
           |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin))

  /** COMPOSED POST-TRAINING PIPELINE: fit → audit → harvest. Stage 1
    * fits Bradley-Terry strengths (the q259 MM chain, shared code and
    * shared oracle CTEs). Stage 2 AUDITS the fit's calibration: every
    * match is scored with its fitted win probability
    * `s_a/(s_a+s_b)`, bucketed by predicted decile, and compared to
    * the observed win rate — the reliability check a preference model
    * must pass before its labels are trusted. Stage 3 HARVESTS
    * training pairs: matches whose relative strength gap is ≥ 0.2
    * carry a confident preference (the DPO-data filter), counted per
    * bucket. One distributed pass over the match table against the
    * broadcast 8-strength map; probabilities nano-quantized before
    * bucket sums. Round9Spec pins the calibration property itself
    * (observed ≈ predicted in the populated buckets). */
  val q271BtCalibrationHarvest = GraftQuery(
    "q271_bt_calibration_harvest",
    (s, dir) => {
      val (matches, _, _, p) = fitBt(s, dir)
      val pm = map_from_arrays(
        typedLit((0 until 8).map(_.toLong)), typedLit(p.toSeq))
      val pa = element_at(pm, col("a"))
      val pb = element_at(pm, col("b"))
      val scored = matches
        .withColumn("pr9",
          round(lit(1e9) * (pa / (pa + pb)), 0).cast("long"))
        .withColumn("harv",
          (abs(pa - pb) / (pa + pb) >= 0.2).cast("long"))
      scored
        .withColumn("bucket", least(col("pr9") / 100000000L, lit(9L))
          .cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_matches"),
          sum("win_a").as("n_wins_a"),
          sum("pr9").as("sum_pr9"),
          sum("harv").as("n_harvested"))
        .withColumn("mean_pred",
          round(col("sum_pr9").cast("double") /
            col("n_matches").cast("double") / 1e9, 9))
        .select("bucket", "n_matches", "n_wins_a", "sum_pr9",
          "n_harvested", "mean_pred")
        .orderBy("bucket")
    },
    Some(s"""WITH $btChainSql,
            |scored AS (
            |  SELECT m.win_a,
            |    CAST(round(1e9 * (pa.p / (pa.p + pb.p))) AS BIGINT) AS pr9,
            |    CASE WHEN abs(pa.p - pb.p) / (pa.p + pb.p) >= 0.2
            |         THEN 1 ELSE 0 END AS harv
            |  FROM m JOIN p3 pa ON pa.i = m.a JOIN p3 pb ON pb.i = m.b)
            |SELECT CAST(least(pr9 // 100000000, 9) AS BIGINT) AS bucket,
            |  count(*) AS n_matches,
            |  CAST(sum(win_a) AS BIGINT) AS n_wins_a,
            |  CAST(sum(pr9) AS BIGINT) AS sum_pr9,
            |  CAST(sum(harv) AS BIGINT) AS n_harvested,
            |  round(CAST(sum(pr9) AS DOUBLE) / count(*) / 1e9, 9) AS mean_pred
            |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin))

  /** BEST-OF-N REWARD SCALING CURVES — how much does sampling n
    * candidates and keeping the best buy? For each segment, the exact
    * expectation of the maximum of n with-replacement draws from the
    * EMPIRICAL reward distribution:
    * `E[max_n] = Σ_r x_(r) · ((r/N)ⁿ − ((r−1)/N)ⁿ)` over the sorted
    * rewards — the curve RLHF papers plot to choose n.
    *
    * The scale-relevant construction: per-SEGMENT ranks from the
    * GLOBAL two-phase [[graft.operators.GlobalRank.rowNumber]] keyed
    * (segment, reward, id), minus per-segment broadcast offsets — a
    * 5-value `Window.partitionBy(segment)` would funnel n/5 rows per
    * task (the q179 cliff); this form scales with the data. Powers
    * are computed by an identical left-associated product HOF on both
    * engines; per-rank terms quantize to nanos before the order-free
    * sums. */
  val q277BestOfN = GraftQuery(
    "q277_best_of_n",
    (s, dir) => {
      import graft.operators.GlobalRank
      val o = Tables.orders(s, dir).select(
        col("o_orderpriority").as("segment"), col("o_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      val ranked = GlobalRank.rowNumber(o, "grn",
        col("segment"), col("cents"), col("o_orderkey"))
      // per-segment rank = global rank − rows in lexically-earlier
      // segments (segment-count-sized aggregate, broadcast back)
      val counts = o.groupBy("segment").agg(count(lit(1)).as("n_seg"))
      val offsets = counts
        .withColumn("off", sum("n_seg").over(
          org.apache.spark.sql.expressions.Window.orderBy("segment")
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, -1)))
        .na.fill(0L, Seq("off"))
      val perSeg = ranked.join(broadcast(offsets), "segment")
        .withColumn("r", col("grn") - col("off"))
      val ns = Seq(1, 2, 4, 8, 16)
      ns.map { n =>
        val rOverN = col("r").cast("double") / col("n_seg").cast("double")
        val prevOverN = (col("r") - 1).cast("double") /
          col("n_seg").cast("double")
        def powN(x: org.apache.spark.sql.Column) =
          aggregate(sequence(lit(1), lit(n)), lit(1.0), (acc, _) => acc * x)
        perSeg.withColumn("t9",
          round(lit(1e9) * (col("cents").cast("double") *
            (powN(rOverN) - powN(prevOverN))), 0).cast("long"))
          .groupBy("segment")
          .agg(sum("t9").as("e9"))
          .select(col("segment"), lit(n).cast("long").as("n"),
            round(col("e9").cast("double") / 1e9 / 100.0, 4)
              .as("e_best_of_n"))
      }.reduce(_ unionAll _).orderBy("segment", "n")
    },
    Some {
      def one(n: Int): String =
        s"""SELECT segment, CAST($n AS BIGINT) AS n,
           |  round(CAST(CAST(sum(CAST(round(1e9 * (CAST(cents AS DOUBLE) *
           |    (list_reduce(list_transform(range($n),
           |       i -> CAST(r AS DOUBLE) / CAST(n_seg AS DOUBLE)),
           |       (a, b) -> a * b)
           |     - list_reduce(list_transform(range($n),
           |       i -> CAST(r - 1 AS DOUBLE) / CAST(n_seg AS DOUBLE)),
           |       (a, b) -> a * b)))) AS BIGINT)) AS BIGINT) AS DOUBLE)
           |    / 1e9 / 100.0, 4) AS e_best_of_n
           |FROM ranked GROUP BY 1""".stripMargin
      s"""WITH o AS (
         |  SELECT o_orderpriority AS segment, o_orderkey,
         |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
         |  FROM orders),
         |ranked AS MATERIALIZED (
         |  SELECT segment, cents,
         |    row_number() OVER (PARTITION BY segment
         |      ORDER BY cents, o_orderkey) AS r,
         |    count(*) OVER (PARTITION BY segment) AS n_seg
         |  FROM o)
         |SELECT * FROM (
         |  ${Seq(1, 2, 4, 8, 16).map(one).mkString("\n  UNION ALL\n  ")}
         |) ORDER BY segment, n""".stripMargin
    })

  val all: Seq[GraftQuery] =
    Seq(q258PassAtK, q259BradleyTerry, q260GrpoAdvantage, q261DpoPairs,
      q271BtCalibrationHarvest, q277BestOfN)
}
