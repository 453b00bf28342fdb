package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftQuery, Tables}
import graft.pipeline.FactBuilder

/** J2 as an interval join + event sessionization (the batch shape of
  * streaming session windows). */
object AsofSession {

  /** J2 — the as-of price lookup exactly as the fact build runs it:
    * SCD2 versions → [valid_from, valid_to) intervals (lead window),
    * probes matched by broadcast range join. The ORACLE is the
    * reference's own correlated-scalar-subquery form
    * (FactTable.sql:18-27) — DuckDB decorrelates it; Spark runs the
    * explicit interval join (SURVEY §4). Probes are lineitem rows at
    * shipdate+30d against the part's price history. */
  val q17AsofInterval = GraftQuery(
    "q17_asof_interval_join",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val versions = li.select(
          lpad(col("l_partkey").cast("string"), 6, "0").as("product_name"),
          (col("l_extendedprice") / col("l_quantity")).as("price_each"),
          col("l_shipdate").cast("date").as("order_date"))
        .groupBy("product_name", "price_each")
        .agg(min("order_date").as("last_update_date"))
      val intervals = FactBuilder.priceIntervals(versions)
      val probes = li.select(
        col("l_orderkey"), col("l_linenumber"),
        lpad(col("l_partkey").cast("string"), 6, "0").as("pn"),
        date_add(col("l_shipdate").cast("date"), 30).as("probe_date"))
      // no broadcast hint: at this shape the interval side is
      // probe-sized (one version per input row), so a shuffled hash
      // join on the name key is the plan that survives scale-up; AQE
      // still broadcasts when the build side turns out small.
      probes.join(intervals,
          probes("pn") === intervals("pi_name") and
            intervals("valid_from") <= probes("probe_date") and
            (intervals("valid_to").isNull or intervals("valid_to") > probes("probe_date")),
          "left")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("pn").as("product_name"),
          date_format(col("probe_date"), "yyyy-MM-dd").as("probe_date"),
          col("pi_price").as("asof_price"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""WITH versions AS (
           |  SELECT lpad(CAST(l_partkey AS VARCHAR), 6, '0') AS product_name,
           |         l_extendedprice / l_quantity AS price_each,
           |         min(CAST(l_shipdate AS DATE)) AS last_update_date
           |  FROM lineitem GROUP BY 1, 2),
           |probes AS (
           |  SELECT l_orderkey, l_linenumber,
           |         lpad(CAST(l_partkey AS VARCHAR), 6, '0') AS product_name,
           |         CAST(l_shipdate AS DATE) + INTERVAL 30 DAY AS probe_date
           |  FROM lineitem)
           |SELECT p.l_orderkey, p.l_linenumber, p.product_name,
           |  strftime(p.probe_date, '%Y-%m-%d') AS probe_date,
           |  (SELECT v.price_each FROM versions v
           |   WHERE v.product_name = p.product_name
           |     AND v.last_update_date <= p.probe_date
           |   ORDER BY v.last_update_date DESC, v.price_each DESC
           |   LIMIT 1) AS asof_price
           |FROM probes p
           |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** Gap-based sessionization in batch (the session_window shape):
    * lag → gap>30min flags a new session → running sum numbers the
    * session — one shuffle by user, two window passes. */
  val q19Sessionize = GraftQuery(
    "q19_sessionize_events",
    (s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sess = Tables.events(s, dir)
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull or
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .withColumn("session_seq",
          sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      sess.groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("session_value"),
          unix_timestamp(min("ts")).as("start_sec"),
          unix_timestamp(max("ts")).as("end_sec"))
        .orderBy("user_id", "session_seq")
    },
    Some("""WITH e AS (
           |  SELECT *, lag(ts) OVER (PARTITION BY user_id
           |    ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_ts
           |  FROM events),
           |f AS (
           |  SELECT *, CASE WHEN prev_ts IS NULL
           |      OR CAST(epoch(date_trunc('second', ts)) AS BIGINT)
           |       - CAST(epoch(date_trunc('second', prev_ts)) AS BIGINT) > 1800
           |      THEN 1 ELSE 0 END AS new_session
           |  FROM e),
           |g AS (
           |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
           |    ORDER BY epoch_ns(ts) // 1000, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
           |  FROM f)
           |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           |  count(*) AS n_events,
           |  round(sum(value), 2) AS session_value,
           |  CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS start_sec,
           |  CAST(epoch(date_trunc('second', max(ts))) AS BIGINT) AS end_sec
           |FROM g GROUP BY user_id, session_seq
           |ORDER BY user_id, session_seq""".stripMargin))

  /** Ordered funnel analysis (view → click-after-view →
    * purchase-after-click): each stage is a min-timestamp aggregate
    * joined against the previous stage — three grouped aggregates and
    * two equi-joins, never a per-user scan. Timestamp comparisons run
    * on microseconds to match the engine's nanos→micros read
    * truncation (the oracle truncates the same way). */
  val q79Funnel = GraftQuery(
    "q79_funnel",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
      def stage(t: String) = e.filter(col("event_type") === t)
      val v = stage("view").groupBy("user_id").agg(min("ts_us").as("v_ts"))
      val c = stage("click").join(v, "user_id")
        .filter(col("ts_us") > col("v_ts"))
        .groupBy("user_id").agg(min("ts_us").as("c_ts"))
      val p = stage("purchase").join(c, "user_id")
        .filter(col("ts_us") > col("c_ts"))
        .groupBy("user_id").agg(min("ts_us").as("p_ts"))
      val one = (df: org.apache.spark.sql.DataFrame, name: String) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
      one(v, "1_view").unionByName(one(c, "2_click_after_view"))
        .unionByName(one(p, "3_purchase_after_click"))
        .orderBy("stage")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events),
           |v AS (SELECT user_id, min(ts_us) AS v_ts FROM e
           |      WHERE event_type = 'view' GROUP BY 1),
           |c AS (SELECT e.user_id, min(ts_us) AS c_ts
           |      FROM e JOIN v USING (user_id)
           |      WHERE event_type = 'click' AND ts_us > v_ts GROUP BY 1),
           |p AS (SELECT e.user_id, min(ts_us) AS p_ts
           |      FROM e JOIN c USING (user_id)
           |      WHERE event_type = 'purchase' AND ts_us > c_ts GROUP BY 1)
           |SELECT '1_view' AS stage, count(*) AS n_users FROM v
           |UNION ALL
           |SELECT '2_click_after_view', count(*) FROM c
           |UNION ALL
           |SELECT '3_purchase_after_click', count(*) FROM p
           |ORDER BY stage""".stripMargin))

  /** Semi-structured JSON column processing: extract a typed field
    * from the props JSON string, bucket it, and aggregate — the
    * schema-on-read path every event pipeline needs. Extraction stays
    * inside the scan's codegen'd projection. */
  val q80JsonProps = GraftQuery(
    "q80_json_props",
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), col("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .withColumn("k_bucket", col("k") % 10)
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"),
          round(sum("value"), 2).as("total_value"))
        .orderBy("k_bucket"),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           |  count(*) AS n_events, count(DISTINCT user_id) AS n_users,
           |  round(sum(value), 2) AS total_value
           |FROM events
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Nearest-event as-of join (bidirectional, tolerance-bounded):
    * each click pairs with its NEAREST purchase by the same user
    * within ±30 minutes — the sensor-alignment variant of q07's
    * last-before join. Candidates come from one user-keyed equi-join
    * bounded by the tolerance; the winner per click is a
    * deterministic (diff, purchase-id) rank. */
  val q91AsofNearest = GraftQuery(
    "q91_asof_nearest",
    (s, dir) => {
      val tolUs = 30L * 60 * 1000000
      val e = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_us").as("c_ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us").as("p_ts"))
      val w = Window.partitionBy("click_id")
        .orderBy(abs(col("p_ts") - col("c_ts")).asc, col("purchase_id").asc)
      clicks.join(purchases, "user_id")
        .filter(abs(col("p_ts") - col("c_ts")) <= tolUs)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("click_id"), col("purchase_id"),
          abs(col("p_ts") - col("c_ts")).as("diff_us"))
        .orderBy("click_id")
    },
    Some("""WITH e AS (
           |  SELECT event_id, user_id, event_type,
           |    epoch_ns(ts) // 1000 AS ts_us FROM events),
           |c AS (SELECT user_id, event_id AS click_id, ts_us AS c_ts
           |      FROM e WHERE event_type = 'click'),
           |p AS (SELECT user_id, event_id AS purchase_id, ts_us AS p_ts
           |      FROM e WHERE event_type = 'purchase'),
           |cand AS (
           |  SELECT click_id, purchase_id, abs(p_ts - c_ts) AS diff_us,
           |    row_number() OVER (PARTITION BY click_id
           |                       ORDER BY abs(p_ts - c_ts), purchase_id) AS rn
           |  FROM c JOIN p USING (user_id)
           |  WHERE abs(p_ts - c_ts) <= 30 * 60 * 1000000)
           |SELECT click_id, purchase_id, CAST(diff_us AS BIGINT) AS diff_us
           |FROM cand WHERE rn = 1 ORDER BY click_id""".stripMargin))

  /** Interval-overlap join WITHOUT a nested-loop: cross-user pairs of
    * overlapping sessions, counted per day. Each session explodes to
    * its covered 1-hour grid buckets; candidates come from a bucket
    * EQUI-join (a non-equi overlap predicate alone would plan as a
    * nested-loop cartesian at scale), the exact overlap predicate is
    * the residual filter, and pairs spanning several shared buckets
    * collapse in the distinct. The standard time-grid interval-join
    * decomposition; grid width trades explode factor vs candidate
    * selectivity. Day arithmetic stays in integer epoch-days — no
    * timezone surface anywhere. */
  val q119SessionOverlap = GraftQuery(
    "q119_session_overlap",
    (s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sess = Tables.events(s, dir)
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull or
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .withColumn("session_seq",
          sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_seq")
        .agg(unix_timestamp(min("ts")).as("start_sec"),
          unix_timestamp(max("ts")).as("end_sec"))
      val bucketed = sess.select(col("user_id"), col("session_seq"),
        col("start_sec"), col("end_sec"),
        explode(sequence(floor(col("start_sec") / 3600).cast("long"),
          floor(col("end_sec") / 3600).cast("long"))).as("bucket"))
      val a = bucketed.toDF("ua", "sa", "a_start", "a_end", "bucket")
      val b = bucketed.toDF("ub", "sb", "b_start", "b_end", "bucket")
      a.join(b, Seq("bucket"))
        .filter(col("ua") < col("ub") and
          col("a_start") <= col("b_end") and col("b_start") <= col("a_end"))
        .select(col("ua"), col("sa"), col("ub"), col("sb"),
          floor(greatest(col("a_start"), col("b_start")) / 86400)
            .cast("long").as("day_idx"))
        .distinct()
        .groupBy("day_idx").agg(count(lit(1)).as("n_overlapping_pairs"))
        .orderBy("day_idx")
    },
    Some("""WITH e AS (
           |  SELECT *, lag(ts) OVER (PARTITION BY user_id
           |    ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_ts
           |  FROM events),
           |f AS (
           |  SELECT *, CASE WHEN prev_ts IS NULL
           |      OR CAST(epoch(date_trunc('second', ts)) AS BIGINT)
           |       - CAST(epoch(date_trunc('second', prev_ts)) AS BIGINT) > 1800
           |      THEN 1 ELSE 0 END AS new_session
           |  FROM e),
           |g AS (
           |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
           |    ORDER BY epoch_ns(ts) // 1000, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
           |  FROM f),
           |sess AS (
           |  SELECT user_id, session_seq,
           |    CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS start_sec,
           |    CAST(epoch(date_trunc('second', max(ts))) AS BIGINT) AS end_sec
           |  FROM g GROUP BY user_id, session_seq)
           |SELECT greatest(a.start_sec, b.start_sec) // 86400 AS day_idx,
           |  count(*) AS n_overlapping_pairs
           |FROM sess a JOIN sess b
           |  ON a.user_id < b.user_id
           |  AND a.start_sec <= b.end_sec AND b.start_sec <= a.end_sec
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Markov sequence-anomaly scoring: fit the corpus-level first-order
    * transition model P(next|prev) over event types (q136's matrix),
    * then score every USER's journey by its average negative
    * log-likelihood under that model — the sequence-mining operator
    * behind anomalous-flow / bot / fraud detection ("this user's
    * click path is unlike the population's"). Emits the top-20 most
    * anomalous users. No smoothing term is needed: every scored
    * transition occurs in the corpus that defines the model (q125's
    * argument), so the model join can never miss.
    *
    * Scale: the lead() window partitions by user_id (per-key sort,
    * session-sized partitions, no global sort); the model is the
    * |types|² matrix — broadcast, never shuffled against the event
    * stream; per-user scoring is one map-side-combined hash
    * aggregation; top-20 is a bounded-heap TakeOrderedAndProject,
    * never a global sort of the user population. The ordering key is
    * the ROUNDED score (6 dp) with a user_id tie-break, so the
    * selection boundary is deterministic across engines. */
  val q213SequenceAnomaly = GraftQuery(
    "q213_sequence_anomaly",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead("event_type", 1).over(w))
        .filter(col("to_type").isNotNull)
        .select(col("user_id"), col("event_type").as("from_type"),
          col("to_type"))
      val matrix = trans
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      val totals = matrix.groupBy("from_type").agg(sum("n").as("tot"))
      val model = matrix.join(totals, "from_type")
        .select(col("from_type"), col("to_type"),
          (col("n") / col("tot").cast("double")).as("p"))
      trans.join(broadcast(model), Seq("from_type", "to_type"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_transitions"),
          avg(-log(col("p"))).as("nll"))
        .select(col("user_id"), col("n_transitions"),
          round(col("nll"), 6).as("avg_neg_logprob"))
        .orderBy(col("avg_neg_logprob").desc, col("user_id"))
        .limit(20)
    },
    Some("""WITH seq AS (
           |  SELECT user_id, event_type AS from_type,
           |    lead(event_type) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS to_type
           |  FROM events),
           |trans AS (SELECT * FROM seq WHERE to_type IS NOT NULL),
           |matrix AS (
           |  SELECT from_type, to_type, count(*) AS n
           |  FROM trans GROUP BY 1, 2),
           |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
           |        FROM matrix GROUP BY 1),
           |model AS (
           |  SELECT m.from_type, m.to_type, m.n / CAST(x.tot AS DOUBLE) AS p
           |  FROM matrix m JOIN tot x USING (from_type))
           |SELECT t.user_id, CAST(count(*) AS BIGINT) AS n_transitions,
           |  round(avg(-ln(p)), 6) AS avg_neg_logprob
           |FROM trans t JOIN model USING (from_type, to_type)
           |GROUP BY t.user_id
           |ORDER BY avg_neg_logprob DESC, user_id
           |LIMIT 20""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q17AsofInterval, q19Sessionize, q79Funnel,
    q80JsonProps, q91AsofNearest, q119SessionOverlap, q213SequenceAnomaly)
}
