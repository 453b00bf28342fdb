package graft.queries

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** Join-type and aggregate breadth beyond the reference's own surface
  * (the reference has no full-outer or approximate aggregates —
  * SURVEY §2.4/§2.5 'not present' — but a complete engine ships
  * them). */
object Extras {

  /** FULL OUTER join: per-customer order totals vs per-user event
    * totals (key spaces overlap only partially ⇒ both null sides are
    * exercised). */
  val q18FullOuter = GraftQuery(
    "q18_full_outer_activity",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("key"))
        .agg(count(lit(1)).as("n_orders"))
      val events = Tables.events(s, dir)
        .groupBy(col("user_id").as("key"))
        .agg(count(lit(1)).as("n_events"))
      orders.join(events, Seq("key"), "full_outer")
        .select(col("key"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("key")
    },
    Some("""WITH o AS (SELECT o_custkey AS key, count(*) n_orders FROM orders GROUP BY 1),
           |e AS (SELECT user_id AS key, count(*) n_events FROM events GROUP BY 1)
           |SELECT COALESCE(o.key, e.key) AS key,
           |  COALESCE(o.n_orders, 0) AS n_orders,
           |  COALESCE(e.n_events, 0) AS n_events
           |FROM o FULL OUTER JOIN e ON o.key = e.key
           |ORDER BY key""".stripMargin))

  /** Exact distinct counting (the shuffle-heavy baseline). */
  val q33DistinctExact = GraftQuery(
    "q33_distinct_exact",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct("user_id").as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
           |  count(*) AS n_events
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Approximate distinct — the 100 TB path where an exact distinct
    * would shuffle every key. The gate path is the native KMV sketch
    * ([[graft.functions.Kmv]]): "k smallest md5 digests" is engine-
    * independent, so DuckDB recomputes the IDENTICAL estimate and the
    * query hash-matches — unlike HyperLogLog, whose registers are
    * engine-specific (Spark's `approx_count_distinct` stays available
    * as the engine-native alternate; `ExtrasSpec` bounds both sketches'
    * error against the exact count). */
  val q34DistinctApprox = GraftQuery(
    "q34_distinct_approx",
    (s, dir) => {
      val k = 64
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(graft.functions.Kmv.kmvDigests(
            md5(col("user_id").cast("string")), k).as("kmv"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"),
          round(graft.functions.Kmv.kmvEstimate(col("kmv"), k), 4)
            .as("n_users_kmv"),
          col("n_events"))
        .orderBy("event_type")
    },
    Some("""WITH d AS (SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
           |           FROM events),
           |r AS (SELECT event_type, h,
           |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
           |      FROM d),
           |g AS (SELECT event_type, count(*) AS nd,
           |        max(CASE WHEN rk = 64 THEN substr(h, 1, 12) END) AS h64
           |      FROM r GROUP BY event_type),
           |c AS (SELECT event_type, count(*) AS n_events FROM events GROUP BY 1)
           |SELECT g.event_type,
           |  round(CASE WHEN g.nd < 64 THEN CAST(g.nd AS DOUBLE)
           |        ELSE 63.0 / (CAST(concat('0x', g.h64) AS BIGINT) / power(2, 48))
           |        END, 4) AS n_users_kmv,
           |  c.n_events
           |FROM g JOIN c ON g.event_type = c.event_type
           |ORDER BY g.event_type""".stripMargin))

  /** PIVOT: order counts per market segment × priority. Spark's
    * `.pivot` with an explicit value list (never let pivot scan for
    * values at scale — that's an extra job over the full input);
    * oracle = conditional aggregation with matching column names. */
  val q35Pivot = GraftQuery(
    "q35_pivot_priority",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("1-URGENT", "urgent")
        .withColumnRenamed("2-HIGH", "high")
        .withColumnRenamed("3-MEDIUM", "medium")
        .withColumnRenamed("4-NOT SPECIFIED", "not_specified")
        .withColumnRenamed("5-LOW", "low")
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
           |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
           |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
           |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
           |  CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS not_specified,
           |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** Analytic window family the reference lacks (SURVEY §2.6 'not
    * present'): lag/lead/ntile/rank with frames over order history. */
  val q36WindowAnalytics = GraftQuery(
    "q36_window_analytics",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
          round(lead("o_totalprice", 1).over(w), 2).as("next_price"),
          ntile(4).over(w).cast("long").as("quartile"),
          row_number().over(w).cast("long").as("seq"),
          round(sum("o_totalprice").over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)), 2)
            .as("running_total"))
        .orderBy("o_custkey", "seq")
    },
    Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
           |  round(lag(o_totalprice) OVER w, 2) AS prev_price,
           |  round(lead(o_totalprice) OVER w, 2) AS next_price,
           |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           |  CAST(row_number() OVER w AS BIGINT) AS seq,
           |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           |    ORDER BY o_orderdate, o_orderkey
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
           |FROM orders
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           |ORDER BY o_custkey, seq""".stripMargin))

  /** Exact distributed percentiles (linear interpolation at p·(n−1)) —
    * Spark's `percentile` and DuckDB's `quantile_cont` share the
    * definition, so the oracle checks exact quantiles, not an
    * approximation. Shuffles once on the group key; each group's sort
    * happens inside its partition. */
  val q56Percentiles = GraftQuery(
    "q56_percentiles",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("price_p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("price_p95"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("qty_p50"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  round(quantile_cont(l_extendedprice, 0.25), 4) AS price_p25,
           |  round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50,
           |  round(quantile_cont(l_extendedprice, 0.95), 4) AS price_p95,
           |  round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
           |  count(*) AS n_rows
           |FROM lineitem
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Arbitrary GROUPING SETS (beyond q11's ROLLUP / q12's CUBE): the
    * set list ((flag,status),(status),()) is neither a rollup nor a
    * cube, so it exercises the general expand-based aggregation.
    * Summary rows are labeled by COALESCE (portable across engines,
    * no grouping_id needed — the data has no real NULL keys). */
  val q71GroupingSets = GraftQuery(
    "q71_grouping_sets",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("return_flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("line_status"),
          col("sum_qty"), col("n_rows"))
        .orderBy("return_flag", "line_status")
    },
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS return_flag,
           |  COALESCE(l_linestatus, 'ALL') AS line_status,
           |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
           |ORDER BY return_flag, line_status""".stripMargin))

  /** Fuzzy (edit-distance) matching over a value domain: part-name
    * pairs within Levenshtein distance 3. The scale design is the
    * distinct-value reduction — 2,000 part rows collapse to 64 names,
    * and the quadratic comparison runs over that (dictionary-sized,
    * broadcastable) domain with a length-difference prefilter, never
    * over the row space. The classic fuzzy-dedup shape for dimension
    * cleanup. */
  val q72FuzzyNamePairs = GraftQuery(
    "q72_fuzzy_name_pairs",
    (s, dir) => {
      val names = Tables.part(s, dir).select("p_name").distinct()
      val a = names.select(col("p_name").as("name_a"))
      val b = names.select(col("p_name").as("name_b"))
      a.join(broadcast(b),
          col("name_a") < col("name_b") and
            abs(length(col("name_a")) - length(col("name_b"))) <= 3)
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 3)
        .orderBy("name_a", "name_b")
    },
    Some("""WITH names AS (SELECT DISTINCT p_name FROM part)
           |SELECT a.p_name AS name_a, b.p_name AS name_b,
           |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
           |FROM names a JOIN names b
           |  ON a.p_name < b.p_name
           | AND abs(length(a.p_name) - length(b.p_name)) <= 3
           |WHERE levenshtein(a.p_name, b.p_name) <= 3
           |ORDER BY name_a, name_b""".stripMargin))

  /** Top-3 parts per supplier through the native [[graft.plans.TopK]]
    * operator (logical node → strategy → two-phase bounded-heap exec)
    * instead of the window-sort plan — the oracle ranks with
    * row_number, proving the custom physical operator is
    * output-identical to the SQL semantics. Revenue is an exact
    * decimal sum so ranking can't flip between engines. */
  val q73TopkPerGroup = GraftQuery(
    "q73_topk_per_group",
    (s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
      graft.plans.TopK.topKPerGroup(rev, Seq(col("l_suppkey")),
          Seq(col("rev").desc, col("l_partkey").asc), 3)
        .select(col("l_suppkey"), col("l_partkey"),
          col("rev").cast("double").as("revenue"))
        .orderBy("l_suppkey", "l_partkey")
    },
    Some("""WITH rev AS (
           |  SELECT l_suppkey, l_partkey,
           |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
           |  FROM lineitem GROUP BY 1, 2)
           |SELECT l_suppkey, l_partkey, CAST(rev AS DOUBLE) AS revenue
           |FROM (SELECT l_suppkey, l_partkey, rev,
           |        row_number() OVER (PARTITION BY l_suppkey
           |                           ORDER BY rev DESC, l_partkey) AS rn
           |      FROM rev)
           |WHERE rn <= 3
           |ORDER BY l_suppkey, l_partkey""".stripMargin))

  /** Statistical aggregates per group: Pearson correlation, sample
    * covariance/stddev, and simple linear regression (slope +
    * intercept) — the profiling pass a data-quality pipeline runs
    * before modeling. All are single-pass distributed moments
    * (map-side combined); rounding absorbs aggregation-order ulps. */
  val q75StatAggregates = GraftQuery(
    "q75_stat_aggregates",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"),
          round(stddev_samp(col("l_extendedprice")), 4).as("std_price"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           |  round(stddev_samp(l_extendedprice), 4) AS std_price,
           |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           |  count(*) AS n_rows
           |FROM lineitem
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Winsorization (outlier clipping at per-group p05/p95): exact
    * group quantiles joined back (broadcast — one row per group), then
    * a clipped mean and clip counts in one pass. The standard
    * statistical-cleaning operator; quantile interpolation is the same
    * p·(n−1) rule in both engines (see q56). */
  val q76Winsorize = GraftQuery(
    "q76_winsorize",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val bounds = li.groupBy(col("l_returnflag").as("b_flag"))
        .agg(expr("percentile(l_extendedprice, 0.05)").as("p05"),
          expr("percentile(l_extendedprice, 0.95)").as("p95"))
      li.join(broadcast(bounds), col("l_returnflag") === col("b_flag"))
        .groupBy("l_returnflag")
        .agg(
          round(avg(greatest(col("p05"), least(col("p95"), col("l_extendedprice")))), 4)
            .as("winsorized_mean"),
          round(avg("l_extendedprice"), 4).as("raw_mean"),
          sum(when(col("l_extendedprice") < col("p05"), 1L).otherwise(0L))
            .as("n_clipped_low"),
          sum(when(col("l_extendedprice") > col("p95"), 1L).otherwise(0L))
            .as("n_clipped_high"))
        .orderBy("l_returnflag")
    },
    Some("""WITH bounds AS (
           |  SELECT l_returnflag AS b_flag,
           |    quantile_cont(l_extendedprice, 0.05) AS p05,
           |    quantile_cont(l_extendedprice, 0.95) AS p95
           |  FROM lineitem GROUP BY 1)
           |SELECT l_returnflag,
           |  round(avg(greatest(p05, least(p95, l_extendedprice))), 4) AS winsorized_mean,
           |  round(avg(l_extendedprice), 4) AS raw_mean,
           |  CAST(sum(CASE WHEN l_extendedprice < p05 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_clipped_low,
           |  CAST(sum(CASE WHEN l_extendedprice > p95 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_clipped_high
           |FROM lineitem JOIN bounds ON l_returnflag = b_flag
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Order-independent table checksum per segment — the migration
    * verification tool: hash every row canonically (doubles reduced to
    * integer cents so string formatting can't diverge), fold with the
    * native rolling_hash, sum modulo a prime. Two engines that hold
    * the same rows produce the same checksum regardless of row order
    * or partitioning; one pass, map-side combined. */
  val q77TableChecksum = GraftQuery(
    "q77_table_checksum",
    (s, dir) => {
      val rowStr = concat_ws("|",
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long"), col("c_mktsegment"))
      Tables.customer(s, dir)
        .select(col("c_mktsegment"),
          (graft.functions.RollingHash.rollingHash(rowStr) % 100000007L).as("h"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"), sum("h").as("checksum"))
        .orderBy("c_mktsegment")
    },
    Some("""WITH rows_h AS (
           |  SELECT c_mktsegment,
           |    list_reduce(
           |      list_prepend(CAST(0 AS BIGINT),
           |        list_transform(generate_series(1, length(rs)),
           |          i -> CAST(unicode(substr(rs, i, 1)) AS BIGINT))),
           |      (a, c) -> (a * 31 + c) % 1000000000000037) % 100000007 AS h
           |  FROM (
           |    SELECT c_mktsegment,
           |      concat_ws('|', c_custkey, c_name, c_nationkey,
           |        CAST(round(c_acctbal * 100) AS BIGINT), c_mktsegment) AS rs
           |    FROM customer))
           |SELECT c_mktsegment, count(*) AS n_rows,
           |  CAST(sum(h) AS BIGINT) AS checksum
           |FROM rows_h GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Equal-width histogram (8 buckets over the global [min,max]) of
    * line prices — the profiling sketch. Bounds come from a one-row
    * broadcast; the bucket index is pure arithmetic, identical IEEE in
    * both engines. */
  val q78Histogram = GraftQuery(
    "q78_histogram",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val bounds = li.agg(min("l_extendedprice").as("mn"),
        max("l_extendedprice").as("mx"))
      li.crossJoin(broadcast(bounds))
        .select(least(lit(7), floor((col("l_extendedprice") - col("mn"))
            / ((col("mx") - col("mn")) / 8.0)).cast("int")).cast("long").as("bucket"),
          col("mn"), col("mx"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(first(col("mn")) + col("bucket") * (first(col("mx")) - first(col("mn"))) / 8.0, 4)
            .as("bucket_lo"))
        .select("bucket", "bucket_lo", "n")
        .orderBy("bucket")
    },
    Some("""WITH bounds AS (
           |  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
           |  FROM lineitem),
           |b AS (
           |  SELECT least(7, CAST(floor((l_extendedprice - mn) / ((mx - mn) / 8.0))
           |    AS INTEGER)) AS bucket, mn, mx
           |  FROM lineitem CROSS JOIN bounds)
           |SELECT CAST(bucket AS BIGINT) AS bucket,
           |  round(min(mn) + bucket * (min(mx) - min(mn)) / 8.0, 4) AS bucket_lo,
           |  count(*) AS n
           |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin))

  /** Distribution window functions (beyond q36's lag/lead/ntile):
    * percent_rank, cume_dist, a bounded moving average, and
    * first/last value over the frame — the analyst ranking toolkit.
    * Restricted to a probe key range to keep the gate output small. */
  val q89DistributionWindows = GraftQuery(
    "q89_distribution_windows",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          round(avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).as("mov_avg3"),
          round(first("o_totalprice").over(w), 2).as("cheapest"),
          round(max("o_totalprice").over(
            w.rowsBetween(Long.MinValue, Long.MaxValue)), 2).as("priciest"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
           |  round(percent_rank() OVER w, 6) AS pct_rank,
           |  round(cume_dist() OVER w, 6) AS cume,
           |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
           |    ORDER BY o_totalprice, o_orderkey
           |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3,
           |  round(first_value(o_totalprice) OVER w, 2) AS cheapest,
           |  round(max(o_totalprice) OVER (PARTITION BY o_custkey), 2) AS priciest
           |FROM orders
           |WHERE o_custkey < 50
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
           |ORDER BY o_custkey, o_orderkey""".stripMargin))

  /** Week-over-week retention: users active in week w who are also
    * active in week w+1. Week buckets are pure day arithmetic from a
    * fixed epoch (engine-proof — no ISO-week semantics), and the
    * retained set is one self-join of the distinct (user, week)
    * frame. */
  val q90Retention = GraftQuery(
    "q90_retention",
    (s, dir) => {
      val uw = Tables.events(s, dir)
        .select(col("user_id"),
          floor(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")) / 7)
            .cast("long").as("week"))
        .distinct()
      val nxt = uw.select(col("user_id"), (col("week") - 1).as("week"))
        .distinct()
      val retained = uw.join(nxt, Seq("user_id", "week"), "left_semi")
        .groupBy("week").agg(count(lit(1)).as("n_retained"))
      uw.groupBy("week").agg(count(lit(1)).as("n_active"))
        .join(retained, Seq("week"), "left")
        .select(col("week"),
          col("n_active"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          round(coalesce(col("n_retained"), lit(0L)).cast("double") / col("n_active"), 6)
            .as("retention"))
        .orderBy("week")
    },
    Some("""WITH uw AS (
           |  SELECT DISTINCT user_id,
           |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week
           |  FROM events),
           |nxt AS (SELECT DISTINCT user_id, week - 1 AS week FROM uw),
           |ret AS (
           |  SELECT week, count(*) AS n_retained
           |  FROM uw WHERE EXISTS (
           |    SELECT 1 FROM nxt WHERE nxt.user_id = uw.user_id AND nxt.week = uw.week)
           |  GROUP BY 1)
           |SELECT CAST(uw.week AS BIGINT) AS week, count(*) AS n_active,
           |  COALESCE(CAST(min(ret.n_retained) AS BIGINT), 0) AS n_retained,
           |  round(COALESCE(min(ret.n_retained), 0) * 1.0 / count(*), 6) AS retention
           |FROM uw LEFT JOIN ret ON ret.week = uw.week
           |GROUP BY uw.week ORDER BY week""".stripMargin))

  /** Robust dispersion per group: median absolute deviation around
    * the median — two exact-percentile passes (group medians join back
    * as a broadcast, then the deviation median), the outlier-resistant
    * alternative to q75's stddev. */
  val q96RobustStats = GraftQuery(
    "q96_robust_stats",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val med = li.groupBy(col("l_returnflag").as("m_flag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
      li.join(broadcast(med), col("l_returnflag") === col("m_flag"))
        .withColumn("adev", abs(col("l_extendedprice") - col("med")))
        .groupBy("l_returnflag")
        .agg(round(first("med"), 4).as("median_price"),
          round(expr("percentile(adev, 0.5)"), 4).as("mad"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },
    Some("""WITH med AS (
           |  SELECT l_returnflag AS m_flag,
           |    quantile_cont(l_extendedprice, 0.5) AS med
           |  FROM lineitem GROUP BY 1)
           |SELECT l_returnflag, round(min(med), 4) AS median_price,
           |  round(quantile_cont(abs(l_extendedprice - med), 0.5), 4) AS mad,
           |  count(*) AS n_rows
           |FROM lineitem JOIN med ON l_returnflag = m_flag
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Cohort analysis: users grouped by their first active week, activity
    * counted by week age — the triangular retention matrix product
    * analytics lives on. First-week cohort is one grouped min joined
    * back; buckets stay pure day arithmetic (engine-proof). */
  val q97Cohorts = GraftQuery(
    "q97_cohorts",
    (s, dir) => {
      val uw = Tables.events(s, dir)
        .select(col("user_id"),
          floor(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")) / 7)
            .cast("long").as("week"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min("week").as("cohort"))
      uw.join(cohort, "user_id")
        .groupBy(col("cohort"), (col("week") - col("cohort")).as("age"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort", "age")
    },
    Some("""WITH uw AS (
           |  SELECT DISTINCT user_id,
           |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week
           |  FROM events),
           |c AS (SELECT user_id, min(week) AS cohort FROM uw GROUP BY 1)
           |SELECT CAST(cohort AS BIGINT) AS cohort,
           |  CAST(week - cohort AS BIGINT) AS age, count(*) AS n_active
           |FROM uw JOIN c USING (user_id)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Exponentially-decayed 30-day revenue per order day (half-life
    * smoothing — the freshness-weighted KPI shape). Scale design:
    * aggregate FIRST (orders → one row per day, the big reduction),
    * then fan each day's revenue forward to its next 30 calendar days
    * with explode(sequence) and re-aggregate — a bounded 30× explode
    * on the tiny daily table and two equi-shuffles, never a range
    * join or a window over the raw fact. Weights pow(0.9, age) are
    * pure libm doubles; round(4) absorbs ulp and sum-order noise. */
  val q102DecayedRevenue = GraftQuery(
    "q102_decayed_revenue",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      val contrib = daily
        .select(col("day"), col("rev"), explode(expr("sequence(0, 29)")).as("age"))
        .select(date_add(col("day"), col("age")).as("day"),
          (col("rev").cast("double") * pow(lit(0.9), col("age"))).as("w"))
        .groupBy("day").agg(sum("w").as("decayed"))
      daily.join(contrib, "day")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("rev").cast("double"), 2).as("rev"),
          // round(…, 2), not 4: the decayed sum reaches ~1.5e8 at sf0.1,
          // where 4 decimals demands ~13 identical significant digits —
          // cross-engine summation-order drift (~1e-4 absolute) straddled
          // a rounding boundary in exactly one cell at sf0.1. Two
          // decimals keep 100× headroom over the drift.
          round(col("decayed"), 2).as("decayed_rev"))
        .orderBy("day")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day,
           |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           |  FROM orders GROUP BY 1),
           |contrib AS (
           |  SELECT day + CAST(o.g AS INTEGER) AS day,
           |    CAST(rev AS DOUBLE) * pow(0.9, o.g) AS w
           |  FROM daily, LATERAL (SELECT unnest(generate_series(0, 29)) g) o)
           |SELECT strftime(d.day, '%Y-%m-%d') AS day,
           |  round(CAST(d.rev AS DOUBLE), 2) AS rev,
           |  round(sum(c.w), 2) AS decayed_rev
           |FROM daily d JOIN contrib c ON c.day = d.day
           |GROUP BY d.day, d.rev ORDER BY d.day""".stripMargin))

  /** The KMV distinct sketch in its second, composable context: per-day
    * distinct-user estimates next to the exact count — the daily-rollup
    * shape where a 100 TB engine runs sketches INSTEAD of exact
    * distincts (bounded memory per group, mergeable partials). Same
    * engine-portable "k smallest md5 digests" estimator as q34, so the
    * DuckDB oracle reproduces the estimate bit-for-bit. */
  val q104KmvDailyUsers = GraftQuery(
    "q104_kmv_daily_users",
    (s, dir) => {
      val k = 64
      Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(graft.functions.Kmv.kmvDigests(
            md5(col("user_id").cast("string")), k).as("kmv"),
          countDistinct(col("user_id")).as("n_users_exact"),
          count(lit(1)).as("n_events"))
        .select(col("day"),
          round(graft.functions.Kmv.kmvEstimate(col("kmv"), k), 4)
            .as("n_users_kmv"),
          col("n_users_exact"), col("n_events"))
        .orderBy("day")
    },
    Some("""WITH d AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day,
           |                  md5(CAST(user_id AS VARCHAR)) AS h
           |           FROM events),
           |r AS (SELECT day, h,
           |        row_number() OVER (PARTITION BY day ORDER BY h) AS rk
           |      FROM d),
           |g AS (SELECT day, count(*) AS nd,
           |        max(CASE WHEN rk = 64 THEN substr(h, 1, 12) END) AS h64
           |      FROM r GROUP BY day),
           |c AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
           |        count(DISTINCT user_id) AS n_users_exact,
           |        count(*) AS n_events
           |      FROM events GROUP BY 1)
           |SELECT g.day,
           |  round(CASE WHEN g.nd < 64 THEN CAST(g.nd AS DOUBLE)
           |        ELSE 63.0 / (CAST(concat('0x', g.h64) AS BIGINT) / power(2, 48))
           |        END, 4) AS n_users_kmv,
           |  c.n_users_exact, c.n_events
           |FROM g JOIN c ON g.day = c.day
           |ORDER BY g.day""".stripMargin))

  /** Incremental rollup maintenance: per-segment summaries computed as
    * a MERGE of two partial summaries (history before / after a
    * cutoff) — sums add, min/max combine, and the KMV sketch merges by
    * re-sketching the union of stored digests (the k smallest of a
    * union of k-smallest sets IS the k smallest of the union). The
    * oracle aggregates the full data directly, pinning
    * merge(partial_A, partial_B) ≡ full — the invariant that lets a
    * 100 TB warehouse maintain rollups from daily deltas (and what
    * KmvDigests.merge already does inside every distributed
    * aggregation, surfaced here at the query level). */
  val q107IncrementalRollup = GraftQuery(
    "q107_incremental_rollup",
    (s, dir) => {
      val k = 64
      val joined = Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_totalprice"),
          col("o_orderdate").cast("date").as("d"), col("o_custkey"))
      def partial(half: org.apache.spark.sql.DataFrame) =
        half.groupBy("c_mktsegment").agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"),
          min(col("d")).as("first_day"), max(col("d")).as("last_day"),
          graft.functions.Kmv.kmvDigests(
            md5(col("o_custkey").cast("string")), k).as("kmv"))
      val cutoff = to_date(lit("1998-01-01"))
      val partials = partial(joined.filter(col("d") < cutoff))
        .union(partial(joined.filter(col("d") >= cutoff)))
      val scalars = partials.groupBy("c_mktsegment").agg(
        sum("n_orders").as("n_orders"), sum("revenue").as("revenue"),
        min("first_day").as("first_day"), max("last_day").as("last_day"))
      val sketches = partials
        .select(col("c_mktsegment"), explode(col("kmv")).as("digest"))
        .groupBy("c_mktsegment")
        .agg(graft.functions.Kmv.kmvDigests(col("digest"), k).as("kmv"))
      scalars.join(sketches, "c_mktsegment")
        .select(col("c_mktsegment"), col("n_orders"),
          round(col("revenue").cast("double"), 2).as("revenue"),
          date_format(col("first_day"), "yyyy-MM-dd").as("first_day"),
          date_format(col("last_day"), "yyyy-MM-dd").as("last_day"),
          round(graft.functions.Kmv.kmvEstimate(col("kmv"), k), 4)
            .as("n_custs_kmv"))
        .orderBy("c_mktsegment")
    },
    Some("""WITH j AS (
           |  SELECT c_mktsegment, o_totalprice,
           |    CAST(o_orderdate AS DATE) AS d, o_custkey
           |  FROM orders JOIN customer ON o_custkey = c_custkey),
           |dd AS (SELECT DISTINCT c_mktsegment,
           |         md5(CAST(o_custkey AS VARCHAR)) AS h FROM j),
           |r AS (SELECT c_mktsegment, h,
           |        row_number() OVER (PARTITION BY c_mktsegment ORDER BY h) AS rk
           |      FROM dd),
           |g AS (SELECT c_mktsegment, count(*) AS nd,
           |        max(CASE WHEN rk = 64 THEN substr(h, 1, 12) END) AS h64
           |      FROM r GROUP BY c_mktsegment),
           |s AS (SELECT c_mktsegment, count(*) AS n_orders,
           |        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
           |        strftime(min(d), '%Y-%m-%d') AS first_day,
           |        strftime(max(d), '%Y-%m-%d') AS last_day
           |      FROM j GROUP BY 1)
           |SELECT s.c_mktsegment, s.n_orders, s.revenue, s.first_day, s.last_day,
           |  round(CASE WHEN g.nd < 64 THEN CAST(g.nd AS DOUBLE)
           |        ELSE 63.0 / (CAST(concat('0x', g.h64) AS BIGINT) / power(2, 48))
           |        END, 4) AS n_custs_kmv
           |FROM s JOIN g ON s.c_mktsegment = g.c_mktsegment
           |ORDER BY s.c_mktsegment""".stripMargin))

  /** Table profiler (the ANALYZE-TABLE / data-quality pass): one scan
    * of orders stacked into long (column_name, value-string) form,
    * then per-column null counts, exact distinct, KMV-estimated
    * distinct, and lexicographic min/max of the string form. One
    * 5×-stack explode + one aggregation — profiling N columns costs
    * one pass, not N. Only render-stable columns are profiled
    * (integers, strings, formatted dates) so the string forms — and
    * therefore the md5-based KMV estimates — are identical in any
    * engine. */
  val q113TableProfile = GraftQuery(
    "q113_table_profile",
    (s, dir) => {
      val k = 64
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority", "o_day")
      val base = Tables.orders(s, dir).withColumn("o_day",
        date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd"))
      val stacked = base.select(explode(array(cols.map(c =>
          struct(lit(c).as("column_name"), col(c).cast("string").as("v"))): _*)).as("e"))
        .select("e.*")
      stacked.groupBy("column_name")
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col("v"))).as("n_nulls"),
          countDistinct(col("v")).as("n_distinct"),
          round(graft.functions.Kmv.kmvEstimate(
            graft.functions.Kmv.kmvDigests(md5(col("v")), k), k), 4)
            .as("n_distinct_kmv"),
          min("v").as("min_value"), max("v").as("max_value"))
        .orderBy("column_name")
    },
    Some("""WITH base AS (
           |  SELECT CAST(o_orderkey AS VARCHAR) AS c1,
           |    CAST(o_custkey AS VARCHAR) AS c2,
           |    o_orderstatus AS c3, o_orderpriority AS c4,
           |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS c5
           |  FROM orders),
           |stacked AS (
           |  SELECT 'o_orderkey' AS column_name, c1 AS v FROM base
           |  UNION ALL SELECT 'o_custkey', c2 FROM base
           |  UNION ALL SELECT 'o_orderstatus', c3 FROM base
           |  UNION ALL SELECT 'o_orderpriority', c4 FROM base
           |  UNION ALL SELECT 'o_day', c5 FROM base),
           |d AS (SELECT DISTINCT column_name, md5(v) AS h FROM stacked WHERE v IS NOT NULL),
           |r AS (SELECT column_name, h,
           |        row_number() OVER (PARTITION BY column_name ORDER BY h) AS rk
           |      FROM d),
           |g AS (SELECT column_name, count(*) AS nd,
           |        max(CASE WHEN rk = 64 THEN substr(h, 1, 12) END) AS h64
           |      FROM r GROUP BY column_name),
           |s AS (SELECT column_name, count(*) AS n_rows,
           |        count(*) - count(v) AS n_nulls,
           |        count(DISTINCT v) AS n_distinct,
           |        min(v) AS min_value, max(v) AS max_value
           |      FROM stacked GROUP BY 1)
           |SELECT s.column_name, s.n_rows, s.n_nulls, s.n_distinct,
           |  round(CASE WHEN g.nd < 64 THEN CAST(g.nd AS DOUBLE)
           |        ELSE 63.0 / (CAST(concat('0x', g.h64) AS BIGINT) / power(2, 48))
           |        END, 4) AS n_distinct_kmv,
           |  s.min_value, s.max_value
           |FROM s JOIN g USING (column_name)
           |ORDER BY s.column_name""".stripMargin))

  /** RANGE-frame rolling window: 7-calendar-day rolling revenue over
    * the (gappy) daily revenue table. Semantically distinct from a
    * ROWS frame — missing days still count toward the window span, so
    * `rangeBetween` on an integer day index is the correct rolling-
    * by-time shape (and the one a ROWS-6 frame silently gets wrong).
    * The window runs over the day-grain aggregate — bounded by the
    * calendar, never the fact table. */
  val q114RangeFrame = GraftQuery(
    "q114_range_frame",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        .withColumn("day_idx", datediff(col("day"), to_date(lit("1970-01-01"))))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("day_idx")).rangeBetween(-6, 0)
      daily
        .withColumn("rolling_7d", sum("rev").over(w))
        .withColumn("days_in_window", count(lit(1)).over(w))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("rev").cast("double"), 2).as("rev"),
          round(col("rolling_7d").cast("double"), 2).as("rolling_7d"),
          col("days_in_window"))
        .orderBy("day")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day,
           |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
           |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day_idx
           |  FROM orders GROUP BY 1, 3)
           |SELECT strftime(day, '%Y-%m-%d') AS day,
           |  round(CAST(rev AS DOUBLE), 2) AS rev,
           |  round(CAST(sum(rev) OVER w AS DOUBLE), 2) AS rolling_7d,
           |  count(*) OVER w AS days_in_window
           |FROM daily
           |WINDOW w AS (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
           |ORDER BY day""".stripMargin))

  /** Multiset (ALL) set operations — UNION ALL / INTERSECT ALL /
    * EXCEPT ALL preserve duplicate multiplicities, a different algebra
    * from q13's distinct set ops (Spark plans them as aggregate+
    * generate replication, not joins). Operands: the priority
    * multisets of even- vs odd-keyed orders. */
  val q115SetOpsAll = GraftQuery(
    "q115_set_ops_all",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val a = o.filter(col("o_orderkey") % 2 === 0).select("o_orderpriority")
      val b = o.filter(col("o_orderkey") % 2 === 1).select("o_orderpriority")
      def counted(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
          .withColumn("tag", lit(tag))
      counted(a.unionAll(b), "union_all")
        .unionByName(counted(a.intersectAll(b), "intersect_all"))
        .unionByName(counted(a.exceptAll(b), "except_all"))
        .select("tag", "o_orderpriority", "n")
        .orderBy("tag", "o_orderpriority")
    },
    Some("""WITH a AS (SELECT o_orderpriority FROM orders WHERE o_orderkey % 2 = 0),
           |b AS (SELECT o_orderpriority FROM orders WHERE o_orderkey % 2 = 1),
           |u AS (SELECT 'union_all' AS tag, o_orderpriority
           |      FROM (SELECT * FROM a UNION ALL SELECT * FROM b)),
           |i AS (SELECT 'intersect_all' AS tag, o_orderpriority
           |      FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)),
           |e AS (SELECT 'except_all' AS tag, o_orderpriority
           |      FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
           |SELECT tag, o_orderpriority, count(*) AS n
           |FROM (SELECT * FROM u UNION ALL SELECT * FROM i UNION ALL SELECT * FROM e)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Forward fill (LOCF — last observation carried forward): the day
    * spine left-joined to daily revenue, gaps taking the most recent
    * observed value via `last(..., ignoreNulls)` over an ordered
    * running frame. The time-series repair op every reporting layer
    * needs; runs on the calendar-bounded day grain. */
  val q116ForwardFill = GraftQuery(
    "q116_forward_fill",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val daily = o.groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      val spine = o.agg(min(col("o_orderdate").cast("date")).as("lo"),
          max(col("o_orderdate").cast("date")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("day").rowsBetween(Long.MinValue, 0)
      spine.join(daily, Seq("day"), "left")
        .withColumn("rev_filled", last(col("rev"), ignoreNulls = true).over(w))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("rev_filled").cast("double"), 2).as("rev_filled"),
          col("rev").isNull.cast("int").as("is_gap"))
        .orderBy("day")
    },
    Some("""WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) lo,
           |                  CAST(max(o_orderdate) AS DATE) hi FROM orders),
           |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
           |daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
           |            sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           |          FROM orders GROUP BY 1)
           |SELECT strftime(spine.day, '%Y-%m-%d') AS day,
           |  round(CAST(last_value(daily.rev IGNORE NULLS) OVER (
           |    ORDER BY spine.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |    AS DOUBLE), 2) AS rev_filled,
           |  CAST(daily.rev IS NULL AS INTEGER) AS is_gap
           |FROM spine LEFT JOIN daily ON daily.day = spine.day
           |ORDER BY day""".stripMargin))

  /** Gaps-and-islands: per-user runs of consecutive active days from
    * events (the streak/session-by-day analysis). The island id is
    * the classic day_idx − row_number constant — one distinct, one
    * pid-free-safe per-user window, two aggregations; never a
    * self-join over days. */
  val q117ActivityIslands = GraftQuery(
    "q117_activity_islands",
    (s, dir) => {
      val ud = Tables.events(s, dir)
        .select(col("user_id"),
          datediff(col("ts").cast("date"), to_date(lit("1970-01-01"))).as("day_idx"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day_idx")
      val islands = ud
        .withColumn("island", col("day_idx") - row_number().over(w))
        .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
      islands.groupBy("user_id")
        .agg(count(lit(1)).as("n_streaks"),
          max("len").as("longest_streak"),
          sum("len").as("n_active_days"))
        .orderBy("user_id")
    },
    Some("""WITH ud AS (
           |  SELECT DISTINCT user_id,
           |    CAST(ts AS DATE) - DATE '1970-01-01' AS day_idx
           |  FROM events),
           |isl AS (
           |  SELECT user_id,
           |    day_idx - row_number() OVER (PARTITION BY user_id ORDER BY day_idx)
           |      AS island
           |  FROM ud),
           |runs AS (SELECT user_id, island, count(*) AS len
           |         FROM isl GROUP BY 1, 2)
           |SELECT user_id, count(*) AS n_streaks,
           |  CAST(max(len) AS BIGINT) AS longest_streak,
           |  CAST(sum(len) AS BIGINT) AS n_active_days
           |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Sketched multi-grain rollup: KMV distinct-user estimates for
    * GROUPING SETS ((event_type), (day), ()) in ONE aggregation pass —
    * the sketch-OLAP composition a 100 TB cube runs (one Expand +
    * one shuffle produces every grain; the TypedImperativeAggregate
    * buffers merge per grain like any partial aggregate). The oracle
    * reproduces each grain's k-smallest-md5 estimate and unions the
    * three grains. */
  val q118SketchedGrains = GraftQuery(
    "q118_sketched_grains",
    (s, dir) => {
      val k = 64
      val e = Tables.events(s, dir)
        .select(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          md5(col("user_id").cast("string")).as("uh"))
      e.groupingSets(
          Seq(Seq(col("event_type")), Seq(col("day")), Seq()),
          col("event_type"), col("day"))
        .agg(graft.functions.Kmv.kmvDigests(col("uh"), k).as("kmv"),
          count(lit(1)).as("n_events"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("day"), lit("ALL")).as("day"),
          round(graft.functions.Kmv.kmvEstimate(col("kmv"), k), 4)
            .as("n_users_kmv"),
          col("n_events"))
        .orderBy("event_type", "day")
    },
    Some("""WITH e AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           |             md5(CAST(user_id AS VARCHAR)) AS uh FROM events),
           |grains AS (
           |  SELECT event_type, 'ALL' AS day, uh FROM e
           |  UNION ALL SELECT 'ALL', day, uh FROM e
           |  UNION ALL SELECT 'ALL', 'ALL', uh FROM e),
           |d AS (SELECT DISTINCT event_type, day, uh FROM grains),
           |r AS (SELECT event_type, day, uh,
           |        row_number() OVER (PARTITION BY event_type, day ORDER BY uh) AS rk
           |      FROM d),
           |g AS (SELECT event_type, day, count(*) AS nd,
           |        max(CASE WHEN rk = 64 THEN substr(uh, 1, 12) END) AS h64
           |      FROM r GROUP BY 1, 2),
           |c AS (SELECT event_type, day, count(*) AS n_events
           |      FROM grains GROUP BY 1, 2)
           |SELECT g.event_type, g.day,
           |  round(CASE WHEN g.nd < 64 THEN CAST(g.nd AS DOUBLE)
           |        ELSE 63.0 / (CAST(concat('0x', g.h64) AS BIGINT) / power(2, 48))
           |        END, 4) AS n_users_kmv,
           |  c.n_events
           |FROM g JOIN c ON g.event_type = c.event_type AND g.day = c.day
           |ORDER BY g.event_type, g.day""".stripMargin))

  /** CDC log compaction: collapse an append-only event log to the
    * latest state per key (the upsert-snapshot op every incremental
    * lakehouse pipeline runs). ONE keyed aggregation with
    * `max(struct(ts, id, …))` — the partial pass compacts each map
    * partition before the shuffle (struct buffers plan as two-phase
    * SortAggregate: per-partition sort, but the shuffle still carries
    * one row per partition × key, not the full log); a window/
    * row_number formulation (the oracle's) would instead shuffle and
    * sort the whole log.
    * Ordering ties at identical micro-timestamps break by event_id on
    * both sides (the oracle orders by micro-truncated epoch — events.ts
    * carries nanos DuckDB sees but Spark's reader truncates). */
  val q126CdcCompaction = GraftQuery(
    "q126_cdc_compaction",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          max(struct(col("ts"), col("event_id"), col("event_type"), col("value")))
            .as("last"))
        .select(col("user_id"), col("n_events"),
          unix_timestamp(col("last.ts")).as("last_ts_sec"),
          col("last.event_id").as("last_event_id"),
          col("last.event_type").as("last_event_type"),
          col("last.value").as("last_value"))
        .orderBy("user_id"),
    Some("""SELECT user_id, n_events,
           |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS last_ts_sec,
           |  event_id AS last_event_id, event_type AS last_event_type,
           |  value AS last_value
           |FROM (
           |  SELECT *,
           |    row_number() OVER (PARTITION BY user_id
           |      ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) AS rn,
           |    count(*) OVER (PARTITION BY user_id) AS n_events
           |  FROM events)
           |WHERE rn = 1 ORDER BY user_id""".stripMargin))

  /** First-touch attribution: each user's chronologically first event
    * type claims credit for that user's purchases. Two keyed
    * aggregations + one left join — no corpus-wide window. The
    * conversion funnel by acquisition channel, the marketing-analytics
    * staple. */
  val q127FirstTouch = GraftQuery(
    "q127_first_touch",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val firstTouch = ev.groupBy("user_id")
        .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("f"))
        .select(col("user_id"), col("f.event_type").as("first_touch"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("np"), sum(col("value")).as("pv"))
      firstTouch.join(purchases, Seq("user_id"), "left")
        .groupBy("first_touch")
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("np") > 0, 1L).otherwise(0L)).as("n_converted"),
          round(sum(coalesce(col("pv"), lit(0.0))), 2).as("purchase_value"),
          round(sum(when(col("np") > 0, 1.0).otherwise(0.0)) / count(lit(1)), 6)
            .as("conversion_rate"))
        .orderBy("first_touch")
    },
    Some("""WITH f AS (
           |  SELECT user_id, event_type AS first_touch FROM (
           |    SELECT user_id, event_type,
           |      row_number() OVER (PARTITION BY user_id
           |        ORDER BY epoch_ns(ts) // 1000, event_id) AS rn
           |    FROM events) WHERE rn = 1),
           |p AS (
           |  SELECT user_id, count(*) AS np, sum(value) AS pv
           |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
           |SELECT first_touch, CAST(count(*) AS BIGINT) AS n_users,
           |  CAST(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           |  round(sum(COALESCE(pv, 0)), 2) AS purchase_value,
           |  round(sum(CASE WHEN np > 0 THEN 1.0 ELSE 0.0 END) / count(*), 6)
           |    AS conversion_rate
           |FROM f LEFT JOIN p USING (user_id)
           |GROUP BY first_touch ORDER BY first_touch""".stripMargin))

  /** Declarative data-quality constraint suite (the Deequ/dbt-test
    * shape): six constraints over `orders` — completeness, uniqueness,
    * two business rules (two of which genuinely fail on this data),
    * domain membership, and referential integrity — evaluated in ONE
    * aggregation pass plus one anti-join count, then pivoted to a
    * row-per-constraint report. At 100 TB the whole suite costs one
    * scan + one broadcast-ish anti-join, not one scan per constraint. */
  val q128ConstraintCheck = GraftQuery(
    "q128_constraint_check",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val base = o.agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col("o_orderkey"))).as("null_key"),
        (count(col("o_orderkey")) - countDistinct(col("o_orderkey"))).as("dup_key"),
        sum(when(col("o_totalprice") > 100000.0, 1L).otherwise(0L)).as("price_gt_100k"),
        sum(when(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("date_ge_2000"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
          .as("bad_status"))
      val fk = o.join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("fk_orphans"))
      base.crossJoin(fk)
        .selectExpr("n AS n_rows",
          """stack(6,
            |  'orderkey_not_null', null_key,
            |  'orderkey_unique', dup_key,
            |  'totalprice_le_100k', price_gt_100k,
            |  'orderdate_before_2000', date_ge_2000,
            |  'status_in_domain', bad_status,
            |  'custkey_fk', fk_orphans) AS (check_name, n_violations)""".stripMargin)
        .select(col("check_name"), col("n_rows"), col("n_violations"),
          (col("n_violations") === 0L).cast("int").as("passed"))
        .orderBy("check_name")
    },
    Some("""WITH base AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(count(*) - count(o_orderkey) AS BIGINT) AS null_key,
           |    CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_key,
           |    CAST(sum(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS price_gt_100k,
           |    CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '2000-01-01' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS date_ge_2000,
           |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
           |      AS BIGINT) AS bad_status
           |  FROM orders),
           |fk AS (
           |  SELECT CAST(count(*) AS BIGINT) AS fk_orphans
           |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
           |  WHERE c.c_custkey IS NULL),
           |r AS (
           |  SELECT 'orderkey_not_null' AS check_name, n AS n_rows, null_key AS n_violations FROM base, fk
           |  UNION ALL SELECT 'orderkey_unique', n, dup_key FROM base, fk
           |  UNION ALL SELECT 'totalprice_le_100k', n, price_gt_100k FROM base, fk
           |  UNION ALL SELECT 'orderdate_before_2000', n, date_ge_2000 FROM base, fk
           |  UNION ALL SELECT 'status_in_domain', n, bad_status FROM base, fk
           |  UNION ALL SELECT 'custkey_fk', n, fk_orphans FROM base, fk)
           |SELECT check_name, n_rows, n_violations,
           |  CAST(n_violations = 0 AS INTEGER) AS passed
           |FROM r ORDER BY check_name""".stripMargin))

  /** PageRank (3 fixed power iterations, damping 0.85) over the
    * co-purchase graph: parts are linked when they appear in the same
    * order. The iterative-graph-analytics shape: each round is ONE
    * equi-join (ranks onto edge sources) + ONE keyed aggregation
    * (mass summed at destinations) — the same dataflow at any scale,
    * with per-order edge fanout bounded by order size (≤ a few items),
    * so edge construction is a safe self-join. Every node in the graph
    * has degree ≥ 1 (edges are symmetrized), so no dangling-mass terms.
    * Fixed iteration count keeps the result deterministic and lets the
    * oracle unroll the recursion. */
  val q129PagerankCopurchase = GraftQuery(
    "q129_pagerank_copurchase",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
      val e0 = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .distinct()
      // edges/deg feed every iteration UNPERSISTED on purpose: the
      // iterations' joins hash-partition edges identically each round,
      // so Catalyst reuses the one shuffle (ReusedExchange — pinned in
      // PlanAuditSpec) and the self-join runs once. An explicit
      // .persist() measured SLOWER (8.7 s vs 7.0 s at sf0.1): it
      // replaces free shuffle-file reuse with a cache materialization
      // pass. For iteration counts where the growing lineage would
      // out-depth shuffle reuse, checkpoint instead (see Dedup's CC).
      val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      val deg = edges.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
      // fold the source degree into the edge frame ONCE — every
      // iteration then needs a single join (ranks onto edges) instead
      // of two, and the (edges ⋈ deg) exchange is reused across all
      // three rounds
      val edgesWithDeg = edges
        .join(deg.withColumnRenamed("node", "a"), Seq("a"))
      var ranks = deg.select(col("node"), lit(1.0).as("r"))
      for (_ <- 1 to 3) {
        // round each iteration's ranks to 1e-9 (both engines, see the
        // oracle): the engines sum neighbor contributions in different
        // orders, so raw doubles drift ~1e-15 per round and COMPOUND
        // through the recursion; snapping at every boundary keeps the
        // next round's inputs bit-identical instead of letting three
        // rounds of drift gamble against the final round(…, 6) gate
        ranks = edgesWithDeg
          .join(ranks.withColumnRenamed("node", "a"), Seq("a"))
          .groupBy(col("b").as("node"))
          .agg(round(lit(0.15) + lit(0.85) * sum(col("r") / col("d")), 9).as("r"))
      }
      ranks.join(deg, Seq("node"))
        .select(col("node").as("p_partkey"), col("d").as("degree"),
          round(col("r"), 6).as("rank"))
        .orderBy("p_partkey")
    },
    Some("""WITH e0 AS (
           |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
           |  FROM lineitem x JOIN lineitem y
           |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
           |e AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
           |deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY a),
           |r0 AS (SELECT node, 1.0 AS r FROM deg),
           |r1 AS (SELECT e.b AS node, round(0.15 + 0.85 * sum(r0.r / deg.d), 9) AS r
           |       FROM e JOIN r0 ON r0.node = e.a JOIN deg ON deg.node = e.a
           |       GROUP BY e.b),
           |r2 AS (SELECT e.b AS node, round(0.15 + 0.85 * sum(r1.r / deg.d), 9) AS r
           |       FROM e JOIN r1 ON r1.node = e.a JOIN deg ON deg.node = e.a
           |       GROUP BY e.b),
           |r3 AS (SELECT e.b AS node, round(0.15 + 0.85 * sum(r2.r / deg.d), 9) AS r
           |       FROM e JOIN r2 ON r2.node = e.a JOIN deg ON deg.node = e.a
           |       GROUP BY e.b)
           |SELECT r3.node AS p_partkey, deg.d AS degree, round(r3.r, 6) AS rank
           |FROM r3 JOIN deg ON deg.node = r3.node
           |ORDER BY p_partkey""".stripMargin))

  /** Trailing-7-day distinct users from MERGED daily KMV sketches: the
    * sliding-window sketch composition (q104 builds the daily sketches;
    * this rolls them up). k-min-of-union ≡ k-min of the unioned per-day
    * k-mins, so merging day sketches loses nothing — the window never
    * touches event grain. That inversion is the 100 TB story: the RANGE
    * window runs over ≤ a-few-thousand day rows carrying O(k) digests
    * each (the single-partition day-grain window is bounded by the
    * calendar, not the data), while the exact formulation the oracle
    * runs — distinct users per 7-day span — re-scans events per day. */
  val q131RollingKmvUsers = GraftQuery(
    "q131_rolling_kmv_users",
    (s, dir) => {
      val k = 64
      val daily = Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(graft.functions.Kmv.kmvDigests(
          md5(col("user_id").cast("string")), k).as("kmv"))
        .withColumn("day_num",
          datediff(to_date(col("day")), lit("1970-01-01").cast("date")))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("day_num").rangeBetween(-6, 0)
      daily
        .withColumn("n_days", count(lit(1)).over(w))
        .withColumn("merged",
          slice(array_sort(array_distinct(flatten(collect_list(col("kmv")).over(w)))),
            1, k))
        .select(col("day"), col("n_days"),
          round(graft.functions.Kmv.kmvEstimate(col("merged"), k), 4)
            .as("users_7d_kmv"))
        .orderBy("day")
    },
    Some("""WITH days AS (
           |  SELECT DISTINCT CAST(strftime(ts, '%Y-%m-%d') AS DATE) AS d FROM events),
           |dh AS (
           |  SELECT DISTINCT CAST(strftime(ts, '%Y-%m-%d') AS DATE) AS d,
           |    md5(CAST(user_id AS VARCHAR)) AS h
           |  FROM events),
           |nd AS (
           |  SELECT a.d, CAST(count(*) AS BIGINT) AS n_days
           |  FROM days a JOIN days b ON b.d BETWEEN a.d - 6 AND a.d
           |  GROUP BY a.d),
           |uh AS (
           |  SELECT DISTINCT a.d, dh.h
           |  FROM days a JOIN dh ON dh.d BETWEEN a.d - 6 AND a.d),
           |r AS (
           |  SELECT d, h, row_number() OVER (PARTITION BY d ORDER BY h) AS rk
           |  FROM uh),
           |g AS (
           |  SELECT d, count(*) AS nk,
           |    max(CASE WHEN rk = 64 THEN substr(h, 1, 12) END) AS h64
           |  FROM r WHERE rk <= 64 GROUP BY d)
           |SELECT strftime(g.d, '%Y-%m-%d') AS day, nd.n_days,
           |  round(CASE WHEN g.nk < 64 THEN CAST(g.nk AS DOUBLE)
           |    ELSE 63.0 / (CAST(concat('0x', g.h64) AS BIGINT) / power(2, 48))
           |    END, 4) AS users_7d_kmv
           |FROM g JOIN nd ON nd.d = g.d
           |ORDER BY day""".stripMargin))

  /** KMV set-operation cardinality estimation (Beyer et al. 2007):
    * estimate |A∪B|, Jaccard, and |A∩B| for two key sets from their
    * k-minimum-value sketches ALONE — the join-size estimate a query
    * planner wants without running the join. Each side is one sketch
    * aggregation; the composition (merge k-mins, count sketch-level
    * agreement, scale) is pure array arithmetic on 2×k digests. md5
    * keys make every step engine-portable, so the oracle recomputes
    * the estimates bit-for-bit; the exact counts ride along to show
    * the error. */
  val q132KmvSetOps = GraftQuery(
    "q132_kmv_set_ops",
    (s, dir) => {
      val k = 128
      val ka = Tables.orders(s, dir)
        .agg(graft.functions.Kmv.kmvDigests(
          md5(col("o_custkey").cast("string")), k).as("ka"))
      val kb = Tables.events(s, dir)
        .agg(graft.functions.Kmv.kmvDigests(
          md5(col("user_id").cast("string")), k).as("kb"))
      // both exact counts from ONE full-outer join of the two distinct
      // key sets (marker columns survive the null-extension): |A∪B| is
      // the row count, |A∩B| the rows present on both sides — a second
      // semi-join would re-scan and re-distinct both inputs for a
      // ride-along column
      val exact = Tables.orders(s, dir)
        .select(col("o_custkey").as("key")).distinct().withColumn("in_a", lit(1))
        .join(Tables.events(s, dir)
            .select(col("user_id").as("key")).distinct().withColumn("in_b", lit(1)),
          Seq("key"), "full_outer")
        .agg(count(lit(1)).as("n_union_exact"),
          sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L)
            .otherwise(0L)).as("n_intersection_exact"))
      ka.crossJoin(kb)
        .select(col("ka"), col("kb"),
          slice(array_sort(array_distinct(concat(col("ka"), col("kb")))), 1, k)
            .as("ku"))
        .select(
          lit(k).as("k"),
          round(graft.functions.Kmv.kmvEstimate(col("ku"), k), 4).as("est_union"),
          size(array_intersect(array_intersect(col("ku"), col("ka")), col("kb")))
            .cast("long").as("n_sketch_both"),
          round(size(array_intersect(array_intersect(col("ku"), col("ka")), col("kb")))
            / size(col("ku")).cast("double"), 6).as("est_jaccard"),
          round(graft.functions.Kmv.kmvEstimate(col("ku"), k) *
            (size(array_intersect(array_intersect(col("ku"), col("ka")), col("kb")))
              / size(col("ku")).cast("double")), 4).as("est_intersection"))
        .crossJoin(exact)
    },
    Some("""WITH a AS (SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS h,
           |                  o_custkey AS key FROM orders),
           |b AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h,
           |        user_id AS key FROM events),
           |ka AS (SELECT h FROM a ORDER BY h LIMIT 128),
           |kb AS (SELECT h FROM b ORDER BY h LIMIT 128),
           |ku AS (SELECT h, row_number() OVER (ORDER BY h) AS rk
           |       FROM (SELECT h FROM ka UNION SELECT h FROM kb)
           |       ORDER BY h LIMIT 128),
           |m AS (SELECT count(*) AS nu,
           |        max(CASE WHEN rk = 128 THEN substr(h, 1, 12) END) AS h128,
           |        CAST(sum(CASE WHEN h IN (SELECT h FROM ka)
           |                       AND h IN (SELECT h FROM kb)
           |                 THEN 1 ELSE 0 END) AS BIGINT) AS nboth
           |      FROM ku),
           |est AS (SELECT
           |    CASE WHEN nu < 128 THEN CAST(nu AS DOUBLE)
           |         ELSE 127.0 / (CAST(concat('0x', h128) AS BIGINT) / power(2, 48))
           |    END AS eu,
           |    nboth, nu FROM m),
           |ex AS (SELECT CAST(count(DISTINCT key) AS BIGINT) AS n_union_exact
           |       FROM (SELECT key FROM a UNION ALL SELECT key FROM b)),
           |exi AS (SELECT CAST(count(*) AS BIGINT) AS n_intersection_exact
           |        FROM (SELECT DISTINCT o_custkey FROM orders) x
           |        JOIN (SELECT DISTINCT user_id FROM events) y
           |          ON x.o_custkey = y.user_id)
           |SELECT 128 AS k, round(eu, 4) AS est_union, nboth AS n_sketch_both,
           |  round(nboth * 1.0 / nu, 6) AS est_jaccard,
           |  round(eu * (nboth * 1.0 / nu), 4) AS est_intersection,
           |  ex.n_union_exact, exi.n_intersection_exact
           |FROM est, ex, exi""".stripMargin))

  /** The salted skew join behind the oracle gate: events (probe side,
    * hot user keys) joined to the customer dimension through
    * `SkewJoin.saltedJoin` — each hot key spread over 8 salt
    * partitions, build side replicated ×8 — then rolled up per market
    * segment. Row-identical to the plain join (the oracle runs the
    * plain join), which is the operator's whole contract; the plan
    * property (the join key is (user_id, __salt)) is spec-pinned in
    * SkewJoinSpec. */
  val q133SaltedJoin = GraftQuery(
    "q133_salted_join",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.SkewJoin.saltedJoin(
          Tables.events(s, dir), cust, Seq("user_id"), factor = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
           |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           |  round(sum(value), 2) AS total_value
           |FROM events JOIN customer ON c_custkey = user_id
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** Group-wise ordinary-least-squares: per event type, regress event
    * value on hour-of-day (slope, intercept, correlation, n) with the
    * SQL-standard regr_* / corr aggregates — one partial-aggregated
    * pass, the "fit a tiny model per group" shape feature platforms
    * run per entity at scale. Hour-of-day keeps the regressor bounded
    * so the rounded coefficients are stable across engines'
    * summation orders. */
  val q134GroupwiseRegression = GraftQuery(
    "q134_groupwise_regression",
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), col("value"),
          hour(col("ts")).cast("double").as("x"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(regr_slope(col("value"), col("x")), 6).as("slope"),
          round(regr_intercept(col("value"), col("x")), 6).as("intercept"),
          round(corr(col("value"), col("x")), 6).as("correlation"))
        .orderBy("event_type"),
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |  round(regr_slope(value, CAST(hour(ts) AS DOUBLE)), 6) AS slope,
           |  round(regr_intercept(value, CAST(hour(ts) AS DOUBLE)), 6) AS intercept,
           |  round(corr(value, CAST(hour(ts) AS DOUBLE)), 6) AS correlation
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Table diff / reconciliation: compare two versions of a table by
    * full-outer joining on the key and hashing the non-key payload —
    * the anti-entropy check a lakehouse runs between a source and its
    * replica (or before/after a backfill). The "new version" here is a
    * deterministic mutation of orders (every 13th key dropped, every
    * 7th price re-priced) so the diff has all three change classes.
    * One full-outer join on the key + md5 payload compare; at 100 TB
    * both sides shuffle once on the key and the payload comparison is
    * a fixed-width hash, not a column-by-column row compare. */
  val q135TableDiff = GraftQuery(
    "q135_table_diff",
    (s, dir) => {
      // price carried as integer cents so the payload hash and the 10%
      // re-price are pure integer arithmetic — engine-identical, no
      // float-formatting or rounding-mode dependence in the digest
      val o = Tables.orders(s, dir)
        .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
      def payload(df: org.apache.spark.sql.DataFrame) = df.select(
        col("o_orderkey").as("key"),
        md5(concat_ws("|", col("o_custkey"), col("o_orderstatus"),
          col("cents"), col("o_orderpriority"))).as("h"))
      val v1 = payload(o)
      val v2 = payload(
        o.filter(col("o_orderkey") % 13 =!= 0)
          .withColumn("cents",
            when(col("o_orderkey") % 7 === 0, expr("(cents * 11) div 10"))
              .otherwise(col("cents"))))
      v1.withColumnRenamed("h", "h1")
        .join(v2.withColumnRenamed("h", "h2"), Seq("key"), "full_outer")
        .select(when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "modified")
          .otherwise("unchanged").as("change_type"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("change_type")
    },
    Some("""WITH base AS (
           |  SELECT *, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
           |  FROM orders),
           |v1 AS (
           |  SELECT o_orderkey AS key,
           |    md5(concat_ws('|', o_custkey, o_orderstatus, cents,
           |      o_orderpriority)) AS h1
           |  FROM base),
           |v2 AS (
           |  SELECT o_orderkey AS key,
           |    md5(concat_ws('|', o_custkey, o_orderstatus,
           |      CASE WHEN o_orderkey % 7 = 0 THEN (cents * 11) // 10
           |           ELSE cents END,
           |      o_orderpriority)) AS h2
           |  FROM base WHERE o_orderkey % 13 <> 0)
           |SELECT CASE WHEN h1 IS NULL THEN 'added'
           |            WHEN h2 IS NULL THEN 'removed'
           |            WHEN h1 <> h2 THEN 'modified'
           |            ELSE 'unchanged' END AS change_type,
           |  CAST(count(*) AS BIGINT) AS n_rows
           |FROM v1 FULL OUTER JOIN v2 USING (key)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** First-order Markov transition matrix over per-user event
    * sequences: count (current → next) event-type pairs with a
    * per-user lead window (per-key sort, never a global one), then
    * normalize rows into transition probabilities with a tiny window
    * over the 5×5 type matrix. The sequence-mining primitive behind
    * next-action prediction and anomalous-flow detection. */
  val q136EventTransitions = GraftQuery(
    "q136_event_transitions",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round(col("n") / sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("prev_type")), 6))
        .orderBy("prev_type", "next_type")
    },
    Some("""WITH s AS (
           |  SELECT event_type,
           |    lead(event_type) OVER (PARTITION BY user_id
           |      ORDER BY epoch_ns(ts) // 1000, event_id) AS next_type
           |  FROM events),
           |c AS (
           |  SELECT event_type AS prev_type, next_type,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2)
           |SELECT prev_type, next_type, n,
           |  round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6) AS p
           |FROM c ORDER BY prev_type, next_type""".stripMargin))

  /** Time-weighted average (TWAP): each event's value holds until the
    * user's next event; the average weights values by how long they
    * were in force, not by how often they were sampled — the metric
    * finance/ops pipelines use when observation cadence is uneven.
    * One per-user lead window (per-key sort) + one keyed aggregation;
    * durations are integer microseconds so only the final weighted
    * mean is floating-point. */
  val q137TimeWeightedAvg = GraftQuery(
    "q137_time_weighted_avg",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("value"),
          unix_micros(col("ts")).as("tus"), col("ts"), col("event_id"))
        .withColumn("nxt", lead(col("tus"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .withColumn("dt", col("nxt") - col("tus"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dt")).as("horizon_us"),
          round(sum(col("value") * col("dt")) / sum(col("dt")), 6).as("twap"))
        .orderBy("user_id")
    },
    Some("""WITH s AS (
           |  SELECT user_id, value, epoch_ns(ts) // 1000 AS tus,
           |    lead(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
           |      ORDER BY epoch_ns(ts) // 1000, event_id) AS nxt
           |  FROM events)
           |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
           |  CAST(sum(nxt - tus) AS BIGINT) AS horizon_us,
           |  round(sum(value * (nxt - tus)) / sum(nxt - tus), 6) AS twap
           |FROM s WHERE nxt IS NOT NULL
           |GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Rolling 7-day MEDIAN of daily revenue: an ordered-set statistic
    * in a sliding window — the robust trend line a mean-based rolling
    * aggregate can't give (one whale order drags a mean for a week).
    * The window runs over the calendar-bounded day grain (like q114/
    * q131), so collecting the frame into an array is O(7) per row; the
    * lower-median convention (sorted[(n+1)/2]) avoids cross-engine
    * interpolation differences, and inputs are pre-rounded so both
    * engines sort identical doubles. */
  val q138RollingMedian = GraftQuery(
    "q138_rolling_median",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
            .cast("long").as("day_num"))
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("day_num").rangeBetween(-6, 0)
      daily
        .withColumn("n_days", count(lit(1)).over(w))
        .withColumn("med_list", collect_list(col("rev")).over(w))
        .select(col("day"), col("rev"), col("n_days"),
          expr("element_at(array_sort(med_list), CAST((size(med_list) + 1) / 2 AS INT))")
            .as("med_7d"))
        .orderBy("day")
    },
    Some("""WITH d AS (
           |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
           |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           |      AS BIGINT) AS day_num,
           |    round(sum(o_totalprice), 2) AS rev
           |  FROM orders GROUP BY 1, 2)
           |SELECT day, rev,
           |  CAST(count(*) OVER w AS BIGINT) AS n_days,
           |  list_sort(list(rev) OVER w)[(count(*) OVER w + 1) // 2] AS med_7d
           |FROM d
           |WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
           |ORDER BY day""".stripMargin))

  /** Market-basket lift between event types at user grain: for each
    * unordered type pair, lift = P(both)/(P(a)·P(b)) over the user
    * population — >1 means co-occurring users beyond chance. Baskets
    * are the distinct (user, type) pairs; the pair join fans out
    * per-user by basket size (≤5 types here; bounded by the domain,
    * not the data), then two broadcast-sized marginal joins. The
    * association-rule primitive (support/confidence/lift) behind
    * recommender baselines. */
  val q140BasketLift = GraftQuery(
    "q140_basket_lift",
    (s, dir) => {
      val baskets = Tables.events(s, dir)
        .select(col("user_id"), col("event_type")).distinct()
      val nUsers = baskets.select("user_id").distinct()
        .agg(count(lit(1)).as("n_users"))
      val marg = baskets.groupBy("event_type").agg(count(lit(1)).as("m"))
      val pairs = baskets.as("x")
        .join(baskets.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("type_a"),
          col("y.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(marg.withColumnRenamed("event_type", "type_a")
          .withColumnRenamed("m", "m_a")), Seq("type_a"))
        .join(broadcast(marg.withColumnRenamed("event_type", "type_b")
          .withColumnRenamed("m", "m_b")), Seq("type_b"))
        .crossJoin(broadcast(nUsers))
        .select(col("type_a"), col("type_b"), col("n_both"),
          round(col("n_both") / col("n_users").cast("double"), 6).as("support"),
          round((col("n_both") * col("n_users")).cast("double") /
            (col("m_a") * col("m_b")), 6).as("lift"))
        .orderBy("type_a", "type_b")
    },
    Some("""WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
           |n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM b),
           |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m FROM b
           |      GROUP BY event_type),
           |p AS (
           |  SELECT x.event_type AS type_a, y.event_type AS type_b,
           |    CAST(count(*) AS BIGINT) AS n_both
           |  FROM b x JOIN b y
           |    ON x.user_id = y.user_id AND x.event_type < y.event_type
           |  GROUP BY 1, 2)
           |SELECT type_a, type_b, n_both,
           |  round(n_both / CAST(n_users AS DOUBLE), 6) AS support,
           |  round(CAST(n_both * n_users AS DOUBLE) / (ma.m * mb.m), 6) AS lift
           |FROM p
           |JOIN m ma ON ma.event_type = type_a
           |JOIN m mb ON mb.event_type = type_b
           |CROSS JOIN n
           |ORDER BY type_a, type_b""".stripMargin))

  /** k-anonymity audit over a quasi-identifier tuple: group sizes on
    * (nation, market segment), the privacy gate run before a dataset
    * leaves the warehouse — any equivalence class smaller than k makes
    * its members re-identifiable. One aggregation for class sizes, one
    * roll-up for the report (smallest class, classes and rows below
    * k=5, at-risk share). */
  val q141KAnonymity = GraftQuery(
    "q141_k_anonymity",
    (s, dir) => {
      val k = 5
      val classes = Tables.customer(s, dir)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("class_size"))
      classes.agg(
        count(lit(1)).as("n_classes"),
        min(col("class_size")).as("k_min"),
        sum(when(col("class_size") < k, 1L).otherwise(0L)).as("classes_below_k"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("rows_at_risk"),
        round(sum(when(col("class_size") < k, col("class_size")).otherwise(0L)) /
          sum(col("class_size")).cast("double"), 6).as("at_risk_share"))
    },
    Some("""WITH c AS (
           |  SELECT c_nationkey, c_mktsegment, count(*) AS class_size
           |  FROM customer GROUP BY 1, 2)
           |SELECT CAST(count(*) AS BIGINT) AS n_classes,
           |  CAST(min(class_size) AS BIGINT) AS k_min,
           |  CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS classes_below_k,
           |  CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT)
           |    AS rows_at_risk,
           |  round(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
           |    / CAST(sum(class_size) AS DOUBLE), 6) AS at_risk_share
           |FROM c""".stripMargin))

  /** Event path mining: frequency and share of every length-3
    * event-type path walked by a user (two lead windows over the
    * per-user sequence — q136's transition matrix one order deeper).
    * The "what do users actually do in three steps" product-analytics
    * staple; path cardinality is domain³, not data-sized. */
  val q142EventTrigrams = GraftQuery(
    "q142_event_trigrams",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val tri = Tables.events(s, dir)
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .filter(col("t3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
          col("t3").as("step3"))
        .agg(count(lit(1)).as("n"))
      val total = tri.agg(sum(col("n")).as("n_total"))
      tri.crossJoin(broadcast(total))
        .select(col("step1"), col("step2"), col("step3"), col("n"),
          round(col("n") / col("n_total").cast("double"), 6).as("share"))
        .orderBy("step1", "step2", "step3")
    },
    Some("""WITH s AS (
           |  SELECT event_type AS step1,
           |    lead(event_type, 1) OVER w AS step2,
           |    lead(event_type, 2) OVER w AS step3
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id
           |    ORDER BY epoch_ns(ts) // 1000, event_id)),
           |c AS (
           |  SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
           |  FROM s WHERE step3 IS NOT NULL GROUP BY 1, 2, 3),
           |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
           |SELECT step1, step2, step3, n,
           |  round(n / CAST(n_total AS DOUBLE), 6) AS share
           |FROM c CROSS JOIN t
           |ORDER BY step1, step2, step3""".stripMargin))

  /** UNPIVOT/melt + per-metric profile: the three lineitem measures
    * melted to (metric, value) rows by a `stack` generator inside the
    * projection (no shuffle to reshape — row count ×3 but column count
    * ÷3), then one aggregation pass. The wide→long reshape every
    * metrics warehouse and feature-store export runs. */
  val q130UnpivotStats = GraftQuery(
    "q130_unpivot_stats",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .selectExpr(
          """stack(3,
            |  'extendedprice', l_extendedprice,
            |  'discount', l_discount,
            |  'quantity', l_quantity) AS (metric, value)""".stripMargin)
        .groupBy("metric")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total"),
          round(avg(col("value")), 6).as("mean"),
          round(min(col("value")), 4).as("min_value"),
          round(max(col("value")), 4).as("max_value"))
        .orderBy("metric"),
    Some("""WITH m AS (
           |  SELECT 'extendedprice' AS metric, l_extendedprice AS value FROM lineitem
           |  UNION ALL SELECT 'discount', l_discount FROM lineitem
           |  UNION ALL SELECT 'quantity', l_quantity FROM lineitem)
           |SELECT metric, CAST(count(*) AS BIGINT) AS n,
           |  round(sum(value), 2) AS total, round(avg(value), 6) AS mean,
           |  round(min(value), 4) AS min_value, round(max(value), 4) AS max_value
           |FROM m GROUP BY metric ORDER BY metric""".stripMargin))

  /** Triangle census of the co-purchase graph (parts appearing in the
    * same order) via [[graft.operators.Graph.triangleStats]] — the
    * degree-ordered wedge join whose orientation bounds every
    * out-degree at O(sqrt E) (no "last reducer" hot key; see the
    * operator's Scaladoc for the pairing-order correctness subtlety).
    * Output is one audit row: nodes, edges, wedges, triangles, global
    * clustering coefficient — all from exact integers, so the final
    * division is bit-deterministic. */
  val q143CopurchaseTriangles = GraftQuery(
    "q143_copurchase_triangles",
    (s, dir) => {
      val op = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val e = op.as("a").join(op.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("p1"), col("b.p").as("p2"))
      graft.operators.Graph.triangleStats(e, "p1", "p2")
    },
    Some("""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
           |e AS (SELECT DISTINCT a.p AS p1, b.p AS p2
           |      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
           |deg AS (SELECT p, CAST(count(*) AS BIGINT) AS d
           |        FROM (SELECT p1 AS p FROM e UNION ALL SELECT p2 FROM e)
           |        GROUP BY 1),
           |o AS (SELECT
           |    CASE WHEN (d1.d, e.p1) < (d2.d, e.p2) THEN e.p1 ELSE e.p2 END AS u,
           |    CASE WHEN (d1.d, e.p1) < (d2.d, e.p2) THEN e.p2 ELSE e.p1 END AS v,
           |    CASE WHEN (d1.d, e.p1) < (d2.d, e.p2) THEN d2.d ELSE d1.d END AS dv
           |  FROM e JOIN deg d1 ON e.p1 = d1.p JOIN deg d2 ON e.p2 = d2.p),
           |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
           |        FROM o a JOIN o b
           |          ON a.u = b.u AND (a.dv, a.v) < (b.dv, b.v)
           |        WHERE EXISTS (SELECT 1 FROM o c
           |                      WHERE c.u = a.v AND c.v = b.v)),
           |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           |         CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges
           |       FROM deg),
           |es AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
           |SELECT n_nodes, n_edges, n_wedges, n_triangles,
           |  round(3.0 * n_triangles / n_wedges, 6) AS clustering
           |FROM ns CROSS JOIN es CROSS JOIN tri""".stripMargin))

  /** Gini coefficient of customer revenue per nation — the revenue-
    * concentration audit behind "do 20% of customers drive 80% of
    * revenue". All arithmetic is exact: revenue is summed in integer
    * cents (each o_totalprice has two decimals, so round(x*100) is
    * exact per row), the rank-weighted numerator stays in BIGINT, and
    * only the final ratio is floating-point — both engines divide the
    * same exact integers, so round(..., 6) is bit-deterministic. The
    * rank window partitions by nation (per-key sort, no global one). */
  val q144RevenueGini = GraftQuery(
    "q144_revenue_gini",
    (s, dir) => {
      val rev = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("rev_cents"))
      val byNation = rev
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_custkey"), col("rev_cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("n_name").orderBy("rev_cents", "c_custkey")
      byNation.withColumn("i", row_number().over(w))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("rev_cents")).as("s"),
          sum(col("i") * col("rev_cents")).as("sr"))
        .select(col("n_name"), col("n_customers"),
          round(col("s") / lit(100.0), 2).as("total_revenue"),
          round(lit(2.0) * col("sr") / (col("n_customers") * col("s"))
            - (col("n_customers") + lit(1.0)) / col("n_customers"), 6)
            .as("gini"))
        .orderBy("n_name")
    },
    Some("""WITH rev AS (
           |  SELECT o_custkey,
           |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           |      AS rev_cents
           |  FROM orders GROUP BY 1),
           |r AS (SELECT n_name, c_custkey, rev_cents,
           |        row_number() OVER (PARTITION BY n_name
           |          ORDER BY rev_cents, c_custkey) AS i
           |      FROM rev
           |      JOIN customer ON o_custkey = c_custkey
           |      JOIN nation ON c_nationkey = n_nationkey),
           |g AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
           |        CAST(sum(rev_cents) AS BIGINT) AS s,
           |        CAST(sum(i * rev_cents) AS BIGINT) AS sr
           |      FROM r GROUP BY 1)
           |SELECT n_name, n_customers,
           |  round(s / 100.0, 2) AS total_revenue,
           |  round(2.0 * sr / (n_customers * s)
           |    - (n_customers + 1.0) / n_customers, 6) AS gini
           |FROM g ORDER BY n_name""".stripMargin))

  /** RFM segmentation: quartile-bucket every customer on Recency
    * (days since last order, vs the corpus max date), Frequency
    * (order count), and Monetary (lifetime revenue), then profile the
    * segments. A plain `ntile(4).over(Window.orderBy(..))` funnels the
    * whole customer set through ONE partition, so each quartile is
    * instead derived arithmetically from a [[GlobalRank]] two-phase
    * row_number and the broadcast total count — the ANSI ntile bucket
    * of rank i over n rows in k buckets is closed-form in integer
    * arithmetic (first n%k buckets hold n/k+1 rows). The oracle runs
    * DuckDB's REAL ntile(4), so the hash-match also proves the closed
    * form. Ranks are total orders (metric, then customer key), and
    * monetary ranks on exact integer cents — a float-sum rank would
    * let 1-ulp summation drift reorder near-ties across engines. */
  val q145RfmSegments = GraftQuery(
    "q145_rfm_segments",
    (s, dir) => {
      import graft.operators.GlobalRank
      val orders = Tables.orders(s, dir)
      val maxd = orders.agg(max(col("o_orderdate")).as("max_date"))
      val rfm = orders
        .groupBy("o_custkey")
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("f"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .as("m_cents"))
        .crossJoin(broadcast(maxd))
        .withColumn("r_days", datediff(col("max_date"), col("last_order")))
      val total = rfm.agg(count(lit(1)).as("n_total"))
      val ranked = GlobalRank.rowNumber(
        GlobalRank.rowNumber(
          GlobalRank.rowNumber(rfm,
            "r_i", col("r_days"), col("o_custkey")),
          "f_i", col("f"), col("o_custkey")),
        "m_i", col("m_cents"), col("o_custkey"))
        .crossJoin(broadcast(total))
      def quartile(i: String): org.apache.spark.sql.Column = expr(
        s"""CASE WHEN $i <= (n_total % 4) * (n_total DIV 4 + 1)
           |  THEN ($i + (n_total DIV 4)) DIV (n_total DIV 4 + 1)
           |  ELSE (n_total % 4)
           |    + ($i - (n_total % 4) * (n_total DIV 4 + 1)
           |       + (n_total DIV 4) - 1) DIV (n_total DIV 4)
           |END""".stripMargin)
      val seg = ranked
        .withColumn("r_q", quartile("r_i"))
        .withColumn("f_q", quartile("f_i"))
        .withColumn("m_q", quartile("m_i"))
      // Half-up average in EXACT integer cents — floor(s/n + 1/2) =
      // (2s+n) div 2n — then a single /100.0: a float cents-average
      // can land exactly on a .xx5 boundary (observed at sf0.001),
      // where Spark's BigDecimal round and DuckDB's multiply-round
      // disagree; a true-2-decimal value never sits on one.
      seg.groupBy("r_q", "f_q", "m_q")
        .agg(count(lit(1)).as("n_customers"),
          (expr("(2 * sum(m_cents) + count(1)) DIV (2 * count(1))")
            / lit(100.0)).as("avg_monetary"),
          round(avg(col("r_days")), 4).as("avg_recency_days"))
        .orderBy("r_q", "f_q", "m_q")
    },
    Some("""WITH rfm AS (
           |  SELECT o_custkey, max(o_orderdate) AS last_order,
           |    CAST(count(*) AS BIGINT) AS f,
           |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           |      AS m_cents
           |  FROM orders GROUP BY 1),
           |d AS (SELECT *,
           |        date_diff('day', last_order,
           |          (SELECT max(o_orderdate) FROM orders)) AS r_days
           |      FROM rfm),
           |seg AS (SELECT *,
           |    ntile(4) OVER (ORDER BY r_days, o_custkey) AS r_q,
           |    ntile(4) OVER (ORDER BY f, o_custkey) AS f_q,
           |    ntile(4) OVER (ORDER BY m_cents, o_custkey) AS m_q
           |  FROM d)
           |SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers,
           |  ((2 * sum(m_cents) + count(*)) // (2 * count(*))) / 100.0
           |    AS avg_monetary,
           |  round(avg(r_days), 4) AS avg_recency_days
           |FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))

  /** Order-vs-lines reconciliation: recompute each order's total from
    * its lineitems (extendedprice * (1-discount) * (1+tax), the TPC-H
    * charge formula) and classify every order as matching the header
    * total, mismatching, or having no lines at all — the referential
    * revenue audit every warehouse runs after a load. One keyed
    * aggregation + one left join; per-order sums are ~4 items so the
    * round(.., 2) on them has 7 orders of magnitude of headroom over
    * float drift. */
  val q146OrderReconciliation = GraftQuery(
    "q146_order_reconciliation",
    (s, dir) => {
      val lines = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(round(sum(expr(
          "l_extendedprice * (1 - l_discount) * (1 + l_tax)")), 2)
          .as("line_total"))
      Tables.orders(s, dir)
        .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_totalprice"), col("line_total"),
          when(col("line_total").isNull, "no_lines")
            .when(abs(col("o_totalprice") - col("line_total")) < 0.005,
              "match")
            .otherwise("mismatch").as("status"),
          // exact integer cents per order (both inputs are 2-decimal
          // money, so round(x*100) is drift-free), so the average
          // below is integer half-up division — a float cents-average
          // can land exactly on a .xx5 boundary where the engines'
          // round implementations disagree
          coalesce(expr(
            "CAST(round(abs(o_totalprice - line_total) * 100) AS BIGINT)"),
            lit(0L)).as("adiff_cents"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_orders"),
          (expr("(2 * sum(adiff_cents) + count(1)) DIV (2 * count(1))")
            / lit(100.0)).as("avg_abs_diff"),
          (max(col("adiff_cents")) / lit(100.0)).as("max_abs_diff"))
        .orderBy("status")
    },
    Some("""WITH ls AS (
           |  SELECT l_orderkey,
           |    round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
           |      AS line_total
           |  FROM lineitem GROUP BY 1),
           |c AS (SELECT o_totalprice, line_total,
           |        CASE WHEN line_total IS NULL THEN 'no_lines'
           |             WHEN abs(o_totalprice - line_total) < 0.005 THEN 'match'
           |             ELSE 'mismatch' END AS status,
           |        COALESCE(CAST(round(abs(o_totalprice - line_total) * 100)
           |          AS BIGINT), 0) AS adiff_cents
           |      FROM orders LEFT JOIN ls ON o_orderkey = l_orderkey)
           |SELECT status, CAST(count(*) AS BIGINT) AS n_orders,
           |  ((2 * sum(adiff_cents) + count(*)) // (2 * count(*))) / 100.0
           |    AS avg_abs_diff,
           |  max(adiff_cents) / 100.0 AS max_abs_diff
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Benford first-digit audit over order totals: observed vs
    * expected log10(1 + 1/d) share per leading digit — the classic
    * fabricated-numbers screen. The digit comes from the decimal
    * string of floor(x) (exact for both engines), NOT from
    * floor(x / 10^floor(log10 x)): float log10 of an exact power of
    * ten can land at k-epsilon, shifting the digit. Note DuckDB's
    * CAST(double AS BIGINT) rounds half-away while Spark's truncates
    * — floor() first makes them agree. The `digit >= 1` guard (both
    * sides) makes the audit input-robust: totals in [0,1) would yield
    * digit 0 and a 1/0 expected share (null under Spark's non-ANSI
    * division vs NULL-or-inf in DuckDB — a latent cross-engine
    * divergence); negative totals yield a NULL digit. Benford's law is
    * only defined on leading digits 1-9 anyway. One scan, 9-row
    * output. */
  val q147BenfordAudit = GraftQuery(
    "q147_benford_audit",
    (s, dir) => {
      val digits = Tables.orders(s, dir)
        .select(substring(floor(col("o_totalprice")).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .filter(col("digit") >= 1)
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val total = digits.agg(sum(col("n")).as("n_total"))
      digits.crossJoin(broadcast(total))
        .select(col("digit"), col("n"),
          round(col("n") / col("n_total").cast("double"), 6)
            .as("observed_share"),
          round(log10(lit(1.0) + lit(1.0) / col("digit")), 6)
            .as("expected_share"))
        .orderBy("digit")
    },
    Some("""WITH d AS (
           |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
           |    AS VARCHAR), 1, 1) AS INTEGER) AS digit
           |  FROM orders),
           |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
           |      FROM d WHERE digit >= 1 GROUP BY 1),
           |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
           |SELECT digit, n,
           |  round(n / CAST(n_total AS DOUBLE), 6) AS observed_share,
           |  round(log10(1.0 + 1.0 / digit), 6) AS expected_share
           |FROM c CROSS JOIN t ORDER BY digit""".stripMargin))

  /** Behavioral entropy: Shannon entropy of each user's event-type
    * distribution (H = ln n - sum(c*ln c)/n, computed from the exact
    * per-type counts), profiled by integer activity band. Separates
    * single-track users (H=0) from diverse ones — the engagement-
    * diversity feature behind churn and bot screens. Two keyed
    * aggregations; the activity bands are integer CASE ranges, never
    * float log2 of a count (log2(8) can evaluate below 3, moving a
    * user across bands on one engine only). */
  val q148BehaviorEntropy = GraftQuery(
    "q148_behavior_entropy",
    (s, dir) => {
      val perType = Tables.events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("c"))
      val perUser = perType.groupBy("user_id")
        .agg(sum(col("c")).as("n"),
          sum(col("c") * log(col("c"))).as("clogc"))
        .select(col("user_id"), col("n"),
          (log(col("n")) - col("clogc") / col("n")).as("h"))
      perUser
        .withColumn("band",
          when(col("n") < 4, "a_1_3")
            .when(col("n") < 16, "b_4_15")
            .when(col("n") < 64, "c_16_63")
            .otherwise("d_64_plus"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_users"),
          round(avg(col("h")), 6).as("avg_entropy"),
          round(max(col("h")), 6).as("max_entropy"),
          round(avg(col("n")), 4).as("avg_events"))
        .orderBy("band")
    },
    Some("""WITH pt AS (
           |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY 1, 2),
           |pu AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
           |         ln(sum(c)) - sum(c * ln(c)) / sum(c) AS h
           |       FROM pt GROUP BY 1),
           |b AS (SELECT *,
           |        CASE WHEN n < 4 THEN 'a_1_3'
           |             WHEN n < 16 THEN 'b_4_15'
           |             WHEN n < 64 THEN 'c_16_63'
           |             ELSE 'd_64_plus' END AS band
           |      FROM pu)
           |SELECT band, CAST(count(*) AS BIGINT) AS n_users,
           |  round(avg(h), 6) AS avg_entropy,
           |  round(max(h), 6) AS max_entropy,
           |  round(avg(n), 4) AS avg_events
           |FROM b GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Inter-order gap profile: days between each customer's
    * consecutive orders (per-key lag window, never a global sort),
    * profiled by market segment with the share of gaps over 60 days —
    * the reorder-cadence / churn-risk readout. Gaps are integer days,
    * so every aggregate but the rounded mean is exact. */
  val q149OrderGaps = GraftQuery(
    "q149_order_gaps",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val gaps = Tables.orders(s, dir)
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev_date").isNotNull)
        .withColumn("gap_days", datediff(col("o_orderdate"), col("prev_date")))
      gaps.join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_gaps"),
          round(avg(col("gap_days")), 4).as("avg_gap_days"),
          min(col("gap_days")).cast("long").as("min_gap_days"),
          max(col("gap_days")).cast("long").as("max_gap_days"),
          round(sum(when(col("gap_days") > 60, 1L).otherwise(0L))
            / count(lit(1)).cast("double"), 6).as("share_over_60d"))
        .orderBy("c_mktsegment")
    },
    Some("""WITH g AS (
           |  SELECT o_custkey,
           |    date_diff('day',
           |      lag(o_orderdate) OVER (PARTITION BY o_custkey
           |        ORDER BY o_orderdate, o_orderkey),
           |      o_orderdate) AS gap_days
           |  FROM orders),
           |j AS (SELECT c_mktsegment, gap_days
           |      FROM g JOIN customer ON o_custkey = c_custkey
           |      WHERE gap_days IS NOT NULL)
           |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
           |  round(avg(gap_days), 4) AS avg_gap_days,
           |  min(gap_days) AS min_gap_days,
           |  max(gap_days) AS max_gap_days,
           |  round(sum(CASE WHEN gap_days > 60 THEN 1 ELSE 0 END)
           |    / CAST(count(*) AS DOUBLE), 6) AS share_over_60d
           |FROM j GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Reciprocal-rank fusion (Cormack et al.): merge the by-revenue and
    * by-order-count part rankings with score = sum 1/(60+rank) — the
    * standard no-tuning way to fuse heterogeneous rankers (search
    * backends, ANN + keyword retrieval). Both global ranks come from
    * the two-phase [[GlobalRank]] (a plain row_number().over(orderBy)
    * would single-partition the corpus); the revenue key is exact
    * integer 10^-4 units (a 2-decimal price times a 2-decimal discount
    * factor has exactly 4 decimals), so rank order — and with it every
    * RRF score — is bit-identical across engines. */
  val q150RankFusion = GraftQuery(
    "q150_rank_fusion",
    (s, dir) => {
      import graft.operators.GlobalRank
      val byPart = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"))
          .as("rev_e4"),
          count(lit(1)).as("n_lines"))
      val ranked = GlobalRank.rowNumber(
        GlobalRank.rowNumber(byPart.withColumn("neg_rev", -col("rev_e4"))
            .withColumn("neg_n", -col("n_lines")),
          "rev_rank", col("neg_rev"), col("l_partkey")),
        "cnt_rank", col("neg_n"), col("l_partkey"))
      ranked
        .select(col("l_partkey"), col("rev_rank"), col("cnt_rank"),
          round(lit(1.0) / (lit(60) + col("rev_rank"))
            + lit(1.0) / (lit(60) + col("cnt_rank")), 6).as("rrf_score"))
        .orderBy(col("rrf_score").desc, col("l_partkey"))
        .limit(20)
    },
    Some("""WITH p AS (
           |  SELECT l_partkey,
           |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
           |      AS BIGINT)) AS BIGINT) AS rev_e4,
           |    CAST(count(*) AS BIGINT) AS n_lines
           |  FROM lineitem GROUP BY 1),
           |r AS (SELECT l_partkey,
           |        CAST(row_number() OVER (ORDER BY rev_e4 DESC, l_partkey)
           |          AS BIGINT) AS rev_rank,
           |        CAST(row_number() OVER (ORDER BY n_lines DESC, l_partkey)
           |          AS BIGINT) AS cnt_rank
           |      FROM p)
           |SELECT l_partkey, rev_rank, cnt_rank,
           |  round(CAST(1.0 AS DOUBLE) / (60 + rev_rank)
           |    + CAST(1.0 AS DOUBLE) / (60 + cnt_rank), 6) AS rrf_score
           |FROM r ORDER BY rrf_score DESC, l_partkey LIMIT 20""".stripMargin))

  /** Rolling z-score anomaly flags on daily revenue: each day scored
    * against the trailing 28-day window (self-excluded, so a spike
    * can't mask itself), |z| > 2 flagged — the ops-dashboard anomaly
    * staple. The window is over the day grain (calendar-bounded, like
    * q138's rolling median — a single-partition sort over O(days)
    * rows, which does not grow with the fact table). Daily revenue is
    * summed in exact integer dollars, and mean/variance come from the
    * window's exact integer (n, sum, sum-of-squares), so the z-score
    * float expression is evaluated on identical inputs by both
    * engines — bit-deterministic without any tolerance. Days with
    * under 14 trailing observations emit NULL (cold start). */
  val q151RevenueAnomalies = GraftQuery(
    "q151_revenue_anomalies",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("day"))
        .agg(sum(expr("CAST(round(o_totalprice) AS BIGINT)")).as("rev"))
        .withColumn("di", datediff(col("day"), lit("1970-01-01")))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("di").rangeBetween(-27, -1)
      daily
        .withColumn("n", count(col("rev")).over(w))
        .withColumn("sm", sum(col("rev")).over(w))
        .withColumn("ss", sum(col("rev") * col("rev")).over(w))
        .withColumn("z", when(col("n") >= 14,
          round((col("rev") - col("sm") / col("n").cast("double"))
            / sqrt((col("ss") - col("sm") * col("sm") / col("n").cast("double"))
              / (col("n") - lit(1)).cast("double")), 4)))
        .select(col("day"), col("rev"), col("n").as("n_baseline"), col("z"),
          when(col("z").isNull, lit(null).cast("int"))
            .otherwise((abs(col("z")) > 2.0).cast("int")).as("is_anomaly"))
        .orderBy("day")
    },
    Some("""WITH d AS (
           |  SELECT o_orderdate AS day,
           |    CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS rev,
           |    date_diff('day', DATE '1970-01-01',
           |      CAST(o_orderdate AS DATE)) AS di
           |  FROM orders GROUP BY 1),
           |win AS (
           |  SELECT day, rev,
           |    CAST(count(rev) OVER w AS BIGINT) AS n,
           |    CAST(sum(rev) OVER w AS BIGINT) AS sm,
           |    CAST(sum(rev * rev) OVER w AS BIGINT) AS ss
           |  FROM d
           |  WINDOW w AS (ORDER BY di
           |    RANGE BETWEEN 27 PRECEDING AND 1 PRECEDING))
           |SELECT day, rev, n AS n_baseline,
           |  CASE WHEN n >= 14 THEN
           |    round((rev - sm / CAST(n AS DOUBLE))
           |      / sqrt((ss - sm * sm / CAST(n AS DOUBLE))
           |        / CAST(n - 1 AS DOUBLE)), 4)
           |  END AS z,
           |  CASE WHEN n >= 14
           |    THEN CAST(abs(CASE WHEN n >= 14 THEN
           |      round((rev - sm / CAST(n AS DOUBLE))
           |        / sqrt((ss - sm * sm / CAST(n AS DOUBLE))
           |          / CAST(n - 1 AS DOUBLE)), 4) END) > 2.0 AS INTEGER)
           |  END AS is_anomaly
           |FROM win ORDER BY day""".stripMargin))

  /** Sliding (hopping) windows: 10-minute windows every 5 minutes —
    * each event lands in exactly size/slide = 2 windows, which Spark's
    * `window(ts, size, slide)` plans as a codegen'd explode over the
    * window instances (no self-join, no re-scan). The oracle derives
    * the same two epoch-grid window starts per event arithmetically.
    * The batch twin of q153's streamed tumbling rollup — slide < size
    * is the monitoring/rate-limiting window shape. */
  val q162SlidingWindows = GraftQuery(
    "q162_sliding_windows",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"))
        .select(unix_timestamp(col("w.start")).as("window_start_sec"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy("window_start_sec", "event_type"),
    Some("""WITH x AS (
           |  SELECT event_type, value,
           |    ((CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 300) - k.k)
           |      * 300 AS ws
           |  FROM events, LATERAL (SELECT unnest([0, 1]) k) k)
           |SELECT ws AS window_start_sec, event_type,
           |  count(*) AS n_events, round(sum(value), 2) AS total_value
           |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Semi-structured props via Spark 4's VARIANT type: `parse_json`
    * once into the binary variant encoding, then typed
    * `try_variant_get` extraction — the scale answer to per-access
    * string re-parsing (q80's `get_json_object` re-scans the JSON text
    * on every path access; variant decodes once and field access is an
    * offset lookup). Integer-exact aggregate per event type; a
    * malformed document degrades to NULL (try_ semantics), mirroring
    * the engine-wide cast-failure-routes-rows contract. */
  val q164VariantProps = GraftQuery(
    "q164_variant_props",
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          // try_parse_json: a malformed document must degrade to NULL,
          // not abort the query (plain parse_json raises)
          expr("try_variant_get(try_parse_json(props), '$.k', 'long')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null"),
          sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           |  CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
           |    IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           |    AS sum_k,
           |  min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           |  max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Linear multi-touch attribution: every purchase's value is split
    * equally across the user's PRECEDING touches (clicks + views),
    * and the per-channel credit is summed — q127's first-touch model
    * generalized to the fractional-credit shape ad/product analytics
    * actually ships. The whole computation is two running-count
    * windows (touches-so-far by type, per user ordered by event time)
    * read AT the purchase rows — no purchase×touch pair join exists
    * at any scale; cost is one per-user sort, same as sessionization.
    * Purchases with no preceding touch fall into the `direct` bucket,
    * so total credited value is conserved (= sum of purchase values,
    * asserted by the spec). */
  val q170LinearAttribution = GraftQuery(
    "q170_linear_attribution",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("prior_click",
          count(when(col("event_type") === "click", 1)).over(w))
        .withColumn("prior_view",
          count(when(col("event_type") === "view", 1)).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("n_touch", col("prior_click") + col("prior_view"))
        .agg(
          count(lit(1)).as("n_purchases"),
          sum(when(col("n_touch") === 0, 1L).otherwise(0L)).as("n_direct"),
          round(sum(when(col("n_touch") > 0,
            col("value") * col("prior_click") / col("n_touch"))
            .otherwise(lit(0.0))), 4).as("click_credit"),
          round(sum(when(col("n_touch") > 0,
            col("value") * col("prior_view") / col("n_touch"))
            .otherwise(lit(0.0))), 4).as("view_credit"),
          round(sum(when(col("n_touch") === 0, col("value"))
            .otherwise(lit(0.0))), 4).as("direct_credit"))
    },
    Some("""WITH t AS (
           |  SELECT event_type, value,
           |    count(CASE WHEN event_type = 'click' THEN 1 END) OVER w
           |      AS prior_click,
           |    count(CASE WHEN event_type = 'view' THEN 1 END) OVER w
           |      AS prior_view
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id
           |    ORDER BY epoch_ns(ts) // 1000, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
           |p AS (SELECT value, prior_click, prior_view,
           |        prior_click + prior_view AS n_touch
           |      FROM t WHERE event_type = 'purchase')
           |SELECT CAST(count(*) AS BIGINT) AS n_purchases,
           |  CAST(sum(CASE WHEN n_touch = 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_direct,
           |  round(sum(CASE WHEN n_touch > 0
           |    THEN value * prior_click / n_touch ELSE 0.0 END), 4)
           |    AS click_credit,
           |  round(sum(CASE WHEN n_touch > 0
           |    THEN value * prior_view / n_touch ELSE 0.0 END), 4)
           |    AS view_credit,
           |  round(sum(CASE WHEN n_touch = 0 THEN value ELSE 0.0 END), 4)
           |    AS direct_credit
           |FROM p""".stripMargin))

  /** l-diversity audit: within each quasi-identifier class (nation ×
    * market segment — q141's k-anonymity classes), how many DISTINCT
    * sensitive values (account-balance bands of width 1000) appear?
    * A class can be k-anonymous yet leak everything if all its rows
    * share one sensitive value — l counts the protection that k
    * misses. One groupBy with count + count-distinct; at 100 TB the
    * distinct-per-class is a two-level aggregation on (class, band),
    * never a per-class scan. */
  val q171LDiversity = GraftQuery(
    "q171_l_diversity",
    (s, dir) => {
      val lMin = 3
      val classes = Tables.customer(s, dir)
        .withColumn("band", floor(col("c_acctbal") / lit(1000.0)).cast("long"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("class_size"),
          countDistinct(col("band")).as("l"))
      classes.agg(
        count(lit(1)).as("n_classes"),
        min(col("l")).as("l_min"),
        sum(when(col("l") < lMin, 1L).otherwise(0L)).as("classes_below_l"),
        sum(when(col("l") < lMin, col("class_size")).otherwise(0L))
          .as("rows_at_risk"),
        round(sum(when(col("l") < lMin, col("class_size")).otherwise(0L)) /
          sum(col("class_size")).cast("double"), 6).as("at_risk_share"))
    },
    Some("""WITH c AS (
           |  SELECT c_nationkey, c_mktsegment, count(*) AS class_size,
           |    count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS l
           |  FROM customer GROUP BY 1, 2)
           |SELECT CAST(count(*) AS BIGINT) AS n_classes,
           |  CAST(min(l) AS BIGINT) AS l_min,
           |  CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS classes_below_l,
           |  CAST(sum(CASE WHEN l < 3 THEN class_size ELSE 0 END) AS BIGINT)
           |    AS rows_at_risk,
           |  round(sum(CASE WHEN l < 3 THEN class_size ELSE 0 END)
           |    / CAST(sum(class_size) AS DOUBLE), 6) AS at_risk_share
           |FROM c""".stripMargin))

  /** HITS hubs & authorities (Kleinberg) on the bipartite
    * customer→part purchase graph: authority(part) = Σ hub(customer)
    * over buyers, hub(customer) = Σ authority(part) over their
    * basket — two fixed rounds, each one equi-join + one keyed sum
    * (q129's PageRank dataflow on a DIRECTED bipartite graph, where
    * PageRank's symmetric formulation degenerates). Scores are
    * mean-normalized (×n/Σ) after every half-step so magnitudes stay
    * O(1) under rounding, and snapped to 1e-9 so cross-engine sum
    * order can't compound through the recursion; top-20 authorities
    * reported with rounded scores, doc-id tie-break. */
  val q172HitsAuthorities = GraftQuery(
    "q172_hits_authorities",
    (s, dir) => {
      val edges = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, dir).select("l_orderkey", "l_partkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
      def meanNorm(df: org.apache.spark.sql.DataFrame, scoreCol: String) = {
        val tot = df.agg(sum(col(scoreCol)).as("tot"), count(lit(1)).as("n"))
        df.crossJoin(broadcast(tot))
          .select(df.columns.filterNot(_ == scoreCol).map(col) :+
            round(col(scoreCol) * col("n") / col("tot"), 9).as(scoreCol): _*)
      }
      // a1: every customer starts at hub=1, so the first authority
      // pass is just the part's buyer count (mean-normalized)
      val a1 = meanNorm(edges.groupBy("p")
        .agg(count(lit(1)).cast("double").as("a")), "a")
      val h1 = meanNorm(edges.join(a1, Seq("p"))
        .groupBy("c").agg(round(sum(col("a")), 9).as("h")), "h")
      val a2 = meanNorm(edges.join(h1, Seq("c"))
        .groupBy("p").agg(round(sum(col("h")), 9).as("a")), "a")
      // orderBy+limit plans as TakeOrderedAndProject (per-partition
      // top-20 heaps merged on the driver) — the rank window then sees
      // exactly 20 rows, never a data-sized single partition
      a2.orderBy(col("a").desc, col("p").asc).limit(20)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("a").desc, col("p").asc)).cast("long"))
        .select(col("rank"), col("p").as("p_partkey"),
          round(col("a"), 6).as("authority"))
        .orderBy("rank")
    },
    Some("""WITH e AS (
           |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |a1r AS (SELECT p, CAST(count(*) AS DOUBLE) AS a FROM e GROUP BY p),
           |a1 AS (SELECT p, round(a * (SELECT count(*) FROM a1r)
           |                         / (SELECT sum(a) FROM a1r), 9) AS a
           |       FROM a1r),
           |h1r AS (SELECT c, round(sum(a), 9) AS h
           |        FROM e JOIN a1 USING (p) GROUP BY c),
           |h1 AS (SELECT c, round(h * (SELECT count(*) FROM h1r)
           |                         / (SELECT sum(h) FROM h1r), 9) AS h
           |       FROM h1r),
           |a2r AS (SELECT p, round(sum(h), 9) AS a
           |        FROM e JOIN h1 USING (c) GROUP BY p),
           |a2 AS (SELECT p, round(a * (SELECT count(*) FROM a2r)
           |                         / (SELECT sum(a) FROM a2r), 9) AS a
           |       FROM a2r)
           |SELECT rank, p AS p_partkey, round(a, 6) AS authority FROM (
           |  SELECT p, a,
           |    row_number() OVER (ORDER BY a DESC, p ASC) AS rank
           |  FROM a2)
           |WHERE rank <= 20 ORDER BY rank""".stripMargin))

  /** Multi-source BFS shortest paths (bounded depth) over the
    * co-purchase graph — the reachability/distance primitive behind
    * "products within k hops of a seed set", influence radii, and
    * taint propagation. Seeds are every 1000th part; three rounds of
    * frontier expansion assign each reached node its MINIMUM hop
    * distance (a node enters `dist` the first round it appears and is
    * anti-joined away afterwards). Emits per-distance node counts
    * with an id checksum.
    *
    * Scale: the iteration shuffles only (frontier ⋈ edges) — frontier
    * is a node set, never paths, so the working set is bounded by V
    * per round regardless of path multiplicity (the reason BFS-as-
    * joins beats the oracle's recursive-CTE walk enumeration at
    * 100 TB); edges hash-partition identically each round, so
    * Catalyst reuses the one edge-build shuffle (q129's
    * ReusedExchange pattern — an explicit persist measured slower
    * there). Depth is a constant (3), so lineage stays shallow; an
    * unbounded-diameter BFS would checkpoint per round like Dedup's
    * connected components. */
  val q215ShortestPaths = GraftQuery(
    "q215_shortest_paths",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey").cast("long").as("pk"))
      val e0 = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b"))
        .distinct()
      val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      val seeds = Tables.part(s, dir)
        .filter(col("p_partkey") % 1000 === 0)
        .select(col("p_partkey").cast("long").as("node"))
      var dist = seeds.withColumn("dist", lit(0))
      var frontier = seeds
      for (d <- 1 to 3) {
        val fresh = frontier.join(edges, col("node") === col("a"))
          .select(col("b").as("node")).distinct()
          .join(dist.select("node"), Seq("node"), "left_anti")
          .withColumn("dist", lit(d))
        dist = dist.unionAll(fresh)
        frontier = fresh.select("node")
      }
      dist.groupBy(col("dist").cast("long").as("dist"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(conv(substring(md5(col("node").cast("string")), 1, 8), 16, 10)
            .cast("long")).as("node_sum"))
        .orderBy("dist")
    },
    Some("""WITH RECURSIVE li AS (
           |  SELECT l_orderkey, CAST(l_partkey AS BIGINT) AS pk
           |  FROM lineitem GROUP BY 1, 2),
           |e0 AS (
           |  SELECT x.pk AS a, y.pk AS b
           |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
           |    AND x.pk < y.pk
           |  GROUP BY 1, 2),
           |edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
           |bfs(node, dist) AS (
           |  SELECT CAST(p_partkey AS BIGINT), 0 FROM part
           |  WHERE p_partkey % 1000 = 0
           |  UNION
           |  SELECT e.b, bfs.dist + 1
           |  FROM bfs JOIN edges e ON e.a = bfs.node
           |  WHERE bfs.dist < 3),
           |mind AS (SELECT node, min(dist) AS dist FROM bfs GROUP BY node)
           |SELECT CAST(dist AS BIGINT) AS dist, count(*) AS n_nodes,
           |  CAST(sum(('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 8))
           |    ::BIGINT) AS BIGINT) AS node_sum
           |FROM mind GROUP BY dist ORDER BY dist""".stripMargin))

  /** LINEAR-interpolation gap fill over per-series daily revenue — the
    * time-series repair q116's forward fill cannot express (carry-last
    * holds a stale level; interpolation reconstructs the trend between
    * the surrounding observations). Twelve `o_custkey % 12` series are
    * joined to their own min→max day spines; every interior gap day
    * gets `prev + (next − prev) · (day − prev_day)/(next_day −
    * prev_day)` from TWO ignoreNulls window scans (last-before /
    * first-after — each one pass, PARTITIONED by series so the sort is
    * per-group, never global); days before the first or after the last
    * observation stay NULL (extrapolation is a modeling choice, not a
    * repair). Integer cents in, one shared rounding at the end; the
    * interpolation expression is written in the same association in
    * both engines so the doubles agree bit-for-bit.
    *
    * Scale: the spine is calendar×series-bounded, the windows are
    * keyed by series — the same plan at any corpus size. */
  val q226LinearInterpolate = GraftQuery(
    "q226_linear_interpolate",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val daily = o.groupBy((col("o_custkey") % 12).as("grp"),
          col("o_orderdate").cast("date").as("day"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("rev_cents"))
      val spine = o.groupBy((col("o_custkey") % 12).as("grp"))
        .agg(min(col("o_orderdate").cast("date")).as("lo"),
          max(col("o_orderdate").cast("date")).as("hi"))
        .select(col("grp"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 day")))
            .as("day"))
      val W = org.apache.spark.sql.expressions.Window
      val wPrev = W.partitionBy("grp").orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
      val wNext = W.partitionBy("grp").orderBy("day")
        .rowsBetween(0, W.unboundedFollowing)
      val filled = spine.join(daily, Seq("grp", "day"), "left")
        .withColumn("prev_v", last(col("rev_cents"), ignoreNulls = true).over(wPrev))
        .withColumn("prev_d",
          last(when(col("rev_cents").isNotNull, col("day")), ignoreNulls = true)
            .over(wPrev))
        .withColumn("next_v", first(col("rev_cents"), ignoreNulls = true).over(wNext))
        .withColumn("next_d",
          first(when(col("rev_cents").isNotNull, col("day")), ignoreNulls = true)
            .over(wNext))
        .withColumn("interp",
          when(col("rev_cents").isNotNull, col("rev_cents").cast("double"))
            .otherwise(col("prev_v") +
              (col("next_v") - col("prev_v")) *
                datediff(col("day"), col("prev_d")) /
                datediff(col("next_d"), col("prev_d"))))
      filled.groupBy("grp")
        .agg(count(lit(1)).as("n_days"),
          sum(col("rev_cents").isNull.cast("long")).as("n_gaps"),
          sum(when(col("interp").isNull, 1L).otherwise(0L)).as("n_edge"),
          round(sum(col("interp")) / 100, 2).as("total_interp"),
          round(avg(when(col("rev_cents").isNull, col("interp"))) / 100, 2)
            .as("avg_gap_fill"))
        .orderBy("grp")
    },
    Some("""WITH daily AS (
           |  SELECT o_custkey % 12 AS grp, CAST(o_orderdate AS DATE) AS day,
           |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS rev_cents
           |  FROM orders GROUP BY 1, 2),
           |spine AS (
           |  SELECT grp, unnest(generate_series(lo, hi,
           |    INTERVAL 1 DAY))::DATE AS day
           |  FROM (SELECT o_custkey % 12 AS grp,
           |          min(CAST(o_orderdate AS DATE)) AS lo,
           |          max(CAST(o_orderdate AS DATE)) AS hi
           |        FROM orders GROUP BY 1)),
           |j AS (
           |  SELECT s.grp, s.day, d.rev_cents FROM spine s
           |  LEFT JOIN daily d ON d.grp = s.grp AND d.day = s.day),
           |anno AS (
           |  SELECT grp, day, rev_cents,
           |    last_value(rev_cents IGNORE NULLS) OVER w_prev AS prev_v,
           |    last_value(CASE WHEN rev_cents IS NOT NULL THEN day END
           |      IGNORE NULLS) OVER w_prev AS prev_d,
           |    first_value(rev_cents IGNORE NULLS) OVER w_next AS next_v,
           |    first_value(CASE WHEN rev_cents IS NOT NULL THEN day END
           |      IGNORE NULLS) OVER w_next AS next_d
           |  FROM j
           |  WINDOW w_prev AS (PARTITION BY grp ORDER BY day
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |    w_next AS (PARTITION BY grp ORDER BY day
           |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
           |interp AS (
           |  SELECT grp, day, rev_cents,
           |    CASE WHEN rev_cents IS NOT NULL THEN CAST(rev_cents AS DOUBLE)
           |      ELSE prev_v + (next_v - prev_v) *
           |        CAST(date_diff('day', prev_d, day) AS DOUBLE) /
           |        CAST(date_diff('day', prev_d, next_d) AS DOUBLE)
           |    END AS interp
           |  FROM anno)
           |SELECT grp, count(*) AS n_days,
           |  CAST(sum(CASE WHEN rev_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_gaps,
           |  CAST(sum(CASE WHEN interp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_edge,
           |  round(sum(interp) / 100, 2) AS total_interp,
           |  round(avg(CASE WHEN rev_cents IS NULL THEN interp END) / 100, 2)
           |    AS avg_gap_fill
           |FROM interp GROUP BY grp ORDER BY grp""".stripMargin))

  /** Theil-Sen robust trend estimation per series — the median of all
    * pairwise slopes, the robust counterpart of q134's OLS `regr_slope`
    * (one gross outlier day moves OLS arbitrarily but shifts a median
    * of ~3M slopes by one rank). Runs on the per-priority DAILY grain:
    * the pairwise self-join is O(days²) on a CALENDAR-bounded series
    * (~3M pairs per priority regardless of row count), never on the
    * fact grain — the inversion that keeps a pairwise estimator viable
    * at 100 TB. Slopes are integer-cents differences divided once;
    * both engines interpolate the exact median identically (type-7 /
    * avg-of-middles); the intercept is the median residual under the
    * UNROUNDED slope, so no rounded intermediate feeds later math. */
  val q231TheilSen = GraftQuery(
    "q231_theil_sen",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("priority"),
          col("o_orderdate").cast("date").as("day"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("y"))
        .withColumn("x",
          datediff(col("day"), lit("1995-01-01").cast("date")).cast("long"))
      val slopes = daily.as("a")
        .join(daily.as("b"),
          col("a.priority") === col("b.priority") && col("a.x") < col("b.x"))
        .select(col("a.priority").as("priority"),
          ((col("b.y") - col("a.y")).cast("double") /
            (col("b.x") - col("a.x")).cast("double")).as("slope"))
      val m = slopes.groupBy("priority")
        .agg(expr("percentile(slope, 0.5)").as("m"))
      daily.join(m, Seq("priority"))
        .select(col("priority"), col("m"),
          (col("y").cast("double") - col("m") * col("x").cast("double"))
            .as("resid"))
        .groupBy("priority")
        .agg(count(lit(1)).as("n_days"),
          round(max(col("m")) / 100, 6).as("slope_per_day"),
          round(expr("percentile(resid, 0.5)") / 100, 4).as("intercept"))
        .orderBy("priority")
    },
    Some("""WITH daily AS (
           |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
           |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS y,
           |    CAST(date_diff('day', DATE '1995-01-01',
           |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x
           |  FROM orders GROUP BY 1, 2),
           |m AS (
           |  SELECT a.priority,
           |    median(CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)) AS m
           |  FROM daily a JOIN daily b
           |    ON a.priority = b.priority AND a.x < b.x
           |  GROUP BY a.priority)
           |SELECT d.priority, count(*) AS n_days,
           |  round(max(m.m) / 100, 6) AS slope_per_day,
           |  round(median(CAST(d.y AS DOUBLE) - m.m * CAST(d.x AS DOUBLE)) / 100,
           |    4) AS intercept
           |FROM daily d JOIN m ON m.priority = d.priority
           |GROUP BY d.priority ORDER BY d.priority""".stripMargin))

  /** Label-propagation community detection (3 synchronized rounds)
    * over the co-purchase graph — the community-structure member of
    * the iterative-graph family (q129 ranks importance, q172 scores
    * hubs/authorities, q215 measures distance, q54 proves
    * connectivity; none of them PARTITIONS the graph). Each round is
    * one equi-join (labels onto edge sources) + one keyed count + a
    * per-node argmax with the classic deterministic tie-break
    * (highest neighbor-label frequency, ties to the SMALLEST label) —
    * synchronized updates and a fixed round count keep the evolution
    * order-free, so the oracle can unroll the recursion. Same
    * per-round dataflow shape as q129, which PlanAuditSpec pins to a
    * reused edge exchange: the join keys repeat round over round.
    *
    * Output: per detected community, its size and a member checksum —
    * any divergence in any round's argmax flips the final partition. */
  val q233LabelPropagation = GraftQuery(
    "q233_label_propagation",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
      // threshold to RE-co-purchased pairs (weight >= 2): single
      // co-occurrences are noise edges that glue a co-occurrence graph
      // into one blob — the standard LPA pre-step, and the aggregation
      // is the same keyed count the unthresholded form needs anyway
      val e0 = li.as("x")
        .join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .groupBy(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select("a", "b")
      val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      val W = org.apache.spark.sql.expressions.Window
      var labels = edges.select(col("a").as("node")).distinct()
        .withColumn("lbl", col("node"))
      for (_ <- 1 to 3) {
        val counted = edges
          .join(labels.withColumnRenamed("node", "a"), Seq("a"))
          .groupBy(col("b").as("node"), col("lbl"))
          .agg(count(lit(1)).as("c"))
        labels = counted
          .withColumn("rn", row_number().over(
            W.partitionBy("node").orderBy(col("c").desc, col("lbl"))))
          .filter(col("rn") === 1)
          .select(col("node"), col("lbl"))
      }
      labels.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("size"),
          sum(conv(substring(md5(col("node").cast("string")), 1, 8), 16, 10)
            .cast("long")).as("member_sum"))
        .orderBy(col("size").desc, col("community"))
    },
    Some("""WITH e0 AS (
           |  SELECT x.l_partkey AS a, y.l_partkey AS b
           |  FROM lineitem x JOIN lineitem y
           |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
           |  GROUP BY 1, 2 HAVING count(*) >= 2),
           |e AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
           |l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM e),
           |c1 AS (SELECT e.b AS node, l0.lbl, count(*) AS c
           |       FROM e JOIN l0 ON l0.node = e.a GROUP BY 1, 2),
           |l1 AS (SELECT node, lbl FROM (
           |         SELECT node, lbl, row_number() OVER (PARTITION BY node
           |           ORDER BY c DESC, lbl) AS rn FROM c1) WHERE rn = 1),
           |c2 AS (SELECT e.b AS node, l1.lbl, count(*) AS c
           |       FROM e JOIN l1 ON l1.node = e.a GROUP BY 1, 2),
           |l2 AS (SELECT node, lbl FROM (
           |         SELECT node, lbl, row_number() OVER (PARTITION BY node
           |           ORDER BY c DESC, lbl) AS rn FROM c2) WHERE rn = 1),
           |c3 AS (SELECT e.b AS node, l2.lbl, count(*) AS c
           |       FROM e JOIN l2 ON l2.node = e.a GROUP BY 1, 2),
           |l3 AS (SELECT node, lbl FROM (
           |         SELECT node, lbl, row_number() OVER (PARTITION BY node
           |           ORDER BY c DESC, lbl) AS rn FROM c3) WHERE rn = 1)
           |SELECT lbl AS community, count(*) AS size,
           |  CAST(sum(('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 8))
           |    ::BIGINT) AS BIGINT) AS member_sum
           |FROM l3 GROUP BY lbl ORDER BY size DESC, community""".stripMargin))

  /** Hierarchical (tree) aggregation — the bill-of-materials rollup:
    * parts form an implicit binary assembly tree (parent(k) = k/2,
    * root 1) and every node needs its SUBTREE cost (own price + all
    * components below it). The engine runs the level-synchronous
    * UPWARD SWEEP: per level, one keyed aggregation folds the level's
    * subtree totals into the parents — depth-many small shuffles
    * moving O(n) rows TOTAL, against the O(n·depth) ancestor-explosion
    * the oracle is allowed (a recursive CTE enumerating every
    * (ancestor, node) pair) — the two shapes agree on every node, and
    * the root's total equals the corpus sum by conservation. Levels
    * come from an exact powers-of-two lookup, never floating log2
    * (which misrounds at boundaries). This is the recursion family
    * BFS (q215: distances) and label propagation (q233: partitions)
    * don't cover: values aggregating THROUGH a hierarchy. */
  val q243TreeRollup = GraftQuery(
    "q243_tree_rollup",
    (s, dir) => {
      val own = Tables.part(s, dir).select(
        col("p_partkey").cast("long").as("k"),
        floor(col("p_retailprice") * 100 + lit(0.5)).cast("long").as("own"))
      // exact level = index of the highest set bit, via a 40-row
      // powers table (log2 doubles misround at 2^j boundaries)
      val pows = s.range(0, 40).select(col("id").cast("int").as("lvl"),
        expr("CAST(pow(2, id) AS BIGINT)").as("p"))
      val leveled = own.join(broadcast(pows),
          col("p") <= col("k") && col("k") < col("p") * 2)
        .select(col("k"), col("own"), col("lvl"))
      val maxLvl = leveled.agg(max("lvl")).collect()(0).getInt(0)
      var sums = leveled.withColumn("subtree", col("own"))
      for (l <- maxLvl to 1 by -1) {
        val contrib = sums.filter(col("lvl") === l)
          .groupBy(floor(col("k") / 2).cast("long").as("k"))
          .agg(sum("subtree").as("add"))
        sums = sums.join(contrib, Seq("k"), "left")
          .withColumn("subtree", col("subtree") + coalesce(col("add"), lit(0L)))
          .drop("add")
        // bound the lineage: 14+ chained joins otherwise stack up in
        // one analysis/codegen pass
        if ((maxLvl - l) % 5 == 4) sums = sums.localCheckpoint()
      }
      sums.groupBy(col("lvl").cast("long").as("lvl"))
        .agg(count(lit(1)).as("n_nodes"), sum("own").as("own_sum"),
          sum("subtree").as("subtree_sum"),
          sum(conv(substring(md5(concat_ws("|", col("k"), col("subtree"))),
            1, 8), 16, 10).cast("long")).as("node_sum"))
        .orderBy("lvl")
    },
    Some("""WITH RECURSIVE own AS (
           |  SELECT CAST(p_partkey AS BIGINT) AS k,
           |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS own
           |  FROM part),
           |anc AS (
           |  SELECT k AS node, k AS anc FROM own
           |  UNION ALL
           |  SELECT node, anc // 2 AS anc FROM anc WHERE anc > 1),
           |sub AS (
           |  SELECT a.anc AS k, sum(o.own) AS subtree
           |  FROM anc a JOIN own o ON o.k = a.node
           |  GROUP BY a.anc),
           |pows AS (SELECT g AS lvl, CAST(pow(2, g) AS BIGINT) AS p
           |         FROM (SELECT unnest(generate_series(0, 39)) AS g)),
           |leveled AS (
           |  SELECT o.k, o.own, s.subtree, pw.lvl
           |  FROM own o JOIN sub s ON s.k = o.k
           |  JOIN pows pw ON pw.p <= o.k AND o.k < pw.p * 2)
           |SELECT lvl, count(*) AS n_nodes,
           |  CAST(sum(own) AS BIGINT) AS own_sum,
           |  CAST(sum(subtree) AS BIGINT) AS subtree_sum,
           |  CAST(sum(('0x' || substr(md5(CAST(k AS VARCHAR) || '|' ||
           |    CAST(subtree AS VARCHAR)), 1, 8))::BIGINT) AS BIGINT)
           |    AS node_sum
           |FROM leveled GROUP BY lvl ORDER BY lvl""".stripMargin))

  /** Lagged cross-correlation between two daily revenue series (does
    * URGENT demand LEAD low-priority demand?) — the lead-lag discovery
    * scan time-series monitoring runs between every metric pair. For
    * each lag in −7..7 the Pearson correlation of (x_t, y_{t+lag}) is
    * computed entirely from EXACT integer moments over the aligned
    * calendar overlap (n, Σx, Σy, Σxy, Σx², Σy² — one hash aggregation
    * per lag over the day-grain series, reorder-proof), then a single
    * fixed-form double expression per lag — no data-order float
    * accumulation anywhere, so both engines agree bit-for-bit before
    * the final rounding. The series and the lag set are
    * calendar-bounded: the whole scan costs 15 aggregations over
    * ~2,400-row frames regardless of fact volume. */
  val q244CrossCorrelation = GraftQuery(
    "q244_cross_correlation",
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(
          // whole DOLLARS, not cents: Σx·y over ~2,400 days must stay
          // inside int64 in BOTH engines (cents overflowed at sf0.1 —
          // DuckDB promotes to INT128, Spark's non-ANSI sum wraps)
          sum(when(col("o_orderpriority") === "1-URGENT",
            floor(col("o_totalprice") + lit(0.5)).cast("long"))
            .otherwise(0L)).as("x"),
          sum(when(col("o_orderpriority") === "5-LOW",
            floor(col("o_totalprice") + lit(0.5)).cast("long"))
            .otherwise(0L)).as("y"))
        .withColumn("d", datediff(col("day"), lit("1995-01-01").cast("date"))
          .cast("long"))
        .select("d", "x", "y")
      val lags = s.range(-7, 8).select(col("id").cast("long").as("lag"))
      val joined = daily.as("a").crossJoin(broadcast(lags))
        .join(daily.as("b"), col("b.d") === col("a.d") + col("lag"))
        .select(col("lag"), col("a.x").as("x"), col("b.y").as("y"))
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val m = joined.groupBy("lag").agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      m.select(col("lag"), col("n"),
        round((d(col("sxy")) * d(col("n")) - d(col("sx")) * d(col("sy"))) /
          (sqrt(d(col("sxx")) * d(col("n")) - d(col("sx")) * d(col("sx"))) *
            sqrt(d(col("syy")) * d(col("n")) - d(col("sy")) * d(col("sy")))), 6)
          .as("corr"))
        .orderBy("lag")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(date_diff('day', DATE '1995-01-01',
           |      CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
           |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
           |      THEN CAST(floor(o_totalprice + 0.5) AS BIGINT)
           |      ELSE 0 END) AS BIGINT) AS x,
           |    CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
           |      THEN CAST(floor(o_totalprice + 0.5) AS BIGINT)
           |      ELSE 0 END) AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |lags AS (SELECT CAST(g AS BIGINT) AS lag
           |         FROM (SELECT unnest(generate_series(-7, 7)) AS g)),
           |joined AS (
           |  SELECT l.lag, a.x, b.y
           |  FROM daily a CROSS JOIN lags l
           |  JOIN daily b ON b.d = a.d + l.lag),
           |m AS (
           |  SELECT lag, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
           |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
           |    CAST(sum(x * x) AS BIGINT) AS sxx,
           |    CAST(sum(y * y) AS BIGINT) AS syy
           |  FROM joined GROUP BY lag)
           |SELECT lag, n,
           |  round((CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE) -
           |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
           |    (sqrt(CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE) -
           |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
           |     sqrt(CAST(syy AS DOUBLE) * CAST(n AS DOUBLE) -
           |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
           |FROM m ORDER BY lag""".stripMargin))

  /** Exact grouped quantiles PLUS the approx-sketch error envelope:
    * the exact type-7 percentiles (which both engines interpolate
    * identically and the oracle checks cell-for-cell) alongside a
    * verification that Spark's `approx_percentile` sketch honors its
    * rank-error contract — the measured rank of each sketch answer
    * must sit within ±n/accuracy of the target rank. At 100 TB only
    * the single-pass mergeable sketch is viable (exact percentiles
    * need a per-group sort); this gate is what lets the engine SWAP
    * the exact op for the sketch knowing the substitution error is
    * bounded, and it would fail if the sketch ever regressed past its
    * documented bound. The oracle replays the exact cells and asserts
    * the envelope bits are all true. */
  val q232QuantileEnvelope = GraftQuery(
    "q232_quantile_envelope",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
            .as("cents"))
      val accuracy = 10000
      val stats = li.groupBy("flag").agg(
        count(lit(1)).as("n"),
        expr("percentile(cents, 0.5)").as("p50"),
        expr("percentile(cents, 0.95)").as("p95"),
        expr(s"approx_percentile(cents, 0.5, $accuracy)").as("a50"),
        expr(s"approx_percentile(cents, 0.95, $accuracy)").as("a95"))
      // measured rank of each sketch answer, from one extra
      // conditional aggregation (not a sort)
      val ranks = li.join(broadcast(stats), Seq("flag"))
        .groupBy("flag")
        .agg(max("n").as("n"), max("p50").as("p50"), max("p95").as("p95"),
          sum((col("cents") <= col("a50")).cast("long")).as("r50"),
          sum((col("cents") <= col("a95")).cast("long")).as("r95"))
      ranks.select(col("flag"), col("n"),
        round(col("p50") / 100, 4).as("p50"),
        round(col("p95") / 100, 4).as("p95"),
        (abs(col("r50") - col("n") * 0.5) <=
          col("n").cast("double") / accuracy + 1).as("p50_in_bound"),
        (abs(col("r95") - col("n") * 0.95) <=
          col("n").cast("double") / accuracy + 1).as("p95_in_bound"))
        .orderBy("flag")
    },
    Some("""WITH li AS (
           |  SELECT l_returnflag AS flag,
           |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
           |  FROM lineitem)
           |SELECT flag, count(*) AS n,
           |  round(quantile_cont(cents, 0.5) / 100, 4) AS p50,
           |  round(quantile_cont(cents, 0.95) / 100, 4) AS p95,
           |  true AS p50_in_bound, true AS p95_in_bound
           |FROM li GROUP BY flag ORDER BY flag""".stripMargin))

  /** GLOBAL `percent_rank` + `ntile(100)` at scale: both ride the
    * two-phase [[graft.operators.GlobalRank]] (rank/row-number per
    * range partition + broadcast offsets + a one-row broadcast total)
    * — the plain `Window.orderBy` forms funnel the whole orders table
    * through ONE task, the exact cliff the q245/q179 rewrite closed;
    * this gate closes the remaining members of the unpartitioned
    * analytic-window family. percent_rank orders by the (tied) price
    * grain, ntile by (price, orderkey) so the SQL-standard uneven
    * split is deterministic. Output is the per-centile profile:
    * row count, the percent-rank span, and exact cent mass —
    * `(rank−1)/(n−1)` is the same integer-over-integer double on both
    * engines, rounded at 9 for the usual safety. */
  val q257GlobalNtilePrank = GraftQuery(
    "q257_global_ntile_prank",
    (s, dir) => {
      import graft.operators.GlobalRank
      val o = Tables.orders(s, dir).select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      val pr = GlobalRank.percentRank(o, "pr", col("cents"))
      val tiled = GlobalRank.ntile(pr, 100, "tile",
        col("cents"), col("o_orderkey"))
      tiled.groupBy("tile").agg(
        count(lit(1)).as("n"),
        round(min("pr"), 9).as("min_pr"),
        round(max("pr"), 9).as("max_pr"),
        sum("cents").as("sum_cents"))
        .orderBy("tile")
    },
    Some("""WITH o AS (
           |  SELECT o_orderkey,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           |  FROM orders),
           |r AS (
           |  SELECT cents,
           |    percent_rank() OVER (ORDER BY cents) AS pr,
           |    ntile(100) OVER (ORDER BY cents, o_orderkey) AS tile
           |  FROM o)
           |SELECT CAST(tile AS BIGINT) AS tile, count(*) AS n,
           |  round(min(pr), 9) AS min_pr, round(max(pr), 9) AS max_pr,
           |  CAST(sum(cents) AS BIGINT) AS sum_cents
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q18FullOuter, q33DistinctExact,
    q34DistinctApprox, q35Pivot, q36WindowAnalytics, q56Percentiles,
    q71GroupingSets, q72FuzzyNamePairs, q73TopkPerGroup, q75StatAggregates,
    q76Winsorize, q77TableChecksum, q78Histogram, q89DistributionWindows,
    q90Retention, q96RobustStats, q97Cohorts, q102DecayedRevenue,
    q104KmvDailyUsers, q107IncrementalRollup, q113TableProfile,
    q114RangeFrame, q115SetOpsAll, q116ForwardFill, q117ActivityIslands,
    q118SketchedGrains, q126CdcCompaction, q127FirstTouch,
    q128ConstraintCheck, q129PagerankCopurchase, q130UnpivotStats,
    q131RollingKmvUsers, q132KmvSetOps, q133SaltedJoin,
    q134GroupwiseRegression, q135TableDiff, q136EventTransitions,
    q137TimeWeightedAvg, q138RollingMedian, q140BasketLift,
    q141KAnonymity, q142EventTrigrams, q143CopurchaseTriangles,
    q144RevenueGini, q145RfmSegments, q146OrderReconciliation,
    q147BenfordAudit, q148BehaviorEntropy, q149OrderGaps, q150RankFusion,
    q151RevenueAnomalies, q162SlidingWindows, q164VariantProps,
    q170LinearAttribution, q171LDiversity, q172HitsAuthorities, q215ShortestPaths,
    q226LinearInterpolate, q231TheilSen, q232QuantileEnvelope,
    q233LabelPropagation, q243TreeRollup, q244CrossCorrelation,
    q257GlobalNtilePrank)
}
