package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftQuery, Tables}
import graft.pipeline.{ProductDim, TimeDim}

/** The reference pipeline's operator shapes (SURVEY §2) mapped onto the
  * testdata tables so the driver's DuckDB gate exercises the same
  * pipeline code paths (TimeDim/ProductDim are invoked directly).
  */
object PipelineShaped {

  /** J2/W3 — as-of lookup, the scalable single-pass form: for every
    * 'error' event, the latest preceding 'click' of the same user.
    * Instead of a join (the reference re-scans per row,
    * FactTable.sql:18-27), one window pass: last(click_ts ignoreNulls)
    * over (user, ts) rows-preceding — a single shuffle by user_id,
    * O(n) at any scale, no build side at all. */
  val q07AsofLastClick = GraftQuery(
    "q07_asof_last_click",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("click_ts",
          last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
        .withColumn("click_value",
          last(when(col("event_type") === "click", col("value")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "error")
        .select(
          col("event_id"),
          col("user_id"),
          unix_timestamp(col("ts")).as("error_ts_sec"),
          unix_timestamp(col("click_ts")).as("click_ts_sec"),
          col("click_value"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
           |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS error_ts_sec,
           |  CAST(epoch(date_trunc('second', click_ts)) AS BIGINT) AS click_ts_sec,
           |  click_value
           |FROM (
           |  SELECT *,
           |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts,
           |    last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_value
           |  FROM events)
           |WHERE event_type = 'error'
           |ORDER BY event_id""".stripMargin))

  /** G1/J5/P10 — date spine + left join + COALESCE(qty,0): the
    * reference's sparse-day fill (TimeDimension.sql:49-50 +
    * FactTable.sql:78-110) at day grain. The daily aggregate is
    * computed BEFORE the join (map-side combine ⇒ the spine join is
    * spine-sized, not order-sized). */
  val q08DaySpineFill = GraftQuery(
    "q08_day_spine_fill",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val daily = o.groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).as("n_orders_raw"),
          round(sum("o_totalprice"), 2).as("revenue_raw"))
      val spine = o.agg(min(col("o_orderdate").cast("date")).as("lo"),
          max(col("o_orderdate").cast("date")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
      spine.join(daily, Seq("d"), "left")
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_orders_raw"), lit(0L)).as("n_orders"),
          coalesce(col("revenue_raw"), lit(0.0)).as("revenue"))
        .orderBy("day")
    },
    // Date-typed outputs are stringified on both sides: engines
    // disagree on DATE vs midnight-TIMESTAMP representation in results.
    Some("""WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) lo,
           |                  CAST(max(o_orderdate) AS DATE) hi FROM orders),
           |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) d FROM b),
           |daily AS (SELECT CAST(o_orderdate AS DATE) d, count(*) n, round(sum(o_totalprice), 2) rev
           |          FROM orders GROUP BY 1)
           |SELECT strftime(spine.d, '%Y-%m-%d') AS day, COALESCE(daily.n, 0) AS n_orders,
           |       COALESCE(daily.rev, 0.0) AS revenue
           |FROM spine LEFT JOIN daily ON spine.d = daily.d
           |ORDER BY day""".stripMargin))

  /** G2/P8/P9/J7 — the actual TimeDim pipeline stage over the orders
    * date range: calendar hierarchy with dense_rank IDs and the
    * documented sane labels (SURVEY §7.4-3). */
  val q09TimeHierarchy = GraftQuery(
    "q09_time_hierarchy",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val spine = o.agg(min(col("o_orderdate").cast("date")).as("lo"),
          max(col("o_orderdate").cast("date")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
      TimeDim.fromSpine(spine)
        .withColumn("time_desc", date_format(col("time_desc"), "yyyy-MM-dd"))
        .orderBy("time_desc")
    },
    Some("""WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) lo,
           |                  CAST(max(o_orderdate) AS DATE) hi FROM orders),
           |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) d FROM b),
           |k AS (SELECT d,
           |  year(d) AS yk,
           |  year(d)*10 + CASE WHEN month(d) <= 6 THEN 1 ELSE 2 END AS hk,
           |  year(d)*10 + quarter(d) AS qk,
           |  year(d)*100 + month(d) AS mk,
           |  date_trunc('week', d) AS wk
           |  FROM spine),
           |r AS (SELECT d, yk, hk, qk, mk,
           |  dense_rank() OVER (ORDER BY wk) AS wr,
           |  dense_rank() OVER (ORDER BY mk) AS mr,
           |  dense_rank() OVER (ORDER BY qk) AS qr,
           |  dense_rank() OVER (ORDER BY hk) AS hr
           |  FROM k)
           |SELECT
           |  'D' || strftime(d, '%Y%m%d') AS time_id,
           |  strftime(d, '%Y-%m-%d') AS time_desc,
           |  'W' || CASE WHEN length(CAST(wr AS VARCHAR)) < 3
           |              THEN lpad(CAST(wr AS VARCHAR), 3, '0')
           |              ELSE CAST(wr AS VARCHAR) END AS week_id,
           |  'W' || lpad(CAST(weekofyear(d) AS VARCHAR), 2, '0') || strftime(d, '%y') AS week_desc,
           |  'M' || CASE WHEN length(CAST(mr AS VARCHAR)) < 3
           |              THEN lpad(CAST(mr AS VARCHAR), 3, '0')
           |              ELSE CAST(mr AS VARCHAR) END AS month_id,
           |  'M' || strftime(d, '%m%y') AS month_desc,
           |  'Q' || CASE WHEN length(CAST(qr AS VARCHAR)) < 3
           |              THEN lpad(CAST(qr AS VARCHAR), 3, '0')
           |              ELSE CAST(qr AS VARCHAR) END AS quarter_id,
           |  'Q' || quarter(d) || strftime(d, '%y') AS quarter_desc,
           |  'H' || CASE WHEN length(CAST(hr AS VARCHAR)) < 3
           |              THEN lpad(CAST(hr AS VARCHAR), 3, '0')
           |              ELSE CAST(hr AS VARCHAR) END AS half_year_id,
           |  'H' || year(d) || '-' || CASE WHEN month(d) <= 6 THEN 1 ELSE 2 END AS half_year_desc,
           |  'Y' || year(d) AS year_id,
           |  CAST(year(d) AS VARCHAR) AS year_desc
           |FROM r ORDER BY d""".stripMargin))

  /** §2.9 — the actual ProductDim SCD2 stage over part price versions
    * derived from lineitem (unit price = extendedprice/quantity, exact
    * IEEE division ⇒ identical grouping in both engines). */
  val q10Scd2Versions = GraftQuery(
    "q10_scd2_versions",
    (s, dir) => {
      val versions = Tables.lineitem(s, dir).select(
        lpad(col("l_partkey").cast("string"), 6, "0").as("product"),
        (col("l_extendedprice") / col("l_quantity")).as("price_each"),
        col("l_shipdate").as("order_date"))
      ProductDim(versions)
        .withColumn("last_update_date", date_format(col("last_update_date"), "yyyy-MM-dd"))
        .orderBy("product_id", "price_each")
    },
    Some("""WITH versions AS (
           |  SELECT lpad(CAST(l_partkey AS VARCHAR), 6, '0') AS product_name,
           |         l_extendedprice / l_quantity AS price_each,
           |         min(CAST(l_shipdate AS DATE)) AS last_update_date
           |  FROM lineitem GROUP BY 1, 2),
           |flagged AS (
           |  SELECT *,
           |    count(*) OVER (PARTITION BY product_name) AS n_versions,
           |    row_number() OVER (PARTITION BY product_name
           |                       ORDER BY last_update_date DESC, price_each DESC) AS rn
           |  FROM versions)
           |SELECT
           |  'P' || CASE WHEN length(CAST(dr AS VARCHAR)) < 6
           |              THEN lpad(CAST(dr AS VARCHAR), 6, '0')
           |              ELSE CAST(dr AS VARCHAR) END AS product_id,
           |  product_name, price_each,
           |  strftime(last_update_date, '%Y-%m-%d') AS last_update_date,
           |  CASE WHEN rn = 1 THEN 'Y' ELSE 'N' END AS active_status,
           |  CASE WHEN n_versions = 1 THEN 'I'
           |       WHEN rn = 1 THEN 'U'
           |       WHEN last_update_date = DATE '2019-01-01' THEN 'I'
           |       ELSE 'U' END AS action_flag
           |FROM (SELECT *, dense_rank() OVER (ORDER BY product_name) AS dr FROM flagged)
           |ORDER BY product_id, price_each""".stripMargin))

  /** Cube-at-scale path (SURVEY §7.4-4): GROUP BY ROLLUP instead of
    * materializing a dense cube — partial aggregation handles the
    * hierarchy in one shuffle. */
  val q11Rollup = GraftQuery(
    "q11_rollup_revenue",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(r("r_name").as("region_name"), n("n_name").as("nation_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("region_name").asc_nulls_first, col("nation_name").asc_nulls_first)
    },
    Some("""SELECT r_name AS region_name, n_name AS nation_name,
           |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           |  count(*) AS n_items
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation   ON c_nationkey = n_nationkey
           |JOIN region   ON n_regionkey = r_regionkey
           |GROUP BY ROLLUP (region_name, nation_name)
           |ORDER BY region_name ASC NULLS FIRST, nation_name ASC NULLS FIRST""".stripMargin))

  /** Full CUBE over two independent dims — the other grouping-sets
    * shape analysts run against fact_table. */
  val q12CubeGroupby = GraftQuery(
    "q12_cube_segment_priority",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_price"))
        .orderBy(col("c_mktsegment").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },
    Some("""SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders,
           |  round(sum(o_totalprice), 2) AS total_price
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY CUBE (c_mktsegment, o_orderpriority)
           |ORDER BY c_mktsegment ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin))

  /** §2.7 — UNION / INTERSECT / EXCEPT (SQL set semantics, i.e.
    * distinct): customer keys by order-status membership. */
  val q13SetOps = GraftQuery(
    "q13_set_ops",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      val open = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      val both = urgent.intersect(open).withColumn("tag", lit("urgent_and_open"))
      val urgentOnly = urgent.except(open).withColumn("tag", lit("urgent_only"))
      both.unionByName(urgentOnly)
        .select("tag", "custkey")
        .orderBy("tag", "custkey")
    },
    Some("""WITH urgent AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
           |open_o AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
           |SELECT 'urgent_and_open' AS tag, custkey FROM (SELECT custkey FROM urgent INTERSECT SELECT custkey FROM open_o)
           |UNION ALL
           |SELECT 'urgent_only' AS tag, custkey FROM (SELECT custkey FROM urgent EXCEPT SELECT custkey FROM open_o)
           |ORDER BY tag, custkey""".stripMargin))

  /** F1/F2 — the cleanse router's try-cast semantics on a synthesized
    * dirty column: non-ANSI cast→NULL (Spark) ≡ TRY_CAST (DuckDB);
    * rows route to valid/invalid and both routes are counted — the
    * job never aborts (ref: Cleansing.sql:87-106). */
  val q14CastRouter = GraftQuery(
    "q14_cast_router",
    (s, dir) => {
      val dirty = Tables.events(s, dir).withColumn("raw",
        when(col("event_id") % 7 === 0, lit("bad"))
          .when(col("event_id") % 11 === 0, lit(null))
          .otherwise(col("user_id").cast("string")))
      dirty
        .withColumn("typed", col("raw").cast("long"))
        .withColumn("route",
          when(col("raw").isNull, "invalid_null")
            .when(col("typed").isNull, "invalid_cast")
            .otherwise("valid"))
        .groupBy("route")
        .agg(count(lit(1)).as("n"),
          coalesce(sum("typed"), lit(0L)).as("sum_typed"))
        .orderBy("route")
    },
    Some("""WITH dirty AS (
           |  SELECT CASE WHEN event_id % 7 = 0 THEN 'bad'
           |              WHEN event_id % 11 = 0 THEN NULL
           |              ELSE CAST(user_id AS VARCHAR) END AS raw
           |  FROM events),
           |typed AS (SELECT raw, TRY_CAST(raw AS BIGINT) AS typed,
           |  CASE WHEN raw IS NULL THEN 'invalid_null'
           |       WHEN TRY_CAST(raw AS BIGINT) IS NULL THEN 'invalid_cast'
           |       ELSE 'valid' END AS route
           |  FROM dirty)
           |SELECT route, count(*) AS n,
           |  CAST(COALESCE(sum(typed), 0) AS BIGINT) AS sum_typed
           |FROM typed GROUP BY route ORDER BY route""".stripMargin))

  /** P1/P2/P5/P6/P7 — the cleanse projection family: split_part, trim,
    * lpad, md5, concat (ref: Cleansing.sql:65-68,
    * ProductDimension.sql:59, LocationDimension.sql:95-170). */
  val q15StringFuncs = GraftQuery(
    "q15_string_funcs",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      c.select(
        col("c_custkey"),
        trim(split(col("c_name"), "#").getItem(0)).as("name_prefix"),
        split(col("c_name"), "#").getItem(1).as("name_num"),
        concat(lit("C"), lpad(col("c_custkey").cast("string"), 6, "0")).as("cust_id"),
        substring(md5(col("c_name")), 1, 8).as("name_hash8"),
        concat_ws(" | ", col("c_name"), col("c_mktsegment")).as("label"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey,
           |  trim(split_part(c_name, '#', 1)) AS name_prefix,
           |  split_part(c_name, '#', 2) AS name_num,
           |  'C' || lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS cust_id,
           |  substr(md5(c_name), 1, 8) AS name_hash8,
           |  c_name || ' | ' || c_mktsegment AS label
           |FROM customer ORDER BY c_custkey""".stripMargin))

  /** A1/A2/G3 — COALESCE(MAX(id),0) seeding + max+1 backfill
    * (ref: Cleansing.sql:16,56-61): orders with synthesized NULL keys
    * get max_key + row_number in deterministic order. The seed is a
    * one-row aggregate joined back via broadcast cross join (single
    * plan, no driver round-trip) and the sequence comes from the
    * two-phase [[graft.operators.GlobalRank]] — no single-partition
    * window even when the NULL subset is huge. */
  val q16IdBackfill = GraftQuery(
    "q16_id_backfill",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("raw_key",
          when(col("o_orderkey") % 97 === 0, lit(null)).otherwise(col("o_orderkey")))
      val mx = o.agg(coalesce(max("raw_key"), lit(0L)).as("__mx"))
      val hasKey = o.filter(col("raw_key").isNotNull)
        .withColumn("final_key", col("raw_key"))
      val noKey = graft.operators.GlobalRank.rowNumber(
          o.filter(col("raw_key").isNull).crossJoin(broadcast(mx)),
          "__rn", col("o_orderdate"), col("o_custkey"), col("o_totalprice"))
        .withColumn("final_key", col("__mx") + col("__rn"))
        .drop("__mx", "__rn")
      hasKey.unionByName(noKey)
        .withColumn("backfilled", col("raw_key").isNull)
        .select("final_key", "o_custkey", "backfilled")
        .orderBy("final_key")
    },
    Some("""WITH o AS (
           |  SELECT *, CASE WHEN o_orderkey % 97 = 0 THEN NULL
           |                 ELSE o_orderkey END AS raw_key
           |  FROM orders),
           |mx AS (SELECT COALESCE(max(raw_key), 0) m FROM o)
           |SELECT
           |  CASE WHEN raw_key IS NOT NULL THEN raw_key
           |       ELSE (SELECT m FROM mx) + row_number()
           |         OVER (PARTITION BY (raw_key IS NULL)
           |               ORDER BY o_orderdate, o_custkey, o_totalprice) END AS final_key,
           |  o_custkey,
           |  raw_key IS NULL AS backfilled
           |FROM o ORDER BY final_key""".stripMargin))

  /** §2.9 incremental — SCD2 apply-changes. Builds the dimension from
    * history before the cutoff, then merges the post-cutoff tail as a
    * staged batch through [[graft.pipeline.ProductDim.merge]] (version
    * collapse + flag windows over batch names only; untouched names
    * stream through). The oracle is q10's FULL REBUILD over the whole
    * history — pinning merge ≡ rebuild, the invariant that lets a
    * 100 TB warehouse apply nightly deltas instead of reloading. */
  val q105Scd2Merge = GraftQuery(
    "q105_scd2_merge",
    (s, dir) => {
      val cleansed = Tables.lineitem(s, dir).select(
        lpad(col("l_partkey").cast("string"), 6, "0").as("product"),
        (col("l_extendedprice") / col("l_quantity")).as("price_each"),
        col("l_shipdate").as("order_date"))
      val cutoff = to_date(lit("2000-01-01"))
      val current = ProductDim(cleansed.filter(col("order_date").cast("date") < cutoff))
      val staged = cleansed.filter(col("order_date").cast("date") >= cutoff)
      ProductDim.merge(current, staged)
        .withColumn("last_update_date", date_format(col("last_update_date"), "yyyy-MM-dd"))
        .orderBy("product_id", "price_each")
    },
    q10Scd2Versions.oracle)

  /** Point-in-time (time-travel) version resolution over the SCD2
    * version set: for each probe date, each product resolves to its
    * latest version dated ≤ the probe — the feature-store
    * PIT-correctness lookup ("what did the dimension say AS OF
    * training time"), the row-level complement of q10's full version
    * inventory and q17's event-stream as-of. One keyed `max(struct)`
    * aggregation per probe (map-side combined, no window over the
    * version log); ties at identical dates break by price on both
    * engines. */
  val q166PitVersions = GraftQuery(
    "q166_pit_versions",
    (s, dir) => {
      val versions = Tables.lineitem(s, dir).select(
        lpad(col("l_partkey").cast("string"), 6, "0").as("product"),
        (col("l_extendedprice") / col("l_quantity")).as("price_each"),
        col("l_shipdate").cast("date").as("ver_date"))
      val probes = Seq("1994-01-01", "1996-01-01", "1998-01-01")
      probes.map { d =>
        versions.filter(col("ver_date") <= to_date(lit(d)))
          .groupBy("product")
          .agg(max(struct(col("ver_date"), col("price_each"))).as("v"),
            count(lit(1)).as("n_versions_seen"))
          .select(lit(d).as("as_of"), col("product"),
            date_format(col("v.ver_date"), "yyyy-MM-dd").as("ver_date"),
            col("v.price_each").as("price_each"), col("n_versions_seen"))
      }.reduce(_.unionByName(_)).orderBy("as_of", "product")
    },
    Some("""WITH versions AS (
           |  SELECT lpad(CAST(l_partkey AS VARCHAR), 6, '0') AS product,
           |         l_extendedprice / l_quantity AS price_each,
           |         CAST(l_shipdate AS DATE) AS ver_date
           |  FROM lineitem),
           |probes AS (SELECT unnest(['1994-01-01', '1996-01-01', '1998-01-01']) AS as_of),
           |eligible AS (
           |  SELECT p.as_of, v.product, v.ver_date, v.price_each,
           |    row_number() OVER (PARTITION BY p.as_of, v.product
           |      ORDER BY v.ver_date DESC, v.price_each DESC) AS rn,
           |    count(*) OVER (PARTITION BY p.as_of, v.product) AS n_versions_seen
           |  FROM probes p JOIN versions v ON v.ver_date <= CAST(p.as_of AS DATE))
           |SELECT as_of, product, strftime(ver_date, '%Y-%m-%d') AS ver_date,
           |  price_each, n_versions_seen
           |FROM eligible WHERE rn = 1
           |ORDER BY as_of, product""".stripMargin))

  val all: Seq[GraftQuery] = Seq(
    q07AsofLastClick, q08DaySpineFill, q09TimeHierarchy, q10Scd2Versions,
    q11Rollup, q12CubeGroupby, q13SetOps, q14CastRouter, q15StringFuncs,
    q16IdBackfill, q105Scd2Merge, q166PitVersions)
}
