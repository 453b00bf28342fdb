package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftQuery, Tables}

/** Core relational operator coverage (SURVEY.md §2.2-§2.6) re-expressed
  * over the driver's TPC-H-ish testdata tables.
  *
  * Design rules applied throughout:
  *  - declarative DataFrame ops only → Catalyst pushes filters/prunes
  *    columns into the parquet scan and picks join strategies;
  *  - explicit `broadcast()` on dimension-sized sides (region/nation/
  *    supplier/part are tiny at every SF; at 100 TB the fact side grows
  *    but these dims stay broadcastable);
  *  - every aggregate/computed column aliased identically in the Spark
  *    plan and the DuckDB oracle (driver hash-compares by column name);
  *  - floating aggregates rounded at the end (never mid-plan) so both
  *    engines agree bit-for-bit after summation-order differences.
  */
object Relational {

  /** A4/A5/P10 — grouped aggregation with partial (map-side) combine.
    * Mirrors the reference's GROUP BY..HAVING guard
    * (ProductDimension.sql:124-130) generalized to the TPC-H Q1 shape.
    * Scale: hash aggregate, map-side partial agg ⇒ shuffle carries only
    * (flag,status) groups — O(groups), not O(rows). */
  val q01PricingSummary = GraftQuery(
    "q01_pricing_summary",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  round(sum(l_quantity), 2) AS sum_qty,
           |  round(sum(l_extendedprice), 2) AS sum_base_price,
           |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
           |  round(avg(l_quantity), 4) AS avg_qty,
           |  round(avg(l_discount), 4) AS avg_disc,
           |  count(*) AS count_order
           |FROM lineitem
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** J1/J3/J6 — multi-way equi-join chain with broadcast dims
    * (snowflake collapse, LocationDimension.sql:171-180 shape):
    * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.
    * Scale: only the lineitem⋈orders edge is a real shuffle candidate;
    * customer/nation/region are broadcast so the fact side never
    * repartitions for them. */
  val q02RevenueByNation = GraftQuery(
    "q02_revenue_by_nation",
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
        .groupBy(r("r_name").as("region_name"), n("n_name").as("nation_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("region_name", "nation_name")
    },
    Some("""SELECT r_name AS region_name, n_name AS nation_name,
           |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           |  count(*) AS n_items
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation   ON c_nationkey = n_nationkey
           |JOIN region   ON n_regionkey = r_regionkey
           |GROUP BY 1, 2
           |ORDER BY 1, 2""".stripMargin))

  /** W3 — top-1-per-group ("ORDER BY … LIMIT 1" correlated pattern,
    * FactTable.sql:25-26) via max_by-equivalent window; deterministic
    * tiebreak on (price desc, orderkey, linenumber). */
  val q03TopPerSupplier = GraftQuery(
    "q03_top_item_per_supplier",
    (s, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      Tables.lineitem(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("l_suppkey"),
          col("l_orderkey").as("top_orderkey"),
          col("l_linenumber").as("top_linenumber"),
          round(col("l_extendedprice"), 2).as("top_price"))
        .orderBy("l_suppkey")
    },
    Some("""SELECT l_suppkey, l_orderkey AS top_orderkey,
           |  l_linenumber AS top_linenumber,
           |  round(l_extendedprice, 2) AS top_price
           |FROM (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY l_suppkey
           |    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
           |  FROM lineitem)
           |WHERE rn = 1
           |ORDER BY l_suppkey""".stripMargin))

  /** W1/W2 — dense_rank + row_number surrogate-ID assignment
    * (ProductDimension.sql:143-152, LocationDimension.sql:162):
    * 'P'+zero-padded rank by natural key, via the two-phase
    * [[graft.operators.GlobalRank]] (range-partitioned local ranks +
    * broadcast cumulative offsets) — same values as the unpartitioned
    * window, no single-partition sort at any input size. */
  val q04SurrogateIds = GraftQuery(
    "q04_surrogate_ids",
    (s, dir) => {
      import graft.operators.GlobalRank
      val base = Tables.part(s, dir).select("p_partkey", "p_brand", "p_name")
      val ranked = GlobalRank.rowNumber(
        GlobalRank.denseRank(base, "brand_rk", col("p_brand")),
        "part_rk", col("p_name"), col("p_partkey"))
      ranked
        .withColumn("brand_id",
          concat(lit("B"), lpad(col("brand_rk").cast("string"), 6, "0")))
        .withColumn("part_seq",
          concat(lit("P"), lpad(col("part_rk").cast("string"), 6, "0")))
        .select("p_partkey", "p_name", "p_brand", "brand_id", "part_seq")
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_name, p_brand,
           |  'B' || lpad(CAST(dense_rank() OVER (ORDER BY p_brand) AS VARCHAR), 6, '0') AS brand_id,
           |  'P' || lpad(CAST(row_number() OVER (ORDER BY p_name, p_partkey) AS VARCHAR), 6, '0') AS part_seq
           |FROM part
           |ORDER BY p_partkey""".stripMargin))

  /** J8/F3 — NOT EXISTS anti-join (ProductDimension.sql:33-39): parts
    * never ordered in bulk (quantity ≥ 45). left_anti ⇒ Spark hashes
    * only the distinct keys of the filtered right side; the l_quantity
    * filter is pushed into the parquet scan before the join. */
  val q05NeverOrderedParts = GraftQuery(
    "q05_never_bulk_ordered_parts",
    (s, dir) => {
      val p = Tables.part(s, dir)
      val li = Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= 45).select("l_partkey")
      p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_name, p_brand
           |FROM part p
           |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
           |                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
           |ORDER BY p_partkey""".stripMargin))

  /** J9-adjacent — EXISTS semi-join: customers having at least one
    * high-priority order. left_semi keeps the probe side narrow (no
    * column explosion, no dedup needed afterwards). */
  val q06CustomersWithUrgentOrders = GraftQuery(
    "q06_customers_with_urgent_orders",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment
           |FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o
           |              WHERE o.o_custkey = c.c_custkey
           |                AND o.o_orderpriority = '1-URGENT')
           |ORDER BY c_custkey""".stripMargin))

  /** Referential-integrity audit: orphan detection on every edge of
    * the star (orders without lineitems, lineitems referencing missing
    * orders/parts/suppliers, customers with no orders) — the
    * data-quality gate a warehouse load runs before publishing. Each
    * edge is one anti-join; counts land in one long-format frame. */
  val q120OrphanAudit = GraftQuery(
    "q120_orphan_audit",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val c = Tables.customer(s, dir)
      val p = Tables.part(s, dir)
      val su = Tables.supplier(s, dir)
      def cnt(df: org.apache.spark.sql.DataFrame, check: String) =
        df.agg(count(lit(1)).as("n_orphans")).withColumn("check_name", lit(check))
      cnt(o.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti"),
          "orders_without_lineitems")
        .unionByName(cnt(li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti"),
          "lineitems_without_order"))
        .unionByName(cnt(li.join(p, col("l_partkey") === col("p_partkey"), "left_anti"),
          "lineitems_without_part"))
        .unionByName(cnt(li.join(su, col("l_suppkey") === col("s_suppkey"), "left_anti"),
          "lineitems_without_supplier"))
        .unionByName(cnt(c.join(o, col("c_custkey") === col("o_custkey"), "left_anti"),
          "customers_without_orders"))
        .select("check_name", "n_orphans")
        .orderBy("check_name")
    },
    Some("""SELECT 'customers_without_orders' AS check_name, count(*) AS n_orphans
           |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
           |UNION ALL
           |SELECT 'lineitems_without_order', count(*)
           |FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
           |UNION ALL
           |SELECT 'lineitems_without_part', count(*)
           |FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
           |UNION ALL
           |SELECT 'lineitems_without_supplier', count(*)
           |FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
           |UNION ALL
           |SELECT 'orders_without_lineitems', count(*)
           |FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
           |ORDER BY check_name""".stripMargin))

  /** Accumulating-snapshot order lifecycle: per order the placement
    * date, first/last item ship dates, item count, and the
    * placement→first-ship lag — then the lag distribution per order
    * priority (the milestone-duration fact a warehouse accumulates).
    * One fact aggregation + one broadcast-sized join back to orders. */
  val q121OrderLifecycle = GraftQuery(
    "q121_order_lifecycle",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(min(col("l_shipdate").cast("date")).as("first_ship"),
          max(col("l_shipdate").cast("date")).as("last_ship"),
          count(lit(1)).as("n_items"))
      Tables.orders(s, dir)
        .join(li, Seq("o_orderkey"))
        .withColumn("lag_days",
          datediff(col("first_ship"), col("o_orderdate").cast("date")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          round(avg(col("lag_days").cast("double")), 4).as("avg_lag_days"),
          min("lag_days").as("min_lag_days"),
          max("lag_days").as("max_lag_days"),
          round(avg(col("n_items").cast("double")), 4).as("avg_items"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey AS o_orderkey,
           |    min(CAST(l_shipdate AS DATE)) AS first_ship,
           |    max(CAST(l_shipdate AS DATE)) AS last_ship,
           |    count(*) AS n_items
           |  FROM lineitem GROUP BY 1),
           |j AS (
           |  SELECT o_orderpriority,
           |    first_ship - CAST(o_orderdate AS DATE) AS lag_days, n_items
           |  FROM orders JOIN li USING (o_orderkey))
           |SELECT o_orderpriority, count(*) AS n_orders,
           |  round(avg(CAST(lag_days AS DOUBLE)), 4) AS avg_lag_days,
           |  CAST(min(lag_days) AS INTEGER) AS min_lag_days,
           |  CAST(max(lag_days) AS INTEGER) AS max_lag_days,
           |  round(avg(CAST(n_items AS DOUBLE)), 4) AS avg_items
           |FROM j GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Bloom-prefiltered semi-join: revenue of lineitems whose order is
    * urgent + finished, where the keep-set (≈7% of orders) is assumed
    * too large to broadcast at 100 TB. A compact bloom filter over the
    * keep keys (built by one aggregation, shipped as a scalar subquery)
    * drops definitely-absent fact rows BEFORE the shuffle; the exact
    * semi-join after it removes bloom false positives, so the result is
    * bit-identical to the plain semi-join the oracle runs. This is the
    * engine-explicit form of Spark's own runtime-filter injection —
    * declared in the query so it fires regardless of optimizer
    * heuristics. Sizing: the filter is built for the ACTUAL keep-key
    * count (one cheap aggregation over the filtered dimension side,
    * the same eager-model-state pattern as the IVF quantizer) at
    * 8 bits/key ≈ 2% false positives — a hard-coded size would
    * silently saturate at a larger SF and degrade the prefilter to an
    * all-pass that still pays a per-row probe. */
  val q124BloomSemiJoin = GraftQuery(
    "q124_bloom_semi_join",
    (s, dir) => {
      val keep = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
        .select("o_orderkey")
      val nKeep = math.max(keep.count(), 1L)
      val bf = keep.agg(
        graft.functions.Bloom.filterAgg(xxhash64(col("o_orderkey")), nKeep, 8L * nKeep)
          .as("bf"))
      Tables.lineitem(s, dir)
        .where(graft.functions.Bloom.mightContain(bf, xxhash64(col("l_orderkey"))))
        .join(keep, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           |FROM lineitem
           |WHERE l_orderkey IN (
           |  SELECT o_orderkey FROM orders
           |  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F')
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  val all: Seq[GraftQuery] = Seq(
    q01PricingSummary, q02RevenueByNation, q03TopPerSupplier,
    q04SurrogateIds, q05NeverOrderedParts, q06CustomersWithUrgentOrders,
    q120OrphanAudit, q121OrderLifecycle, q124BloomSemiJoin)
}
