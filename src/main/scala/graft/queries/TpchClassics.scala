package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftQuery, Tables}

/** Classic TPC-H query shapes (Q4/Q13/Q15/Q18 analogues) adapted to
  * the testdata schema — the analyst workload a warehouse engine must
  * run beyond the reference's own ETL surface. */
object TpchClassics {

  /** Q4 shape — EXISTS with a range predicate: orders having a
    * late-shipped line (shipdate > orderdate + 60d), counted by
    * priority. Semi join keeps the probe narrow. */
  val q41LateOrders = GraftQuery(
    "q41_tpch_q4_late_orders",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val late = o.join(li,
        o("o_orderkey") === li("l_orderkey") and
          li("l_shipdate").cast("date") > date_add(o("o_orderdate").cast("date"), 60),
        "left_semi")
      late.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
           |FROM orders o
           |WHERE EXISTS (
           |  SELECT 1 FROM lineitem l
           |  WHERE l.l_orderkey = o.o_orderkey
           |    AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY)
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  /** Q13 shape — LEFT OUTER join + two-level aggregation: the
    * distribution of order counts per customer, including zero-order
    * customers (the outer join's null side). */
  val q42CustDist = GraftQuery(
    "q42_tpch_q13_custdist",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(!col("o_orderpriority").startsWith("5"))
      val perCust = c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, count(*) AS custdist FROM (
           |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
           |  FROM customer c LEFT OUTER JOIN orders o
           |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority NOT LIKE '5%'
           |  GROUP BY c.c_custkey)
           |GROUP BY c_count
           |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  /** Q15 shape — derived revenue view + scalar-max subquery: the
    * supplier(s) achieving the maximum 1996 revenue. The max is a
    * broadcast one-row cross join, not a correlated rescan. */
  val q43TopSupplier = GraftQuery(
    "q43_tpch_q15_top_supplier",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(year(col("l_shipdate")) === 1996)
      val revenue = li.groupBy(col("l_suppkey").as("supplier_no"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("total_revenue"))
      val maxRev = revenue.agg(max("total_revenue").as("max_revenue"))
      val sup = Tables.supplier(s, dir)
      revenue.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
        .join(broadcast(sup), col("supplier_no") === sup("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""WITH revenue AS (
           |  SELECT l_suppkey AS supplier_no,
           |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
           |  FROM lineitem WHERE year(l_shipdate) = 1996
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, total_revenue
           |FROM supplier JOIN revenue ON s_suppkey = supplier_no
           |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
           |ORDER BY s_suppkey""".stripMargin))

  /** Q18 shape — HAVING-filtered membership join-back: orders whose
    * total quantity exceeds a threshold, with customer context. The
    * aggregate runs once; the membership is a semi-join on its result
    * (no IN-subquery rescan). */
  val q44LargeOrders = GraftQuery(
    "q44_tpch_q18_large_orders",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val big = li.groupBy("l_orderkey")
        .agg(round(sum("l_quantity"), 2).as("total_qty"))
        .filter(col("total_qty") > 150)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("total_qty"))
        .orderBy("o_orderkey")
    },
    Some("""WITH big AS (
           |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
           |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
           |SELECT c_custkey, c_name, o_orderkey,
           |  round(o_totalprice, 2) AS o_totalprice, total_qty
           |FROM orders
           |JOIN big ON o_orderkey = big.l_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |ORDER BY o_orderkey""".stripMargin))

  /** Q2 shape — correlated-min join-back: for each part, the
    * supplier(s) selling it at the minimum observed unit price. The
    * correlated `= (SELECT min ...)` becomes one grouped aggregate +
    * an equi-join back (no per-row rescan). */
  val q45MinCostSupplier = GraftQuery(
    "q45_tpch_q2_min_cost_supplier",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("unit_price", col("l_extendedprice") / col("l_quantity"))
      val minPrice = li.groupBy(col("l_partkey").as("mp_partkey"))
        .agg(min("unit_price").as("min_price"))
      li.join(minPrice,
          li("l_partkey") === col("mp_partkey") and
            li("unit_price") === col("min_price"))
        .select(col("l_partkey"), col("l_suppkey"), col("unit_price"))
        .distinct()
        .orderBy("l_partkey", "l_suppkey")
    },
    // raw double output: IEEE division is identical in both engines,
    // while round()'s half-way tie-breaking is not
    Some("""SELECT DISTINCT l_partkey, l_suppkey,
           |  l_extendedprice / l_quantity AS unit_price
           |FROM lineitem l
           |WHERE l_extendedprice / l_quantity = (
           |  SELECT min(l2.l_extendedprice / l2.l_quantity)
           |  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
           |ORDER BY l_partkey, l_suppkey""".stripMargin))

  /** Q11 shape — share-of-global-total in HAVING: nations whose
    * revenue exceeds 4% of the total. The scalar total is a one-row
    * broadcast cross join, computed once. */
  val q46RevenueShare = GraftQuery(
    "q46_tpch_q11_revenue_share",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val byNation = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name").as("nation_name"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val total = byNation.agg(sum("rev").as("total_rev"))
      byNation.crossJoin(broadcast(total))
        .filter(col("rev") > col("total_rev") * 0.04)
        .select(col("nation_name"), round(col("rev"), 2).as("revenue"),
          round(col("rev") / col("total_rev"), 6).as("share"))
        .orderBy(col("revenue").desc, col("nation_name"))
    },
    Some("""WITH by_nation AS (
           |  SELECT n_name AS nation_name,
           |    sum(l_extendedprice * (1.0 - l_discount)) AS rev
           |  FROM lineitem
           |  JOIN orders   ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation   ON c_nationkey = n_nationkey
           |  GROUP BY 1)
           |SELECT nation_name, round(rev, 2) AS revenue,
           |  round(rev / (SELECT sum(rev) FROM by_nation), 6) AS share
           |FROM by_nation
           |WHERE rev > (SELECT sum(rev) FROM by_nation) * 0.04
           |ORDER BY revenue DESC, nation_name""".stripMargin))

  /** Q7 shape — volume shipping between nation pairs: double nation
    * join (supplier's vs customer's) + year rollup. Both nation sides
    * and both dim sides broadcast; the only wide exchange is the
    * lineitem⋈orders join and the final group-by. */
  val q47NationVolume = GraftQuery(
    "q47_tpch_q7_nation_volume",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), sup("s_nationkey") === col("sn_key"))
        .join(broadcast(n2), c("c_nationkey") === col("cn_key"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(li("l_shipdate")).cast("long").as("l_year"))
        // exact decimal arithmetic: with ~4,000 output groups, double
        // sums land on .xx5 cent boundaries often enough to flip
        // round(, 2) between engines; decimals are order-independent
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))), 2)
          .cast("double").as("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           |  year(l_shipdate) AS l_year,
           |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
           |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2)
           |    AS DOUBLE) AS volume
           |FROM lineitem
           |JOIN orders    ON l_orderkey = o_orderkey
           |JOIN supplier  ON l_suppkey = s_suppkey
           |JOIN customer  ON o_custkey = c_custkey
           |JOIN nation sn ON s_nationkey = sn.n_nationkey
           |JOIN nation cn ON c_nationkey = cn.n_nationkey
           |WHERE sn.n_name <> cn.n_name
           |GROUP BY 1, 2, 3
           |ORDER BY 1, 2, 3""".stripMargin))

  /** Q8 shape — market share: one nation's slice of a region's yearly
    * revenue, as a conditional-sum ratio inside one aggregation (no
    * second pass over the join). Part filter exercises scan pushdown
    * on the fifth broadcast dim. */
  val q48MarketShare = GraftQuery(
    "q48_tpch_q8_market_share",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val pt = Tables.part(s, dir).filter(col("p_size") <= 25)
      val nc = Tables.nation(s, dir)
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cr_key"))
      val ns = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(nc), c("c_nationkey") === col("cn_key"))
        .join(broadcast(r), col("cr_key") === r("r_regionkey"))
        .join(broadcast(ns), sup("s_nationkey") === col("sn_key"))
        .groupBy(year(o("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_2", vol).otherwise(0.0)) / sum(vol),
          6).as("mkt_share"))
        .orderBy("o_year")
    },
    Some("""SELECT year(o_orderdate) AS o_year,
           |  round(sum(CASE WHEN sn.n_name = 'NATION_2'
           |                 THEN l_extendedprice * (1.0 - l_discount)
           |                 ELSE 0.0 END)
           |    / sum(l_extendedprice * (1.0 - l_discount)), 6) AS mkt_share
           |FROM lineitem
           |JOIN orders    ON l_orderkey = o_orderkey
           |JOIN part      ON l_partkey = p_partkey AND p_size <= 25
           |JOIN supplier  ON l_suppkey = s_suppkey
           |JOIN customer  ON o_custkey = c_custkey
           |JOIN nation cn ON c_nationkey = cn.n_nationkey
           |JOIN region    ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
           |JOIN nation sn ON s_nationkey = sn.n_nationkey
           |GROUP BY 1
           |ORDER BY 1""".stripMargin))

  /** Q20 shape — nested quantity-share subqueries, decorrelated:
    * suppliers who shipped more than 15% of some part's total
    * quantity. Two grouped aggregates + an equi-join back replace the
    * correlated IN/share-of-subquery chain; the share comparison is
    * deterministic (integral-double sums are exact, and both engines
    * compute the same IEEE product for the threshold). */
  val q49DominantSuppliers = GraftQuery(
    "q49_tpch_q20_dominant_suppliers",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ps = li.groupBy("l_partkey", "l_suppkey")
        .agg(sum("l_quantity").as("supp_qty"))
      val pt = li.groupBy(col("l_partkey").as("t_partkey"))
        .agg(sum("l_quantity").as("part_qty"))
      val n = Tables.nation(s, dir)
      val sup = Tables.supplier(s, dir)
      ps.join(pt, ps("l_partkey") === col("t_partkey"))
        .filter(col("supp_qty") > col("part_qty") * 0.15)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).cast("long").as("parts_dominated"))
        .join(broadcast(sup), col("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .select(col("s_name"), col("n_name").as("nation_name"),
          col("parts_dominated"))
        .orderBy("s_name")
    },
    Some("""WITH ps AS (
           |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
           |  FROM lineitem GROUP BY 1, 2),
           |pt AS (
           |  SELECT l_partkey, sum(l_quantity) AS part_qty
           |  FROM lineitem GROUP BY 1),
           |dom AS (
           |  SELECT l_suppkey, count(*) AS parts_dominated
           |  FROM ps JOIN pt USING (l_partkey)
           |  WHERE supp_qty > part_qty * 0.15
           |  GROUP BY 1)
           |SELECT s_name, n_name AS nation_name,
           |  CAST(parts_dominated AS BIGINT) AS parts_dominated
           |FROM dom
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation   ON s_nationkey = n_nationkey
           |ORDER BY s_name""".stripMargin))

  /** Q3 shape — segment-filtered top-N: highest-revenue unshipped
    * orders for one market segment. The LIMIT is deterministic (revenue
    * desc, then orderkey), so the hash gate is stable; revenue uses
    * exact decimal sums so ranking can't flip between engines. */
  val q61Unshipped = GraftQuery(
    "q61_tpch_q3_unshipped",
    (s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate").cast("date") < lit("1997-06-01"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate").cast("date") > lit("1997-06-01"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(li("l_orderkey"),
          date_format(o("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          o("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))), 2)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey,
           |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
           |  o_orderpriority,
           |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
           |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2)
           |    AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND CAST(o_orderdate AS DATE) < DATE '1997-06-01'
           |  AND CAST(l_shipdate AS DATE) > DATE '1997-06-01'
           |GROUP BY 1, 2, 3
           |ORDER BY revenue DESC, l_orderkey
           |LIMIT 10""".stripMargin))

  /** Q5 shape — region-local supplier revenue: the supplier must sit in
    * the customer's nation (the extra `c_nationkey = s_nationkey`
    * equi-term on the supplier join), rolled up by nation. */
  val q62LocalSupplier = GraftQuery(
    "q62_tpch_q5_local_supplier",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1996)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup),
          li("l_suppkey") === sup("s_suppkey") and
            c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name").as("nation_name"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))), 2)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("nation_name"))
    },
    Some("""SELECT n_name AS nation_name,
           |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
           |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2)
           |    AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |JOIN nation   ON c_nationkey = n_nationkey
           |JOIN region   ON n_regionkey = r_regionkey
           |WHERE year(o_orderdate) = 1996 AND r_name = 'ASIA'
           |GROUP BY 1
           |ORDER BY revenue DESC, nation_name""".stripMargin))

  /** Q10 shape — returned-item losers: top 20 customers by revenue on
    * 'R'-flagged lines in one quarter, with nation context.
    * Deterministic LIMIT via (revenue desc, custkey). */
  val q63ReturnedItems = GraftQuery(
    "q63_tpch_q10_returned_items",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate").cast("date") >= lit("1996-10-01") and
          col("o_orderdate").cast("date") < lit("1997-01-01"))
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(c("c_custkey"), c("c_name"),
          round(c("c_acctbal"), 2).as("c_acctbal"), n("n_name").as("nation_name"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))), 2)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
           |  n_name AS nation_name,
           |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
           |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2)
           |    AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation   ON c_nationkey = n_nationkey
           |WHERE l_returnflag = 'R'
           |  AND CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
           |  AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
           |GROUP BY 1, 2, 3, 4
           |ORDER BY revenue DESC, c_custkey
           |LIMIT 20""".stripMargin))

  /** Q21 shape — sole late supplier: suppliers who were the ONLY late
    * shipper on a multi-supplier order (EXISTS + NOT-EXISTS over the
    * same join, decorrelated into one per-order aggregate: distinct
    * supplier count vs distinct late-supplier count). */
  val q64SoleLateSupplier = GraftQuery(
    "q64_tpch_q21_sole_late_supplier",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val lo = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(li("l_orderkey").as("ok"), li("l_suppkey"),
          (li("l_shipdate").cast("date") >
            date_add(o("o_orderdate").cast("date"), 60)).as("late"))
      val per = lo.groupBy("ok")
        .agg(countDistinct("l_suppkey").as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"))
        .filter(col("n_supp") >= 2 and col("n_late") === 1)
      val sup = Tables.supplier(s, dir)
      lo.filter(col("late")).select("ok", "l_suppkey").distinct()
        .join(per, "ok")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(sup), col("l_suppkey") === sup("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },
    Some("""WITH lo AS (
           |  SELECT l_orderkey AS ok, l_suppkey,
           |    CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY AS late
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |per AS (
           |  SELECT ok, count(DISTINCT l_suppkey) AS n_supp,
           |    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
           |  FROM lo GROUP BY ok
           |  HAVING count(DISTINCT l_suppkey) >= 2
           |     AND count(DISTINCT CASE WHEN late THEN l_suppkey END) = 1),
           |waiting AS (
           |  SELECT DISTINCT ok, l_suppkey FROM lo WHERE late),
           |cnt AS (
           |  SELECT l_suppkey, count(*) AS numwait
           |  FROM waiting JOIN per USING (ok) GROUP BY 1)
           |SELECT s_name, numwait
           |FROM cnt JOIN supplier ON l_suppkey = s_suppkey
           |ORDER BY numwait DESC, s_name""".stripMargin))

  /** Q17 shape — small-quantity niche revenue: lines of one brand whose
    * quantity is below 20% of that part's average quantity. The
    * correlated avg becomes one grouped aggregate joined back; the
    * comparison is deterministic because integer-valued double sums are
    * exact. */
  val q65SmallQtyRevenue = GraftQuery(
    "q65_tpch_q17_small_qty_revenue",
    (s, dir) => {
      val pt = Tables.part(s, dir).filter(col("p_brand") === "Brand#23")
      val li = Tables.lineitem(s, dir)
        .join(broadcast(pt), col("l_partkey") === pt("p_partkey"))
      val avgQty = li.groupBy(col("l_partkey").as("aq_partkey"))
        .agg(avg("l_quantity").as("avg_qty"))
      li.join(avgQty, col("l_partkey") === col("aq_partkey"))
        .filter(col("l_quantity") < col("avg_qty") * 0.2)
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double") / 7.0, 2).as("avg_yearly"))
    },
    Some("""SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           |    / 7.0, 2) AS avg_yearly
           |FROM lineitem l
           |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'
           |WHERE l_quantity < 0.2 * (
           |  SELECT avg(l2.l_quantity) FROM lineitem l2
           |  WHERE l2.l_partkey = l.l_partkey)""".stripMargin))

  /** Q19 shape — disjunction of conjunctive brand/size/quantity bands:
    * the OR-of-ANDs predicate a scan must evaluate without exploding
    * the join (part side broadcast; predicate stays in one codegen'd
    * filter). */
  val q66DisjunctiveBands = GraftQuery(
    "q66_tpch_q19_disjunctive_bands",
    (s, dir) => {
      val pt = Tables.part(s, dir)
      val li = Tables.lineitem(s, dir)
      val j = li.join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
      val bands =
        (pt("p_brand") === "Brand#12" and pt("p_size").between(1, 5) and
          li("l_quantity").between(1, 11)) or
        (pt("p_brand") === "Brand#23" and pt("p_size").between(1, 10) and
          li("l_quantity").between(10, 20)) or
        (pt("p_brand") === "Brand#34" and pt("p_size").between(1, 15) and
          li("l_quantity").between(20, 30))
      j.filter(bands)
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))), 2)
            .cast("double").as("revenue"))
    },
    Some("""SELECT count(*) AS n_lines,
           |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
           |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2)
           |    AS DOUBLE) AS revenue
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           |       AND l_quantity BETWEEN 1 AND 11)
           |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           |       AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin))

  /** Q22 shape — idle wealthy customers: above-average balance and no
    * URGENT (priority 1) order — every synthetic customer has at least
    * one order, so the anti-join target is the filtered order set.
    * Scalar avg via one-row broadcast cross join; "none exists" via
    * left-anti join (never an IN-subquery rescan). Grouped by market
    * segment (the testdata's analogue of the phone prefix). */
  val q67IdleCustomers = GraftQuery(
    "q67_tpch_q22_idle_customers",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority").startsWith("1"))
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(avg("c_acctbal").as("avg_bal"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS numcust,
           |  round(sum(c_acctbal), 2) AS totacctbal
           |FROM customer c
           |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
           |  AND NOT EXISTS (SELECT 1 FROM orders o
           |                  WHERE o.o_custkey = c.c_custkey
           |                    AND o.o_orderpriority LIKE '1%')
           |GROUP BY 1
           |ORDER BY 1""".stripMargin))

  /** Q16 shape — supplier variety per part class: distinct-supplier
    * counts by (brand, type, size) from the lineitem part-supplier
    * relation, excluding blacklisted (negative-balance) suppliers via
    * left-anti join. */
  val q68SupplierVariety = GraftQuery(
    "q68_tpch_q16_supplier_variety",
    (s, dir) => {
      val pt = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#1" and col("p_size") <= 20)
      val bad = Tables.supplier(s, dir).filter(col("s_acctbal") < 0.0)
      val li = Tables.lineitem(s, dir)
      li.join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
        .join(broadcast(bad), li("l_suppkey") === bad("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
           |  count(DISTINCT l_suppkey) AS supplier_cnt
           |FROM lineitem
           |JOIN part ON l_partkey = p_partkey
           |WHERE p_brand <> 'Brand#1' AND p_size <= 20
           |  AND l_suppkey NOT IN (
           |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
           |GROUP BY 1, 2, 3
           |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin))

  /** Q6 shape — the pure scan-aggregate forecast query: one filter set
    * (year, discount band, quantity cap), no joins. The benchmark's
    * pushdown showcase: every predicate must reach the parquet scan. */
  val q81ForecastRevenue = GraftQuery(
    "q81_tpch_q6_forecast_revenue",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(year(col("l_shipdate")) === 1996 and
          col("l_discount").between(0.05, 0.07) and col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(3,2)")), 2).cast("double").as("revenue")),
    Some("""SELECT count(*) AS n_lines,
           |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
           |    CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE) AS revenue
           |FROM lineitem
           |WHERE year(l_shipdate) = 1996
           |  AND l_discount BETWEEN 0.05 AND 0.07
           |  AND l_quantity < 24""".stripMargin))

  /** Q14 shape — promo revenue share: a conditional-sum ratio inside
    * one aggregation over a month window (the testdata's p_type has a
    * literal 'PROMO' class). */
  val q82PromoShare = GraftQuery(
    "q82_tpch_q14_promo_share",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate").cast("date") >= lit("1996-09-01") and
          col("l_shipdate").cast("date") < lit("1996-10-01"))
      val pt = Tables.part(s, dir)
      val vol = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))
      li.join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
        .agg(round(
          sum(when(pt("p_type") === "PROMO", vol).otherwise(lit(0).cast("decimal(18,2)")))
            .cast("double") * 100.0 / sum(vol).cast("double"), 6).as("promo_share"))
    },
    Some("""SELECT round(
           |  CAST(sum(CASE WHEN p_type = 'PROMO'
           |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
           |         (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
           |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 /
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
           |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE),
           |  6) AS promo_share
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
           |  AND CAST(l_shipdate AS DATE) <  DATE '1996-10-01'""".stripMargin))

  /** Q12 shape — conditional priority counts per ship-delay bucket
    * (the schema has no shipmode, so the Q12 group key is adapted to
    * the delay band): urgent (priority 1-2) vs other order counts in
    * one pass. */
  val q83DelayPriority = GraftQuery(
    "q83_tpch_q12_delay_priority",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val delay = datediff(li("l_shipdate").cast("date"), o("o_orderdate").cast("date"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .withColumn("delay_bucket",
          when(delay > 90, ">90").when(delay > 60, "61-90")
            .when(delay > 30, "31-60").otherwise("<=30"))
        .groupBy("delay_bucket")
        .agg(
          sum(when(col("o_orderpriority").startsWith("1") or
            col("o_orderpriority").startsWith("2"), 1L).otherwise(0L)).as("urgent_lines"),
          sum(when(col("o_orderpriority").startsWith("1") or
            col("o_orderpriority").startsWith("2"), 0L).otherwise(1L)).as("other_lines"))
        .orderBy("delay_bucket")
    },
    Some("""SELECT CASE
           |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90 THEN '>90'
           |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60 THEN '61-90'
           |    WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 30 THEN '31-60'
           |    ELSE '<=30' END AS delay_bucket,
           |  CAST(sum(CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
           |       THEN 1 ELSE 0 END) AS BIGINT) AS urgent_lines,
           |  CAST(sum(CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
           |       THEN 0 ELSE 1 END) AS BIGINT) AS other_lines
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Q9 shape — product-line profit by nation and year: the widest
    * join tree in the set (lineitem ⋈ orders ⋈ supplier ⋈ nation ⋈
    * part-with-name-filter), profit = revenue − cost with retail price
    * standing in for the missing supplycost (documented adaptation). */
  val q84NationProfit = GraftQuery(
    "q84_tpch_q9_nation_profit",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val pt = Tables.part(s, dir).filter(col("p_name").contains("bolt"))
      val profit = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")) -
        col("p_retailprice").cast("decimal(18,2)") *
          col("l_quantity").cast("decimal(18,2)") * lit(0.1).cast("decimal(3,1)")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name").as("nation_name"),
          year(o("o_orderdate")).cast("long").as("o_year"))
        .agg(round(sum(profit), 2).cast("double").as("profit"))
        .orderBy(col("nation_name"), col("o_year").desc)
    },
    Some("""SELECT n_name AS nation_name, year(o_orderdate) AS o_year,
           |  CAST(round(sum(
           |    CAST(l_extendedprice AS DECIMAL(18,2)) *
           |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) -
           |    CAST(p_retailprice AS DECIMAL(18,2)) *
           |      CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(3,1))), 2)
           |    AS DOUBLE) AS profit
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation   ON s_nationkey = n_nationkey
           |GROUP BY 1, 2
           |ORDER BY nation_name, o_year DESC""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q41LateOrders, q42CustDist, q43TopSupplier,
    q44LargeOrders, q45MinCostSupplier, q46RevenueShare, q47NationVolume,
    q48MarketShare, q49DominantSuppliers, q61Unshipped, q62LocalSupplier,
    q63ReturnedItems, q64SoleLateSupplier, q65SmallQtyRevenue,
    q66DisjunctiveBands, q67IdleCustomers, q68SupplierVariety,
    q81ForecastRevenue, q82PromoShare, q83DelayPriority, q84NationProfit)
}
