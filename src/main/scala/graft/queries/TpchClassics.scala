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

  val all: Seq[GraftQuery] = Seq(q41LateOrders, q42CustDist, q43TopSupplier,
    q44LargeOrders, q45MinCostSupplier, q46RevenueShare)
}
