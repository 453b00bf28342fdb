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

  /** Approximate distinct via HyperLogLog++ — the 100 TB path where an
    * exact distinct would shuffle every key. Rows-only check (HLL
    * estimates are engine-specific); `ExtrasSpec` bounds the error
    * against the exact count. */
  val q34DistinctApprox = GraftQuery(
    "q34_distinct_approx",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct("user_id", 0.02).as("n_users_approx"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type"),
    None)

  val all: Seq[GraftQuery] = Seq(q18FullOuter, q33DistinctExact, q34DistinctApprox)
}
