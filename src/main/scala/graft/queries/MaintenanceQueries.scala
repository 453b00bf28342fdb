package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.Observation
import graft.{GraftQuery, Tables}

/** Table-maintenance operators: the jobs a lakehouse runs BETWEEN
  * queries to keep 100 TB readable — small-file compaction planning
  * and single-pass pipeline observability.
  */
object MaintenanceQueries {

  /** Small-file compaction planner. The documents corpus is treated as
    * a ledger of per-source data files (64 doc_id ranges per source,
    * sized by their text bytes); the planner assigns CONTIGUOUS file
    * runs to compaction groups by cumulative-size binning: a file's
    * group is `floor(bytes_before_it / target)` within its source, so
    * every group is a consecutive range totalling ≈ the target size —
    * exactly the grouping OPTIMIZE-style compaction executes, and
    * contiguity is what keeps a sort-ordered layout sorted after the
    * rewrite.
    *
    * Scale: one window cumsum PARTITIONED BY source (parallel across
    * sources, no global sort), then one aggregation — both shuffles on
    * the same key. A 100 TB table's file ledger is ~10^6 rows — this
    * plan costs nothing next to the rewrite it schedules. */
  val q186CompactionPlan = GraftQuery(
    "q186_compaction_plan",
    (s, dir) => {
      val target = 400000L // bytes per compaction group
      val files = Tables.documents(s, dir)
        .groupBy(col("source"), (col("doc_id") % 64).as("file_id"))
        .agg(sum("n_chars").as("bytes"), count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("source").orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("grp",
          (coalesce(sum("bytes").over(w), lit(0L)) / target).cast("long"))
        .groupBy("source", "grp")
        .agg(count(lit(1)).as("n_files"), sum("bytes").as("grp_bytes"),
          sum("n_docs").as("n_docs"),
          min("file_id").as("first_file"), max("file_id").as("last_file"))
        .orderBy("source", "grp")
    },
    Some("""WITH files AS (
           |  SELECT source, doc_id % 64 AS file_id,
           |    CAST(sum(n_chars) AS BIGINT) AS bytes, count(*) AS n_docs
           |  FROM documents GROUP BY 1, 2),
           |planned AS (
           |  SELECT source, file_id, bytes, n_docs,
           |    CAST(COALESCE(sum(bytes) OVER (PARTITION BY source
           |      ORDER BY file_id ROWS BETWEEN UNBOUNDED PRECEDING
           |      AND 1 PRECEDING), 0) // 400000 AS BIGINT) AS grp
           |  FROM files)
           |SELECT source, grp, count(*) AS n_files,
           |  CAST(sum(bytes) AS BIGINT) AS grp_bytes,
           |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
           |  min(file_id) AS first_file, max(file_id) AS last_file
           |FROM planned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Single-pass pipeline observability: Spark's `observe` API
    * (CollectMetrics plan node) computes data-quality counters DURING
    * the main pass — row counts, null rates, value bounds — with zero
    * extra scans; executors fold the metrics into accumulators as the
    * rows stream through. This is how a production ingest reports
    * health at 100 TB: the alternative (a second aggregation query)
    * doubles the read. The gate query returns the observed metrics as
    * a one-row table; the oracle recomputes them declaratively. */
  val q187ObservedProfile = GraftQuery(
    "q187_observed_profile",
    (s, dir) => {
      val obs = Observation()
      val li = Tables.lineitem(s, dir).observe(
        obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity").isNull, 1).otherwise(0)).as("null_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        max("l_quantity").as("max_qty"))
      // the observed pass does real work (a filtered write-shaped
      // projection); metrics cover ALL rows seen, pre-filter
      li.filter(col("l_quantity") > 0).select("l_orderkey").count()
      val m = obs.get
      def asL(k: String) = m(k).asInstanceOf[Number].longValue()
      def asD(k: String) = m(k).asInstanceOf[Number].doubleValue()
      import s.implicits._
      Seq((asL("n_rows"), asL("null_qty"), asD("revenue"), asD("max_qty")))
        .toDF("n_rows", "null_qty", "revenue", "max_qty")
    },
    Some("""SELECT count(*) AS n_rows,
           |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS null_qty,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           |  max(l_quantity) AS max_qty
           |FROM lineitem""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q186CompactionPlan, q187ObservedProfile)
}
