package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One entry in the engine's query surface.
  *
  * @param name   stable identifier (key in `SparkEntry.queries`)
  * @param run    builds the result for a given testdata dir
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables (None → driver records a weaker rows-only check).
  *               Column names/aliases MUST match the Spark result exactly.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Shared session tuning applied by Verify/Bench/tests.
    * ANSI off: the reference's semantics are Postgres-lenient
    * (cast failure routes rows, never aborts — Cleansing.sql:87-106);
    * try-cast-to-NULL is the engine-wide contract (SURVEY §2 F2).
    */
  val sessionConfs: Map[String, String] = Map(
    // engine Catalyst extensions (CubeGuard resolution rule)
    "spark.sql.extensions" -> "graft.plans.GraftExtensions",
    "spark.sql.ansi.enabled" -> "false",
    "spark.sql.adaptive.enabled" -> "true",
    // coalesce post-shuffle partitions to the advisory SIZE rather than
    // maximizing parallelism (the setting Spark's own tuning guide
    // recommends for production): a stage's task count then tracks its
    // data volume, so small stages stop paying per-task fixed costs
    // times the core count — at 100 TB big shuffles still fan out to
    // size-bounded partitions, while tiny dimension-sized stages run in
    // a handful of tasks whether the session has 4 cores or 1000.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
    // let AQE re-plan (and size-coalesce) stages UNDER cached plans
    // too: the engine's operators persist delta feeds / CDC merge
    // joins, and with this off every cached subplan runs at the static
    // shuffle-partition count — 32 tasks for a few-hundred-row MV
    // delta. Scale-adaptive in both directions (guide §2.2): big
    // cached plans still fan out to size-bounded partitions.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects outright; read as epoch-nanos longs and convert in
    // Tables.events.
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")
}
