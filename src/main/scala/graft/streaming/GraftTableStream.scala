package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.GraftTable

/** Structured-Streaming SOURCE over a [[GraftTable]] — the ROWS view
  * (Delta-source semantics: snapshot-then-tail), complementing the
  * CHANGES view ([[GraftCdfSource]]):
  *
  * {{{
  *   spark.readStream.format("graft")
  *     .option("path", root)
  *     .load()                        // the table's columns, no _change
  *     .writeStream...                // e.g. into a downstream table
  * }}}
  *
  * Offsets are TABLE VERSIONS. Batch 0 is the FULL SNAPSHOT at
  * `startingVersion` (default: the latest version when the query
  * starts — "give me the table, then keep it coming"); every later
  * batch is the rows ADDED OR UPSERTED in its version window —
  * `changes(a, b]` restricted to inserts and update postimages, cost
  * proportional to what changed, never to table size. Downstream
  * consumers see upserts as re-emitted rows (keyed sinks dedup — the
  * graft sink's merge does), the Delta `ignoreChanges` contract made
  * exact by the row-level diff.
  *
  * DELETEs have no representation in a rows-only stream: a version
  * window containing deletes FAILS the batch (an in-plan guard — no
  * extra driver pass) unless `ignoreDeletes=true` opts into skipping
  * them — exactly Delta's source contract. Consumers who need
  * deletes stream the change feed (`graft-cdf`) instead.
  *
  * `maxVersionsPerTrigger` paces catch-up: a stream restarted fifty
  * commits behind drains in bounded windows instead of one
  * fifty-version batch (the broker-log admission-control idea at the
  * table-version granularity). Restart safety is the engine's offset
  * checkpoint: getBatch replays the exact version window, and the
  * diff is deterministic given the manifests.
  *
  * INCOMPATIBLE HISTORY refuses at start: if a column of the
  * `startingVersion` schema was DROPPED by the time the query starts,
  * there is no single output schema that serves both ends of the
  * stream — the source fails construction with the offending column
  * named (Delta's non-additive-schema-change rule). Columns ADDED
  * mid-history are fine: older windows NULL-pad them.
  */
class GraftTableSource(spark: org.apache.spark.sql.classic.SparkSession,
    parameters: Map[String, String]) extends Source {

  private val root = parameters.getOrElse("path",
    sys.error("graft streaming source needs .option(\"path\", tableRoot)"))
  private val key = parameters.getOrElse("key",
    GraftTable.keyColumn(spark, root).getOrElse(
      sys.error("graft streaming source needs .option(\"key\", ...) for " +
        "tables created before the key column was recorded in the log")))
  private val latestAtStart = GraftTable.latestVersion(spark, root)
  require(latestAtStart >= 0, s"no graft table at $root")
  private val startingVersion =
    parameters.get("startingVersion").map(_.toInt).getOrElse(latestAtStart)
  private val maxVersionsPerTrigger =
    parameters.get("maxVersionsPerTrigger").map(_.toInt)
  private val ignoreDeletes =
    parameters.get("ignoreDeletes").exists(_.toBoolean)
  private val failOnDataLoss =
    parameters.get("failOnDataLoss").forall(_.toBoolean)

  override val schema: StructType = {
    val head = GraftTable.tableSchema(spark, root, latestAtStart)
    // incompatible-history check: every column of the starting
    // snapshot must still exist (same name, same type) at the head —
    // a drop or type change below the start version has no single
    // output schema
    if (GraftTable.availableVersions(spark, root).contains(startingVersion)) {
      val headFields = head.fields.map(f => f.name -> f.dataType).toMap
      GraftTable.tableSchema(spark, root, startingVersion).fields.foreach {
        f =>
          val now = headFields.get(f.name)
          require(now.contains(f.dataType),
            s"graft streaming source: column '${f.name}' of version " +
              s"$startingVersion was ${if (now.isEmpty) "DROPPED"
                else s"retyped to ${now.get}"} by version $latestAtStart — " +
              "no single schema serves this history; start from a newer " +
              "version or stream the change feed (graft-cdf)")
      }
    }
    head
  }

  /** Highest version already handed to the engine — the base the
    * per-trigger cap advances from. Restored on restart by the
    * engine's recovery `getBatch` call for the committed window (the
    * v1 Source contract), so the cap never re-serves history. */
  private var lastServed: Option[Int] = None

  /** The version to diff FROM, honoring the data-loss contract when
    * `want`'s manifest has been vacuumed (same rule as graft-cdf). */
  private def resolveStart(want: Int): Int = {
    val avail = GraftTable.availableVersions(spark, root)
    if (avail.contains(want)) want
    else {
      val earliest = avail.headOption.getOrElse(
        sys.error(s"no graft table at $root"))
      if (failOnDataLoss) throw new IllegalStateException(
        s"graft source data loss: version $want of $root was vacuumed " +
          s"(earliest available is $earliest). Restart from a fresh " +
          "checkpoint, or set .option(\"failOnDataLoss\", false).")
      earliest
    }
  }

  override def getOffset: Option[Offset] = {
    val latest = GraftTable.latestVersion(spark, root)
    if (latest < startingVersion) return None
    val capped = (lastServed, maxVersionsPerTrigger) match {
      case (None, _) => startingVersion // batch 0: the snapshot alone
      case (Some(s), Some(n)) => math.min(latest, s + math.max(1, n))
      case (Some(_), None) => latest
    }
    Some(LongOffset(capped.toLong))
  }

  private def versionOf(o: Offset): Int = o.json().trim.toLong.toInt

  /** The rows view of a version window: inserts + update postimages;
    * deletes fail IN-PLAN (CaseWhen evaluates lazily per row — the
    * guard costs nothing on delete-free windows and never needs a
    * separate driver pass) unless `ignoreDeletes`. */
  private def windowRows(fromV: Int, toV: Int): DataFrame = {
    val feed = GraftTable.changes(spark, root, fromV, toV, key)
    val guarded =
      if (ignoreDeletes) feed.filter(col("_change") =!= "delete")
      else feed.filter(
        when(col("_change") === "delete",
          raise_error(lit(s"graft streaming source: version window " +
            s"($fromV, $toV] of $root contains DELETEs, which a " +
            "rows-only stream cannot represent. Set " +
            ".option(\"ignoreDeletes\", true) to skip them, or stream " +
            "the change feed (format \"graft-cdf\").")).cast("boolean"))
          .otherwise(lit(true)))
    align(guarded.drop("_change"), toV)
  }

  /** NULL-pad columns added to the table after `v` (older windows
    * read with their era's schema); refuse if `v`'s rows carry a
    * column the source schema lacks (non-additive change mid-stream —
    * restart the query to adopt the new schema). */
  private def align(df: DataFrame, v: Int): DataFrame = {
    val have = df.columns.toSet
    val want = schema.fieldNames
    val extra = have.diff(want.toSet)
    require(extra.isEmpty,
      s"graft streaming source: version $v carries column(s) " +
        s"${extra.mkString(", ")} unknown to this query's schema — " +
        "restart the query to adopt the evolved schema")
    df.select(want.map(c =>
      if (have(c)) col(c)
      else lit(null).cast(schema(c).dataType).as(c)).toSeq: _*)
  }

  override def getBatch(start: Option[Offset], end: Offset)
    : org.apache.spark.sql.Dataset[Row] = {
    val endV = versionOf(end)
    lastServed = Some(math.max(endV, lastServed.getOrElse(endV)))
    val batch: DataFrame = start match {
      case None =>
        // Snapshot at the REPLAYED offset, not this instance's
        // startingVersion: on a fresh run getOffset pins batch 0's end
        // to startingVersion so the two agree, but a query restarted
        // after logging batch 0 (and before committing it) constructs
        // a NEW source whose default startingVersion is the CURRENT
        // latest — snapshotting there would ship rows beyond the
        // logged offset and the next window would re-ship the overlap.
        // Keying the snapshot off `end` keeps a replayed batch 0
        // byte-identical to the original plan (Delta's source
        // snapshots at its reserved version for the same reason).
        val fromV = resolveStart(endV)
        align(GraftTable.read(spark, root, Some(fromV)), fromV)
      case Some(s) =>
        val startV = resolveStart(versionOf(s))
        if (endV <= startV)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        else windowRows(startV, endV)
    }
    val aligned = batch.select(schema.fieldNames.map(col).toSeq: _*)
    org.apache.spark.sql.graftshim.StreamingFrame.create(
      spark, aligned.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftTableSource[$root]"
}
