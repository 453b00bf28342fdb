package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.sources.GraftTable

/** Structured-Streaming SOURCE over a [[GraftTable]] CHANGE DATA FEED —
  * the read half of CDC (the Delta/Iceberg "CDF source" pattern):
  *
  * {{{
  *   spark.readStream.format("graft-cdf")
  *     .option("path", root).option("key", "k")
  *     .load()                       // table cols + _change
  *     .writeStream...               // maintain a downstream view
  * }}}
  *
  * Offsets are TABLE VERSIONS: each micro-batch is exactly
  * `GraftTable.changes(start, end)` — the file-diff feed whose cost
  * tracks what CHANGED between the manifests, never table size — so a
  * 1,000-row upsert against a 100 TB table produces a few-file
  * micro-batch. The first batch bootstraps with the full snapshot at
  * `startingVersion` as inserts (how every CDF consumer initializes),
  * then each later batch covers the version window (lastCommitted,
  * latest]. Restart safety comes from the engine checkpointing the
  * version offsets: after a crash, getBatch replays the exact same
  * version window, and the feed is deterministic given the manifests.
  *
  * With `preimages=true` (default) updates emit BOTH images
  * (`update_preimage` / `update_postimage`), which is what signed-delta
  * incremental view maintenance consumes — sum(+new) + sum(−old)
  * — the q253 gate's contract.
  */
class GraftCdfSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-cdf", GraftCdfSource.cdfSchema(
      sqlContext.sparkSession, GraftCdfSource.rootOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftCdfSource(
      sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      parameters)
}

object GraftCdfSource {
  private[streaming] def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("graft-cdf needs .option(\"path\", tableRoot)"))

  /** Feed schema: the table's CURRENT schema plus the change kind.
    * (Schema evolution mid-stream follows the same restart contract as
    * every file source: restart the query to pick up new columns.) */
  private[streaming] def cdfSchema(spark: SparkSession, root: String): StructType = {
    val latest = GraftTable.latestVersion(spark, root)
    require(latest >= 0, s"no graft table at $root")
    StructType(GraftTable.tableSchema(spark, root, latest).fields :+
      StructField("_change", StringType, nullable = true))
  }
}

class GraftCdfSource(spark: org.apache.spark.sql.classic.SparkSession,
    parameters: Map[String, String]) extends Source {

  private val root = GraftCdfSource.rootOf(parameters)
  private val key = parameters.getOrElse("key",
    GraftTable.keyColumn(spark, root).getOrElse(
      sys.error("graft-cdf needs .option(\"key\", ...) for tables created " +
        "before the key column was recorded in the log")))
  private val preimages =
    parameters.get("preimages").forall(_.toBoolean)
  private val startingVersion =
    parameters.get("startingVersion").map(_.toInt).getOrElse(0)
  /** Delta-style contract: by default a checkpointed offset whose
    * manifest was vacuumed while the stream was down FAILS with a
    * dedicated error naming the lost window; `failOnDataLoss=false`
    * opts into skipping the gap (replay resumes from the earliest
    * still-available version — the changes inside the gap are LOST,
    * which is why it is opt-in). */
  private val failOnDataLoss =
    parameters.get("failOnDataLoss").forall(_.toBoolean)

  /** The version to diff FROM, honoring the data-loss contract when
    * `want`'s manifest has been vacuumed. */
  private def resolveStart(want: Int): Int = {
    val avail = GraftTable.availableVersions(spark, root)
    if (avail.contains(want)) want
    else {
      val earliest = avail.headOption.getOrElse(
        sys.error(s"no graft table at $root"))
      if (failOnDataLoss) throw new IllegalStateException(
        s"graft-cdf data loss: checkpointed start version $want of $root " +
          s"was vacuumed while the stream was down (versions " +
          s"[$want, ${earliest - 1}] are gone; earliest " +
          s"available is $earliest). Restart from a fresh checkpoint, or " +
          s"set .option(\"failOnDataLoss\", false) to skip the gap and " +
          s"resume from version $earliest.")
      earliest
    }
  }

  override val schema: StructType = GraftCdfSource.cdfSchema(spark, root)

  /** Latest committed version — the next batch's upper bound. */
  override def getOffset: Option[Offset] = {
    val latest = GraftTable.latestVersion(spark, root)
    if (latest < startingVersion) None else Some(LongOffset(latest.toLong))
  }

  private def versionOf(o: Offset): Int = o.json().trim.toLong.toInt

  override def getBatch(start: Option[Offset], end: Offset): org.apache.spark.sql.Dataset[Row] = {
    val endV = versionOf(end)
    val batch: DataFrame = start match {
      case None =>
        // bootstrap: snapshot at startingVersion, all inserts, plus the
        // changes up to the first observed latest
        val fromV = resolveStart(startingVersion)
        val snap = GraftTable.read(spark, root, Some(fromV))
          .withColumn("_change", lit("insert"))
        if (endV > fromV)
          snap.unionByName(GraftTable.changes(
            spark, root, fromV, endV, key,
            withPreimages = preimages), allowMissingColumns = false)
        else snap
      case Some(s) =>
        val startV = resolveStart(versionOf(s))
        if (endV <= startV)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], schema)
        else GraftTable.changes(spark, root, startV, endV, key,
          withPreimages = preimages)
    }
    // align column order with the declared source schema, and mark the
    // frame streaming (MicroBatchExecution asserts isStreaming=true on
    // v1 sources)
    val aligned = batch.select(schema.fieldNames.map(
      org.apache.spark.sql.functions.col).toSeq: _*)
    org.apache.spark.sql.graftshim.StreamingFrame.create(
      spark, aligned.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftCdfSource[$root]"
}
