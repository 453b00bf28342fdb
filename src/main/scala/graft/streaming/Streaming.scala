package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.IntegerType

/** Structured Streaming surface (stretch beyond the batch-only
  * reference, SURVEY §2.10): streaming cleanse, watermarked windowed
  * aggregation, session windows, and custom per-key state.
  *
  * Scale design: every operator here is keyed-state over a shuffled
  * key (event_type / user_id) with watermark-bounded state — no
  * unbounded buffers; the cleanse route is stateless and fuses into
  * the source scan.
  */
object Streaming {

  final case class Routed(valid: DataFrame, invalid: DataFrame)

  /** Streaming variant of the batch cleanse: the SAME router and
    * normalization core as [[graft.pipeline.Cleanse]] (shared code —
    * the semantics cannot drift), differing only where streaming
    * forces it: no max+1 order-id backfill (cross-row state) — NULL
    * ids get a content-hash surrogate (negative to stay out of the
    * real id space); no global DISTINCT — exact dedup is the
    * downstream `dropDuplicatesWithinWatermark` call. */
  def cleanseStream(landing: DataFrame): Routed = {
    val (valid, invalid) = graft.pipeline.Cleanse.route(landing)
    // hash the full row content (like the batch tiebreak) — omitting
    // quantity/price would collide distinct orders onto one surrogate
    val surrogate = coalesce(col("order_id_t"),
      (-(pmod(xxhash64(col("product"), col("order_date"), col("purchase_address"),
        col("quantity_ordered"), col("price_each")),
        lit(2000000000L)) + 1)).cast(IntegerType))
    Routed(graft.pipeline.Cleanse.normalized(valid, surrogate), invalid)
  }

  /** Watermarked tumbling-window aggregation over the events stream:
    * 5-minute windows by event_type, 10-minute late-data bound. State
    * per (window, type) only — bounded by watermark eviction. */
  def windowedEventAggs(events: DataFrame,
                        window_ : String = "5 minutes",
                        watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Windowed distinct-user estimates via the engine's KMV sketch —
    * the streaming form of q104/q118's sketch-instead-of-exact
    * distinct. `KmvDigests` is a `TypedImperativeAggregate`, so its
    * bounded k-entry buffers are the streaming aggregation state and
    * merge across micro-batches exactly like any partial aggregate:
    * per-window state is O(k), never O(distinct users) — the property
    * that keeps an unbounded stream's state store bounded. Estimates
    * are identical to the batch query over the same rows (spec-pinned). */
  def windowedDistinctUsersKmv(events: DataFrame,
                               window_ : String = "5 minutes",
                               watermark: String = "10 minutes",
                               k: Int = 64): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"))
      .agg(graft.functions.Kmv.kmvDigests(
          md5(col("user_id").cast("string")), k).as("kmv"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"),
        round(graft.functions.Kmv.kmvEstimate(col("kmv"), k), 4).as("n_users_kmv"),
        col("n_events"))

  /** Gap-based session windows (native session_window): the streaming
    * form of q19's batch sessionization. */
  def sessionizedEvents(events: DataFrame,
                        gap: String = "30 minutes",
                        watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Exact streaming dedup by id: `dropDuplicatesWithinWatermark`
    * keeps the per-key state only until the watermark passes it (the
    * plain streaming `dropDuplicates` buffers every key seen FOREVER —
    * an unbounded state store on an unbounded id space). The streaming
    * form of the batch exact-dedup operator: duplicates arriving
    * within the watermark window are dropped exactly. */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream join: each click pairs with the same
    * user's purchases within `within` after it. Both sides carry
    * watermarks and the time-range predicate bounds the join buffer,
    * so state is evicted as event time advances — the unbounded-state
    * pitfall of unconstrained stream-stream joins is structurally
    * impossible here. `joinType = "left_outer"` additionally emits
    * each non-converting click once the watermark proves no in-window
    * purchase can still arrive. */
  def clickToPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                          within: String = "30 minutes",
                          watermark: String = "1 hour",
                          joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    // "left_outer" emits non-converting clicks (null purchase columns)
    // once the watermark proves no in-window purchase can still arrive
    // — the abandonment feed; state eviction bounds are identical to
    // the inner form because the same time-range predicate applies
    c.join(p,
        col("user_id") === col("p_user_id") and
          col("purchase_ts") >= col("click_ts") and
          col("purchase_ts") <= col("click_ts") + expr(s"interval $within"),
        joinType)
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("purchase_value"))
  }

  /** `foreachBatch` sink: per-micro-batch parquet written into a
    * `batch_id=N` directory — a retried batch overwrites its own
    * directory, so the sink stays idempotent (exactly-once effect on
    * at-least-once delivery). The standard escape hatch for sinks
    * without native streaming support; arbitrary batch-DataFrame logic
    * (upserts, dimension merges) slots into the same closure. */
  def parquetBatchSink(df: DataFrame, outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    }

  /** Streaming CDC ingest into a [[graft.sources.GraftTable]]: each
    * micro-batch commits as one table version (create on the first,
    * key-upsert after), giving a continuously-maintained snapshot
    * table with time travel across batch boundaries — the streaming
    * write path every lakehouse pairs with its format. Replayed
    * batches are skipped via the table's ingest markers, so the
    * version log doesn't grow under at-least-once delivery; see
    * [[graft.sources.GraftTable.ingestBatch]] for the exact
    * effective-once contract. */
  def tableIngestSink(df: DataFrame, root: String, key: String,
      nBuckets: Int = 8): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.sources.GraftTable.ingestBatch(
        batch.sparkSession, root, batch, key, batchId, nBuckets)
    }

  /** Incremental streaming NEAR-DUP dedup: a persistent MinHash band
    * registry (parquet under `registryDir`) accumulates the LSH band
    * keys of every admitted document; each micro-batch drops documents
    * whose bands collide with the registry or with a smaller-id
    * admitted document in the same batch, writes the survivors to
    * `outDir/batch_id=N` (overwrite → idempotent output), and appends
    * the survivors' bands to the registry.
    *
    * Admission is the LSH candidate criterion itself (any band equal)
    * — deliberately conservative for a streaming ingest, where a
    * false drop costs one near-duplicate document and a false admit
    * is corrected by the batch near-dup pass downstream. Transitive
    * chains collapse greedily toward the smallest id, the same rule
    * as [[graft.operators.Dedup.clusterSurvivors]].
    *
    * Retry idempotency: registry rows are tagged with the writing
    * batch_id (stored as the `batch_id=N` partition directory), each
    * batch OVERWRITES its own registry partition, and the probe
    * excludes the current batch's own rows — so a replayed micro-batch
    * (failure after the registry write but before the checkpoint
    * commit) never collides with its own bands. A blind append would
    * silently drop EVERY document of the replayed batch, novel ones
    * included, and overwrite the output dir with an empty survivor
    * set.
    *
    * Scale: the registry is partitioned parquet keyed by band_key —
    * the per-batch probe is one semi-join, and at 100 TB the registry
    * join prunes to the band_key hash partitions of the batch's own
    * keys. No driver-side state; the streaming query holds no state
    * store at all (the registry IS the state, shared and restartable).
    * Long-running streams accumulate duplicate band rows across
    * batches — bound it with [[compactRegistry]].
    */
  def nearDupDedupSink(docs: DataFrame, registryDir: String, outDir: String,
                       numHashes: Int = 8, bandSize: Int = 2, shingleLen: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      dedupBatchAgainstRegistry(batch, registryDir, s"$outDir/batch_id=$batchId",
        batchId, numHashes, bandSize, shingleLen)
    }

  private val registrySchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("band",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("band_key",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("batch_id",
      org.apache.spark.sql.types.LongType)))

  /** Registry read that works on ANY Hadoop filesystem (HDFS/S3/local
    * — a java.io.File probe would silently report absent on remote
    * stores, no-opping cross-batch dedup while appends still land).
    * Recovers a compaction interrupted mid-swap before reading (see
    * [[compactRegistry]]). The FULL schema — including the `batch_id`
    * partition column, typed LongType — is passed explicitly, so the
    * partition column resolves by name rather than via inference
    * (whose result type can drift across Spark versions/configs). */
  private def readRegistry(spark: org.apache.spark.sql.SparkSession,
                           registryDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(registryDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverRegistry(fs, path)
    if (fs.exists(path) && fs.listStatus(path).nonEmpty)
      spark.read.schema(registrySchema).parquet(registryDir)
        .select(col("band"), col("band_key"), col("batch_id"))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], registrySchema)
  }

  /** If a [[compactRegistry]] swap was interrupted after the live dir
    * was renamed aside but before the compacted dir replaced it, the
    * live dir is missing and `<dir>.old` holds the complete
    * pre-compaction registry — restore it. (The `.compact.tmp` dir may
    * equally be complete, but `.old` is complete by construction —
    * tmp could be a partial write from an earlier crash.) Leftover tmp
    * dirs are removed whenever the live dir is healthy. */
  private def recoverRegistry(fs: org.apache.hadoop.fs.FileSystem,
                              path: org.apache.hadoop.fs.Path): Unit = {
    val old = new org.apache.hadoop.fs.Path(path.toString + ".old")
    val tmp = new org.apache.hadoop.fs.Path(path.toString + ".compact.tmp")
    if (!fs.exists(path) && fs.exists(old)) {
      if (!fs.rename(old, path))
        throw new java.io.IOException(s"registry recovery rename failed: $old -> $path")
    }
    if (fs.exists(path)) {
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(tmp)) fs.delete(tmp, true)
    }
  }

  /** One micro-batch of the incremental near-dup dedup (also the batch
    * backfill building block). See [[nearDupDedupSink]]. */
  def dedupBatchAgainstRegistry(batch: DataFrame, registryDir: String,
                                outDir: String, batchId: Long, numHashes: Int,
                                bandSize: Int, shingleLen: Int): Unit = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    val sig = Dedup.minHashSignaturesWide(batch, numHashes, shingleLen)
    val bands = Dedup.bandTable(sig, numHashes, bandSize).cache()
    // exclude THIS batch's own registry partition: on a replay those
    // rows are our previous attempt, not foreign documents
    val registry = readRegistry(spark, registryDir)
      .filter(col("batch_id") =!= lit(batchId))
      .select("band", "band_key")
    val dupVsRegistry = bands
      .join(registry, Seq("band", "band_key"), "left_semi")
      .select("id").distinct()
    val dupInBatch = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") and
          col("a.band_key") === col("b.band_key") and col("b.id") < col("a.id"))
      .select(col("a.id")).distinct()
    val dropIds = dupVsRegistry.union(dupInBatch).distinct()
      .withColumnRenamed("id", "doc_id")
    val admitted = batch.join(dropIds, Seq("doc_id"), "left_anti").cache()
    admitted.write.mode("overwrite").parquet(outDir)
    Dedup.bandTable(
        Dedup.minHashSignaturesWide(admitted, numHashes, shingleLen),
        numHashes, bandSize)
      .select("band", "band_key").distinct()
      .write.mode("overwrite").parquet(s"$registryDir/batch_id=$batchId")
    bands.unpersist()
    admitted.unpersist()
  }

  /** Compact the band registry to one row per distinct (band,
    * band_key), keeping the MINIMUM batch_id — the first admitting
    * batch. Min (not arbitrary) is what keeps replay exclusion
    * correct through compaction: if a band's only writer was batch N,
    * a replay of N still sees the row tagged N and excludes it; if an
    * earlier batch also wrote it, the replayed batch's colliding doc
    * really IS a near-dup of an earlier admitted one and must drop.
    * Run between batches (foreachBatch micro-batches are serial, so
    * any quiesced moment works); the rewrite goes to a temp dir, the
    * live dir is renamed ASIDE (not deleted), the temp dir renamed in,
    * and only then is the aside copy deleted. A crash anywhere in the
    * swap leaves either the live dir intact or a complete `.old` copy
    * that [[readRegistry]]/[[recoverRegistry]] restores — the registry
    * (= all historical dedup state) is never the only casualty of a
    * badly-timed failure. (Hadoop rename is not atomic on S3; the
    * rename-aside protocol keeps a complete copy live at every step,
    * which is the strongest guarantee available there.)
    *
    * @return distinct band-row count after compaction */
  def compactRegistry(spark: org.apache.spark.sql.SparkSession,
                      registryDir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(registryDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverRegistry(fs, path)
    if (!fs.exists(path)) return 0L
    val compacted = readRegistry(spark, registryDir)
      .groupBy("band", "band_key")
      .agg(min("batch_id").as("batch_id"))
      .cache()
    val n = compacted.count()
    val tmp = new org.apache.hadoop.fs.Path(registryDir + ".compact.tmp")
    compacted.write.mode("overwrite")
      .partitionBy("batch_id").parquet(tmp.toString)
    compacted.unpersist()
    val old = new org.apache.hadoop.fs.Path(registryDir + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compaction rename-aside failed: $path -> $old")
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(s"compaction rename failed: $tmp -> $path")
    fs.delete(old, true)
    n
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double,
                               errors: Long)

  /** Stream-static dimension enrichment: join the event stream to a
    * BATCH dimension table (the lookup-table pattern — Spark re-plans
    * the static side per micro-batch, so a dimension refreshed in
    * place is picked up without restarting the query). Stateless:
    * nothing buffers, the join broadcasts the dimension into each
    * batch. Use for the enrich-then-aggregate topology where only the
    * aggregation needs state. */
  def enrichWithDimension(events: DataFrame, dim: DataFrame,
                          keys: Seq[String]): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), keys, "left")

  /** Streaming twin of the batch CDC compaction (q126): latest state
    * per key maintained incrementally as micro-batches arrive. The
    * SAME `max(struct(ts, event_id, …))` aggregate as the batch
    * operator — the state store holds one struct per key (O(keys)
    * state, no watermark needed: compaction state is the product, not
    * a buffer), and after any prefix of the stream the result equals
    * the batch compaction over the same rows (spec-pinned). */
  def latestStatePerKey(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("ts"), col("event_id"), col("event_type"), col("value")))
          .as("last"))
      .select(col("user_id"), col("n_events"),
        col("last.ts").as("last_ts"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_event_type"),
        col("last.value").as("last_value"))

  /** Custom keyed state via flatMapGroupsWithState: per-user running
    * totals + error counts, emitted on every batch (Update mode).
    * The KeyValueGroupedDataset state pattern for logic the built-in
    * aggregates can't express (conditional counters here; in general
    * arbitrary per-key machines). State is bounded: users idle past
    * `idleTimeout` are evicted — without it, an unbounded user-id
    * space grows the state store forever. Pass `idleTimeout = "off"`
    * to disable (needed under MemoryStream tests: processing-time
    * timeouts keep the no-data batch loop alive, so
    * `processAllAvailable` never returns). */
  def runningUserTotals(events: Dataset[Event],
                        idleTimeout: String = "1 hour"): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout == "off") GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update, timeoutConf) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0, 0L))
            var n = prev.n_events
            var tot = prev.total_value
            var err = prev.errors
            rows.foreach { e =>
              n += 1; tot += e.value
              if (e.event_type == "error") err += 1
            }
            // state keeps the RAW total (rounding fed back into state
            // would compound error across batches); round only on emit
            state.update(UserRunning(uid, n, tot, err))
            if (idleTimeout != "off") state.setTimeoutDuration(idleTimeout)
            Iterator(UserRunning(uid, n, math.round(tot * 100).toDouble / 100, err))
          }
      }
  }
}
