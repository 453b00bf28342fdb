package graft.queries

import graft.SparkSpec

/** Round-6: streaming operators promoted into the correctness gate.
  * The gate checks stream-final-state vs the DuckDB oracle; these pin
  * the property the gate can't see — that the gate query really
  * executed through the streaming engine in multiple micro-batches and
  * equals the BATCH operator over the same rows (stream ≡ batch, the
  * incremental-view-maintenance contract). */
class Round6Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q152: streamed CDC compaction equals the batch q126 compaction") {
    val streamed = StreamingQueries.q152StreamCdcState.run(spark, dir)
      .collect().toSeq
    val batch = Extras.q126CdcCompaction.run(spark, dir).collect().toSeq
    assert(streamed === batch)
  }

  test("q157: streamed click→purchase join equals the batch join") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingQueries.q157StreamClickPurchase.run(spark, dir)
      .collect().toSeq
    val ev = graft.Tables.events(spark, dir)
    val batch = graft.streaming.Streaming.clickToPurchaseJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        within = "30 minutes", watermark = "3650 days")
      .select(col("user_id"), col("click_id"),
        unix_timestamp(col("click_ts")).as("click_ts_sec"),
        col("purchase_id"),
        unix_timestamp(col("purchase_ts")).as("purchase_ts_sec"),
        col("purchase_value"))
      .orderBy("user_id", "click_id", "purchase_id")
      .collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("q158: BMP and PPM containers with the same content decode identically") {
    val docs = graft.Tables.documents(spark, dir)
    val viaPpm = MultimodalQueries.q154PpmDecode.run(spark, dir).collect().toSeq
    val viaBmp = MultimodalQueries.q158BmpDecode.run(spark, dir).collect().toSeq
    assert(viaBmp === viaPpm)
    assert(viaBmp.size === docs.count())
  }

  test("q153: streamed windowed rollup equals a batch window aggregation") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingQueries.q153StreamWindowedAggs.run(spark, dir)
      .collect().toSeq
    val batch = graft.streaming.Streaming
      .windowedEventAggs(graft.Tables.events(spark, dir))
      .select(unix_timestamp(col("window_start")).as("window_start_sec"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy("window_start_sec", "event_type")
      .collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
