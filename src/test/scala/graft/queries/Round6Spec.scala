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
