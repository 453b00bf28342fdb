package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming cleanse routes rows like the batch router") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String, String, String, String, String)]
    val landing = in.toDF().toDF(
      "order_id", "product", "quantity_ordered", "price_each", "order_date", "purchase_address")
    val routed = Streaming.cleanseStream(landing)

    val qValid = routed.valid.writeStream.format("memory")
      .queryName("sc_valid").outputMode("append").start()
    val qInvalid = routed.invalid.writeStream.format("memory")
      .queryName("sc_invalid").outputMode("append").start()
    in.addData(
      ("1", "iPhone", "1", "700", "01/22/19 21:25", "944 Walnut St, Boston, MA 02215"),
      ("Order ID", "Product", "Quantity Ordered", "Price Each", "Order Date", "Purchase Address"),
      (null, "Cable", "2", "11.95", "01/17/19 13:33", "185 Maple St, Portland, OR 97035"))
    qValid.processAllAvailable(); qInvalid.processAllAvailable()
    qValid.stop(); qInvalid.stop()

    val valid = spark.table("sc_valid").collect()
    val invalid = spark.table("sc_invalid").collect()
    assert(valid.length === 2 && invalid.length === 1)
    assert(invalid.head.getString(1) === "Product")
    val backfilled = valid.find(_.getAs[String]("product") == "Cable").get
    assert(backfilled.getAs[Int]("order_id") < 0) // surrogate id
    assert(valid.find(_.getAs[String]("product") == "iPhone").get
      .getAs[String]("city") === "Boston")
  }

  test("watermarked tumbling window aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val agg = Streaming.windowedEventAggs(events)
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    in.addData(
      (1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 00:02:00"), 2L, "click", 2.0),
      (3L, ts("2024-01-01 00:07:00"), 1L, "view", 5.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win_agg").collect()
    val click = rows.find(_.getAs[String]("event_type") == "click").get
    assert(click.getAs[Long]("n_events") === 2L)
    assert(click.getAs[Double]("total_value") === 3.0)
    assert(click.getAs[Timestamp]("window_start") === ts("2024-01-01 00:00:00"))
    assert(rows.find(_.getAs[String]("event_type") == "view").get
      .getAs[Timestamp]("window_start") === ts("2024-01-01 00:05:00"))
  }

  test("session windows split on gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val sess = Streaming.sessionizedEvents(events)
    val q = sess.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    in.addData(
      (1L, ts("2024-01-01 00:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 00:10:00"), 7L, "click", 1.0),
      (3L, ts("2024-01-01 02:00:00"), 7L, "click", 1.0)) // new session
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("n_events")).sorted === Array(1L, 2L))
  }

  test("flatMapGroupsWithState keeps running per-user totals") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streaming.Event]
    // "off": processing-time timeouts keep no-data batches scheduling,
    // so processAllAvailable would never return under MemoryStream
    val out = Streaming.runningUserTotals(in.toDS(), idleTimeout = "off")
    val q = out.writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    in.addData(
      Streaming.Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 2.0),
      Streaming.Event(2L, ts("2024-01-01 00:01:00"), 1L, "error", 3.0))
    q.processAllAvailable()
    in.addData(Streaming.Event(3L, ts("2024-01-01 00:02:00"), 1L, "view", 5.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("running").collect()
      .map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"),
        r.getAs[Long]("errors")))
    // two updates for user 1: after batch 1 and after batch 2
    assert(rows.contains((2L, 5.0, 1L)))
    assert(rows.contains((3L, 10.0, 1L)))
  }
}
