package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  // 20k rows, duplicated keys, adversarial order (seeded → reproducible)
  private lazy val rnd = new scala.util.Random(42)
  private lazy val rows = (1 to 20000).map { i =>
    (i.toLong, s"k${rnd.nextInt(3000)}%04d", rnd.nextInt(100))
  }
  private lazy val df = rows.toDF("id", "key", "v").repartition(16)

  test("two-phase row_number matches the single-partition window") {
    val single = df.withColumn("rn",
      row_number().over(Window.orderBy("key", "id")).cast("long"))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = GlobalRank.rowNumber(df, "rn", col("key"), col("id"))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two === single)
  }

  test("two-phase dense_rank matches the single-partition window") {
    val single = df.withColumn("dr",
      dense_rank().over(Window.orderBy("key")).cast("long"))
      .select("id", "dr").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = GlobalRank.denseRank(df, "dr", col("key"))
      .select("id", "dr").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two === single)
  }

  test("two-phase exclusive cumsum matches the single-partition window") {
    val single = df.withColumn("cs",
      coalesce(sum("v").over(Window.orderBy("key", "id")
        .rowsBetween(Window.unboundedPreceding, -1)).cast("long"), lit(0L)))
      .select("id", "cs").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = GlobalRank.exclusiveCumSum(df, "cs", col("v"), col("key"), col("id"))
      .select("id", "cs").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two === single)
  }

  test("fails fast when exchange reuse is disabled (offset-consistency guard)") {
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val e = intercept[IllegalArgumentException] {
        GlobalRank.rowNumber(df, "rn", col("key"), col("id"))
      }
      assert(e.getMessage.contains("exchange.reuse"))
    } finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("ranking windows are pid-partitioned (no full-input single-partition sort)") {
    val out = GlobalRank.rowNumber(df, "rn", col("key"), col("id"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty)
    // every window (local rank + offsets cumsum) involves __pid — none
    // sorts the full input on a single partition
    assert(windowLines.forall(_.contains("__pid")), windowLines.mkString("\n"))
  }
}
