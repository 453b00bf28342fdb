package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 1.0),
    ("c", 7L, 7.0)
  ).toDF("grp", "id", "score")

  test("topKPerGroup matches the window-function result") {
    val custom = TopK.topKPerGroup(df, Seq($"grp"),
        Seq($"score".desc, $"id".asc), 2)
      .select("grp", "id", "score").orderBy("grp", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val window = df.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("grp").orderBy($"score".desc, $"id".asc)))
      .filter($"rn" <= 2).select("grp", "id").orderBy("grp", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(custom.toSeq === window.toSeq)
  }

  test("groups smaller than k return all their rows") {
    val out = TopK.topKPerGroup(df, Seq($"grp"), Seq($"score".asc, $"id".asc), 5)
    assert(out.count() === df.count())
  }

  test("plan is the two-phase exec with a hash exchange, no Window/Sort") {
    val out = TopK.topKPerGroup(df.repartition(4), Seq($"grp"),
      Seq($"score".desc, $"id".asc), 2)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert("TopKPerGroupExec".r.findAllIn(p).size == 2
      || p.linesIterator.count(_.contains("TopKPerGroup")) >= 2, p)
    assert(p.contains("hashpartitioning"), p)
    assert(!p.contains("Window"), p)
  }

  test("exact when distinct groups far exceed the partial-pass heap bound") {
    // 5000 groups per partition against a bound of 16: nearly every row
    // overflows the partial map and must stream through unreduced —
    // the final pass alone restores exactness
    spark.conf.set(TopKStrategy.maxPartialGroupsKey, "16")
    try {
      val big = spark.range(20000).select(
        (col("id") % 5000).cast("string").as("grp"), col("id"),
        (col("id") * 37 % 101).cast("double").as("score")).repartition(4)
      val custom = TopK.topKPerGroup(big, Seq(col("grp")),
          Seq(col("score").desc, col("id").asc), 2)
        .select("grp", "id").orderBy("grp", "id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val window = big.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("grp").orderBy(col("score").desc, col("id").asc)))
        .filter(col("rn") <= 2).select("grp", "id").orderBy("grp", "id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(custom === window)
      assert(custom.size === 10000) // 5000 groups x 4 rows each, k=2
    } finally spark.conf.unset(TopKStrategy.maxPartialGroupsKey)
  }

  test("exact across partitions: partial pass never loses a global winner") {
    // 1000 rows, 10 groups, scattered over 8 partitions
    val big = spark.range(1000).select(
      (col("id") % 10).cast("string").as("grp"), col("id"),
      (col("id") * 37 % 101).cast("double").as("score")).repartition(8)
    val custom = TopK.topKPerGroup(big, Seq(col("grp")),
        Seq(col("score").desc, col("id").asc), 3)
      .select("grp", "id").orderBy("grp", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val window = big.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("grp").orderBy(col("score").desc, col("id").asc)))
      .filter(col("rn") <= 3).select("grp", "id").orderBy("grp", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(custom === window)
  }
}
