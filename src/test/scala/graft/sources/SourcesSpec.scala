package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("csv/json/parquet round-trips preserve rows") {
    val dir = Files.createTempDirectory("sources").toString
    val df = Seq((1L, "a"), (2L, "b"), (3L, null: String)).toDF("id", "name")

    Sources.writeCsv(df, s"$dir/csv")
    Sources.writeJson(df, s"$dir/json")
    Sources.writeParquet(df, s"$dir/pq")

    assert(Sources.readCsv(spark, s"$dir/csv", schema).count() === 3)
    // JSON drops null fields per line; schema read restores the column
    val j = Sources.readJson(spark, s"$dir/json", schema)
    assert(j.count() === 3 && j.filter($"name".isNull).count() === 1)
    assert(Sources.readParquet(spark, s"$dir/pq").count() === 3)
  }

  test("orc round-trips rows and pushes scan predicates") {
    val dir = Files.createTempDirectory("sources_orc").toString
    val df = (0L until 1000L).map(i => (i, s"name$i")).toDF("id", "name")
    Sources.writeOrc(df, s"$dir/orc")
    val back = Sources.readOrc(spark, s"$dir/orc")
    assert(back.count() === 1000)
    val filtered = back.filter($"id" >= 990)
    assert(filtered.count() === 10)
    // predicate must reach the ORC scan, same as the parquet paths
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(id,990)"), plan)
  }

  test("partitioned parquet layout enables partition pruning") {
    val dir = Files.createTempDirectory("sources_part").toString
    val df = (1 to 100).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "grp")
    Sources.writeParquet(df, s"$dir/t", partitionCols = Seq("grp"))
    // one directory per partition value
    val parts = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.startsWith("grp=")).map(_.getName).sorted
    assert(parts === Array("grp=g0", "grp=g1", "grp=g2", "grp=g3"))
    // a partition filter reads only that directory (plan shows pruning)
    val plan = Sources.readParquet(spark, s"$dir/t").filter($"grp" === "g1")
      .queryExecution.executedPlan.toString
    assert(Sources.readParquet(spark, s"$dir/t")
      .filter($"grp" === "g1").count() === 25)
  }

  test("bucketed tables join without a shuffle on the bucketed key") {
    Seq("bkt_left", "bkt_right").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    Sources.writeBucketed(left, "bkt_left", Seq("k"), 4)
    Sources.writeBucketed(right, "bkt_right", Seq("k"), 4)
    // force the sort-merge path (tiny tables would broadcast, which
    // inserts a BroadcastExchange and hides the bucketing effect)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed SMJ: no ShuffleExchange on either side
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle:\n$plan")
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("runAndSave writes a bucketed fact whose location rollup skips the shuffle") {
    spark.sql("DROP TABLE IF EXISTS graft_fact_bkt")
    // a previous JVM's physical dir survives the (metastore-only) DROP
    val loc = new java.io.File("spark-warehouse/graft_fact_bkt")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(loc)
    }
    val csv =
      """Order ID,Product,Quantity Ordered,Price Each,Order Date,Purchase Address
        |141234,iPhone,1,700,01/22/19 21:25,"944 Walnut St, Boston, MA 02215"
        |141235,USB-C Charging Cable,2,11.95,01/17/19 13:33,"185 Maple St, Portland, OR 97035"
        |141236,Wired Headphones,1,11.99,01/07/19 11:27,"83 7th St, Portland, ME 04101"
        |""".stripMargin
    val dir = Files.createTempDirectory("bucketed_fact")
    Files.writeString(dir.resolve("orders.csv"), csv)
    graft.pipeline.Pipeline.runAndSave(spark, dir.resolve("orders.csv").toString,
      s"$dir/out", denseFact = false, bucketedFactTable = Some("graft_fact_bkt"),
      factBuckets = 4)
    val rollup = spark.table("graft_fact_bkt")
      .groupBy("location_id").agg(sum("quantity_ordered").as("qty"))
    rollup.collect()
    val plan = rollup.queryExecution.executedPlan.toString
    // bucketed-by-location_id scan feeds the aggregate directly
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    assert(rollup.count() === 3)
  }

  test("schema evolution: mergeSchema unions columns across parquet batches") {
    // an appended batch gaining a column must not break readers — the
    // standard additive-evolution contract for a long-lived table
    val dir = Files.createTempDirectory("sources_evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$dir/t/batch=1")
    Seq((3L, "c", 0.5), (4L, "d", 1.5)).toDF("id", "name", "score")
      .write.parquet(s"$dir/t/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.toSet === Set("id", "name", "score", "batch"))
    assert(merged.count() === 4)
    // rows from the old batch read the new column as NULL
    assert(merged.filter($"score".isNull).count() === 2)
    assert(merged.filter($"batch" === 1 && $"score".isNotNull).count() === 0)
  }

  test("permissive csv read never fails on malformed rows") {
    val dir = Files.createTempDirectory("sources_bad").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/bad.csv"),
      "id,name\n1,a\nnot_a_long,b\n")
    val r = Sources.readCsv(spark, s"$dir/bad.csv", schema).collect()
    assert(r.length === 2)
    assert(r.count(_.isNullAt(0)) === 1) // malformed id → NULL, row kept
  }
}
