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

  test("permissive csv read never fails on malformed rows") {
    val dir = Files.createTempDirectory("sources_bad").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/bad.csv"),
      "id,name\n1,a\nnot_a_long,b\n")
    val r = Sources.readCsv(spark, s"$dir/bad.csv", schema).collect()
    assert(r.length === 2)
    assert(r.count(_.isNullAt(0)) === 1) // malformed id → NULL, row kept
  }
}
