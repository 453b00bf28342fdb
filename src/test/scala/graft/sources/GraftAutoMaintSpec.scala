package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The auto-maintenance tick on the ingest path: property- and
  * option-driven scheduling of the free probe ladder. */
class GraftAutoMaintSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_automaint_spec").toString

  private def rows(n: Int) = spark.range(1, n + 1)
    .select($"id".as("k"), ($"id" * 3).as("v"))

  test("maintenance='auto' ingest option ticks the ladder every Nth " +
      "version; 'off' suppresses a property opt-in") {
    val d = freshDir()
    val data = rows(4000)
    GraftTable.create(spark, s"$d/t", data, "k", nBuckets = 4)
    GraftTable.setTableProperty(spark, s"$d/t",
      "graft.maintenance.everyBatches", "2")
    GraftTable.setTableProperty(spark, s"$d/t",
      "graft.eqdel.maxPendingRatio", "0.0001")
    (1 to 4).foreach { b =>
      GraftTable.ingestBatch(spark, s"$d/t",
        data.filter($"k" % 101 === b).withColumn("v", lit(-b.toLong)),
        "k", batchId = b.toLong, mode = "eqdel", maintenance = "auto")
    }
    val head = GraftTable.latestVersion(spark, s"$d/t")
    assert(head > 4, "maintenance commits must interleave")
    assert((math.max(0, head - 3) to head)
      .exists(v => !GraftTable.hasLiveEqDels(spark, s"$d/t", v)),
      "the eqdel debt must have been retired")
    // content is the CDC replay regardless of maintenance
    val want = data.withColumn("v",
      when($"k" % 101 >= 1 && $"k" % 101 <= 4, -($"k" % 101))
        .otherwise($"v"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(GraftTable.read(spark, s"$d/t")
      .as[(Long, Long)].collect().toSeq.sorted === want)
    // 'off' beats the table property: no new maintenance commits
    GraftTable.setTableProperty(spark, s"$d/t",
      "graft.maintenance.auto", "true")
    val before = GraftTable.latestVersion(spark, s"$d/t")
    GraftTable.ingestBatch(spark, s"$d/t",
      data.filter($"k" === 1).withColumn("v", lit(0L)),
      "k", batchId = 99L, mode = "eqdel", maintenance = "off")
    assert(GraftTable.latestVersion(spark, s"$d/t") === before + 1,
      "'off' must suppress the ladder even with the property set")
  }
}
