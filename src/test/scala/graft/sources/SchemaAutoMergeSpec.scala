package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SCHEMA AUTO-MERGE (`graft.schema.autoMerge`): with the property on,
  * a drifted batch evolves the table (new columns: metadata-only add,
  * old files read NULL) and narrow batches NULL-fill (the coalesce
  * merge keeps target values for matched rows). Off by default — the
  * refusal names the property. */
class SchemaAutoMergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_automerge_spec").toString

  private def mk(root: String): Unit =
    GraftTable.create(spark, root,
      spark.range(1, 101).select($"id".as("k"),
        concat(lit("r"), $"id").as("name"), ($"id" * 2).as("v")),
      "k", nBuckets = 2)

  test("off by default: extra and missing columns both refuse, naming " +
      "the property") {
    val root = freshDir() + "/t"
    mk(root)
    val e1 = intercept[IllegalArgumentException] {
      GraftTable.upsert(spark, root,
        Seq((1L, "x", 2L, "web")).toDF("k", "name", "v", "channel"), "k")
    }
    assert(e1.getMessage.contains("graft.schema.autoMerge"))
    val e2 = intercept[IllegalArgumentException] {
      GraftTable.upsert(spark, root, Seq((1L, "x")).toDF("k", "name"), "k")
    }
    assert(e2.getMessage.contains("graft.schema.autoMerge"))
  }

  test("on: a wider batch evolves the table — old rows read NULL, " +
      "batch rows land populated, nothing rewrites for the add") {
    val root = freshDir() + "/t"
    mk(root)
    GraftTable.setTableProperty(spark, root, "graft.schema.autoMerge", "true")
    GraftTable.upsert(spark, root,
      Seq((5L, "upd5", 50L, "web"), (200L, "new200", 1L, "app"))
        .toDF("k", "name", "v", "channel"), "k")
    val t = GraftTable.read(spark, root)
    assert(t.columns.toSeq === Seq("k", "name", "v", "channel"))
    assert(t.count() === 101)
    assert(t.filter($"k" === 5).select("channel").as[String].head() === "web")
    assert(t.filter($"k" === 200).select("channel").as[String].head() === "app")
    assert(t.filter($"k" === 7).select("channel").head().isNullAt(0),
      "pre-evolution rows read NULL for the added column")
  }

  test("on: a NARROW batch null-fills — matched rows keep their old " +
      "values through the coalesce merge") {
    val root = freshDir() + "/t"
    mk(root)
    GraftTable.setTableProperty(spark, root, "graft.schema.autoMerge", "true")
    GraftTable.upsert(spark, root,
      Seq((5L, "renamed5")).toDF("k", "name"), "k")
    val r5 = GraftTable.read(spark, root).filter($"k" === 5).head()
    assert(r5.getString(1) === "renamed5")
    assert(r5.getLong(2) === 10L,
      "the column the narrow batch lacks keeps the target's value")
  }

  test("on: the CDC path aligns too — op column rides untouched, " +
      "deletes still delete") {
    val root = freshDir() + "/t"
    mk(root)
    GraftTable.setTableProperty(spark, root, "graft.schema.autoMerge", "true")
    GraftTable.applyCdcBatch(spark, root,
      Seq((3L, "u3", 33L, "ads", "upsert"),
        (4L, null.asInstanceOf[String], 0L,
          null.asInstanceOf[String], "delete"))
        .toDF("k", "name", "v", "channel", "_op"), "k")
    val t = GraftTable.read(spark, root)
    assert(t.columns.toSeq === Seq("k", "name", "v", "channel"))
    assert(t.filter($"k" === 4).count() === 0)
    assert(t.filter($"k" === 3).select("channel").as[String].head() === "ads")
  }

  test("on: survives the hash layout and a second evolution") {
    val root = freshDir() + "/t"
    GraftTable.create(spark, root,
      spark.range(1, 101).select($"id".as("k"), ($"id" * 2).as("v")),
      "k", nBuckets = 4, hashLayout = true)
    GraftTable.setTableProperty(spark, root, "graft.schema.autoMerge", "true")
    GraftTable.upsert(spark, root,
      Seq((1L, 2L, "a")).toDF("k", "v", "c1"), "k")
    GraftTable.upsert(spark, root,
      Seq((2L, 4L, "b", 9L)).toDF("k", "v", "c1", "c2"), "k")
    val t = GraftTable.read(spark, root)
    assert(t.columns.toSeq === Seq("k", "v", "c1", "c2"))
    assert(t.filter($"k" === 2).select("c2").as[Long].head() === 9L)
    // layout intact after the evolving writes
    val v = GraftTable.latestVersion(spark, root)
    assert(GraftTable.snapshotFilesWithDvs(spark, root, v).forall(x =>
      GraftTable.fileBucket(x._1.getPath.toUri.getPath).isDefined))
  }
}
