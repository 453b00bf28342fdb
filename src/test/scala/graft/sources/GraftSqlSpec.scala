package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The DSv2 SQL surface must resolve to the SAME pruned snapshot reads
  * as the Scala API: format reads, versionAsOf, catalog resolution,
  * VERSION AS OF time travel, and — the part that matters at 100 TB —
  * manifest file skipping biting through SQL text. */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(): String =
    Files.createTempDirectory("graft_sql_spec").toString

  private def mk(root: String, n: Int = 1000, buckets: Int = 4): Unit =
    GraftTable.create(spark, root,
      spark.range(1, n + 1).select(
        $"id".as("k"), concat(lit("row"), $"id").as("name"),
        ($"id" * 10).as("v")),
      "k", nBuckets = buckets)

  test("format read matches the Scala API, including versionAsOf") {
    val root = freshBase() + "/t"
    mk(root)
    GraftTable.upsert(spark, root,
      spark.range(1, 11).select($"id".as("k"), lit("u").as("name"),
        lit(-1L).as("v")), "k")
    val sqlNow = spark.read.format("graft").load(root)
    assert(sqlNow.columns.toSeq === Seq("k", "name", "v"))
    assert(sqlNow.count() === 1000)
    assert(sqlNow.filter($"name" === "u").count() === 10)
    val sqlV0 = spark.read.format("graft").option("versionAsOf", 0).load(root)
    assert(sqlV0.filter($"name" === "u").count() === 0)
    assert(sqlV0.agg(sum("v")).as[Long].head() ===
      GraftTable.read(spark, root, Some(0)).agg(sum("v")).as[Long].head())
  }

  test("catalog: SQL text with VERSION AS OF and a key range matches readRange") {
    val base = freshBase()
    val root = base + "/events"
    mk(root)
    GraftTable.upsert(spark, root,
      spark.range(100, 121).select($"id".as("k"), lit("upd").as("name"),
        lit(0L).as("v")), "k")
    spark.conf.set("spark.sql.catalog.gtest", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtest.base", base)
    val viaSql = spark.sql(
      "SELECT k, name, v FROM gtest.events VERSION AS OF 1 " +
        "WHERE k BETWEEN 100 AND 200 ORDER BY k")
    val viaApi = GraftTable.readRange(spark, root, "k", 100, 200, Some(1))
      .orderBy("k")
    assert(viaSql.collect().toSeq === viaApi.collect().toSeq)
    // time travel below the upsert
    val v0 = spark.sql(
      "SELECT count(*) AS n FROM gtest.events VERSION AS OF 0 " +
        "WHERE name = 'upd'").as[Long].head()
    assert(v0 === 0)
    // latest resolution without AS OF
    assert(spark.sql("SELECT count(*) FROM gtest.events").as[Long].head() === 1000)
  }

  test("file skipping bites through SQL: an out-of-range file is never opened") {
    val base = freshBase()
    val root = base + "/skip"
    mk(root, n = 2000, buckets = 8)
    // the range [1, 50] lives in the lowest bucket(s); every other data
    // file is outside it
    val full = GraftTable.prunedFileCount(spark, root, Long.MinValue, Long.MaxValue)
    val pruned = GraftTable.prunedFileCount(spark, root, 1, 50)
    assert(pruned < full, s"fixture broken: $pruned vs $full")
    // sabotage: physically delete a data file whose key interval is
    // DISJOINT from [1, 50]; a scan that opens it would throw, so a
    // surviving query proves the manifest skipped it
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lines = scala.io.Source.fromFile(s"$root/_log/v00000.manifest")
      .getLines().filter(_.nonEmpty).toList
    val victim = lines.map(_.split('\t')).filter(_(1).toLong > 1000).head
    fs.delete(new org.apache.hadoop.fs.Path(root, victim(0)), false)
    // NB: catalog plugins are cached by NAME on first use — every test
    // needs its own catalog name or it inherits another test's base
    spark.conf.set("spark.sql.catalog.gskip", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gskip.base", base)
    val got = spark.sql(
      "SELECT sum(v) AS s, count(*) AS n FROM gskip.skip " +
        "WHERE k >= 1 AND k <= 50").collect()(0)
    assert(got.getLong(1) === 50)
    assert(got.getLong(0) === 10L * 50 * 51 / 2)
    // sanity: the unpruned read DOES hit the missing file
    intercept[Exception] {
      spark.sql("SELECT count(*) FROM gskip.skip").collect()
    }
  }

  test("key-range extraction handles conjunctions and rejects non-integral shapes") {
    import org.apache.spark.sql.sources._
    def r(fs: Filter*) = GraftScanBuilder.keyRange(fs.toArray, "k")
    assert(r(GreaterThanOrEqual("k", 10L), LessThanOrEqual("k", 20L))
      === Some((10L, 20L)))
    assert(r(GreaterThan("k", 10), LessThan("k", 20)) === Some((11L, 19L)))
    assert(r(EqualTo("k", 7)) === Some((7L, 7L)))
    assert(r(In("k", Array(3, 9, 5))) === Some((3L, 9L)))
    assert(r(And(GreaterThan("k", 1L), LessThan("k", 9L))) === Some((2L, 8L)))
    assert(r(EqualTo("other", 7)) === None)
    assert(r(EqualTo("k", "oops")) === None)
    assert(r(IsNotNull("k")) === None)
  }

  test("SQL DDL + DML: CREATE TABLE and INSERT INTO land as real versioned " +
    "commits with keyed-MERGE semantics") {
    val base = freshBase()
    spark.conf.set("spark.sql.catalog.gw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gw.base", base)
    spark.sql("CREATE TABLE gw.t (k BIGINT, name STRING, v BIGINT) " +
      "TBLPROPERTIES ('key' = 'k', 'buckets' = '4')")
    // version 0 exists and is empty
    assert(GraftTable.latestVersion(spark, base + "/t") === 0)
    assert(spark.sql("SELECT count(*) FROM gw.t").as[Long].head() === 0L)
    assert(GraftTable.keyColumn(spark, base + "/t") === Some("k"))
    spark.sql("INSERT INTO gw.t SELECT id AS k, concat('r', id) AS name, " +
      "id * 2 AS v FROM range(1, 101)")
    assert(GraftTable.latestVersion(spark, base + "/t") === 1)
    assert(spark.sql("SELECT count(*) FROM gw.t").as[Long].head() === 100L)
    // keyed MERGE: overlapping keys replace, new keys insert
    spark.sql("INSERT INTO gw.t SELECT id AS k, 'upd' AS name, -1L AS v " +
      "FROM range(90, 111)")
    assert(GraftTable.latestVersion(spark, base + "/t") === 2)
    assert(spark.sql("SELECT count(*) FROM gw.t").as[Long].head() === 110L)
    assert(spark.sql("SELECT count(*) FROM gw.t WHERE name = 'upd'")
      .as[Long].head() === 21L)
    // the SQL write is the SAME commit path as the Scala API: time
    // travel sees every version, and the Scala read agrees
    assert(spark.sql("SELECT count(*) FROM gw.t VERSION AS OF 1")
      .as[Long].head() === 100L)
    assert(GraftTable.read(spark, base + "/t").count() === 110L)
    // writing into the past is refused
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gw.t VERSION AS OF 1 VALUES (1L, 'x', 0L)")
    }
    assert(e.getMessage.toLowerCase.contains("version")
      || e.getMessage.contains("syntax"), e.getMessage)
    // INSERT OVERWRITE is refused with guidance
    val e2 = intercept[Exception] {
      spark.sql("INSERT OVERWRITE gw.t SELECT 1L, 'x', 0L")
    }
    assert(e2.getMessage.contains("INSERT OVERWRITE") ||
      e2.getMessage.contains("not supported"), e2.getMessage)
    // DELETE FROM with convertible filters is a real pruned commit
    spark.sql("DELETE FROM gw.t WHERE k <= 95 AND name = 'upd'")
    assert(GraftTable.latestVersion(spark, base + "/t") === 3)
    assert(spark.sql("SELECT count(*) FROM gw.t").as[Long].head() === 104L)
    assert(spark.sql("SELECT count(*) FROM gw.t WHERE name = 'upd'")
      .as[Long].head() === 15L)
    // time travel still sees the pre-delete version
    assert(spark.sql("SELECT count(*) FROM gw.t VERSION AS OF 2")
      .as[Long].head() === 110L)
    // an unconvertible predicate refuses rather than approximating
    val e3 = intercept[Exception] {
      spark.sql("DELETE FROM gw.t WHERE k % 2 = 0")
    }
    assert(e3.getMessage.toLowerCase.contains("cannot translate") ||
      e3.getMessage.toLowerCase.contains("delete"), e3.getMessage)
    // and the failed attempt committed nothing
    assert(GraftTable.latestVersion(spark, base + "/t") === 3)
  }

  test("CREATE TABLE validates key and duplicates; CTAS-style insert " +
    "round-trips by name not position") {
    val base = freshBase()
    spark.conf.set("spark.sql.catalog.gw2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gw2.base", base)
    val bad = intercept[Exception] {
      spark.sql("CREATE TABLE gw2.bad (a BIGINT) TBLPROPERTIES ('key'='zz')")
    }
    assert(bad.getMessage.contains("key column"), bad.getMessage)
    spark.sql("CREATE TABLE gw2.t (k BIGINT, v BIGINT)")
    val dup = intercept[Exception] {
      spark.sql("CREATE TABLE gw2.t (k BIGINT, v BIGINT)")
    }
    assert(dup.getMessage.toLowerCase.contains("exists"), dup.getMessage)
    // key defaults to the first column
    assert(GraftTable.keyColumn(spark, base + "/t") === Some("k"))
    // INSERT by explicit column list (reordered) still merges correctly
    spark.sql("INSERT INTO gw2.t (v, k) VALUES (10L, 1L), (20L, 2L)")
    val rows = spark.sql("SELECT k, v FROM gw2.t ORDER BY k")
      .as[(Long, Long)].collect().toSeq
    assert(rows === Seq((1L, 10L), (2L, 20L)))
  }

  test("catalog lists tables and refuses writes with a clear message") {
    val base = freshBase()
    mk(base + "/t1"); mk(base + "/t2", n = 10, buckets = 1)
    Files.createDirectory(java.nio.file.Paths.get(base, "not_a_table"))
    spark.conf.set("spark.sql.catalog.glist", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.glist.base", base)
    assert(spark.sql("SHOW TABLES IN glist").select("tableName")
      .as[String].collect().sorted.toSeq === Seq("t1", "t2"))
    val e = intercept[Exception] {
      spark.sql("DROP TABLE glist.t2")
    }
    assert(e.getMessage.contains("deleting the table root"))
  }
}
