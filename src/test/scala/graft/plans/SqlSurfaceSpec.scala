package graft.plans

import graft.SparkSpec

/** The injected SQL surface: `spark.sql(...)` must reach the same
  * native codegen'd kernels the DataFrame API uses — the reference's
  * audience writes SQL, so the engine's custom functions have to be
  * first-class SQL citizens, not DataFrame-only combinators. */
class SqlSurfaceSpec extends SparkSpec {

  test("vec_dot is callable from SQL and matches the manual fold") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS d")
      .collect()(0).getDouble(0)
    assert(r === (1.0 * 4 + 2.0 * 5 + 3.0 * 6))
  }

  test("hamming_hex is callable from SQL") {
    // 'f' ^ '0' = 4 bits; two such nibbles = 8
    val r = spark.sql("SELECT hamming_hex('ff00', '0000') AS h")
      .collect()(0).getInt(0)
    assert(r === 8)
  }

  test("rolling_hash is callable from SQL and equals the DataFrame form") {
    val sql = spark.sql("SELECT rolling_hash('warehouse') AS h")
      .collect()(0).getLong(0)
    val df = spark.range(1)
      .select(graft.functions.RollingHash.rollingHash(
        org.apache.spark.sql.functions.lit("warehouse")).as("h"))
      .collect()(0).getLong(0)
    assert(sql === df)
  }

  test("kmv_digests aggregates from SQL; estimate is exact under k") {
    spark.range(1000).selectExpr("id % 37 AS v")
      .createOrReplaceTempView("kmv_sql_fixture")
    val sketch = spark.sql(
      "SELECT kmv_digests(md5(CAST(v AS STRING)), 64) AS s FROM kmv_sql_fixture")
    val arr = sketch.collect()(0).getSeq[String](0)
    assert(arr.length === 37) // < k ⇒ the sketch IS the distinct set
    assert(arr === arr.sorted)
  }

  test("kmv_digests rejects a non-literal k") {
    val e = intercept[Exception] {
      spark.sql("SELECT kmv_digests(md5(CAST(id AS STRING)), CAST(id AS INT)) FROM range(5)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
