package graft.functions

import graft.SparkSpec
import graft.functions.HammingHex.hammingHex
import org.apache.spark.sql.functions._

class HammingHexSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: known distances") {
    assert(HammingHex.distance("00", "00") === 0)
    assert(HammingHex.distance("0", "f") === 4)
    assert(HammingHex.distance("ff00", "00ff") === 16)
    assert(HammingHex.distance("deadbeef", "deadbeef") === 0)
    intercept[IllegalArgumentException](HammingHex.distance("ab", "abc"))
    intercept[IllegalArgumentException](HammingHex.distance("zz", "aa"))
  }

  test("expression evaluates under codegen and handles nulls") {
    val df = Seq(
      (Some("deadbeef"), Some("deadbeee")),
      (Some("00000000"), Some("ffffffff")),
      (None, Some("aa"))
    ).toDF("a", "b")
    val out = df.select(hammingHex($"a", $"b").as("d")).collect()
    assert(out(0).getInt(0) === 1)
    assert(out(1).getInt(0) === 32)
    assert(out(2).isNullAt(0))
  }

  test("SQL registration") {
    HammingHex.register(spark)
    val d = spark.sql("SELECT hamming_hex('f0', '0f') AS d").first().getInt(0)
    assert(d === 8)
  }

  test("pairs SimHash fingerprints inside one codegen stage") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "unrelated text about catalyst expression codegen")
    ).toDF("doc_id", "text")
    val sh = graft.operators.Dedup.simHash(docs)
    val pairs = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        hammingHex(col("a.simhash"), col("b.simhash")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 1L)) < pairs((0L, 2L)))
  }
}
