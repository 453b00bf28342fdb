package graft.functions

import graft.SparkSpec
import graft.functions.RollingHash.rollingHash

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: polynomial fold over code points") {
    assert(RollingHash.hash("") === 0L)
    assert(RollingHash.hash("a") === 97L)
    assert(RollingHash.hash("ab") === 97L * 31 + 98)
    // content-sensitive: one-char change flips the hash
    assert(RollingHash.hash("hello world") !== RollingHash.hash("hello worle"))
    // stays within the modulus on long input
    val h = RollingHash.hash("x" * 100000)
    assert(h >= 0L && h < RollingHash.Mod)
  }

  test("expression under codegen, null-safe") {
    val df = Seq(Some("abc"), Some(""), None).toDF("t")
    val out = df.select(rollingHash($"t").as("h")).collect()
    assert(out(0).getLong(0) === (97L * 31 + 98) * 31 + 99)
    assert(out(1).getLong(0) === 0L)
    assert(out(2).isNullAt(0))
  }
}
