package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kernel-level pins for the Jaro-Winkler expression: the classic
  * literature values, the DuckDB-compatible empty-string convention,
  * NULL propagation, and the SQL-text registration. Cross-engine
  * agreement on real data is gated by q225. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def sim(a: String, b: String): Double = JaroWinkler.similarity(a, b)

  test("classic literature values") {
    assert(math.abs(sim("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(sim("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(sim("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-12)
    assert(sim("abc", "abc") === 1.0)
    assert(sim("a", "b") === 0.0)
    // transposed pair: matched but out of order
    assert(math.abs(sim("CRATE", "TRACE") - 0.7333333333333333) < 1e-12)
  }

  test("empty strings score 0 (DuckDB convention) and boost gates at 0.7") {
    assert(sim("", "") === 0.0)
    assert(sim("", "abc") === 0.0)
    assert(sim("abc", "") === 0.0)
    // below the 0.7 boost threshold the raw Jaro value is returned even
    // with a common prefix
    val j = sim("DIXON", "DIMMMMMQQ")
    assert(j < 0.7 + 1e-9)
  }

  test("column API and NULL propagation") {
    val df = Seq(
      (Some("MARTHA"), Some("MARHTA")),
      (None, Some("x")),
      (Some("x"), None)).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler($"a", $"b").as("s"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).exists(v => math.abs(v - 0.9611111111111111) < 1e-12))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("SQL registration resolves and matches the column API") {
    val viaSql = spark.sql(
      "SELECT jaro_winkler('JELLYFISH', 'SMELLYFISH') AS s").as[Double].head()
    assert(math.abs(viaSql - sim("JELLYFISH", "SMELLYFISH")) === 0.0)
  }
}
