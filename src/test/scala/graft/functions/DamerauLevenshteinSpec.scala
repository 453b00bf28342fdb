package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kernel pins for damerau_levenshtein: the UNRESTRICTED variant's
  * signature cases (CA→ABC = 2 — the optimal-string-alignment
  * restriction would say 3), transposition-vs-substitution accounting,
  * NULL propagation, and SQL registration. Corpus-scale cross-engine
  * agreement with DuckDB's independent implementation is gated by
  * q247. */
class DamerauLevenshteinSpec extends SparkSpec {
  import spark.implicits._

  private def d(a: String, b: String): Int = DamerauLevenshtein.distance(a, b)

  test("unrestricted-variant signature and classic values") {
    assert(d("CA", "ABC") === 2)    // delete C, transpose? unrestricted path
    assert(d("ab", "ba") === 1)     // one transposition, not two edits
    assert(d("abc", "acb") === 1)
    assert(d("kitten", "sitting") === 3)
    assert(d("abcdef", "abcdef") === 0)
    assert(d("", "abc") === 3 && d("abc", "") === 3 && d("", "") === 0)
    // two independent swaps = 2 (plain levenshtein says 4)
    assert(d("abcdefgh", "bacdefhg") === 2)
    // transposition over a gap costs the gap too
    assert(d("ac", "ca") === 1)
    assert(d("a cat", "a abct") === 2) // insert b + gap-transpose c/a
  }

  test("column API, NULL propagation, SQL registration") {
    val df = Seq((Some("ab"), Some("ba")), (None, Some("x")))
      .toDF("a", "b")
      .select(DamerauLevenshtein.damerauLevenshtein($"a", $"b").as("d"))
    val got = df.collect()
    assert(got(0).getInt(0) === 1 && got(1).isNullAt(0))
    assert(spark.sql("SELECT damerau_levenshtein('CA', 'ABC') AS d")
      .as[Int].head() === 2)
  }
}
