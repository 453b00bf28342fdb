package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kernel pins for lcs_length: classic cases, reorder sensitivity (the
  * property ROUGE-L uses it for), NULL semantics, and the SQL surface.
  * Corpus-scale cross-engine agreement is gated by q238 against a
  * recursive-CTE replay. */
class LcsLengthSpec extends SparkSpec {
  import spark.implicits._

  private def viaDf(a: Seq[String], b: Seq[String]): Int =
    Seq((a, b)).toDF("a", "b")
      .select(LcsLength.lcsLength($"a", $"b").as("l")).as[Int].head()

  test("classic values and reorder sensitivity") {
    assert(viaDf(Seq("a", "b", "c"), Seq("a", "b", "c")) === 3)
    assert(viaDf(Seq("a", "b", "c"), Seq("x", "y", "z")) === 0)
    assert(viaDf(Seq("the", "cat", "sat"), Seq("the", "fat", "cat")) === 2)
    // block rotation: n-grams survive inside blocks but LCS collapses
    // to the larger block — the discriminative property q238 leans on
    assert(viaDf(Seq("a", "b", "c", "d", "e", "f"),
      Seq("d", "e", "f", "a", "b", "c")) === 3)
    assert(viaDf(Seq.empty, Seq("a")) === 0)
    assert(viaDf(Seq("a"), Seq.empty) === 0)
  }

  test("a subsequence at any gap counts; repeated tokens handled") {
    assert(viaDf(Seq("a", "x", "b", "y", "c"), Seq("a", "b", "c")) === 3)
    assert(viaDf(Seq("a", "a", "a"), Seq("a", "a")) === 2)
    assert(viaDf(Seq("a", "b", "a", "b"), Seq("b", "a", "b", "a")) === 3)
  }

  test("NULL array -> NULL; NULL elements never match") {
    val df = Seq((Some(Seq("a", "b")), None: Option[Seq[String]]))
      .toDF("a", "b").select(LcsLength.lcsLength($"a", $"b").as("l"))
    assert(df.collect()(0).isNullAt(0))
    val withNullElems = spark.sql(
      "SELECT lcs_length(array('a', CAST(NULL AS STRING), 'b'), " +
        "array('a', CAST(NULL AS STRING), 'b')) AS l").as[Int].head()
    assert(withNullElems === 2) // the two real tokens; NULL != NULL
  }

  test("SQL registration matches the column API") {
    assert(spark.sql(
      "SELECT lcs_length(split('p q r s', ' '), split('p r s q', ' ')) AS l")
      .as[Int].head() === 3)
  }
}
