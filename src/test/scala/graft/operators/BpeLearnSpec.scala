package graft.operators

import graft.SparkSpec

class BpeLearnSpec extends SparkSpec {
  import spark.implicits._

  test("learns textbook merges with non-overlapping greedy application") {
    // "aaa"×2 has TWO (a,a) occurrences per word (every adjacent index)
    // but merging produces ["aa","a"] (left-to-right non-overlap)
    val words = Seq(("aaa", 2L), ("ab", 3L), ("ba", 1L)).toDF("word", "freq")
    val m = BpeLearn.learn(words, 3)
    assert(m.map(x => (x.iter, x.a, x.b, x.weight)) === List(
      (1, "a", "a", 4L),   // 2 occurrences × freq 2
      (2, "a", "b", 3L),   // ("aa","a") only counts 2 after the merge
      (3, "aa", "a", 2L))) // multi-char token pairs merge too
  }

  test("ties break lexicographically, making learning deterministic") {
    val words = Seq(("xz", 5L), ("xy", 5L), ("zz", 4L)).toDF("word", "freq")
    val m = BpeLearn.learn(words, 1)
    assert(m.head.a === "x" && m.head.b === "y" && m.head.weight === 5L)
  }

  test("single-character words contribute no pairs and never crash") {
    val words = Seq(("a", 100L), ("bc", 1L)).toDF("word", "freq")
    val m = BpeLearn.learn(words, 1)
    assert(m === List(BpeLearn.Merge(1, "b", "c", 1L)))
  }

  test("learn returns PARTIAL merges when the vocabulary runs dry") {
    // after merging (b,c) every word is a single token — iterations
    // 2..5 have no pairs and must return the 1 learned merge, not throw
    val words = Seq(("a", 100L), ("bc", 1L)).toDF("word", "freq")
    val m = BpeLearn.learn(words, 5)
    assert(m === List(BpeLearn.Merge(1, "b", "c", 1L)))
    // fully dry from the start: no pairs at all -> empty merge list
    assert(BpeLearn.learn(Seq(("a", 3L), ("b", 1L)).toDF("word", "freq"),
      4) === Nil)
  }

  test("tokenizeCol round-trips the training corpus through learned merges") {
    import org.apache.spark.sql.functions._
    val words = Seq(("aaa", 2L), ("ab", 3L), ("aab", 1L), ("c", 4L))
      .toDF("word", "freq")
    val merges = BpeLearn.learn(words, 2)
    // merges: (a,a) w=5 -> "aa"; then (a,b) w=3
    assert(merges.map(m => (m.a, m.b)) === List(("a", "a"), ("a", "b")))
    val got = words
      .select(col("word"), BpeLearn.tokenizeCol(col("word"), merges).as("t"))
      .as[(String, Seq[String])].collect().toMap
    // BPE invariant: applying learned merges by rank reproduces the
    // learner's own final word state (greedy left-to-right non-overlap)
    assert(got("aaa") === Seq("aa", "a"))
    assert(got("ab") === Seq("ab"))
    assert(got("aab") === Seq("aa", "b")) // (a,b) can't fire: its 'a' merged
    assert(got("c") === Seq("c"))
    // empty merge list = character tokenization
    assert(words.select(BpeLearn.tokenizeCol(col("word"), Nil).as("t"))
      .as[Seq[String]].collect().map(_.mkString).sorted
      === Array("aaa", "aab", "ab", "c"))
  }
}
