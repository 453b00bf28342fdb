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
}
