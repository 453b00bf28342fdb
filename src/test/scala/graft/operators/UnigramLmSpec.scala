package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val words = Seq(
    ("thequick", 50L), ("thefox", 40L), ("quickfox", 30L),
    ("lazydog", 20L), ("thedog", 25L), ("dogma", 5L))
    .toDF("word", "freq")

  test("seed keeps every character and the heaviest multi-char substrings") {
    val s = UnigramLm.seed(words, maxLen = 3, multiVocab = 10)
    val chars = s.filter(_._1.length == 1).map(_._1).toSet
    assert(chars === "thequickfoxlazydogma".toSet.map((c: Char) => c.toString))
    val multi = s.filter(_._1.length > 1)
    assert(multi.size === 10)
    // 'the' appears in thequick+thefox+thedog = 115 weight, top multi
    assert(multi.map(_._1).contains("the"))
  }

  test("segmentation reconstructs the word and picks frequent pieces") {
    val trained = UnigramLm.train(words, maxLen = 3, multiVocab = 10, iters = 2)
    val logp = UnigramLm.logProbs(trained)
    val entries = logp.toSeq.sortBy(_._1)
    val vm = map_from_arrays(typedLit(entries.map(_._1)),
      typedLit(entries.map(_._2)))
    val seg = words.select($"word",
      UnigramLm.segmentCol($"word", vm, 3).as("pieces"))
    // lossless round-trip: pieces concatenate back to the word
    val bad = seg.filter(concat_ws("", $"pieces") =!= $"word").count()
    assert(bad === 0)
    // 'the'-words should start with the learned 'the' piece
    val theSeg = seg.filter($"word" === "thequick")
      .select($"pieces").as[Seq[String]].head()
    assert(theSeg.head === "the", s"got $theSeg")
  }

  test("EM is deterministic and weights stay integer-consistent") {
    val a = UnigramLm.train(words, 3, 10, 2)
    val b = UnigramLm.train(words, 3, 10, 2)
    assert(a === b)
    // every multi-char weight is a sum of word freqs (divisible logic:
    // total corpus positions bound the total weight)
    assert(a.forall(_._2 >= 1))
  }
}
