package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary LEARNING — the
  * tokenizer-induction step of a training-data pipeline (q69 applies a
  * fixed merge table; this learns one). Textbook algorithm (merge the
  * most frequent adjacent token pair, repeat) over a word-frequency
  * table:
  *
  *  - pair counting is a distributed explode + hash aggregate
  *    (map-side combined; "aaa" counts (a,a) twice — every adjacent
  *    index, the standard convention);
  *  - the argmax is `orderBy(weight desc, a, b).limit(1)` — a
  *    TakeOrderedAndProject, never a global sort — with the
  *    lexicographic tie-break that makes learning deterministic;
  *  - the merge applies as ONE codegen'd string `replace` per
  *    iteration on a sentinel-delimited token string (`§a§§b§` →
  *    `§ab§`): each token is individually wrapped, so matches can't
  *    straddle token boundaries or match inside longer tokens, and
  *    left-to-right non-overlapping replacement is exactly BPE's
  *    greedy pairwise application.
  *
  * Driver traffic is ONE (a, b, weight) row per iteration — the
  * KMeans-centroid pattern; the word table itself never leaves the
  * executors. At 100 TB the word-frequency table is the only input
  * (vocabulary-sized, not corpus-sized), so iterations cost k small
  * shuffles regardless of corpus size.
  *
  * Tokens must not contain the `§` sentinel — callers feed
  * letters-only words (the regexp-extracted word table q189 builds).
  */
object BpeLearn {

  final case class Merge(iter: Int, a: String, b: String, weight: Long)

  /** Learn `k` merges from a (word, freq) table. */
  def learn(words: DataFrame, k: Int): Seq[Merge] = {
    val out = scala.collection.mutable.ListBuffer.empty[Merge]
    // one sentinel-wrapped cell per character: "ab" -> "§a§§b§"
    var cached = words
      .select(regexp_replace(col("word"), "(.)", "§$1§").as("toks"),
        col("freq"))
      .cache()
    for (i <- 1 to k) {
      val pairs = cached
        .withColumn("t", split(regexp_replace(col("toks"), "^§|§$", ""), "§§"))
        .filter(size(col("t")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(t) - 1), " +
            "j -> struct(element_at(t, j) AS a, element_at(t, j + 1) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("weight"))
      val best = pairs.orderBy(desc("weight"), asc("a"), asc("b"))
        .limit(1).collect()(0)
      val (a, b, w) = (best.getString(0), best.getString(1), best.getLong(2))
      out += Merge(i, a, b, w)
      // tokens are letters-only by contract, safe to embed literally
      val next = cached
        .select(expr(s"replace(toks, '§$a§§$b§', '§$a$b§')").as("toks"),
          col("freq"))
        .cache()
      next.count() // materialize before dropping the parent from cache
      cached.unpersist()
      cached = next
    }
    cached.unpersist()
    out.toList
  }
}
