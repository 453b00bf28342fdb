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

  /** Learn `k` merges from a (word, freq) table. Returns fewer than
    * `k` merges if the vocabulary runs dry first (every word reduced
    * to a single token — no adjacent pairs left to merge). */
  def learn(words: DataFrame, k: Int): Seq[Merge] = {
    val out = scala.collection.mutable.ListBuffer.empty[Merge]
    // one sentinel-wrapped cell per character: "ab" -> "§a§§b§"
    var cached = words
      .select(regexp_replace(col("word"), "(.)", "§$1§").as("toks"),
        col("freq"))
      .cache()
    var i = 1
    var exhausted = false
    while (i <= k && !exhausted) {
      val pairs = cached
        .withColumn("t", split(regexp_replace(col("toks"), "^§|§$", ""), "§§"))
        .filter(size(col("t")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(t) - 1), " +
            "j -> struct(element_at(t, j) AS a, element_at(t, j + 1) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("weight"))
      pairs.orderBy(desc("weight"), asc("a"), asc("b"))
        .limit(1).collect().headOption match {
        case None => exhausted = true // no pairs left: partial result
        case Some(best) =>
          val (a, b, w) =
            (best.getString(0), best.getString(1), best.getLong(2))
          out += Merge(i, a, b, w)
          // tokens are letters-only by contract, safe to embed literally
          val next = cached
            .select(expr(s"replace(toks, '§$a§§$b§', '§$a$b§')").as("toks"),
              col("freq"))
            .cache()
          next.count() // materialize before dropping the parent from cache
          cached.unpersist()
          cached = next
          i += 1
      }
    }
    cached.unpersist()
    out.toList
  }

  /** Tokenize a word column with a LEARNED merge list — the apply
    * half of the tokenizer (learn() induces the vocabulary; this puts
    * it to work on the corpus). Exactly the learning-side mechanics,
    * replayed: sentinel-wrap every character, then one codegen'd
    * `replace` per merge IN LEARNED ORDER (BPE application must
    * replay merges by rank, not by match length), then split into the
    * token array. The whole thing is a single projection — k merges
    * become k nested string expressions inside one whole-stage-codegen
    * span, no UDF, no shuffle, no state; at 100 TB it runs as a
    * map-only pass over the corpus.
    *
    * Same contract as learn(): words must not contain the `§`
    * sentinel. */
  def tokenizeCol(word: org.apache.spark.sql.Column,
                  merges: Seq[Merge]): org.apache.spark.sql.Column = {
    var toks = regexp_replace(word, "(.)", "§$1§")
    merges.sortBy(_.iter).foreach { m =>
      toks = replace(toks, lit(s"§${m.a}§§${m.b}§"), lit(s"§${m.a}${m.b}§"))
    }
    split(regexp_replace(toks, "^§|§$", ""), "§§")
  }
}
