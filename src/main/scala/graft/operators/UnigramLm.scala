package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SentencePiece-style UNIGRAM-LM tokenizer training — the other
  * mainstream tokenizer family next to BPE ([[BpeLearn]]): a piece
  * vocabulary with probabilities, trained by EM over a word-frequency
  * table, applied by Viterbi segmentation (each word splits into the
  * pieces maximizing Σ log p(piece)).
  *
  * This is the HARD-EM (Viterbi-EM) variant: the E-step segments every
  * word by the current piece log-probs, the M-step recounts pieces
  * over the best segmentations and renormalizes, pruning the
  * vocabulary back to `multiVocab` multi-character pieces by count —
  * the first-order likelihood-loss proxy (removing the
  * lowest-contribution pieces loses the least corpus likelihood);
  * single characters are never pruned (coverage floor, exactly
  * SentencePiece's required-character rule).
  *
  * Scale shape: the E-step is ONE map-only projection per iteration —
  * the Viterbi DP runs entirely inside a SQL `aggregate` HOF over the
  * word's positions with the (bounded, vocabulary-sized) piece
  * log-prob map inlined as a literal; the M-step is one
  * explode+hash-aggregate over pieces. Only the model (≤ chars +
  * multiVocab rows) ever reaches the driver per iteration — the
  * BpeLearn/KMeans pattern. At 100 TB the input is the word-frequency
  * table (vocabulary-sized), so iterations cost small shuffles
  * regardless of corpus size.
  *
  * Every decision is DETERMINISTIC and SQL-replayable (the q255/q256
  * oracles replay 2 full EM iterations plus application in DuckDB):
  * DP cell scores are quantized to 9 decimals at every step (log-probs
  * snap to 1e-9 — the established ln() cross-engine convention), best
  * candidates compare on the (rounded score, piece length) pair so
  * ties go to the LONGER piece, and vocabulary pruning ranks by
  * (count desc, piece asc). */
object UnigramLm {

  /** round-half-away-from-zero to 9 decimals — matches both engines'
    * `round(x, 9)`. */
  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Piece log-probs from integer weights: lp = round(ln(w / W), 9). */
  def logProbs(weights: Seq[(String, Long)]): Map[String, Double] = {
    val total = weights.map(_._2).sum.toDouble
    weights.map { case (p, w) => p -> round9(math.log(w / total)) }.toMap
  }

  /** Seed vocabulary from a (word, freq) table: every substring of
    * length 1..maxLen, weighted by freq × occurrences; ALL single
    * characters survive, plus the top `multiVocab` multi-character
    * substrings by (weight desc, piece asc). Driver result is
    * vocabulary-sized. */
  def seed(words: DataFrame, maxLen: Int,
           multiVocab: Int): Seq[(String, Long)] = {
    val subs = words
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)),
           |  i -> transform(sequence(1, least($maxLen, length(word) - i + 1)),
           |  l -> substring(word, i, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("freq").as("w"))
    val chars = subs.filter(length(col("piece")) === 1)
      .orderBy("piece")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val multi = subs.filter(length(col("piece")) > 1)
      .orderBy(desc("w"), asc("piece")).limit(multiVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    chars ++ multi
  }

  /** Viterbi forward DP over `word` as a pure Column: cell j holds the
    * best (9-decimal-quantized) score of the length-j prefix plus the
    * backpointer that achieved it. Candidates are the ≤ maxLen piece
    * lengths ending at j; the argmax compares the encoded key
    * `round(score, 9) + l·1e-12` — scores are 1e-9-quantized so the
    * 1e-12 length term can never flip a genuine score difference, and
    * on an exact score tie it deterministically prefers the LONGER
    * piece. The explicit descending CASE chain (not a struct
    * `greatest`) is used so the DuckDB oracle can replay the identical
    * decision. `vocab` is the literal piece→logp map; single
    * characters must all be present (seed guarantees it) or a word
    * could be unsegmentable. */
  private def forwardDp(word: Column, vocab: Column, maxLen: Int): Column =
    aggregate(
      sequence(lit(1), length(word)),
      array(struct(lit(0.0).as("score"), lit(0).as("back"))),
      (acc, j) => {
        // s(l) = quantized candidate score for a length-l piece ending
        // at cell j; k(l) = its comparison key
        val s = (1 to maxLen).map { l =>
          val i = j - lit(l) // predecessor prefix length
          val lp = element_at(vocab, word.substr(i + 1, lit(l)))
          when(i >= 0 && lp.isNotNull,
            round(element_at(acc, i + 1)("score") + lp, 9))
        }
        val k = s.zipWithIndex.map { case (c, idx) => c + (idx + 1) * 1e-12 }
        // descending argmax: l wins iff its key strictly beats every
        // shorter candidate's (keys are distinct by construction)
        val bestL = (maxLen to 2 by -1).foldRight(lit(1)) { (l, rest) =>
          when(k(l - 1).isNotNull &&
            (1 until l).map(m => k(m - 1).isNull || k(l - 1) > k(m - 1))
              .reduce(_ && _), lit(l))
            .otherwise(rest)
        }
        val bestS = (maxLen to 2 by -1).foldRight(s.head) { (l, rest) =>
          when(bestL === l, s(l - 1)).otherwise(rest)
        }
        concat(acc, array(struct(bestS.as("score"), (j - bestL).as("back"))))
      })

  /** Best segmentation of `word` under `vocab` (piece→logp literal
    * map): the Viterbi pieces in order. */
  def segmentCol(word: Column, vocab: Column, maxLen: Int): Column = {
    val dp = forwardDp(word, vocab, maxLen)
    // walk the backpointers from len to 0 (len steps bound the walk),
    // collecting pieces right-to-left
    aggregate(
      sequence(lit(1), length(word)),
      struct(length(word).as("pos"),
        typedLit(Array.empty[String]).as("parts"), dp.as("dp")),
      (acc, _) => {
        val bk = element_at(acc("dp"), acc("pos") + 1)("back")
        when(acc("pos") > 0,
          struct(bk.as("pos"),
            concat(acc("parts"),
              array(word.substr(bk + 1, acc("pos") - bk))).as("parts"),
            acc("dp").as("dp")))
          .otherwise(acc)
      },
      a => reverse(a("parts")))
  }

  private def vocabMap(logp: Map[String, Double]): Column = {
    val entries = logp.toSeq.sortBy(_._1)
    map_from_arrays(typedLit(entries.map(_._1)), typedLit(entries.map(_._2)))
  }

  /** One hard-EM round: segment every word under `logp`, recount
    * pieces (freq-weighted), floor unseen single characters at weight
    * 1, prune multi-char pieces to the top `multiVocab` by (count
    * desc, piece asc). Returns the new integer weights. */
  def emStep(words: DataFrame, logp: Map[String, Double],
             seedChars: Seq[String], maxLen: Int,
             multiVocab: Int): Seq[(String, Long)] = {
    val counts = words
      .select(explode(segmentCol(col("word"), vocabMap(logp), maxLen))
        .as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val chars = seedChars.sorted.map(c => c -> counts.getOrElse(c, 1L))
    val multi = counts.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, w) => (-w, p) }.take(multiVocab)
    chars ++ multi
  }

  /** Full training: seed → `iters` hard-EM rounds. Returns the final
    * integer piece weights (the model; pair with [[logProbs]] +
    * [[segmentCol]] to tokenize). */
  def train(words: DataFrame, maxLen: Int = 3, multiVocab: Int = 50,
            iters: Int = 2): Seq[(String, Long)] = {
    var weights = seed(words, maxLen, multiVocab)
    val seedChars = weights.collect { case (p, _) if p.length == 1 => p }
    for (_ <- 0 until iters)
      weights = emStep(words, logProbs(weights), seedChars, maxLen, multiVocab)
    weights
  }
}
