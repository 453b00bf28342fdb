package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-scrape quality filters in the shape popularized by the public
  * Gopher/MassiveText and C4 cleaning recipes (Rae et al. 2021; Raffel
  * et al. 2020): per-document word-count / word-length / alphabetic /
  * stop-word gates, plus set-based repetition statistics.
  *
  * Two deliberate implementation families:
  *  - per-row gates stay inside one codegen'd projection (array
  *    functions, no UDFs, no shuffle) — they run at scan speed;
  *  - repetition stats explode to (doc_id, gram) and aggregate, because
  *    a per-row O(tokens²) "most frequent n-gram" HOF would blow up on
  *    long documents; the explode shape is map-side-combined and
  *    partitions by doc, so it survives 100 TB corpora with bounded
  *    memory per task.
  */
object Quality {

  /** Stop-word hit count (same 7-word list as [[Text.stopwordRatio]]). */
  private val stopwords = Seq("a", "the", "of", "to", "and", "is", "in")

  def stopwordCount(text: Column): Column = {
    val t = Text.tokens(lower(text))
    size(filter(t, x => x.isin(stopwords.map(lit): _*)))
  }

  /** Fraction of tokens containing at least one ASCII letter. */
  def alphaWordRatio(text: Column): Column = {
    val t = Text.tokens(text)
    when(size(t) === 0, 0.0)
      .otherwise(size(filter(t, x => x.rlike("[A-Za-z]"))).cast("double") / size(t))
  }

  /** Tokens that are pure symbol runs (no letter, no digit) per word —
    * the "#/ellipsis symbol ratio" gate generalized to any symbol token. */
  def symbolWordRatio(text: Column): Column = {
    val t = Text.tokens(text)
    when(size(t) === 0, 0.0)
      .otherwise(size(filter(t, x => !x.rlike("[A-Za-z0-9]"))).cast("double") / size(t))
  }

  /** The Gopher-style document gate as one boolean expression.
    * Thresholds are the published MassiveText defaults scaled to this
    * corpus (min 50 words, mean word length in [3,10], >80% alphabetic
    * tokens, ≥2 stop words). */
  def passesGopher(text: Column): Column = {
    val n = Text.tokenCount(text)
    (n >= 50) && (n <= 100000) &&
      (Text.meanTokenLen(text) >= 3.0) && (Text.meanTokenLen(text) <= 10.0) &&
      (alphaWordRatio(text) > 0.8) &&
      (stopwordCount(text) >= 2)
  }

  /** Set-based per-document repetition statistics over unigrams and
    * word bigrams: type/token ratio, most-frequent-token fraction,
    * duplicate-bigram fraction. Input needs (doc_id, text); output is
    * one row per doc. Aggregations are map-side combined; nothing is
    * per-row quadratic. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(Text.tokens(col("text"))).as("tok"))
    val tokStats = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        max("c").cast("long").as("top_token_c"))
    val bigrams = docs.select(col("doc_id"),
      explode(Text.wordShingles(col("text"), 2)).as("g"))
    val biStats = bigrams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").cast("long").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max("c").cast("long").as("top_bigram_c"))
    tokStats.join(biStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        round(col("n_distinct_tokens").cast("double") / col("n_tokens"), 6)
          .as("type_token_ratio"),
        round(col("top_token_c").cast("double") / col("n_tokens"), 6)
          .as("top_token_frac"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(lit(1.0) -
          col("n_distinct_bigrams").cast("double") / col("n_bigrams"), lit(0.0)), 6)
          .as("dup_bigram_frac"),
        round(coalesce(col("top_bigram_c").cast("double") / col("n_bigrams"),
          lit(0.0)), 6).as("top_bigram_frac"))
  }

  // ---- C4/Gopher line-level boilerplate signals -------------------
  // The public C4 cleaning recipe (Raffel et al. 2020 §2.2) works on
  // newline-split lines: keep lines ending in terminal punctuation
  // with enough words, drop pages with policy boilerplate or code
  // braces; Gopher adds bullet/ellipsis line-fraction gates. All of
  // these are array expressions over one split — a single projection,
  // no shuffle, no UDF.

  /** Newline-split lines of a document. */
  def docLines(text: Column): Column = split(text, "\n")

  /** Words on one (trimmed) line; 0 for blank lines. */
  private def lineWords(l: Column): Column =
    when(length(trim(l)) === 0, 0).otherwise(size(split(trim(l), "\\s+")))

  /** Lines ending in terminal punctuation ({@code . ! ? "}). */
  def terminalPunctLines(ls: Column): Column =
    size(filter(ls, l => rtrim(l).rlike("[.!?\"]$")))

  /** C4's sentence proxy: terminal-punctuated lines with ≥ 5 words. */
  def keptLines(ls: Column): Column =
    size(filter(ls, l => rtrim(l).rlike("[.!?\"]$") && lineWords(l) >= 5))

  /** Lines that start like a bullet item ({@code - }, {@code * }, •). */
  def bulletLines(ls: Column): Column =
    size(filter(ls, l => ltrim(l).rlike("^(-\\s|\\*\\s|•)")))

  /** Lines ending in an ellipsis ({@code ...} or …). */
  def ellipsisLines(ls: Column): Column =
    size(filter(ls, l => rtrim(l).rlike("(\\.\\.\\.|…)$")))

  /** How many of the C4 policy-boilerplate phrases the page hits. */
  val policyPhrases: Seq[String] = Seq("lorem ipsum", "javascript",
    "cookie policy", "privacy policy", "terms of use", "all rights reserved")

  def policyPhraseHits(text: Column): Column =
    policyPhrases.map(p => when(lower(text).contains(p), 1).otherwise(0))
      .reduce(_ + _)

  /** The composite C4 page gate: ≥ 3 sentence-like lines, no policy
    * boilerplate, no code braces. */
  def passesC4(text: Column): Column = {
    val ls = docLines(text)
    (keptLines(ls) >= 3) && (policyPhraseHits(text) === 0) &&
      !text.contains("{")
  }

  /** Per-document unigram Shannon entropy (nats), from the same
    * exploded-count shape: H = ln(N) - Σ c·ln(c) / N. High-entropy docs
    * are lexically diverse; near-zero entropy marks degenerate repeats
    * (a standard training-data quality signal). */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(Text.tokens(col("text"))).as("tok"))
    toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("k"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clogc"))
      .select(col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        col("k").cast("long").as("n_distinct_tokens"),
        round(log(col("n").cast("double")) - col("clogc") / col("n"), 6)
          .as("entropy"),
        round(when(col("k") > 1,
            (log(col("n").cast("double")) - col("clogc") / col("n"))
              / log(col("k").cast("double")))
          .otherwise(0.0), 6).as("norm_entropy"))
  }
}
