package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: token
  * counting, quality scoring, language-ID heuristic, canonical
  * fingerprinting, shingling. All built from codegen'd
  * `org.apache.spark.sql.functions` — no UDFs in the hot path, so whole
  * stage codegen spans the full projection.
  */
object Text {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Mean token length (0.0 for empty text). */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, 0.0).otherwise(
      aggregate(t, lit(0.0), (acc, x) => acc + length(x)) / size(t))
  }

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("double")
        / length(text))

  private val stopwords = Seq("a", "the", "of", "to", "and", "is", "in")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    val hits = size(filter(t, x => x.isin(stopwords.map(lit): _*)))
    when(size(t) === 0, 0.0).otherwise(hits.cast("double") / size(t))
  }

  /** Composite quality score in [0,1]: favors mid-length docs with low
    * punctuation and some stopwords (the usual web-scrape heuristic
    * shape). Deterministic, integer/double arithmetic only. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val punct = punctRatio(text)
    val stop = stopwordRatio(text)
    round(greatest(lit(0.0),
      lenScore * 0.5 + stop * 0.3 + (lit(1.0) - punct) * 0.2), 6)
  }

  /** Language-ID by marker-token voting (n-gram-heuristic shape): score
    * per language = count of that language's marker tokens; argmax with
    * a fixed precedence tiebreak. Markers are deliberately simple —
    * the mechanism (profile scoring + argmax) is the operator. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est", "une"),
    "es" -> Seq("el", "la", "y", "es", "una"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val t = tokens(lower(text))
    langMarkers.map { case (lang, ms) =>
      lang -> size(filter(t, x => x.isin(ms.map(lit): _*)))
    }
  }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lang).otherwise(acc)
    }
  }

  /** Canonical content fingerprint: md5 of the sorted distinct lowered
    * token set — stable under word order and duplication (the
    * "fingerprint dedup" of training pipelines). */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(lower(trim(text))))), " "))

  /** BPE-ish pre-tokenization segments: maximal runs of letters, of
    * digits, or of other non-space symbols — the (lookahead-free)
    * core of the GPT-2 pre-tokenizer regex, portable between Java
    * regex and RE2 so the DuckDB oracle counts identically. The
    * segment count approximates subword token count far better than
    * whitespace words on code/punctuated text. */
  val bpeSegmentPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  def bpeSegments(text: Column): Column =
    regexp_extract_all(text, lit(bpeSegmentPattern), lit(0))

  def bpeSegmentCount(text: Column): Column = size(bpeSegments(text))

  /** Word n-gram shingles (array of strings). */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array())
      .otherwise(transform(sequence(lit(0), size(t) - n),
        i => array_join(slice(t, i + 1, lit(n)), " ")))
  }
}
