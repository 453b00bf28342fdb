package graft.queries

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.Quality

/** Corpus-quality filtering in the public Gopher/C4 shape: per-row
  * gates (one codegen'd projection), set-based repetition statistics
  * (explode → map-side-combined agg), and unigram entropy. All
  * arithmetic is integer counts + one final rounded division so the
  * DuckDB oracle hash-matches. */
object QualityQueries {

  /** Gopher-style per-document gates: word count, mean word length,
    * alphabetic/symbol token ratios, stop-word count, and the combined
    * pass/fail flag. Pure projection — runs at scan speed. */
  val q58GopherQuality = GraftQuery(
    "q58_gopher_quality",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        graft.functions.Text.tokenCount(col("text")).cast("long").as("n_words"),
        round(graft.functions.Text.meanTokenLen(col("text")), 4).as("mean_word_len"),
        round(Quality.alphaWordRatio(col("text")), 6).as("alpha_word_ratio"),
        round(Quality.symbolWordRatio(col("text")), 6).as("symbol_word_ratio"),
        Quality.stopwordCount(col("text")).cast("long").as("n_stopwords"),
        Quality.passesGopher(col("text")).cast("int").as("passes_gopher"))
        .orderBy("doc_id"),
    Some("""WITH t AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws,
           |         string_split_regex(trim(lower(text)), '\s+') AS wl
           |  FROM documents),
           |m AS (SELECT doc_id, len(ws) AS n_words,
           |  list_sum(list_transform(ws, x -> len(x))) AS tok_chars,
           |  len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_hits,
           |  len(list_filter(ws, x -> NOT regexp_matches(x, '[A-Za-z0-9]'))) AS sym_hits,
           |  len(list_filter(wl, x -> x IN ('a','the','of','to','and','is','in'))) AS stop_hits
           |  FROM t),
           |r AS (SELECT doc_id, n_words,
           |  CASE WHEN n_words = 0 THEN 0.0 ELSE tok_chars * 1.0 / n_words END AS mwl,
           |  CASE WHEN n_words = 0 THEN 0.0 ELSE alpha_hits * 1.0 / n_words END AS awr,
           |  CASE WHEN n_words = 0 THEN 0.0 ELSE sym_hits * 1.0 / n_words END AS swr,
           |  stop_hits FROM m)
           |SELECT doc_id, n_words, round(mwl, 4) AS mean_word_len,
           |  round(awr, 6) AS alpha_word_ratio, round(swr, 6) AS symbol_word_ratio,
           |  stop_hits AS n_stopwords,
           |  CAST(n_words >= 50 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
           |       AND awr > 0.8 AND stop_hits >= 2 AS INTEGER) AS passes_gopher
           |FROM r ORDER BY doc_id""".stripMargin))

  /** Set-based repetition statistics (the Gopher repetition filters):
    * type/token ratio, top-token fraction, duplicate-bigram fraction.
    * Explode → (doc, gram) count → per-doc agg; never per-row
    * quadratic, so long documents cost O(len) not O(len²). */
  val q59RepetitionStats = GraftQuery(
    "q59_repetition_stats",
    (s, dir) =>
      Quality.repetitionStats(Tables.documents(s, dir)).orderBy("doc_id"),
    Some("""WITH toks AS (
           |  SELECT doc_id, tok.t AS tok
           |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') ws FROM documents),
           |       LATERAL (SELECT unnest(ws) t) tok),
           |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
           |ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           |         count(*) AS n_distinct_tokens, CAST(max(c) AS BIGINT) AS top_c
           |       FROM tc GROUP BY 1),
           |bg AS (
           |  SELECT doc_id, ws[i.g] || ' ' || ws[i.g+1] AS g
           |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') ws FROM documents),
           |       LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) g) i
           |  WHERE len(ws) >= 2),
           |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
           |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           |         count(*) AS n_distinct_bigrams, CAST(max(c) AS BIGINT) AS top_bc
           |       FROM bc GROUP BY 1)
           |SELECT ts.doc_id, ts.n_tokens, ts.n_distinct_tokens,
           |  round(ts.n_distinct_tokens * 1.0 / ts.n_tokens, 6) AS type_token_ratio,
           |  round(ts.top_c * 1.0 / ts.n_tokens, 6) AS top_token_frac,
           |  COALESCE(bs.n_bigrams, 0) AS n_bigrams,
           |  round(COALESCE(1.0 - bs.n_distinct_bigrams * 1.0 / bs.n_bigrams, 0.0), 6)
           |    AS dup_bigram_frac,
           |  round(COALESCE(bs.top_bc * 1.0 / bs.n_bigrams, 0.0), 6) AS top_bigram_frac
           |FROM ts LEFT JOIN bs ON bs.doc_id = ts.doc_id
           |ORDER BY ts.doc_id""".stripMargin))

  /** Per-document unigram Shannon entropy in nats (lexical-diversity
    * quality signal), from the exploded-count shape. */
  val q60TokenEntropy = GraftQuery(
    "q60_token_entropy",
    (s, dir) =>
      Quality.tokenEntropy(Tables.documents(s, dir)).orderBy("doc_id"),
    Some("""WITH toks AS (
           |  SELECT doc_id, tok.t AS tok
           |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') ws FROM documents),
           |       LATERAL (SELECT unnest(ws) t) tok),
           |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
           |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS k,
           |          sum(c * ln(c)) AS clogc
           |        FROM tc GROUP BY 1)
           |SELECT doc_id, n AS n_tokens, k AS n_distinct_tokens,
           |  round(ln(n) - clogc / n, 6) AS entropy,
           |  round(CASE WHEN k > 1 THEN (ln(n) - clogc / n) / ln(k) ELSE 0.0 END, 6)
           |    AS norm_entropy
           |FROM agg ORDER BY doc_id""".stripMargin))

  /** Unigram language-model scoring (the KenLM-style quality proxy,
    * order 1): per-document mean negative log-probability and the
    * corresponding perplexity under the corpus's own unigram
    * distribution. Two aggregations (corpus term frequencies, one-row
    * total) + a token-keyed join — fully set-based, the same dataflow
    * an n-gram LM scorer runs at 100 TB. */
  val q74UnigramLogprob = GraftQuery(
    "q74_unigram_logprob",
    (s, dir) => {
      val toks = Tables.documents(s, dir).select(col("doc_id"),
        explode(graft.functions.Text.tokens(col("text"))).as("tok"))
      val freq = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      toks.join(freq, "tok")
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          avg(log(col("n_total").cast("double")) - log(col("tf").cast("double")))
            .as("nll"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("nll"), 6).as("avg_neg_logprob"),
          round(exp(col("nll")), 2).as("perplexity"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, tok.t AS tok
           |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') ws FROM documents),
           |       LATERAL (SELECT unnest(ws) t) tok),
           |freq AS (SELECT tok, count(*) AS tf FROM toks GROUP BY 1),
           |total AS (SELECT count(*) AS n_total FROM toks),
           |nll AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           |    avg(ln(CAST(n_total AS DOUBLE)) - ln(CAST(tf AS DOUBLE))) AS nll
           |  FROM toks JOIN freq USING (tok) CROSS JOIN total
           |  GROUP BY doc_id)
           |SELECT doc_id, n_tokens, round(nll, 6) AS avg_neg_logprob,
           |  round(exp(nll), 2) AS perplexity
           |FROM nll ORDER BY doc_id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q58GopherQuality, q59RepetitionStats,
    q60TokenEntropy, q74UnigramLogprob)
}
