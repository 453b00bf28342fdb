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

  /** Collocation mining via pointwise mutual information: adjacent
    * word pairs scored by ln(p(ab) / (p(a)·p(b))) with corpus-level
    * unigram/bigram frequencies — three aggregations and two
    * broadcast-able joins, the standard phrase-detection pass. Top 30
    * with a deterministic tiebreak. */
  val q94Collocations = GraftQuery(
    "q94_collocations",
    (s, dir) => {
      val docs = graft.operators.FanOut(Tables.documents(s, dir))
      val toks = docs.select(explode(graft.functions.Text.tokens(col("text"))).as("tok"))
      val uni = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      // total tokens = Σ unigram counts: one aggregate over the (tiny)
      // vocabulary instead of a second full explode pass over the corpus
      val nTok = uni.agg(sum("c").as("n_tok"))
      val bi = docs.select(
          explode(graft.functions.Text.wordShingles(col("text"), 2)).as("bg"))
        .select(split(col("bg"), " ").getItem(0).as("w1"),
          split(col("bg"), " ").getItem(1).as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
      val nBi = docs.select(
          (greatest(graft.functions.Text.tokenCount(col("text")) - 1, lit(0)))
            .as("nb")).agg(sum("nb").as("n_bi"))
      bi.join(uni.select(col("tok").as("w1"), col("c").as("c_a")), "w1")
        .join(uni.select(col("tok").as("w2"), col("c").as("c_b")), "w2")
        .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
        .withColumn("pmi", round(
          log((col("c_ab").cast("double") / col("n_bi")) /
            ((col("c_a").cast("double") / col("n_tok")) *
             (col("c_b").cast("double") / col("n_tok")))), 6))
        .select(col("w1"), col("w2"), col("c_ab"), col("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(30)
    },
    Some("""WITH toks AS (
           |  SELECT tok.t AS tok
           |  FROM (SELECT string_split_regex(trim(text), '\s+') ws FROM documents),
           |       LATERAL (SELECT unnest(ws) t) tok),
           |uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
           |ntok AS (SELECT count(*) AS n_tok FROM toks),
           |bi AS (
           |  SELECT ws[i.g] AS w1, ws[i.g+1] AS w2, count(*) AS c_ab
           |  FROM (SELECT string_split_regex(trim(text), '\s+') ws FROM documents),
           |       LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) g) i
           |  WHERE len(ws) >= 2
           |  GROUP BY 1, 2 HAVING count(*) >= 5),
           |nbi AS (
           |  SELECT CAST(sum(greatest(len(string_split_regex(trim(text), '\s+')) - 1, 0))
           |    AS BIGINT) AS n_bi
           |  FROM documents)
           |SELECT w1, w2, c_ab,
           |  round(ln((c_ab * 1.0 / n_bi) /
           |    ((a.c * 1.0 / n_tok) * (b.c * 1.0 / n_tok))), 6) AS pmi
           |FROM bi
           |JOIN uni a ON a.tok = w1
           |JOIN uni b ON b.tok = w2
           |CROSS JOIN ntok CROSS JOIN nbi
           |ORDER BY pmi DESC, w1, w2
           |LIMIT 30""".stripMargin))

  /** Chi-square independence test between order priority and line
    * return flag: observed vs expected cell counts from the marginals,
    * χ² = Σ (o−e)²/e — the categorical-association profiling stat,
    * computed in two aggregation passes with broadcast marginals. */
  val q95ChiSquare = GraftQuery(
    "q95_chi_square",
    (s, dir) => {
      val j = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("prio"), col("l_returnflag").as("flag"))
      val cells = j.groupBy("prio", "flag").agg(count(lit(1)).as("o"))
      val rowM = j.groupBy("prio").agg(count(lit(1)).as("r"))
      val colM = j.groupBy("flag").agg(count(lit(1)).as("cc"))
      val n = j.agg(count(lit(1)).as("n"))
      cells.join(broadcast(rowM), "prio").join(broadcast(colM), "flag")
        .crossJoin(broadcast(n))
        .withColumn("e", col("r").cast("double") * col("cc") / col("n"))
        .agg(count(lit(1)).as("n_cells"),
          round(sum(pow(col("o") - col("e"), 2) / col("e")), 4).as("chi2"))
    },
    Some("""WITH j AS (
           |  SELECT o_orderpriority AS prio, l_returnflag AS flag
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |cells AS (SELECT prio, flag, count(*) AS o FROM j GROUP BY 1, 2),
           |rm AS (SELECT prio, count(*) AS r FROM j GROUP BY 1),
           |cm AS (SELECT flag, count(*) AS cc FROM j GROUP BY 1),
           |n AS (SELECT count(*) AS n FROM j)
           |SELECT count(*) AS n_cells,
           |  round(sum(pow(o - (r * 1.0 * cc / n.n), 2) / (r * 1.0 * cc / n.n)), 4)
           |    AS chi2
           |FROM cells JOIN rm USING (prio) JOIN cm USING (flag) CROSS JOIN n""".stripMargin))

  /** Language-ID confidence: the margin between the best and
    * second-best marker scores (argmax alone hides ambiguity — the
    * routing decision a multilingual pipeline actually makes is
    * lang + confidence). Scores sort in-plan via array_sort; counts
    * per (language, confident) cell. */
  val q98LangidConfidence = GraftQuery(
    "q98_langid_confidence",
    (s, dir) => {
      import graft.functions.Text
      val scores = Text.langScores(col("text"))
      val arr = array_sort(array(scores.map(_._2.cast("long")): _*))
      val n = scores.size
      Tables.documents(s, dir)
        .select(Text.langId(col("text")).as("lang_pred"),
          (element_at(arr, n) - element_at(arr, n - 1)).as("margin"))
        .groupBy(col("lang_pred"), (col("margin") >= 2).cast("int").as("confident"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang_pred", "confident")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
           |  FROM documents),
           |sc AS (SELECT doc_id,
           |  len(list_filter(ws, x -> x IN ('the','a','of','and','is'))) AS s_en,
           |  len(list_filter(ws, x -> x IN ('der','die','das','und','ist'))) AS s_de,
           |  len(list_filter(ws, x -> x IN ('le','la','et','est','une'))) AS s_fr,
           |  len(list_filter(ws, x -> x IN ('el','la','y','es','una'))) AS s_es
           |  FROM t),
           |p AS (SELECT doc_id,
           |  CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es) AND s_en > 0 THEN 'en'
           |       WHEN s_de = greatest(s_en, s_de, s_fr, s_es) AND s_de > 0 THEN 'de'
           |       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) AND s_fr > 0 THEN 'fr'
           |       WHEN s_es = greatest(s_en, s_de, s_fr, s_es) AND s_es > 0 THEN 'es'
           |       ELSE 'und' END AS lang_pred,
           |  list_sort([s_en, s_de, s_fr, s_es]) AS srt
           |  FROM sc)
           |SELECT lang_pred,
           |  CAST(srt[4] - srt[3] >= 2 AS INTEGER) AS confident,
           |  count(*) AS n_docs
           |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** C4/Gopher line-level boilerplate statistics: newline-split line
    * counts, terminal-punctuation/sentence-like/bullet/ellipsis line
    * fractions, policy-phrase hits, code-brace flag, and the composite
    * C4 page gate — one codegen-friendly projection over one split.
    * The synthetic corpus is single-line punctuation-free text, so the
    * line-shape features are uniform here (the multi-line fixtures in
    * QualitySpec discriminate every branch); the varying word-count
    * columns keep the oracle hash sensitive to the splitting and
    * counting machinery itself. */
  val q99C4Boilerplate = GraftQuery(
    "q99_c4_boilerplate",
    (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("ls", Quality.docLines(col("text")))
        .select(
          col("doc_id"),
          size(col("ls")).cast("long").as("n_lines"),
          aggregate(transform(col("ls"), l =>
              when(length(trim(l)) === 0, 0)
                .otherwise(size(split(trim(l), "\\s+")))),
            lit(0), (acc, x) => acc + x).cast("long").as("total_line_words"),
          array_max(transform(col("ls"), l =>
              when(length(trim(l)) === 0, 0)
                .otherwise(size(split(trim(l), "\\s+")))))
            .cast("long").as("max_line_words"),
          round(Quality.terminalPunctLines(col("ls")).cast("double") /
            size(col("ls")), 6).as("terminal_punct_line_ratio"),
          round(Quality.bulletLines(col("ls")).cast("double") /
            size(col("ls")), 6).as("bullet_line_frac"),
          round(Quality.ellipsisLines(col("ls")).cast("double") /
            size(col("ls")), 6).as("ellipsis_line_frac"),
          Quality.keptLines(col("ls")).cast("long").as("kept_lines"),
          Quality.policyPhraseHits(col("text")).cast("long").as("policy_hits"),
          col("text").contains("{").cast("int").as("has_brace"),
          Quality.passesC4(col("text")).cast("int").as("passes_c4"))
        .orderBy("doc_id"),
    Some("""WITH t AS (
           |  SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM documents),
           |m AS (SELECT doc_id, text, len(ls) AS n_lines,
           |  list_transform(ls, l -> CASE WHEN len(trim(l)) = 0 THEN 0
           |    ELSE len(string_split_regex(trim(l), '\s+')) END) AS lw,
           |  len(list_filter(ls, l -> regexp_matches(rtrim(l), '[.!?"]$'))) AS tp,
           |  len(list_filter(ls, l -> regexp_matches(rtrim(l), '[.!?"]$')
           |    AND (CASE WHEN len(trim(l)) = 0 THEN 0
           |         ELSE len(string_split_regex(trim(l), '\s+')) END) >= 5)) AS kept,
           |  len(list_filter(ls, l -> regexp_matches(ltrim(l), '^(-\s|\*\s|•)'))) AS bul,
           |  len(list_filter(ls, l -> regexp_matches(rtrim(l), '(\.\.\.|…)$'))) AS ell,
           |  (CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END
           |   + CASE WHEN contains(lower(text), 'javascript') THEN 1 ELSE 0 END
           |   + CASE WHEN contains(lower(text), 'cookie policy') THEN 1 ELSE 0 END
           |   + CASE WHEN contains(lower(text), 'privacy policy') THEN 1 ELSE 0 END
           |   + CASE WHEN contains(lower(text), 'terms of use') THEN 1 ELSE 0 END
           |   + CASE WHEN contains(lower(text), 'all rights reserved') THEN 1 ELSE 0 END)
           |    AS policy_hits,
           |  CASE WHEN contains(text, '{') THEN 1 ELSE 0 END AS has_brace
           |  FROM t)
           |SELECT doc_id, n_lines,
           |  CAST(list_sum(lw) AS BIGINT) AS total_line_words,
           |  CAST(list_max(lw) AS BIGINT) AS max_line_words,
           |  round(tp * 1.0 / n_lines, 6) AS terminal_punct_line_ratio,
           |  round(bul * 1.0 / n_lines, 6) AS bullet_line_frac,
           |  round(ell * 1.0 / n_lines, 6) AS ellipsis_line_frac,
           |  CAST(kept AS BIGINT) AS kept_lines,
           |  CAST(policy_hits AS BIGINT) AS policy_hits, has_brace,
           |  CAST(kept >= 3 AND policy_hits = 0 AND has_brace = 0 AS INTEGER)
           |    AS passes_c4
           |FROM m ORDER BY doc_id""".stripMargin))

  /** Count-min-sketch heavy hitters: the corpus's top-20 tokens with
    * their CMS-estimated counts (d=4 hash rows × w=256 buckets)
    * beside the exact counts. The sketch is the third portable-sketch
    * family in the engine (after KMV distinct and MinHash/OPH
    * similarity): per-row buckets are pure md5 functions, the table
    * is one (row, bucket) aggregation — mergeable across shards by
    * addition — and estimates are min-over-rows lookups. At 100 TB
    * frequency questions run against the 1024-cell sketch, not a
    * full vocabulary shuffle; the estimate ≥ exact property is
    * visible in the output (collision inflation). */
  val q112CmsHeavyHitters = GraftQuery(
    "q112_cms_heavy_hitters",
    (s, dir) => {
      val toks = graft.operators.FanOut(Tables.documents(s, dir))
        .select(explode(graft.functions.Text.tokens(col("text"))).as("tok"))
      val counts = toks.groupBy("tok").agg(count(lit(1)).as("exact_count"))
      val top = counts
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("exact_count").desc, col("tok").asc)).cast("long"))
        .filter(col("rank") <= 20)
      def bucket(r: org.apache.spark.sql.Column, tok: org.apache.spark.sql.Column) =
        pmod(conv(substring(md5(concat(r.cast("string"), lit(":"), tok)), 1, 4), 16, 10)
          .cast("long"), lit(256L))
      val cms = toks.select(explode(sequence(lit(0), lit(3))).as("r"), col("tok"))
        .select(col("r"), bucket(col("r"), col("tok")).as("bucket"))
        .groupBy("r", "bucket").agg(count(lit(1)).as("c"))
      top.select(col("rank"), col("tok"), col("exact_count"),
          explode(sequence(lit(0), lit(3))).as("r"))
        .withColumn("bucket", bucket(col("r"), col("tok")))
        .join(cms, Seq("r", "bucket"))
        .groupBy("rank", "tok", "exact_count")
        .agg(min("c").as("cms_estimate"))
        .orderBy("rank")
    },
    Some("""WITH toks AS (
           |  SELECT tok.t AS tok
           |  FROM (SELECT string_split_regex(trim(text), '\s+') ws FROM documents),
           |       LATERAL (SELECT unnest(ws) t) tok),
           |counts AS (SELECT tok, count(*) AS exact_count FROM toks GROUP BY 1),
           |top AS (
           |  SELECT rank, tok, exact_count FROM (
           |    SELECT tok, exact_count,
           |      row_number() OVER (ORDER BY exact_count DESC, tok ASC) AS rank
           |    FROM counts)
           |  WHERE rank <= 20),
           |cms AS (
           |  SELECT r.g AS r,
           |    CAST(concat('0x', substr(md5(r.g || ':' || tok), 1, 4)) AS BIGINT) % 256
           |      AS bucket,
           |    count(*) AS c
           |  FROM toks, LATERAL (SELECT unnest(generate_series(0, 3)) g) r
           |  GROUP BY 1, 2)
           |SELECT t.rank, t.tok, t.exact_count, min(cms.c) AS cms_estimate
           |FROM top t, LATERAL (SELECT unnest(generate_series(0, 3)) g) r
           |JOIN cms ON cms.r = r.g
           |  AND cms.bucket =
           |    CAST(concat('0x', substr(md5(r.g || ':' || t.tok), 1, 4)) AS BIGINT) % 256
           |GROUP BY t.rank, t.tok, t.exact_count
           |ORDER BY t.rank""".stripMargin))

  /** Interpolated bigram language-model scoring (KenLM-style quality
    * proxy, order 2): P(w₂|w₁) = λ·c(w₁w₂)/c(w₁) + (1−λ)·c(w₂)/N with
    * λ=0.9, scored against the corpus's own counts. Extends q74's
    * unigram dataflow by one more keyed aggregation (bigram counts) and
    * two unigram joins — every stage a map-side-combined hash
    * aggregation or equi-join, the exact shape an n-gram LM scorer
    * keeps at 100 TB. Interpolation means unseen-bigram smoothing falls
    * out of the math (the bigram join can never miss: every scored
    * bigram occurs at least once in the corpus that defines the model,
    * but λ<1 still discounts rare continuations). */
  val q125BigramLogprob = GraftQuery(
    "q125_bigram_logprob",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id"),
        explode(graft.functions.Text.tokens(col("text"))).as("tok"))
      val uni = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      val bi = docs
        .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("t"))
        .select(col("doc_id"), explode(expr(
          // guard the degenerate single-token document: sequence(1, 0)
          // steps DOWNWARD to [1, 0] and element_at(t, 0) throws
          // unconditionally — mirror Text.wordShingles' empty-array
          // guard so short docs simply contribute no bigrams (the
          // oracle's generate_series(1, 0) is empty for the same doc)
          """CASE WHEN size(t) < 2 THEN array()
            |ELSE transform(sequence(1, size(t) - 1),
            |  i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))
            |END""".stripMargin)).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val bc = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      bi.join(bc, Seq("w1", "w2"))
        .join(uni.withColumnRenamed("tok", "w1").withColumnRenamed("c", "c1"), Seq("w1"))
        .join(uni.withColumnRenamed("tok", "w2").withColumnRenamed("c", "c2"), Seq("w2"))
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          avg(-log(lit(0.9) * col("cb") / col("c1") +
            lit(0.1) * col("c2") / col("n_total"))).as("nll"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("nll"), 6).as("avg_neg_logprob"),
          round(exp(col("nll")), 2).as("perplexity"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
           |  FROM documents),
           |toks AS (
           |  SELECT doc_id, tok.x AS tok
           |  FROM t, LATERAL (SELECT unnest(ws) x) tok),
           |uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
           |total AS (SELECT count(*) AS n_total FROM toks),
           |bi AS (
           |  SELECT doc_id, ws[i.g] AS w1, ws[i.g + 1] AS w2
           |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) g) i),
           |bc AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2),
           |j AS (
           |  SELECT doc_id,
           |    -ln(0.9 * cb / u1.c + 0.1 * u2.c / n_total) AS nl
           |  FROM bi JOIN bc USING (w1, w2)
           |  JOIN uni u1 ON u1.tok = bi.w1
           |  JOIN uni u2 ON u2.tok = bi.w2
           |  CROSS JOIN total)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |  round(avg(nl), 6) AS avg_neg_logprob,
           |  round(exp(avg(nl)), 2) AS perplexity
           |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Unicode canonicalization + mojibake repair — the curation pass
    * that runs BEFORE every quality gate and dedup stage. The corpus
    * is ASCII, so the gate plants its own non-ASCII deterministically:
    * each doc is decorated with " café" in NFD form (e + combining
    * acute, even doc_ids) or precomposed NFC form (odd), then
    * [[graft.functions.UnicodeNorm]] must converge both to one byte
    * sequence (checksummed against DuckDB's ICU `nfc_normalize` — two
    * independent UAX#15 implementations agreeing byte-for-byte).
    * Mojibake: the decorated text is double-encoded IN-QUERY with
    * Spark's own `decode(encode(s,'UTF-8'),'ISO-8859-1')`, and
    * `mojibake_repair` must invert it exactly (checksum equals the
    * original's) while provably never touching clean ASCII text
    * (`n_clean_changed` = 0 — the strict-validity guard that makes
    * the repair safe corpus-wide). All three ops are codegen'd
    * projections — scan-speed at 100 TB. */
  val q195UnicodeRepair = GraftQuery(
    "q195_unicode_repair",
    (s, dir) => {
      import graft.functions.UnicodeNorm.{mojibakeRepair, unicodeNormalize}
      val deco = when(col("doc_id") % 2 === 0, lit(" cafe\u0301")) // NFD: e + combining acute
        .otherwise(lit(" caf\u00e9")) // NFC: precomposed
      val moji = decode(encode(col("decorated"), "UTF-8"), "ISO-8859-1")
      Tables.documents(s, dir)
        .withColumn("decorated", concat(col("text"), deco))
        .select(col("source"), col("text"), col("decorated"),
          unicodeNormalize(col("decorated"), "NFC").as("nfc"),
          moji.as("moji"),
          mojibakeRepair(moji).as("repaired"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("nfc") =!= col("decorated"), 1).otherwise(0))
            .as("n_nfc_changed"),
          sum(conv(substring(md5(col("nfc")), 1, 8), 16, 10).cast("long"))
            .as("nfc_checksum"),
          sum(when(col("moji") =!= col("decorated"), 1).otherwise(0))
            .as("n_moji_changed"),
          sum(conv(substring(md5(col("repaired")), 1, 8), 16, 10).cast("long"))
            .as("repair_checksum"),
          sum(when(mojibakeRepair(col("text")) =!= col("text"), 1)
            .otherwise(0)).as("n_clean_changed"))
        .orderBy("source")
    },
    Some("""WITH d AS (
           |  SELECT source, text,
           |    text || CASE WHEN doc_id % 2 = 0 THEN ' cafe' || chr(769)
           |                 ELSE ' caf' || chr(233) END AS decorated
           |  FROM documents)
           |SELECT source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN nfc_normalize(decorated) <> decorated
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_nfc_changed,
           |  CAST(sum(('0x' || substr(md5(nfc_normalize(decorated)), 1, 8))
           |    ::BIGINT) AS BIGINT) AS nfc_checksum,
           |  -- every decorated row carries non-ASCII, so the latin-1
           |  -- re-read always changes it
           |  CAST(count(*) AS BIGINT) AS n_moji_changed,
           |  -- repair must invert the double-encoding exactly
           |  CAST(sum(('0x' || substr(md5(decorated), 1, 8))::BIGINT)
           |    AS BIGINT) AS repair_checksum,
           |  -- ASCII corpus: the validity guard must never rewrite it
           |  CAST(0 AS BIGINT) AS n_clean_changed
           |FROM d GROUP BY source ORDER BY source""".stripMargin))

  /** CCNet-style perplexity filtering (Wenzek et al. 2020): train the
    * interpolated bigram LM on a REFERENCE slice only (the `en` docs —
    * the wiki-quality stand-in), score EVERY document against it, and
    * bucket each source's docs into head/middle/tail perplexity
    * terciles — the cross-domain filtering decision CCNet applies to
    * CommonCrawl, as opposed to q125's self-scoring. Cross-domain
    * scoring forces real smoothing: unseen-in-reference bigrams get
    * λ·0 and unseen unigrams fall back to add-one over (N+V), so
    * every probability is strictly positive.
    *
    * Determinism: per-doc NLL is rounded to 6 dp BEFORE the tercile
    * window ranks on (nll, doc_id), so bucket membership can't flip
    * on engine float-summation order; bucket stats are min/max of
    * already-rounded values (no second float aggregation anywhere).
    *
    * Scale: model tables are vocabulary-sized and built once from the
    * reference slice; scoring is three equi-joins against them plus a
    * broadcast of the 1-row (N, V) census; the tercile window
    * partitions by source over doc-count-sized rows. */
  val q219PerplexityFilter = GraftQuery(
    "q219_perplexity_filter",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      def bigrams(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), col("source"),
          graft.functions.Text.tokens(col("text")).as("t"))
        .select(col("doc_id"), col("source"), explode(expr(
          """CASE WHEN size(t) < 2 THEN array()
            |ELSE transform(sequence(1, size(t) - 1),
            |  i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))
            |END""".stripMargin)).as("b"))
        .select(col("doc_id"), col("source"),
          col("b.w1").as("w1"), col("b.w2").as("w2"))
      val en = docs.filter(col("lang") === "en")
      val enToks = en.select(explode(graft.functions.Text.tokens(col("text")))
        .as("tok"))
      val uni = enToks.groupBy("tok").agg(count(lit(1)).as("c"))
      val census = enToks.agg(count(lit(1)).as("n_total"),
        countDistinct("tok").as("v_size"))
      val bc = bigrams(en).groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      val scored = bigrams(docs)
        .join(bc, Seq("w1", "w2"), "left_outer")
        .join(uni.withColumnRenamed("tok", "w1").withColumnRenamed("c", "c1"),
          Seq("w1"), "left_outer")
        .join(uni.withColumnRenamed("tok", "w2").withColumnRenamed("c", "c2"),
          Seq("w2"), "left_outer")
        .crossJoin(broadcast(census))
        .withColumn("p",
          lit(0.9) * coalesce(col("cb") / col("c1"), lit(0.0)) +
            lit(0.1) * (coalesce(col("c2"), lit(0L)) + lit(1)) /
              (col("n_total") + col("v_size")).cast("double"))
        .groupBy("doc_id", "source")
        .agg(round(avg(-log(col("p"))), 6).as("nll"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("nll"), col("doc_id"))
      scored.withColumn("bucket", ntile(3).over(w).cast("long"))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          min("nll").as("min_nll"), max("nll").as("max_nll"))
        .orderBy("source", "bucket")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, source, lang,
           |    string_split_regex(trim(text), '\s+') AS ws
           |  FROM documents),
           |en_toks AS (
           |  SELECT tok.x AS tok FROM t, LATERAL (SELECT unnest(ws) x) tok
           |  WHERE lang = 'en'),
           |uni AS (SELECT tok, count(*) AS c FROM en_toks GROUP BY tok),
           |census AS (SELECT count(*) AS n_total, count(DISTINCT tok) AS v_size
           |           FROM en_toks),
           |en_bi AS (
           |  SELECT ws[i.g] AS w1, ws[i.g + 1] AS w2, count(*) AS cb
           |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) g) i
           |  WHERE lang = 'en' GROUP BY 1, 2),
           |bi AS (
           |  SELECT doc_id, source, ws[i.g] AS w1, ws[i.g + 1] AS w2
           |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) g) i),
           |scored AS (
           |  SELECT doc_id, source,
           |    round(avg(-ln(
           |      0.9 * COALESCE(cb / CAST(u1.c AS DOUBLE), 0)
           |      + 0.1 * (COALESCE(u2.c, 0) + 1)
           |        / CAST(n_total + v_size AS DOUBLE))), 6) AS nll
           |  FROM bi
           |  LEFT JOIN en_bi USING (w1, w2)
           |  LEFT JOIN uni u1 ON u1.tok = bi.w1
           |  LEFT JOIN uni u2 ON u2.tok = bi.w2
           |  CROSS JOIN census
           |  GROUP BY doc_id, source),
           |bucketed AS (
           |  SELECT source, doc_id, nll,
           |    ntile(3) OVER (PARTITION BY source ORDER BY nll, doc_id)
           |      AS bucket
           |  FROM scored)
           |SELECT source, CAST(bucket AS BIGINT) AS bucket,
           |  count(*) AS n_docs, min(nll) AS min_nll, max(nll) AS max_nll
           |FROM bucketed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q58GopherQuality, q59RepetitionStats,
    q60TokenEntropy, q74UnigramLogprob, q94Collocations, q95ChiSquare,
    q98LangidConfidence, q99C4Boilerplate, q112CmsHeavyHitters,
    q125BigramLogprob, q195UnicodeRepair, q219PerplexityFilter)
}
