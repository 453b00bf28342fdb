package graft.queries

import graft.{GraftQuery, Tables}

/** q197 — the SQL TEXT surface of the engine's native functions.
  *
  * Every other gate drives the registered Catalyst expressions through
  * the DataFrame API (`bridge.column(...)`); this one routes a query
  * through `spark.sql(...)` string SQL, proving the
  * `SparkSessionExtensions.injectFunction` registrations
  * ([[graft.plans.GraftExtensions]]) stay wired: `vec_dot`,
  * `rolling_hash`, `hamming_hex`, `unicode_normalize`,
  * `mojibake_repair`, and the `kmv_digests` aggregate all resolve from
  * SQL text and produce the same codegen'd kernels (no UDF fallback).
  * The reference's audience writes SQL — this is the surface they
  * actually touch.
  */
object SqlSurface {

  val q197SqlFunctionSurface = GraftQuery(
    "q197_sql_function_surface",
    (s, dir) => {
      Tables.registerAll(s, dir)
      val nfd = " cafe\u0301" // e + combining acute
      val nfc = " caf\u00e9"  // precomposed
      s.sql(s"""
        |WITH kk AS (
        |  SELECT kmv_digests(md5(CAST(doc_id AS STRING)), 64) AS arr
        |  FROM documents)
        |SELECT d.doc_id AS id,
        |  CAST(round(vec_dot(v.embedding, v.embedding), 4) AS DOUBLE)
        |    AS self_dot,
        |  rolling_hash(d.text) AS fp,
        |  CAST(hamming_hex(substr(md5(d.text), 1, 16),
        |                   substr(md5(concat(d.lang, d.source)), 1, 16))
        |    AS INT) AS hd,
        |  CAST(length(unicode_normalize(concat(d.text, '$nfd'), 'NFC'))
        |    AS BIGINT) AS nfc_len,
        |  CAST(mojibake_repair(
        |         decode(encode(concat(d.text, '$nfc'), 'UTF-8'),
        |                'ISO-8859-1'))
        |       = concat(d.text, '$nfc') AS INT) AS repaired_ok,
        |  (SELECT CAST(size(arr) AS BIGINT) FROM kk) AS kmv_n,
        |  (SELECT element_at(arr, size(arr)) FROM kk) AS kmv_kth
        |FROM documents d JOIN embeddings v ON v.vec_id = d.doc_id
        |ORDER BY id""".stripMargin)
    },
    Some("""WITH dk AS (
           |  SELECT DISTINCT md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
           |kk AS (
           |  SELECT least(64, count(*)) AS kmv_n,
           |    (SELECT max(h) FROM (SELECT h FROM dk ORDER BY h LIMIT 64))
           |      AS kmv_kth
           |  FROM dk)
           |SELECT d.doc_id AS id,
           |  round(list_sum(list_transform(v.embedding,
           |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS self_dot,
           |  list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(generate_series(1, length(d.text)),
           |      i -> CAST(unicode(substr(d.text, i, 1)) AS BIGINT))),
           |    (a, c) -> (a * 31 + c) % 1000000000000037) AS fp,
           |  CAST(list_sum(list_transform(generate_series(1, 16), g ->
           |    bit_count(CAST(xor(
           |      strpos('0123456789abcdef', substr(md5(d.text), g, 1)) - 1,
           |      strpos('0123456789abcdef',
           |             substr(md5(d.lang || d.source), g, 1)) - 1)
           |      AS BIGINT)))) AS INTEGER) AS hd,
           |  CAST(length(nfc_normalize(d.text || ' cafe' || chr(769)))
           |    AS BIGINT) AS nfc_len,
           |  -- repair inverts the in-query double-encoding by construction
           |  CAST(1 AS INTEGER) AS repaired_ok,
           |  (SELECT CAST(kmv_n AS BIGINT) FROM kk) AS kmv_n,
           |  (SELECT kmv_kth FROM kk) AS kmv_kth
           |FROM documents d JOIN embeddings v ON v.vec_id = d.doc_id
           |ORDER BY id""".stripMargin))

  /** q250 — the SQL TEXT surface of the round-8 native expressions:
    * `jaro_winkler`, `damerau_levenshtein`, `utf8_truncate`, and
    * `lcs_length` driven through `spark.sql(...)` string SQL (q197's
    * contract extended to the new registrations). The string-distance
    * functions are checked against DuckDB's OWN `jaro_winkler_similarity`
    * and `damerau_levenshtein`; the truncation and LCS cells are
    * replayed from first principles (char-prefix byte scan; recursive
    * CTE DP). Everything runs over deterministic derivations of the
    * documents table so the gate exercises real codegen'd columns, not
    * literals. */
  val q250SqlFunctionSurface2 = GraftQuery(
    "q250_sql_function_surface2",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        |SELECT doc_id AS id,
        |  CAST(floor(jaro_winkler(substr(text, 1, 20),
        |         concat(substr(text, 1, 2), substr(text, 4, 1),
        |                substr(text, 3, 1), substr(text, 5, 16)))
        |    * 10000 + 0.5) AS BIGINT) AS jw_e4,
        |  CAST(damerau_levenshtein(substr(text, 1, 12),
        |         concat(substr(text, 2, 1), substr(text, 1, 1),
        |                substr(text, 3, 10))) AS BIGINT) AS dl,
        |  CAST(octet_length(utf8_truncate(concat(substr(text, 1, 10),
        |         ' 汉字🚀'), CAST(12 + doc_id % 9 AS INT))) AS BIGINT)
        |    AS cut_bytes,
        |  CAST(lcs_length(slice(split(trim(text), ' +'), 1, 8),
        |         reverse(slice(split(trim(text), ' +'), 1, 8))) AS BIGINT)
        |    AS lcs_rev
        |FROM documents ORDER BY id""".stripMargin)
    },
    Some("""WITH RECURSIVE base AS (
           |  SELECT doc_id,
           |    substr(text, 1, 20) AS a20,
           |    substr(text, 1, 2) || substr(text, 4, 1) || substr(text, 3, 1)
           |      || substr(text, 5, 16) AS b20,
           |    substr(text, 1, 12) AS a12,
           |    substr(text, 2, 1) || substr(text, 1, 1) || substr(text, 3, 10)
           |      AS b12,
           |    substr(text, 1, 10) || ' 汉字🚀' AS mix,
           |    12 + doc_id % 9 AS budget,
           |    list_slice(regexp_split_to_array(trim(text), ' +'), 1, 8) AS toks
           |  FROM documents),
           |cut AS (
           |  SELECT doc_id, max(k) AS best_k FROM base,
           |    LATERAL (SELECT unnest(generate_series(0, length(mix))) AS k)
           |  WHERE strlen(substr(mix, 1, CAST(k AS INTEGER))) <= budget
           |  GROUP BY doc_id),
           |lcs AS (
           |  SELECT doc_id, toks AS ref, list_reverse(toks) AS cand, 0 AS i,
           |    list_transform(range(len(toks) + 1), x -> 0) AS dp
           |  FROM base
           |  UNION ALL
           |  SELECT doc_id, ref, cand, i + 1,
           |    list_transform(range(1, len(ref) + 2), j ->
           |      CASE WHEN j = 1 THEN 0 ELSE
           |        list_max(list_transform(range(2, j + 1), k ->
           |          greatest(dp[k], dp[k-1] +
           |            CASE WHEN cand[i+1] = ref[k-1] THEN 1 ELSE 0 END)))
           |      END)
           |  FROM lcs WHERE i < len(cand)),
           |lcsf AS (
           |  SELECT doc_id, dp[len(ref) + 1] AS lcs_rev
           |  FROM lcs WHERE i = len(cand))
           |SELECT b.doc_id AS id,
           |  CAST(floor(jaro_winkler_similarity(b.a20, b.b20) * 10000 + 0.5)
           |    AS BIGINT) AS jw_e4,
           |  CAST(damerau_levenshtein(b.a12, b.b12) AS BIGINT) AS dl,
           |  CAST(strlen(substr(b.mix, 1, CAST(c.best_k AS INTEGER)))
           |    AS BIGINT) AS cut_bytes,
           |  CAST(l.lcs_rev AS BIGINT) AS lcs_rev
           |FROM base b JOIN cut c ON c.doc_id = b.doc_id
           |JOIN lcsf l ON l.doc_id = b.doc_id
           |ORDER BY id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q197SqlFunctionSurface,
    q250SqlFunctionSurface2)
}
