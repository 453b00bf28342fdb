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

  val all: Seq[GraftQuery] = Seq(q197SqlFunctionSurface)
}
