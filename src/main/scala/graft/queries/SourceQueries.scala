package graft.queries

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.sources.{AvroIO, Sources}

/** Source-format round-trips promoted into the DuckDB correctness
  * gate. Each query writes the documents table out in a non-parquet
  * format, reads it back with the engine's own source, and aggregates
  * — the oracle is the SAME aggregate over the original parquet table,
  * so any row lost, duplicated, or value-corrupted by the format
  * round-trip fails the gate (the checksum column makes single-byte
  * text corruption visible, not just row counts).
  *
  * Scale note: the round-trip through a temp dir is the gate harness;
  * the sources themselves are distributed both ways (one writer task
  * per partition, one reader task per file — no driver data path), so
  * the same code serves a 100 TB directory listing.
  */
object SourceQueries {

  private def docChecksum(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        // 32-bit md5 slice per text, summed: single-byte corruption
        // anywhere in any document flips the per-source sum
        sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
          .as("text_sum"),
        sum(length(col("lang"))).as("lang_len"))
      .orderBy("source")

  private val checksumOracle =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT) AS text_sum,
      |  CAST(sum(length(lang)) AS BIGINT) AS lang_len
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Avro container round-trip ≡ identity on the documents table. */
  val q183AvroRoundtrip = GraftQuery(
    "q183_avro_roundtrip",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_avro_rt")
        .toFile.getAbsolutePath
      try {
        AvroIO.write(Tables.documents(s, dir), s"$tmp/docs")
        docChecksum(AvroIO.read(s, s"$tmp/docs"))
      } finally {
        // result is materialized by the caller AFTER this returns, so
        // the files must survive; register a shutdown sweep instead of
        // deleting eagerly. Verify/Bench run queries to completion per
        // call, so accumulation is bounded by the registry size.
        sys.addShutdownHook {
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
        }
      }
    },
    Some(checksumOracle))

  /** JSON-lines round-trip ≡ identity on the documents table. */
  val q184JsonlRoundtrip = GraftQuery(
    "q184_jsonl_roundtrip",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl_rt")
        .toFile.getAbsolutePath
      val docs = Tables.documents(s, dir)
      try {
        Sources.writeJson(docs, s"$tmp/docs")
        docChecksum(Sources.readJson(s, s"$tmp/docs", docs.schema))
      } finally {
        sys.addShutdownHook {
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
        }
      }
    },
    Some(checksumOracle))

  /** CSV round-trip ≡ identity on the documents table — the hard case
    * for the reference's ONLY ingest format: free text with embedded
    * newlines, quotes, and commas, plus NULL/empty-string distinction,
    * all through [[Sources.losslessCsv]] (RFC-style quote doubling,
    * multiLine read, explicit null sentinel). */
  val q188CsvRoundtrip = GraftQuery(
    "q188_csv_roundtrip",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_csv_rt")
        .toFile.getAbsolutePath
      val docs = Tables.documents(s, dir)
      try {
        Sources.writeCsv(docs, s"$tmp/docs", options = Sources.losslessCsv)
        docChecksum(Sources.readCsv(s, s"$tmp/docs", docs.schema,
          options = Sources.losslessCsv))
      } finally {
        sys.addShutdownHook {
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
        }
      }
    },
    Some(checksumOracle))

  val all: Seq[GraftQuery] =
    Seq(q183AvroRoundtrip, q184JsonlRoundtrip, q188CsvRoundtrip)
}
