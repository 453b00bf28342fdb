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
  * per partition, one reader task per byte-range split — no driver
  * data path), so the same code serves a 100 TB directory listing.
  */
object SourceQueries {

  /** Temp dirs live until JVM exit (the caller materializes the
    * result AFTER the query function returns, so eager deletion would
    * yank the files out from under the scan). ONE static hook sweeps a
    * shared list — repeated invocations (bench warm-ups,
    * SPARK_GRAFT_REPEAT) add an entry here, not a hook per call. */
  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  locally {
    sys.addShutdownHook {
      tempDirs.forEach(f =>
        org.apache.commons.io.FileUtils.deleteQuietly(f): Unit)
    }: Unit
  }

  private def newTempDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    tempDirs.add(dir)
    dir.getAbsolutePath
  }

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
      val tmp = newTempDir("graft_avro_rt")
      AvroIO.write(Tables.documents(s, dir), s"$tmp/docs")
      docChecksum(AvroIO.read(s, s"$tmp/docs"))
    },
    Some(checksumOracle))

  /** JSON-lines round-trip ≡ identity on the documents table. */
  val q184JsonlRoundtrip = GraftQuery(
    "q184_jsonl_roundtrip",
    (s, dir) => {
      val tmp = newTempDir("graft_jsonl_rt")
      val docs = Tables.documents(s, dir)
      Sources.writeJson(docs, s"$tmp/docs")
      docChecksum(Sources.readJson(s, s"$tmp/docs", docs.schema))
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
      val tmp = newTempDir("graft_csv_rt")
      val docs = Tables.documents(s, dir)
      Sources.writeCsv(docs, s"$tmp/docs", options = Sources.losslessCsv)
      docChecksum(Sources.readCsv(s, s"$tmp/docs", docs.schema,
        options = Sources.losslessCsv))
    },
    Some(checksumOracle))

  val all: Seq[GraftQuery] =
    Seq(q183AvroRoundtrip, q184JsonlRoundtrip, q188CsvRoundtrip)
}
