package graft.streaming

import org.apache.spark.sql.SparkSession
import graft.QueryDef
import graft.pipeline.Schemas

/** Streaming-cleanse demo over a real file source:
  *
  *   runMain graft.streaming.RunStreamingDemo <csvDirOrFile> <outDir>
  *
  * Reads the landing CSV as a file-source stream, routes rows through
  * the streaming cleanse, sinks valid rows to parquet (checkpointed)
  * and prints the routed counts after draining available input.
  */
object RunStreamingDemo {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: RunStreamingDemo <csvPath> <outDir>")
    val Array(csvPath, outDir) = args
    val b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    QueryDef.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // file-source streams read directories; stage a lone file into one
    val src = new java.io.File(csvPath)
    val inputDir =
      if (src.isFile) {
        val d = new java.io.File(outDir, "input")
        d.mkdirs()
        java.nio.file.Files.copy(src.toPath,
          new java.io.File(d, src.getName).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        d.getAbsolutePath
      } else csvPath
    val landing = spark.readStream
      .option("header", "true")
      .schema(Schemas.landing)
      .csv(inputDir)
    val routed = Streaming.cleanseStream(landing)

    // valid rows flow through the foreachBatch parquet sink (idempotent
    // batch_id=N dirs — the retry-safe sink pattern)
    val qValid = Streaming.parquetBatchSink(routed.valid, s"$outDir/cleansed_stream")
      .option("checkpointLocation", s"$outDir/ckpt_valid")
      .start()
    val qInvalid = routed.invalid.writeStream
      .format("memory").queryName("invalid_stream")
      .outputMode("append").start()
    // watermark-bounded exact dedup over the cleansed flow (order_id ×
    // order_date as the event identity/time)
    val qDedup = Streaming.dedupedEvents(
        routed.valid.select(
          org.apache.spark.sql.functions.col("order_id").as("event_id"),
          org.apache.spark.sql.functions.col("order_date").as("ts")),
        watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    qValid.processAllAvailable()
    qInvalid.processAllAvailable()
    qDedup.processAllAvailable()
    qValid.stop(); qInvalid.stop(); qDedup.stop()

    // all-invalid input writes no batch dirs — report valid=0 instead
    // of crashing on schema inference
    val batchDirs = Option(new java.io.File(s"$outDir/cleansed_stream").listFiles())
      .map(_.filter(_.getName.startsWith("batch_id=")).map(_.getAbsolutePath))
      .getOrElse(Array.empty[String])
    val validN =
      if (batchDirs.isEmpty) 0L
      else spark.read.parquet(batchDirs.toIndexedSeq: _*).count()
    val invalidN = spark.table("invalid_stream").count()
    val dedupN = spark.table("dedup_stream").count()
    println(s"""{"stream_valid":$validN,"stream_invalid":$invalidN,"stream_deduped":$dedupN}""")
    spark.stop()
  }
}
