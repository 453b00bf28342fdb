package graft.streaming

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A BROKER-SHAPED commit log on plain files — the Kafka data model
  * (partitioned, offset-addressed, append-only, replayable by offset)
  * without a broker process, so the at-least-once streaming-source
  * integration surface is testable in this sandbox and swappable for
  * a real broker client in production:
  *
  *   - TOPIC = a directory; PARTITION = `p=<n>/`; SEGMENT =
  *     `seg-<startOffset>-<rowCount>.log`, base64-TSV lines
  *     (`base64(key) \t base64(value) \t tsMillis`) — binary-safe,
  *     splittable by line, and the end offset of a partition is a
  *     pure LISTING computation (max of start+count), no file reads.
  *   - PRODUCE ([[GraftLog.append]]): each batch appends ONE segment
  *     per partition via create-if-absent rename — two racing
  *     producers to the same partition cannot interleave or clobber
  *     (the loser's rename fails and retries at the new end offset).
  *     Offsets within a segment follow the producer's explicit
  *     `seq` ordering, so a replayed append is byte-identical.
  *   - CONSUME: `spark.readStream.format("graftlog").load(dir)` — a
  *     DSv2 [[MicroBatchStream]] whose offsets are per-partition end
  *     positions (the Kafka checkpoint shape: the engine checkpoints
  *     `{pid: offset}`, restart resumes exactly there, a batch
  *     re-planned after a crash re-reads the SAME offset range —
  *     at-least-once upstream, exactly-once downstream when the sink
  *     dedups, which the graft table sink's keyed merge does).
  *     `startingOffsets` = earliest (default) | latest. Batch reads
  *     (`spark.read.format("graftlog")`) serve the whole log with the
  *     same schema: (partition, offset, key, value, ts).
  *
  * Segment readers stream lines and skip by COUNT to the requested
  * offset — executor-side, one pass, no driver materialization; a
  * 1000-partition topic fans out one reader per partition. */
object GraftLog {

  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true),
    StructField("ts", LongType, nullable = false)))

  private def fs(dir: String, spark: SparkSession) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private[streaming] def b64(s: String): String =
    if (s == null) "@NULL@"
    else java.util.Base64.getEncoder.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private[streaming] def unb64(s: String): String =
    if (s == "@NULL@") null
    else new String(java.util.Base64.getDecoder.decode(s),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Per-partition segment list: (path, startOffset, rowCount),
    * ascending by startOffset. Pure listing. */
  private def segments(f: org.apache.hadoop.fs.FileSystem,
      dir: String, pid: Int): Seq[(String, Long, Long)] = {
    val pDir = new org.apache.hadoop.fs.Path(dir, s"p=$pid")
    if (!f.exists(pDir)) Seq.empty
    else f.listStatus(pDir).map(_.getPath)
      .flatMap { p =>
        p.getName match {
          case s if s.matches("seg-\\d{12}-\\d{8}\\.log") =>
            Some((p.toString, s.substring(4, 16).toLong,
              s.substring(17, 25).toLong))
          case _ => None
        }
      }.sortBy(_._2).toSeq
  }

  private[streaming] def partitionIds(f: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[Int] = {
    val d = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).map(_.getPath.getName)
      .collect { case s if s.matches("p=\\d+") => s.substring(2).toInt }
      .sorted.toSeq
  }

  /** End offsets per partition (next offset to be written). */
  def endOffsets(spark: SparkSession, dir: String): Map[Int, Long] = {
    val (f, _) = fs(dir, spark)
    partitionIds(f, dir).map { pid =>
      pid -> segments(f, dir, pid).lastOption
        .map(s => s._2 + s._3).getOrElse(0L)
    }.toMap
  }

  /** PRODUCE: append `batch` — columns (partition INT, seq LONG,
    * key STRING, value STRING, ts LONG); rows land in `seq` order
    * within their partition — as one segment per non-empty partition.
    * Create-if-absent rename per segment = OCC against racing
    * producers (loser retries at the new end offset). Returns the new
    * end offsets. Rows cross the driver ONCE per append (a producer
    * harness writes batch-sized payloads, the Kafka client contract;
    * the distributed path into a topic is `foreachBatch` over many
    * appends). */
  def append(spark: SparkSession, dir: String, batch: DataFrame)
    : Map[Int, Long] = {
    require(batch.columns.toSet == Set("partition", "seq", "key", "value", "ts"),
      s"append batch needs (partition, seq, key, value, ts), got " +
        batch.columns.mkString(", "))
    val (f, _) = fs(dir, spark)
    val rows = batch
      .select(col("partition").cast("int"), col("seq").cast("long"),
        col("key").cast("string"), col("value").cast("string"),
        col("ts").cast("long"))
      .collect()
      .groupBy(_.getInt(0))
    rows.toSeq.sortBy(_._1).foreach { case (pid, rs) =>
      val lines = rs.sortBy(_.getLong(1)).map { r =>
        val k = if (r.isNullAt(2)) null else r.getString(2)
        val v = if (r.isNullAt(3)) null else r.getString(3)
        s"${b64(k)}\t${b64(v)}\t${r.getLong(4)}"
      }
      var committed = false
      while (!committed) {
        val start = segments(f, dir, pid).lastOption
          .map(s => s._2 + s._3).getOrElse(0L)
        val dest = new org.apache.hadoop.fs.Path(dir,
          f"p=$pid/seg-$start%012d-${lines.length}%08d.log")
        f.mkdirs(dest.getParent)
        val tmp = new org.apache.hadoop.fs.Path(dest.getParent,
          s".tmp-${dest.getName}-${java.util.UUID.randomUUID()}")
        val os = f.create(tmp, false)
        try os.write(lines.mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally os.close()
        if (!f.exists(dest) && f.rename(tmp, dest)) committed = true
        else f.delete(tmp, false) // racing producer won: retry at new end
      }
    }
    endOffsets(spark, dir)
  }
}

/** `{pid: endOffset}` — the engine checkpoints this JSON verbatim. */
case class GraftLogOffset(ends: Map[Int, Long]) extends Offset {
  override def json(): String =
    ends.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object GraftLogOffset {
  def parse(json: String): GraftLogOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}")
    if (body.isEmpty) GraftLogOffset(Map.empty)
    else GraftLogOffset(body.split(',').map { kv =>
      val Array(k, v) = kv.split(':')
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap)
  }
}

/** One partition's (from, until] slice: the overlapping segments and
  * the serialized Hadoop conf the executor-side reader needs. */
case class GraftLogInputPartition(pid: Int,
    segs: Seq[(String, Long, Long)], from: Long, until: Long,
    hconf: Map[String, String]) extends InputPartition

class GraftLogReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftLogInputPartition]
    new PartitionReader[InternalRow] {
      private val conf = {
        val c = new org.apache.hadoop.conf.Configuration(false)
        part.hconf.foreach { case (k, v) => c.set(k, v) }
        c
      }
      private val segIter = part.segs.iterator
      private var reader: java.io.BufferedReader = _
      private var segOffset = 0L
      private var current: InternalRow = _

      private def openNext(): Boolean = {
        if (reader != null) { reader.close(); reader = null }
        while (segIter.hasNext) {
          val (path, start, count) = segIter.next()
          // segment entirely below the slice: skip without opening
          if (start + count > part.from && start < part.until) {
            val hp = new org.apache.hadoop.fs.Path(path)
            val in = hp.getFileSystem(conf).open(hp)
            reader = new java.io.BufferedReader(new java.io.InputStreamReader(
              in, java.nio.charset.StandardCharsets.UTF_8))
            segOffset = start
            // skip lines below `from` by count — offsets are dense
            while (segOffset < part.from) { reader.readLine(); segOffset += 1 }
            return true
          }
        }
        false
      }

      override def next(): Boolean = {
        while (true) {
          if (reader == null && !openNext()) return false
          if (segOffset >= part.until) { reader.close(); reader = null; return false }
          val line = reader.readLine()
          if (line == null) { reader.close(); reader = null }
          else {
            val Array(k, v, ts) = line.split('\t')
            current = InternalRow(part.pid, segOffset,
              Option(GraftLog.unb64(k)).map(UTF8String.fromString).orNull,
              Option(GraftLog.unb64(v)).map(UTF8String.fromString).orNull,
              ts.toLong)
            segOffset += 1
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}

/** The scan: micro-batch stream AND batch read over the same
  * partition/offset reader. */
class GraftLogScan(dir: String, startingOffsets: String,
    spark: SparkSession) extends Scan with Batch {

  private def hconfMap: Map[String, String] = {
    val c = spark.sparkContext.hadoopConfiguration
    val it = c.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  override def readSchema(): StructType = GraftLog.schema

  override def toBatch: Batch = this

  private def slices(fromEnds: Map[Int, Long], untilEnds: Map[Int, Long])
    : Array[InputPartition] = {
    val (f, _) = {
      val p = new org.apache.hadoop.fs.Path(dir)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    val hm = hconfMap
    untilEnds.toSeq.sortBy(_._1).flatMap { case (pid, until) =>
      val from = fromEnds.getOrElse(pid, 0L)
      if (until <= from) None
      else {
        // per-partition segment listing (metadata only)
        val segs = {
          val pDir = new org.apache.hadoop.fs.Path(dir, s"p=$pid")
          if (!f.exists(pDir)) Seq.empty[(String, Long, Long)]
          else f.listStatus(pDir).map(_.getPath)
            .flatMap { p =>
              p.getName match {
                case s if s.matches("seg-\\d{12}-\\d{8}\\.log") =>
                  Some((p.toString, s.substring(4, 16).toLong,
                    s.substring(17, 25).toLong))
                case _ => None
              }
            }.sortBy(_._2).toSeq
        }
        Some(GraftLogInputPartition(pid, segs, from, until, hm)
          : InputPartition)
      }
    }.toArray
  }

  // ---- batch read: the whole log ----
  override def planInputPartitions(): Array[InputPartition] =
    slices(Map.empty, GraftLog.endOffsets(spark, dir))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory

  // ---- micro-batch stream ----
  override def toMicroBatchStream(checkpointLocation: String)
    : MicroBatchStream = new MicroBatchStream {

    override def initialOffset(): Offset = startingOffsets match {
      case "latest" => GraftLogOffset(GraftLog.endOffsets(spark, dir))
      case _ => GraftLogOffset(
        GraftLog.endOffsets(spark, dir).map { case (p, _) => p -> 0L })
    }

    override def latestOffset(): Offset =
      GraftLogOffset(GraftLog.endOffsets(spark, dir))

    override def deserializeOffset(json: String): Offset =
      GraftLogOffset.parse(json)

    override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] =
      slices(start.asInstanceOf[GraftLogOffset].ends,
        end.asInstanceOf[GraftLogOffset].ends)

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftLogReaderFactory

    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
  }
}

class GraftLogTable(dir: String, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  override def name(): String = s"graftlog.`$dir`"
  override def schema(): StructType = GraftLog.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftLogScan(dir,
        Option(opts.get("startingOffsets")).getOrElse(
          Option(options.get("startingOffsets")).getOrElse("earliest")),
        SparkSession.active)
    }
}

class GraftLogDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftlog"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graftlog needs a topic directory: .load(dir)"))
    new GraftLogTable(dir, options)
  }
}
