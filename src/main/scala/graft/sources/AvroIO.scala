package graft.sources

import scala.collection.JavaConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileStream, DataFileWriter, SeekableInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._

/** Avro container-file source/sink built on the Avro CORE library
  * (`org.apache.avro`, which Spark ships for its shuffle internals) —
  * the `spark-avro` connector module is not on this classpath, and the
  * build adds no external dependencies, so the engine provides the
  * format itself.
  *
  * Read path: SPLITTABLE. Avro containers are sequences of
  * sync-marker-delimited blocks, so a multi-GB container does not
  * serialize onto one task: the driver lists files (sorted, so schema
  * choice is deterministic) and cuts each into byte ranges of
  * `targetSplitBytes`; each task `sync()`s to the first block at or
  * after its range start and reads until `pastSync(end)` — the
  * standard split contract (a block belongs to the split containing
  * its starting sync marker). Read parallelism is therefore
  * max(containers, totalBytes / targetSplitBytes). The chosen schema
  * is passed as the READER schema so Avro's schema resolution handles
  * per-file writer-schema drift (e.g. int→long promotion) instead of
  * failing at row encoding. Nothing but file paths and one container
  * header touches the driver.
  *
  * Write path: one container per partition via `mapPartitionsWithIndex`
  * through the Hadoop `FileSystem` API (works on local paths in tests
  * and on HDFS/object stores on a cluster). Each attempt writes a
  * temp file named by its task attempt id and renames into place on
  * success — a retried or speculative attempt can never interleave
  * bytes with its sibling; the loser of the rename race deletes its
  * temp file.
  *
  * Type mapping (both directions): boolean/int/long/float/double/
  * string/bytes, `timestamp-micros` logical ↔ TIMESTAMP, `date` ↔
  * DATE, arrays, nested records, and nullable `[null, T]` unions.
  */
object AvroIO {

  // ---- schema mapping -------------------------------------------------

  /** Avro writer schema → Spark schema. */
  def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date") DateType
      else IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType != null &&
        s.getLogicalType.getName == "timestamp-micros") TimestampType
      else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.ARRAY =>
      ArrayType(toSparkType(s.getElementType), containsNull = isNullable(s.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, toSparkType(s.getValueType), isNullable(s.getValueType))
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.map(f =>
        StructField(f.name, toSparkType(f.schema), nullable = isNullable(f.schema))).toSeq)
    case Schema.Type.UNION => toSparkType(nonNullBranch(s))
    case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def nonNullBranch(s: Schema): Schema = {
    val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    if (branches.size != 1) throw new IllegalArgumentException(
      s"only [null, T] unions supported, got $s")
    branches.head
  }

  /** Spark schema → Avro schema (every field written as nullable
    * `[null, T]`, matching Spark's nullable-by-default semantics). */
  def toAvroSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, nullable(toAvro(f.dataType, s"${name}_${f.name}")),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  private def toAvro(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      org.apache.avro.LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(el, containsNull) =>
      Schema.createArray(if (containsNull) nullable(toAvro(el, name)) else toAvro(el, name))
    case st: StructType => toAvroSchema(st, name)
    case other => throw new IllegalArgumentException(s"unsupported Spark type: $other")
  }

  // ---- value conversion ----------------------------------------------

  private def toSparkValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (l: java.lang.Long, TimestampType) => // micros since epoch
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(l.longValue, 1000000L),
        Math.floorMod(l.longValue, 1000000L) * 1000L))
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue))
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) => f.bytes()
    case (a: java.util.Collection[_], ArrayType(el, _)) =>
      a.asScala.map(toSparkValue(_, el)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, mv) => k.toString -> toSparkValue(mv, vt) }.toMap
    case (r: GenericRecord, st: StructType) => recordToRow(r, st)
    case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) => e.toString
    case (x, _) => x
  }

  private def recordToRow(r: GenericRecord, st: StructType): Row =
    new GenericRowWithSchema(
      st.fields.map(f => toSparkValue(r.get(f.name), f.dataType)), st)

  private def toAvroValue(v: Any, s: Schema): Any = {
    if (v == null) return null
    val target = if (s.getType == Schema.Type.UNION) nonNullBranch(s) else s
    (v, target.getType) match {
      case (ts: java.sql.Timestamp, Schema.Type.LONG) =>
        // exact micros: seconds*1e6 + micros-within-second (sign-safe)
        val inst = ts.toInstant
        Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
          inst.getNano / 1000L)
      case (d: java.sql.Date, Schema.Type.INT) =>
        d.toLocalDate.toEpochDay.toInt
      case (b: Array[Byte], Schema.Type.BYTES) => java.nio.ByteBuffer.wrap(b)
      case (seq: scala.collection.Seq[_], Schema.Type.ARRAY) =>
        seq.map(toAvroValue(_, target.getElementType)).asJava
      case (row: Row, Schema.Type.RECORD) => rowToRecord(row, target)
      case (x, _) => x
    }
  }

  private def rowToRecord(row: Row, s: Schema): GenericRecord = {
    val rec = new GenericData.Record(s)
    s.getFields.asScala.foreach { f =>
      val i = row.fieldIndex(f.name)
      rec.put(f.name, if (row.isNullAt(i)) null else toAvroValue(row.get(i), f.schema))
    }
    rec
  }

  // ---- read / write ---------------------------------------------------

  /** [[SeekableInput]] over a Hadoop `FSDataInputStream` — the ~10
    * lines that keep this source on the Avro CORE jar (the equivalent
    * `FsInput` lives in the avro-mapred module). */
  private final class HadoopSeekableInput(
      in: org.apache.hadoop.fs.FSDataInputStream, len: Long)
    extends SeekableInput {
    def seek(p: Long): Unit = in.seek(p)
    def tell(): Long = in.getPos
    def length(): Long = len
    def read(b: Array[Byte], off: Int, l: Int): Int = in.read(b, off, l)
    def close(): Unit = in.close()
  }

  /** One task's byte range of one container file. */
  private final case class AvroSplit(file: String, start: Long, end: Long)

  /** Read a directory of Avro container files (or a single file). The
    * Spark schema is derived on the driver from the embedded writer
    * schema of the first file in SORTED path order (header-only read —
    * deterministic regardless of `listStatus` ordering), then every
    * byte-range split decodes in parallel on the executors with that
    * schema as the Avro READER schema, so files whose writer schema
    * differs compatibly (int→long, added nullable field) resolve per
    * record instead of corrupting rows.
    *
    * `targetSplitBytes` bounds task granularity: a container larger
    * than it is cut at sync-marker boundaries into multiple tasks, so
    * one multi-GB file cannot serialize a 100 TB scan. Default 128 MB,
    * parquet's `maxPartitionBytes` convention.
    *
    * `lenient = true` is the PERMISSIVE counterpart of the CSV/JSON
    * readers: a corrupt or truncated container stops contributing rows
    * at the first undecodable block instead of failing the job — at
    * warehouse scale a directory of millions of files always has a
    * partial upload somewhere, and one bad file must not kill a 100 TB
    * scan. Default is strict (fail loudly), matching parquet. */
  def read(spark: SparkSession, path: String,
           lenient: Boolean = false,
           targetSplitBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(targetSplitBytes > 0, "targetSplitBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files = (if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).toSeq.map(_.getPath) else Seq(p))
      .filter(_.getName.endsWith(".avro"))
      .sortBy(_.toString)
    require(files.nonEmpty, s"no .avro files under $path")
    def headerSchema(p: org.apache.hadoop.fs.Path): Schema = {
      val in = fs.open(p)
      try {
        val dfs = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        val s = dfs.getSchema
        dfs.close()
        s
      } finally in.close()
    }
    // lenient mode may skip corrupt heads, but SOME file must yield a
    // schema — with none, there is nothing to be lenient about
    val avroSchema =
      if (!lenient) headerSchema(files.head)
      else files.view.flatMap(p => scala.util.Try(headerSchema(p)).toOption)
        .headOption.getOrElse(throw new java.io.IOException(
          s"no readable Avro container under $path"))
    val readerSchemaJson = avroSchema.toString
    val sparkSchema = toSparkType(avroSchema).asInstanceOf[StructType]
    val splits = files.flatMap { f =>
      val len = fs.getFileStatus(f).getLen
      if (len <= targetSplitBytes) Seq(AvroSplit(f.toString, 0L, len))
      else (0L until len by targetSplitBytes).map(s =>
        AvroSplit(f.toString, s, math.min(s + targetSplitBytes, len)))
    }
    val confSer = new org.apache.spark.util.SerializableConfiguration(conf)
    val rows = spark.sparkContext
      .parallelize(splits, splits.size)
      .flatMap { split =>
        val fp = new org.apache.hadoop.fs.Path(split.file)
        val sfs = fp.getFileSystem(confSer.value)
        val len = sfs.getFileStatus(fp).getLen
        val sin = new HadoopSeekableInput(sfs.open(fp), len)
        def fail(e: Throwable): Nothing = {
          sin.close()
          throw new java.io.IOException(
            s"corrupt Avro container ${split.file}", e)
        }
        val readerSchema = new Schema.Parser().parse(readerSchemaJson)
        val dfr =
          try {
            val r = new DataFileReader[GenericRecord](sin,
              new GenericDatumReader[GenericRecord](null, readerSchema))
            // position at the first block whose sync marker is at or
            // after this split's start (the file header ends with the
            // sync marker, so start=0 lands exactly at block 1)
            r.sync(split.start)
            r
          } catch { case e: Throwable =>
            if (lenient) { sin.close(); null } else fail(e)
          }
        if (dfr == null) Iterator.empty
        else {
          // lookahead iterator: the decode happens in advance(), so a
          // mid-stream corruption in lenient mode cleanly ENDS the
          // split's contribution instead of throwing from next()
          new Iterator[Row] {
            private var nextRow: Row = _
            private var closed = false
            private def closeAll(): Unit =
              if (!closed) { closed = true; dfr.close() } // closes sin
            private def advance(): Unit =
              if (nextRow == null && !closed) {
                try {
                  if (dfr.hasNext && !dfr.pastSync(split.end))
                    nextRow = recordToRow(dfr.next(), sparkSchema)
                  else closeAll()
                } catch { case e: Throwable =>
                  if (lenient) closeAll() else fail(e)
                }
              }
            def hasNext: Boolean = { advance(); nextRow != null }
            def next(): Row = {
              advance()
              if (nextRow == null) throw new NoSuchElementException
              val r = nextRow; nextRow = null; r
            }
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Write `df` as a directory of Avro container files, one per
    * partition, via the Hadoop FileSystem API (local paths in tests,
    * HDFS/object stores on a cluster). Deflate-compressed — Avro's
    * universally-supported codec. */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val avroJson = toAvroSchema(sparkSchema, "row").toString
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new org.apache.hadoop.fs.Path(path)
    val fs = out.getFileSystem(confSer.value)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      // partition 0 always writes, even with no rows: an empty table
      // must still produce a schema-bearing container, so a later read
      // returns an empty DataFrame instead of "no .avro files"
      if (rows.isEmpty && idx != 0) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(avroJson)
        val pfs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(confSer.value)
        // output-commit protocol: write to an attempt-unique temp name,
        // rename into place on success. A retried or speculative
        // attempt writes its own temp file — two attempts can never
        // interleave bytes in one part file; whichever rename lands
        // second sees the destination taken and withdraws its bytes.
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new org.apache.hadoop.fs.Path(
          path, f".part-$idx%05d-attempt-$attempt.avro.tmp")
        val part = new org.apache.hadoop.fs.Path(
          path, f"part-$idx%05d.avro")
        val os = pfs.create(tmp, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        writer.create(schema, os)
        try rows.foreach(r => writer.append(rowToRecord(r, schema)))
        finally writer.close() // closes os
        if (!pfs.rename(tmp, part)) {
          val won = pfs.exists(part) // sibling attempt committed first
          pfs.delete(tmp, false)
          if (!won) throw new java.io.IOException(
            s"could not commit $tmp -> $part")
        }
        Iterator.single(1)
      }
    }.count(): Unit
    // a 0-partition RDD (empty relation) runs no tasks at all — emit
    // the schema-bearing empty container from the driver
    if (!fs.listStatus(out).exists(_.getPath.getName.endsWith(".avro"))) {
      val schema = new Schema.Parser().parse(avroJson)
      val os = fs.create(new org.apache.hadoop.fs.Path(out, "part-00000.avro"), true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.create(schema, os)
      writer.close()
    }
  }
}
