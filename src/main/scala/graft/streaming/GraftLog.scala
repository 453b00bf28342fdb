package graft.streaming

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
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
  *   - PRODUCE: each appended segment claims its START OFFSET with a
  *     create-exclusive `.claim-<start>` file BEFORE publishing — two
  *     racing producers to the same partition always collide on the
  *     SAME claim name whatever their row counts, so the loser retries
  *     at the new end offset and offsets stay dense and disjoint (a
  *     name keyed on (start, count) would let different-sized racers
  *     pass an exists-check and publish overlapping segments). The
  *     claim releases after the publish rename; an abandoned claim (a
  *     producer that died mid-write) is taken over after a staleness
  *     window. [[GraftLog.append]] is the driver-side producer harness
  *     (batch-sized payloads, the Kafka-client contract);
  *     `df.write.format("graftlog").mode("append")` is the
  *     DISTRIBUTED producer — a DSv2 batch write that requires
  *     clustering by `partition` and ordering by (partition, offset),
  *     so every partition's rows land executor-side, in order, through
  *     the same claim protocol, and the driver never materializes the
  *     frame. Produce is at-least-once under task retry (a retried
  *     task re-appends its chunk — the non-idempotent Kafka producer
  *     contract); consumers dedup by key where that matters.
  *   - CONSUME: `spark.readStream.format("graftlog").load(dir)` — a
  *     DSv2 [[MicroBatchStream]] whose offsets are per-partition end
  *     positions (the Kafka checkpoint shape: the engine checkpoints
  *     `{pid: offset}`, restart resumes exactly there, a batch
  *     re-planned after a crash re-reads the SAME offset range —
  *     at-least-once upstream, exactly-once downstream when the sink
  *     dedups, which the graft table sink's keyed merge does).
  *     `startingOffsets` = earliest (default) | latest.
  *     `maxOffsetsPerTrigger` (Kafka semantics) caps each micro-batch
  *     at N records, split across partitions proportionally to their
  *     lag — without it a stream started from `earliest` on a large
  *     topic plans ONE batch spanning the entire log, the 100 TB
  *     scale-killer. `Trigger.AvailableNow` is honored: the end is
  *     pinned once at start and drained in capped batches, then the
  *     query stops. Batch reads (`spark.read.format("graftlog")`)
  *     serve the whole log with the same schema:
  *     (partition, offset, key, value, ts).
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

  /** Per-partition segment list: (path, startOffset, offsetSpan),
    * ascending by startOffset. Pure listing. Two segment kinds:
    *
    *   - DENSE `seg-<start12>-<count8>.log`: count consecutive
    *     offsets, one per line (`key \t value \t ts`);
    *   - SPARSE `cseg-<start12>-<span8>.log` (written by [[compact]]):
    *     covers the offset RANGE [start, start+span) but holds only
    *     the SURVIVING records, each line carrying its explicit
    *     offset (`offset \t key \t value \t ts`) — offsets are never
    *     renumbered by compaction, Kafka's rule.
    *
    * SHADOWING: a dense (or older sparse) segment lying ENTIRELY
    * inside a sparse segment's range is superseded — compaction
    * publishes the cseg first and deletes the old files after, so a
    * crash in between leaves both on disk; the listing resolves the
    * overlap deterministically (the cseg wins) and reads stay exact.
    * End-offset math is unchanged: max(start + span) over the listing. */
  private[streaming] def segments(f: org.apache.hadoop.fs.FileSystem,
      dir: String, pid: Int): Seq[(String, Long, Long)] = {
    val pDir = new org.apache.hadoop.fs.Path(dir, s"p=$pid")
    if (!f.exists(pDir)) return Seq.empty
    val all = f.listStatus(pDir).map(_.getPath)
      .flatMap { p =>
        p.getName match {
          case s if s.matches("seg-\\d{12}-\\d{8}\\.log") =>
            Some((p.toString, s.substring(4, 16).toLong,
              s.substring(17, 25).toLong))
          case s if s.matches("cseg-\\d{12}-\\d{8}\\.log") =>
            Some((p.toString, s.substring(5, 17).toLong,
              s.substring(18, 26).toLong))
          case _ => None
        }
      }.toSeq
    val csegs = all.filter(t => isSparse(t._1))
    all.filter { case (path, start, span) =>
      // shadowed iff contained in a cseg's range AND either dense or a
      // strictly narrower cseg (re-compaction: the widest cseg wins)
      !csegs.exists { case (cp, cs, csp) =>
        cp != path && cs <= start && start + span <= cs + csp &&
          (!isSparse(path) || csp > span)
      }
    }.sortBy(_._2)
  }

  private[streaming] def isSparse(path: String): Boolean =
    new org.apache.hadoop.fs.Path(path).getName.startsWith("cseg-")

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

  /** Earliest still-available offset per partition (the first
    * surviving segment's start — moves up as [[truncateBefore]]
    * retires history). */
  def earliestOffsets(spark: SparkSession, dir: String): Map[Int, Long] = {
    val (f, _) = fs(dir, spark)
    partitionIds(f, dir).map { pid =>
      pid -> segments(f, dir, pid).headOption.map(_._2).getOrElse(0L)
    }.toMap
  }

  // ---- SPARSE OFFSET INDEX (`.idx` sidecars) ----------------------
  //
  // `seg-*.log.idx`: lines `offset \t bytePosition`, every Nth offset
  // of the owning DENSE segment. A replayed offset window entering a
  // fat segment mid-way seeks to the nearest indexed position and
  // walks at most N lines, instead of skipping O(offset − start)
  // lines. Strictly an optimization: lost/corrupt sidecars degrade to
  // the plain line skip.

  private[streaming] val IndexEvery = 4096

  /** The (offset, bytePos) to seek to for reading `from` onward, from
    * the segment's `.idx` sidecar: the LARGEST indexed offset ≤ from.
    * None = no usable sidecar / nothing below from. */
  private[streaming] def indexSeek(f: org.apache.hadoop.fs.FileSystem,
      segPath: String, from: Long): Option[(Long, Long)] =
    try {
      val p = new org.apache.hadoop.fs.Path(segPath + ".idx")
      if (!f.exists(p)) None
      else {
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          f.open(p), java.nio.charset.StandardCharsets.UTF_8))
        try {
          var best: Option[(Long, Long)] = None
          var line = in.readLine()
          while (line != null) {
            val Array(o, b) = line.split('\t')
            val off = o.toLong
            if (off <= from && best.forall(_._1 < off))
              best = Some((off, b.toLong))
            line = in.readLine()
          }
          best
        } finally in.close()
      }
    } catch { case _: Exception => None } // degrade, never fail a read

  /** (Re)build the `.idx` sidecar for a dense segment — the
    * maintenance form (the produce path writes one inline for big
    * segments). Atomic replace; readers tolerate both absence and
    * the transient delete window. */
  private[streaming] def writeOffsetIndex(f: org.apache.hadoop.fs.FileSystem,
      segPath: String, every: Int = IndexEvery): Unit = {
    require(!isSparse(segPath), "sparse segments carry explicit offsets")
    val name = new org.apache.hadoop.fs.Path(segPath).getName
    val start = name.substring(4, 16).toLong
    val in = f.open(new org.apache.hadoop.fs.Path(segPath))
    val entries = Seq.newBuilder[String]
    try {
      val r = new java.io.BufferedReader(new java.io.InputStreamReader(
        in, java.nio.charset.StandardCharsets.UTF_8))
      var bytePos = 0L
      var i = 0L
      var line = r.readLine()
      while (line != null) {
        if (i > 0 && i % every == 0) entries += s"${start + i}\t$bytePos"
        bytePos += line.getBytes(
          java.nio.charset.StandardCharsets.UTF_8).length + 1L
        i += 1
        line = r.readLine()
      }
    } finally in.close()
    val dest = new org.apache.hadoop.fs.Path(segPath + ".idx")
    val tmp = new org.apache.hadoop.fs.Path(
      dest.getParent, s".tmp-${dest.getName}-${java.util.UUID.randomUUID()}")
    val os = f.create(tmp, false)
    try os.write(entries.result().mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    f.delete(dest, false)
    if (!f.rename(tmp, dest)) f.delete(tmp, false): Unit
  }

  /** RETENTION (Kafka's log truncation): delete every segment lying
    * ENTIRELY below its partition's watermark — whole immutable files,
    * no rewrite, so retiring a year of history from a 100 TB topic is
    * a metadata-sized delete pass. A segment SPANNING the watermark
    * survives whole (offsets are never renumbered), and the NEWEST
    * segment of a partition always survives (it carries the end
    * offset, so produced offsets can never restart and collide with
    * consumed history — Kafka keeps its active segment for the same
    * reason). Readers degrade gracefully: a request below the earliest
    * surviving offset serves from the first surviving row (Kafka's
    * `auto.offset.reset=earliest` behavior — a checkpointed stream
    * whose offsets were truncated away resumes at the survivors).
    * Returns the number of segments deleted. */
  def truncateBefore(spark: SparkSession, dir: String,
      watermarks: Map[Int, Long]): Int = {
    val (f, _) = fs(dir, spark)
    var removed = 0
    watermarks.foreach { case (pid, wm) =>
      val segs = segments(f, dir, pid)
      segs.dropRight(1).foreach { case (path, start, count) =>
        if (start + count <= wm) {
          if (f.delete(new org.apache.hadoop.fs.Path(path), false)) {
            f.delete(new org.apache.hadoop.fs.Path(path + ".idx"), false)
            removed += 1
          }
        }
      }
    }
    removed
  }

  /** KEY COMPACTION (Kafka compacted-topic semantics): rewrite each
    * partition's history below its watermark keeping only the LATEST
    * record per key — offsets PRESERVED (never renumbered), the
    * newest segment always protected (it carries the end offset), so
    * consumers, checkpoints, and [[truncateBefore]] compose
    * unchanged. A CDC topic replayed from `earliest` then costs
    * O(live keys), not O(all history) — unbounded growth between
    * retention horizons removed.
    *
    * Mechanics: the eligible run (contiguous whole segments from the
    * front, entirely below the watermark, never the newest) is read
    * as ONE distributed offset-window batch across all partitions,
    * deduplicated per (partition, key) by max offset (NULL-key
    * records always survive — Kafka requires keys on compacted
    * topics; keeping is the safe analogue), and rewritten
    * executor-side as one SPARSE segment per partition
    * (`cseg-<start>-<span>.log`, explicit per-line offsets).
    * Publication order makes crashes safe: the cseg lands first
    * (create-if-absent rename), the superseded files are deleted
    * after — in between, the listing's SHADOWING rule ([[segments]])
    * already serves the cseg and ignores the contained files. Like
    * Kafka's log cleaner, one compaction per topic at a time (racing
    * compactions of the same range publish identical content and the
    * rename dedups them).
    *
    * Returns the number of superseded segment files removed. */
  /** POLICY-TRIGGERED compaction — the Kafka log-cleaner rule
    * (`min.cleanable.dirty.ratio`) on the graft log: a partition
    * compacts when its eligible run (whole segments below the newest)
    * is dirtier than `minDirtyRatio`, where DIRTY is the row count
    * sitting in not-yet-compacted segments and CLEAN is the offset
    * span already folded into sparse `cseg`s. The decision is a PURE
    * LISTING pass — segment names carry their counts — so probing a
    * quiet topic costs one `listStatus` per partition and compaction
    * I/O only happens when the ratio says it pays for itself.
    * Returns (partitionsTriggered, supersededFilesRemoved). */
  def compactIfDirty(spark: SparkSession, dir: String,
      minDirtyRatio: Double = 0.5): (Int, Int) = {
    require(minDirtyRatio >= 0.0 && minDirtyRatio <= 1.0,
      s"minDirtyRatio must be in [0, 1], got $minDirtyRatio")
    val (f, _) = fs(dir, spark)
    val wm = partitionIds(f, dir).flatMap { pid =>
      val eligible = segments(f, dir, pid).dropRight(1)
      if (eligible.isEmpty) None
      else {
        val dirty = eligible.filterNot(s => isSparse(s._1))
          .map(_._3).sum.toDouble
        val clean = eligible.filter(s => isSparse(s._1))
          .map(_._3).sum.toDouble
        if (dirty > 0 && dirty / (dirty + clean) >= minDirtyRatio)
          Some(pid -> (eligible.last._2 + eligible.last._3))
        else None
      }
    }
    if (wm.isEmpty) (0, 0)
    else (wm.size, compact(spark, dir, wm.toMap))
  }

  /** Test seam: the largest single byte[] the most recent [[compact]]
    * handed its segment output stream. The writer streams ROW-SIZED
    * writes by construction, so this stays at one record's encoding; a
    * reintroduced whole-partition buffer (the pre-round-14 shape)
    * would surface here as the partition's full survivor byte count.
    * Shared-JVM visible in local mode — test instrumentation only. */
  private[streaming] val lastCompactMaxWriteBytes =
    new java.util.concurrent.atomic.AtomicLong(0L)

  def compact(spark: SparkSession, dir: String,
      watermarks: Map[Int, Long]): Int = {
    import org.apache.spark.sql.expressions.Window
    val (f, _) = fs(dir, spark)
    // sweep files a crashed earlier compaction left shadowed
    var removed = gcShadowed(f, dir)
    val ranges: Map[Int, (Long, Long)] = watermarks.flatMap {
      case (pid, wm) =>
        val segs = segments(f, dir, pid)
        val eligible = segs.dropRight(1).takeWhile(s => s._2 + s._3 <= wm)
        // idempotence: a run that is already one sparse segment has
        // nothing to fold
        if (eligible.isEmpty ||
          (eligible.size == 1 && isSparse(eligible.head._1))) None
        else Some(pid ->
          (eligible.head._2, eligible.last._2 + eligible.last._3))
    }
    if (ranges.isEmpty) return removed
    def json(m: Map[Int, Long]) = m.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
    val window = spark.read.format("graftlog")
      .option("startingOffsets", json(ranges.map { case (p, r) => p -> r._1 }))
      .option("endingOffsets", json(ranges.map { case (p, r) => p -> r._2 }))
      .load(dir)
    val w = Window.partitionBy(col("partition"), col("key"))
      .orderBy(col("offset").desc)
    val survivors = window.filter(col("key").isNotNull)
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .unionByName(window.filter(col("key").isNull))
    val hconf = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    val rangeB = ranges
    val dirB = dir
    lastCompactMaxWriteBytes.set(0L)
    // one writer task per partition: the per-partition survivor set
    // STREAMS through in offset order, each row written to the tmp
    // file's output stream as it arrives — memory is one row plus a
    // fixed 64 KiB buffer, NOT O(live keys per partition) (Kafka's
    // log cleaner streams its cleaned segment the same way). The
    // tmp-then-rename publish keeps atomicity.
    survivors
      .repartition(math.max(1, ranges.size), col("partition"))
      .sortWithinPartitions("partition", "offset")
      .foreachPartition {
        (it: Iterator[org.apache.spark.sql.Row]) =>
          val c = new org.apache.hadoop.conf.Configuration(false)
          hconf.foreach { case (k, v) => c.set(k, v) }
          val fsys = new org.apache.hadoop.fs.Path(dirB).getFileSystem(c)
          var curPid = Int.MinValue
          var tmp: org.apache.hadoop.fs.Path = null
          var os: java.io.OutputStream = null
          def close(): Unit = if (os != null) {
            os.close()
            val (lo, hi) = rangeB(curPid)
            val pDir = new org.apache.hadoop.fs.Path(dirB, s"p=$curPid")
            val dest = new org.apache.hadoop.fs.Path(pDir,
              f"cseg-$lo%012d-${hi - lo}%08d.log")
            // create-if-absent: a racing identical compaction loses
            // quietly (same range → same content)
            if (!fsys.rename(tmp, dest)) fsys.delete(tmp, false): Unit
            os = null; tmp = null
          }
          val line = new StringBuilder // reused, row-sized
          it.foreach { r =>
            val pid = r.getInt(r.fieldIndex("partition"))
            if (os != null && pid != curPid) close()
            curPid = pid
            if (os == null) {
              val pDir = new org.apache.hadoop.fs.Path(dirB, s"p=$pid")
              tmp = new org.apache.hadoop.fs.Path(pDir,
                s".tmp-cseg-$pid-${java.util.UUID.randomUUID()}")
              os = new java.io.BufferedOutputStream(
                fsys.create(tmp, false), 1 << 16)
            }
            val k = if (r.isNullAt(r.fieldIndex("key"))) null
              else r.getString(r.fieldIndex("key"))
            val v = if (r.isNullAt(r.fieldIndex("value"))) null
              else r.getString(r.fieldIndex("value"))
            line.setLength(0)
            line.append(r.getLong(r.fieldIndex("offset"))).append('\t')
              .append(b64(k)).append('\t').append(b64(v)).append('\t')
              .append(r.getLong(r.fieldIndex("ts"))).append('\n')
            val bytes = line.toString.getBytes(
              java.nio.charset.StandardCharsets.UTF_8)
            lastCompactMaxWriteBytes.accumulateAndGet(bytes.length.toLong,
              (a, b) => math.max(a, b))
            os.write(bytes)
          }
          close()
      }
    removed + gcShadowed(f, dir)
  }

  /** Delete every segment file (and its `.idx`) that the SHADOWING
    * rule hides — the cleanup half of [[compact]]'s
    * publish-then-delete, also run up front to reap a crashed
    * compaction's leftovers. */
  private def gcShadowed(f: org.apache.hadoop.fs.FileSystem,
      dir: String): Int = {
    var removed = 0
    partitionIds(f, dir).foreach { pid =>
      val visible = segments(f, dir, pid).map(_._1).toSet
      val pDir = new org.apache.hadoop.fs.Path(dir, s"p=$pid")
      f.listStatus(pDir).map(_.getPath)
        .filter(p => p.getName.matches("c?seg-\\d{12}-\\d{8}\\.log"))
        .filterNot(p => visible(p.toString))
        .foreach { p =>
          if (f.delete(p, false)) {
            f.delete(new org.apache.hadoop.fs.Path(p.toString + ".idx"),
              false)
            removed += 1
          }
        }
    }
    removed
  }

  /** Atomic create-exclusive of `p` with `content`: true iff THIS call
    * created it. The local filesystem goes through java.nio
    * (O_CREAT|O_EXCL — a genuine kernel-level atomic, where Hadoop's
    * LocalFileSystem create(overwrite=false) is an
    * exists-check-then-create TOCTOU); remote stores use the
    * FileSystem contract (HDFS create-if-absent is atomic on the
    * namenode). */
  private[streaming] def createExclusive(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, content: String = ""): Boolean = {
    val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val scheme = Option(p.toUri.getScheme).getOrElse(f.getScheme)
    if (scheme == "file" || (scheme == null && f.getScheme == "file")) {
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(p.toUri.getPath), bytes,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try {
        val os = f.create(p, false)
        try os.write(bytes) finally os.close()
        true
      }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException
          if Option(e.getMessage).exists(_.contains("already exists")) => false
      }
    }
  }

  /** Atomically REPLACE `p`'s content (the takeover primitive: a stale
    * claim's owner token is overwritten, never deleted, so the
    * zombie's pre-publish ownership check fails instead of finding the
    * claim gone). Local FS uses an atomic rename-over; stores without
    * rename-overwrite fall back to delete+create (the takeover window
    * widens by one metadata op — still bounded by the staleness
    * horizon that gates entry here). */
  private def replaceClaim(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, content: String): Boolean = {
    val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val scheme = Option(p.toUri.getScheme).getOrElse(f.getScheme)
    if (scheme == "file" || (scheme == null && f.getScheme == "file")) {
      try {
        val dir = java.nio.file.Paths.get(p.getParent.toUri.getPath)
        val tmp = java.nio.file.Files.createTempFile(dir, ".claimswap-", "")
        java.nio.file.Files.write(tmp, bytes)
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(p.toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        true
      } catch { case _: java.io.IOException => false }
    } else {
      f.delete(p, false)
      createExclusive(f, p, content)
    }
  }

  /** The claim file's current content, or None if it vanished. */
  private def readClaim(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val in = f.open(p)
      try {
        val buf = new Array[Byte](256)
        var off = 0; var n = 0
        while (off < buf.length &&
          { n = in.read(buf, off, buf.length - off); n > 0 }) off += n
        Some(new String(buf, 0, off, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  /** Append `lines` (already encoded, already in order) as ONE segment
    * at the current end of partition `pid`, through the FENCED claim
    * protocol; callable from executors (no SparkSession). Returns
    * (startOffset, rowCount).
    *
    * Commit protocol, per attempt:
    *   1. `start` = end offset from the segment LISTING.
    *   2. Claim `start` by create-exclusive of `p=<pid>/.claim-<start>`
    *      — the single name every racer for this offset collides on —
    *      whose CONTENT is `<ownerToken>\t<rowCount>`. Loser: if the
    *      claim is fresher than the staleness horizon, wait for the
    *      owner's segment to land and retry at the NEW end; if staler,
    *      the owner died mid-write — take over by atomically REPLACING
    *      the claim content with our own token (never deleting it:
    *      the zombie's pre-publish ownership check must find a claim
    *      that is no longer its own, not an absent file it could
    *      mistake for a clean release). The horizon scales with the
    *      CLAIMED payload size (a live-but-slow producer uploading a
    *      1M-row segment to an object store legitimately exceeds a
    *      flat 30 s), so takeover triggers on death, not on size.
    *   3. Owner writes a temp file, RE-READS the claim to verify its
    *      token still owns the offset (the fence: a taken-over zombie
    *      aborts here instead of publishing a second segment at the
    *      same start), then renames onto `seg-<start>-<count>.log`.
    *   4. Release the claim ONLY if still owned (a zombie must not
    *      delete the taker's claim out from under it). */
  private[streaming] def appendPartition(f: org.apache.hadoop.fs.FileSystem,
      dir: String, pid: Int, lines: Seq[String],
      staleClaimMs: Long = 30000L,
      beforePublish: () => Unit = () => ()): (Long, Long) = {
    require(lines.nonEmpty, "appendPartition with no rows")
    val pDir = new org.apache.hadoop.fs.Path(dir, s"p=$pid")
    f.mkdirs(pDir)
    val token = java.util.UUID.randomUUID().toString
    val claimBody = s"$token\t${lines.length}"
    // the staleness horizon for a claim advertising n rows: base plus
    // ~10 µs/row of upload allowance (1 M rows → +10 s)
    def horizon(rows: Long): Long = staleClaimMs + rows / 100
    while (true) {
      val start = segments(f, dir, pid).lastOption
        .map(s => s._2 + s._3).getOrElse(0L)
      val claim = new org.apache.hadoop.fs.Path(pDir, f".claim-$start%012d")
      var owned = createExclusive(f, claim, claimBody)
      if (!owned) {
        // another producer owns this start: wait for its publish (the
        // common case) or take over a stale claim (a dead producer) by
        // REPLACING its token — the zombie's fence check then fails
        val st =
          try Some(f.getFileStatus(claim))
          catch { case _: java.io.FileNotFoundException => None }
        st match {
          case Some(s) =>
            val claimedRows = readClaim(f, claim)
              .flatMap(_.split('\t').lift(1)).flatMap(_.trim.toLongOption)
              .getOrElse(0L)
            if (System.currentTimeMillis() - s.getModificationTime >
                horizon(claimedRows))
              owned = replaceClaim(f, claim, claimBody)
            else Thread.sleep(5)
          case None => () // released between claim attempt and stat: retry
        }
      }
      if (owned) {
        var lost = false
        try {
          // RE-VERIFY under the claim: our `start` came from a listing
          // taken BEFORE the claim — a racer may have claimed this
          // offset, published, and released in between, making our
          // start stale (the ABA the claim alone can't see). Holding
          // the claim freezes this offset, so a fresh listing is
          // authoritative: if the end moved, release and retry there.
          val endNow = segments(f, dir, pid).lastOption
            .map(s => s._2 + s._3).getOrElse(0L)
          if (endNow == start) {
            val dest = new org.apache.hadoop.fs.Path(pDir,
              f"seg-$start%012d-${lines.length}%08d.log")
            val tmp = new org.apache.hadoop.fs.Path(pDir,
              s".tmp-${dest.getName}-${java.util.UUID.randomUUID()}")
            val os = f.create(tmp, false)
            try os.write(lines.mkString("", "\n", "\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally os.close()
            beforePublish()
            // THE FENCE: publish only while the claim still carries our
            // token — a replaced (taken-over) claim means some taker
            // now owns this offset and our segment must not land
            lost = !readClaim(f, claim).exists(_.startsWith(token))
            if (lost) f.delete(tmp, false)
            else if (!f.rename(tmp, dest)) {
              f.delete(tmp, false)
              throw new IllegalStateException(
                s"graftlog publish rename failed for claimed offset: $dest")
            } else if ({
              // POST-PUBLISH RE-VERIFY: the pre-rename fence and the
              // rename are two FS ops, so a takeover landing between
              // them would let both the zombie and the taker publish
              // at this start offset. Re-checking AFTER the rename and
              // RETRACTING our own segment on loss closes that window:
              // a taker that replaced the claim after this read lists
              // the log after its replace, sees our segment, and moves
              // to the new end. The irreducible residue on a
              // non-CAS filesystem is a taker whose takeover AND
              // listing both land inside our rename→delete
              // microsecond window (takeover itself already requires
              // this producer to have stalled past the payload-scaled
              // staleness horizon mid-publish) — that taker can
              // publish past a segment we then retract, leaving a gap
              // where overlap used to be possible.
              lost = !readClaim(f, claim).exists(_.startsWith(token))
              if (lost) f.delete(dest, false): Unit
              lost
            }) { /* retracted: fall through to retry at the new end */ }
            else {
              // big segments get an inline `.idx` sidecar (byte
              // positions are already known from the payload) so
              // replayed offset windows seek instead of line-skip;
              // best-effort — the sidecar is never load-bearing
              if (lines.length >= 2 * IndexEvery) {
                try {
                  val b = new StringBuilder
                  var pos = 0L
                  var i = 0
                  lines.foreach { l =>
                    if (i > 0 && i % IndexEvery == 0)
                      b.append(start + i).append('\t').append(pos)
                        .append('\n')
                    pos += l.getBytes(
                      java.nio.charset.StandardCharsets.UTF_8).length + 1L
                    i += 1
                  }
                  val ip = new org.apache.hadoop.fs.Path(
                    dest.toString + ".idx")
                  val itmp = new org.apache.hadoop.fs.Path(pDir,
                    s".tmp-${ip.getName}-${java.util.UUID.randomUUID()}")
                  val os2 = f.create(itmp, false)
                  try os2.write(b.toString.getBytes(
                    java.nio.charset.StandardCharsets.UTF_8))
                  finally os2.close()
                  if (!f.rename(itmp, ip)) f.delete(itmp, false): Unit
                } catch { case _: Exception => () }
              }
              return (start, lines.length.toLong)
            }
          }
        } finally {
          // release only if still ours (a zombie deleting the taker's
          // claim would re-open the offset to a third producer)
          if (!lost && readClaim(f, claim).exists(_.startsWith(token)))
            f.delete(claim, false): Unit
        }
        if (lost) Thread.sleep(5) // taken over: re-enter at the new end
      }
    }
    sys.error("unreachable")
  }

  /** PRODUCE (driver-side harness): append `batch` — columns
    * (partition INT, seq LONG, key STRING, value STRING, ts LONG);
    * rows land in `seq` order within their partition — as one segment
    * per non-empty partition, through the claim protocol (so racing
    * appends from other processes interleave safely). Returns the new
    * end offsets. Rows cross the driver ONCE per append (a producer
    * harness writes batch-sized payloads, the Kafka client contract);
    * the DISTRIBUTED produce path is
    * `df.write.format("graftlog").mode("append")`. */
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
      }.toSeq
      appendPartition(f, dir, pid, lines)
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

  /** Cap `head` at `maxRows` records above `from`, split across
    * partitions PROPORTIONALLY to their lag (Kafka's
    * maxOffsetsPerTrigger rule): each partition gets
    * floor(lag_p × maxRows / totalLag), and the remainder goes to the
    * largest lags first (ties by partition id — deterministic, so a
    * re-planned batch reads the identical range). */
  private[streaming] def capped(from: Map[Int, Long], head: Map[Int, Long],
      maxRows: Long): Map[Int, Long] = {
    val lags = head.map { case (p, h) =>
      p -> math.max(0L, h - from.getOrElse(p, 0L)) }
    val total = lags.values.sum
    if (total <= maxRows) head
    else {
      val base = lags.map { case (p, l) => p -> l * maxRows / total }
      val rem = (maxRows - base.values.sum).toInt
      val extra = lags.toSeq.sortBy { case (p, l) => (-l, p) }
        .take(rem).map(_._1).toSet
      head.map { case (p, h) =>
        val take = base(p) + (if (extra(p)) 1L else 0L)
        p -> math.min(h, from.getOrElse(p, 0L) + take)
      }
    }
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
      private var sparse = false
      private var current: InternalRow = _

      private def openNext(): Boolean = {
        if (reader != null) { reader.close(); reader = null }
        while (segIter.hasNext) {
          val (path, start, count) = segIter.next()
          // segment entirely outside the slice: skip without opening
          if (start + count > part.from && start < part.until) {
            val hp = new org.apache.hadoop.fs.Path(path)
            val fsys = hp.getFileSystem(conf)
            val in = fsys.open(hp)
            sparse = GraftLog.isSparse(path)
            if (!sparse) {
              segOffset = start
              // mid-segment entry: the optional `.idx` sidecar (every
              // Nth offset → byte position) turns the O(skip) line
              // walk into one seek + a bounded tail walk; a missing
              // or unreadable sidecar degrades to the plain skip,
              // never correctness
              if (part.from > start) {
                GraftLog.indexSeek(fsys, path, part.from).foreach {
                  case (off, bytePos) =>
                    try { in.seek(bytePos); segOffset = off }
                    catch { case _: java.io.IOException => in.seek(0L) }
                }
              }
              reader = new java.io.BufferedReader(
                new java.io.InputStreamReader(
                  in, java.nio.charset.StandardCharsets.UTF_8))
              while (segOffset < part.from) {
                reader.readLine(); segOffset += 1
              }
            } else {
              // sparse (compacted) segment: explicit per-line offsets,
              // the reader filters to the slice
              reader = new java.io.BufferedReader(
                new java.io.InputStreamReader(
                  in, java.nio.charset.StandardCharsets.UTF_8))
            }
            return true
          }
        }
        false
      }

      private def row(off: Long, k: String, v: String, ts: String)
        : InternalRow =
        InternalRow(part.pid, off,
          Option(GraftLog.unb64(k)).map(UTF8String.fromString).orNull,
          Option(GraftLog.unb64(v)).map(UTF8String.fromString).orNull,
          ts.toLong)

      override def next(): Boolean = {
        while (true) {
          if (reader == null && !openNext()) return false
          if (!sparse && segOffset >= part.until) {
            reader.close(); reader = null; return false
          }
          val line = reader.readLine()
          if (line == null) { reader.close(); reader = null }
          else if (sparse) {
            val Array(o, k, v, ts) = line.split('\t')
            val off = o.toLong
            if (off >= part.until) {
              // lines ascend; later segments start later still — done
              reader.close(); reader = null; return false
            }
            if (off >= part.from) { current = row(off, k, v, ts); return true }
          } else {
            val Array(k, v, ts) = line.split('\t')
            current = row(segOffset, k, v, ts)
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
  * partition/offset reader.
  *
  * Batch reads honor Kafka-shaped slicing options:
  * `startingOffsets` / `endingOffsets` = earliest | latest | a
  * per-partition JSON map (`{"0":5,"1":0}`) — reprocessing an exact
  * offset window without a streaming checkpoint; `minPartitions`
  * splits big topic-partitions into multiple contiguous offset-range
  * input partitions, so ONE hot partition no longer caps read
  * parallelism at 100 TB (chunks inside a segment skip to their start
  * by line count — bounded re-read, never wrong rows). */
class GraftLogScan(dir: String, startingOffsets: String,
    endingOffsets: String, maxOffsetsPerTrigger: Option[Long],
    minPartitions: Option[Int],
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
      else Some(GraftLogInputPartition(pid,
        GraftLog.segments(f, dir, pid), from, until, hm): InputPartition)
    }.toArray
  }

  /** Split slices into ≥ `minParts` contiguous offset-range chunks:
    * each slice gets ceil(len × minParts / total) splits — the sum of
    * ceilings is ≥ minParts whatever the skew — sized evenly within
    * the slice. Deterministic (a re-planned batch splits identically). */
  private def chunked(parts: Array[InputPartition]): Array[InputPartition] =
    minPartitions match {
      case Some(minParts) if parts.length < minParts && parts.nonEmpty =>
        val ps = parts.map(_.asInstanceOf[GraftLogInputPartition])
        val total = math.max(1L, ps.map(p => p.until - p.from).sum)
        ps.flatMap { p =>
          val len = p.until - p.from
          val n = math.max(1L, (len * minParts + total - 1) / total)
          // exact proportional boundaries (floor(i·len/n)): exactly n
          // non-empty chunks whenever n ≤ len, sizes within one row
          (0L until n).map { i =>
            p.copy(from = p.from + i * len / n,
              until = p.from + (i + 1) * len / n)
          }.filter(c => c.until > c.from).map(c => c: InputPartition)
        }
      case _ => parts
    }

  private def boundOf(opt: String, head: Map[Int, Long]): Map[Int, Long] =
    opt match {
      case "earliest" => Map.empty
      case "latest" => head
      case json => GraftLogOffset.parse(json).ends
    }

  // ---- batch read: the configured offset window (whole log default) --
  override def planInputPartitions(): Array[InputPartition] = {
    val head = GraftLog.endOffsets(spark, dir)
    chunked(slices(boundOf(startingOffsets, head),
      boundOf(endingOffsets, head)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory

  // ---- micro-batch stream ----
  override def toMicroBatchStream(checkpointLocation: String)
    : MicroBatchStream = new MicroBatchStream
      with SupportsAdmissionControl with SupportsTriggerAvailableNow {

    // Trigger.AvailableNow pins the topic head ONCE at query start;
    // capped batches then drain toward that fixed end and the query
    // stops — the bounded-catch-up contract (rows produced after the
    // pin wait for the next run).
    private var availableNowEnd: Option[Map[Int, Long]] = None

    override def initialOffset(): Offset = startingOffsets match {
      case "latest" => GraftLogOffset(GraftLog.endOffsets(spark, dir))
      case "earliest" => GraftLogOffset(
        GraftLog.endOffsets(spark, dir).map { case (p, _) => p -> 0L })
      case json => GraftLogOffset.parse(json) // explicit {pid: offset}
    }

    override def getDefaultReadLimit: ReadLimit =
      maxOffsetsPerTrigger.map(ReadLimit.maxRows)
        .getOrElse(ReadLimit.allAvailable())

    override def prepareForTriggerAvailableNow(): Unit =
      availableNowEnd = Some(GraftLog.endOffsets(spark, dir))

    /** The admission-controlled end of the next micro-batch: the topic
      * head (or the AvailableNow pin), capped at the limit's row count
      * above `start`, split proportionally to per-partition lag. This
      * is what keeps batch 0 of an `earliest` start on a huge topic
      * from spanning the whole log. */
    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val from = start.asInstanceOf[GraftLogOffset].ends
      val head = availableNowEnd.getOrElse(GraftLog.endOffsets(spark, dir))
      limit match {
        case r: ReadMaxRows =>
          GraftLogOffset(GraftLogOffset.capped(from, head, r.maxRows()))
        case _ => GraftLogOffset(head)
      }
    }

    override def reportLatestOffset(): Offset =
      GraftLogOffset(GraftLog.endOffsets(spark, dir))

    // the engine calls the admission-controlled form above when the
    // source implements SupportsAdmissionControl; this uncapped form
    // survives for the base-interface contract
    override def latestOffset(): Offset =
      GraftLogOffset(GraftLog.endOffsets(spark, dir))

    override def deserializeOffset(json: String): Offset =
      GraftLogOffset.parse(json)

    override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] =
      chunked(slices(start.asInstanceOf[GraftLogOffset].ends,
        end.asInstanceOf[GraftLogOffset].ends))

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftLogReaderFactory

    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
  }
}

/** Per-task commit message: the (pid, start, count) segments this task
  * published — metadata-sized. */
case class GraftLogWriteCommit(segments: Seq[(Int, Long, Long)])
  extends WriterCommitMessage

/** Executor-side producer task: rows arrive CLUSTERED by `partition`
  * and SORTED by (partition, offset) — the Write declares that
  * requirement, Spark plans the shuffle/sort — so each partition's
  * payload is contiguous and ordered, and one task owns each
  * partition per job. Segments publish through the same claim
  * protocol as the driver harness, in bounded chunks
  * (`maxRowsPerSegment`), so task memory never holds more than one
  * segment. Task retry re-appends already-published chunks —
  * at-least-once, the non-idempotent Kafka producer contract. */
class GraftLogDataWriter(dir: String, hconf: Map[String, String],
    pIdx: Int, oIdx: Int, kIdx: Int, vIdx: Int, tIdx: Int,
    maxRowsPerSegment: Int) extends DataWriter[InternalRow] {

  private lazy val fsys = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    hconf.foreach { case (k, v) => c.set(k, v) }
    new org.apache.hadoop.fs.Path(dir).getFileSystem(c)
  }
  private var curPid: Int = Int.MinValue
  private var started = false
  private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
  private val published = Seq.newBuilder[(Int, Long, Long)]

  private def flush(): Unit = if (buf.nonEmpty) {
    val (start, n) = GraftLog.appendPartition(fsys, dir, curPid, buf.toSeq)
    published += ((curPid, start, n))
    buf.clear()
  }

  override def write(r: InternalRow): Unit = {
    val pid = r.getInt(pIdx)
    if (started && pid != curPid) flush()
    started = true
    curPid = pid
    val k = if (r.isNullAt(kIdx)) null else r.getUTF8String(kIdx).toString
    val v = if (r.isNullAt(vIdx)) null else r.getUTF8String(vIdx).toString
    buf += s"${GraftLog.b64(k)}\t${GraftLog.b64(v)}\t${r.getLong(tIdx)}"
    if (buf.size >= maxRowsPerSegment) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    GraftLogWriteCommit(published.result())
  }

  // chunks already published stay (append-only log, at-least-once);
  // nothing staged to clean
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

class GraftLogWriterFactory(dir: String, hconf: Map[String, String],
    pIdx: Int, oIdx: Int, kIdx: Int, vIdx: Int, tIdx: Int,
    maxRowsPerSegment: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
    : DataWriter[InternalRow] =
    new GraftLogDataWriter(dir, hconf, pIdx, oIdx, kIdx, vIdx, tIdx,
      maxRowsPerSegment)
}

class GraftLogTable(dir: String, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graftlog.`$dir`"
  override def schema(): StructType = GraftLog.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        def opt(k: String) = Option(opts.get(k)).orElse(Option(options.get(k)))
        new GraftLogScan(dir,
          opt("startingOffsets").getOrElse("earliest"),
          opt("endingOffsets").getOrElse("latest"),
          opt("maxOffsetsPerTrigger").map(_.toLong),
          opt("minPartitions").map(_.toInt),
          SparkSession.active)
      }
    }

  /** `df.write.format("graftlog").mode("append").save(dir)`: the
    * distributed producer. The frame must carry the log's own schema
    * (partition, offset, key, value, ts) — `offset` here is the
    * PRODUCER SEQUENCE (in-partition ordering), re-assigned to real
    * log offsets at append, exactly like [[GraftLog.append]]'s `seq`. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.fieldNames.toSet == GraftLog.schema.fieldNames.toSet,
      "graftlog write needs columns (partition, offset, key, value, ts); " +
        s"got ${s.fieldNames.mkString(", ")}")
    def idx(n: String) = s.fieldIndex(n)
    require(s(idx("partition")).dataType == IntegerType &&
        s(idx("offset")).dataType == LongType &&
        s(idx("ts")).dataType == LongType,
      "graftlog write needs partition INT, offset LONG, ts LONG " +
        "(cast before writing)")
    val maxRows = Option(options.get("maxRowsPerSegment"))
      .map(_.toInt).getOrElse(1 << 20)
    new WriteBuilder {
      override def build(): Write = new Write with RequiresDistributionAndOrdering {
        // one task per topic-partition (clustered), rows in producer
        // order within it (sorted) — the layout that makes each task's
        // payload one contiguous ordered segment run
        override def requiredDistribution(): Distribution =
          Distributions.clustered(Array(Expressions.identity("partition")))
        override def requiredOrdering(): Array[SortOrder] = Array(
          Expressions.sort(Expressions.identity("partition"),
            SortDirection.ASCENDING),
          Expressions.sort(Expressions.identity("offset"),
            SortDirection.ASCENDING))
        private def factory(): GraftLogWriterFactory = {
          val spark = SparkSession.active
          val c = spark.sparkContext.hadoopConfiguration.iterator()
          val b = Map.newBuilder[String, String]
          while (c.hasNext) { val e = c.next(); b += (e.getKey -> e.getValue) }
          new GraftLogWriterFactory(dir, b.result(),
            idx("partition"), idx("offset"), idx("key"), idx("value"),
            idx("ts"), maxRows)
        }
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(pi: PhysicalWriteInfo)
            : DataWriterFactory = factory()
          // segments published executor-side through the claim protocol
          // are already durable and readable — job commit is a no-op
          // (the Kafka producer has no job-level commit either)
          override def commit(messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
        /** Streaming PRODUCE (`df.writeStream.format("graftlog")`) —
          * the Kafka-sink contract: every micro-batch's rows append
          * executor-side through the same claim-protocol writers as
          * the batch path; epoch commit is a no-op (segments are
          * already durable), and a batch re-delivered after a failure
          * between sink write and checkpoint advance RE-APPENDS —
          * at-least-once, exactly like a non-idempotent Kafka
          * producer; consumers dedup by key where that matters (the
          * graft table sink's keyed merge does). */
        override def toStreaming: StreamingWrite = new StreamingWrite {
          override def createStreamingWriterFactory(pi: PhysicalWriteInfo)
            : StreamingDataWriterFactory = {
            val f = factory()
            new StreamingDataWriterFactory {
              override def createWriter(partitionId: Int, taskId: Long,
                  epochId: Long): DataWriter[InternalRow] =
                f.createWriter(partitionId, taskId)
            }
          }
          override def commit(epochId: Long,
              messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(epochId: Long,
              messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
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
