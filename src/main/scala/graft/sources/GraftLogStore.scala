package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The COMMIT-LOG STORE seam — one verb: PUBLISH `content` at `dest`
  * iff nothing exists there, ATOMICALLY. Every manifest rename in the
  * format reduces to this conditional-put, so the store IS the commit
  * protocol: whoever wins the publish wins the version, and a loser
  * must observe a [[GraftTable.ConcurrentCommitException]] — never a
  * silent overwrite (the round-14 lost-update bug was exactly a
  * publish primitive that let two racers both "win").
  *
  * Implementations:
  *  - [[LocalFsLogStore]] (default): `link(2)` create-exclusive on
  *    the local filesystem, exists+rename on HDFS-like schemes —
  *    the behavior the format always had, now behind the seam.
  *  - [[InMemoryCasLogStore]]: a process-local compare-and-swap
  *    keyed on the qualified path — the reference semantics an
  *    OBJECT-STORE deployment needs from its log (S3 conditional
  *    PUT / DynamoDB-arbitrated commit, the documented Delta
  *    LogStore contract). A both-win is impossible by construction:
  *    `putIfAbsent` decides uniqueness before any byte lands.
  *
  * Install per-process via [[GraftTable.withLogStore]] (tests) or
  * [[GraftTable.setLogStore]]; `null` restores the default. The seam
  * covers every `_log` publish (manifests, token-named sidecars,
  * markers) — sidecar names are attempt-unique so the stricter
  * semantics cost nothing there. */
trait GraftLogStore {
  /** Atomic create-if-absent publish of `content` (UTF-8) at `dest`.
    * Throws [[GraftTable.ConcurrentCommitException]] iff `dest` was
    * already published — the OCC loss signal retry loops key on. */
  def publish(f: FileSystem, dest: Path, content: String): Unit
}

/** Filesystem-native publish: write to an attempt-unique temp name,
  * then claim `dest` by `link(2)` (local — POSIX rename overwrites,
  * link fails EEXIST atomically) or exists+rename (HDFS-like — their
  * rename refuses an existing destination). Object stores have
  * neither primitive; point them at [[InMemoryCasLogStore]]-shaped
  * arbitration instead. */
object LocalFsLogStore extends GraftLogStore {
  override def publish(f: FileSystem, dest: Path,
      content: String): Unit = {
    val tmp = new Path(
      dest.getParent, s".tmp-${dest.getName}-${java.util.UUID.randomUUID()}")
    val os = f.create(tmp, false)
    try os.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    if (Option(f.getUri.getScheme).contains("file")) {
      val d = java.nio.file.Paths.get(f.makeQualified(dest).toUri.getPath)
      val t = java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath)
      try java.nio.file.Files.createLink(d, t)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          f.delete(tmp, false)
          throw new GraftTable.ConcurrentCommitException(
            s"concurrent commit: $dest already exists")
      }
      // the winner carries the checksum sidecar over (ChecksumFileSystem
      // pairs `.name.crc` with name); best-effort — a missing crc only
      // skips verification, never fails a read
      val tcrc = t.getParent.resolve("." + t.getFileName.toString + ".crc")
      val dcrc = d.getParent.resolve("." + d.getFileName.toString + ".crc")
      if (java.nio.file.Files.exists(tcrc)) {
        try { java.nio.file.Files.createLink(dcrc, tcrc); () }
        catch { case _: java.io.IOException => () }
      }
      f.delete(tmp, false)
    } else if (f.exists(dest) || !f.rename(tmp, dest)) {
      f.delete(tmp, false)
      throw new GraftTable.ConcurrentCommitException(
        s"concurrent commit: $dest already exists")
    }
  }
}

/** Conditional-put log store: a process-local CAS on the qualified
  * destination path decides the winner BEFORE any filesystem state
  * changes; the winner then materializes the file (plain create —
  * uniqueness is already arbitrated, so even an overwriting
  * filesystem can't lose an update). This is the semantics an object
  * store must supply (S3 `If-None-Match` conditional PUT, or an
  * external arbiter table) — and the spec harness runs the same race
  * loops against it to prove the protocol needs nothing more than
  * this one primitive. */
class InMemoryCasLogStore extends GraftLogStore {
  private val published =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Number of successful publishes (spec observability). */
  def publishedCount: Int = published.size()

  override def publish(f: FileSystem, dest: Path,
      content: String): Unit = {
    val key = f.makeQualified(dest).toString
    // the CAS — exactly one caller per path ever passes
    if (!published.add(key))
      throw new GraftTable.ConcurrentCommitException(
        s"concurrent commit: $dest already published (CAS)")
    // Any failure BELOW must release the claim: a slot claimed with
    // nothing published would make every OCC retry of this version
    // throw ConcurrentCommitException forever while latestVersion
    // never advances — the table wedged until process restart. The
    // pre-existing-path refusal releases too: the DISK is the truth
    // there (retries re-arbitrate and keep losing against it for as
    // long as the path actually exists).
    try {
      if (f.exists(dest)) {
        throw new GraftTable.ConcurrentCommitException(
          s"concurrent commit: $dest already exists")
      }
      // materialize ATOMICALLY even though uniqueness is already
      // decided: a reader must never list a half-written manifest (an
      // object store's PUT is all-or-nothing; the filesystem stand-in
      // gets the same property from tmp + rename — no contender exists
      // for this path anymore, so plain rename suffices)
      val tmp = new Path(dest.getParent,
        s".cas-${dest.getName}-${java.util.UUID.randomUUID()}")
      val os = f.create(tmp, false)
      try os.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
      if (!f.rename(tmp, dest)) {
        f.delete(tmp, false)
        throw new IllegalStateException(
          s"CAS-won publish failed to materialize $dest")
      }
    } catch {
      case e: Throwable =>
        published.remove(key)
        throw e
    }
  }
}
