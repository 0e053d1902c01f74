package graft.meta

import java.nio.file.{Files, Path}
import java.util.Comparator
import scala.jdk.CollectionConverters._
import scala.util.Random

/** The table's versioned metadata log: `_meta/v%08d.json` snapshot files.
  *
  * Commit protocol — optimistic concurrency exactly in the spirit of the
  * reference's `commit.retry.*` table properties
  * (`core/config.py:15-17`):
  *   1. read the current max version N (directory listing);
  *   2. write the new snapshot to a temp file;
  *   3. atomically publish it as `v(N+1)` via hard-link (fails if another
  *      writer won the race) with an atomic-rename fallback;
  *   4. on conflict, back off (bounded exponential + jitter) and retry
  *      from (1) up to `commit.retry.num-retries` times.
  *
  * The log is the source of truth; no mutable pointer file exists, so a
  * crashed writer can never leave the table unreadable — readers always
  * see the highest fully-published version. On a distributed store this
  * maps to any filesystem with atomic create-if-absent (HDFS rename,
  * object stores' if-none-match put); only this class would change.
  */
final class MetadataLog(tableDir: Path) {
  private val metaDir = tableDir.resolve("_meta")

  private def versionFile(v: Int): Path = metaDir.resolve(f"v$v%08d.json")

  /** Manifests are immutable once published, so a process-local cache
    * makes repeated snapshot reads O(new manifests), not O(all files).
    */
  private val manifestCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[DataFile]]

  /** Manifest files actually parsed from disk (cache misses) — lets
    * tests assert that summary-pruned scans parse fewer manifests than
    * the snapshot references.
    */
  val manifestParses = new java.util.concurrent.atomic.AtomicLong(0)

  def readManifest(relPath: String): Seq[DataFile] =
    manifestCache.getOrElseUpdate(relPath, {
      manifestParses.incrementAndGet()
      Snapshot.manifestFromJson(Files.readString(metaDir.resolve(relPath)))
    })

  /** Publish a new immutable manifest for `files`; returns the group
    * (with a summary when the table schema is supplied — the write
    * paths always do, so new snapshots carry manifest-skip metadata).
    */
  def writeManifest(files: Seq[DataFile],
                    schema: Option[org.apache.spark.sql.types.StructType] = None): FileGroup = {
    Files.createDirectories(metaDir)
    val name = s"m-${java.util.UUID.randomUUID().toString.take(16)}.json"
    Files.writeString(metaDir.resolve(name), Snapshot.manifestToJson(files))
    manifestCache.put(name, files)
    FileGroup(name, files, schema)
  }

  def deleteManifest(relPath: String): Unit = {
    manifestCache.remove(relPath)
    Files.deleteIfExists(metaDir.resolve(relPath))
  }

  def exists(): Boolean = Files.isDirectory(metaDir) && currentVersion().isDefined

  def listVersions(): Seq[Int] = {
    if (!Files.isDirectory(metaDir)) return Nil
    val stream = Files.list(metaDir)
    try {
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
          s.stripPrefix("v").stripSuffix(".json").toInt
        }
        .toSeq.sorted
    } finally stream.close()
  }

  def currentVersion(): Option[Int] = listVersions().lastOption

  def read(version: Int): Snapshot =
    Snapshot.fromJson(Files.readString(versionFile(version)), readManifest)

  def current(): Option[Snapshot] = currentVersion().map(read)

  def snapshots(): Seq[Snapshot] = listVersions().map(read)

  def delete(version: Int): Unit = Files.deleteIfExists(versionFile(version))

  // ---- named refs (tags) ---------------------------------------------
  // One file per ref (`_meta/ref-<name>.json`): create is atomic
  // CREATE_NEW (duplicate tag = natural failure, no read-modify-write
  // race), drop is a delete, listing is a directory scan — the same
  // filesystem primitives as the commit protocol, so refs inherit its
  // portability story.

  private val RefName = "^[A-Za-z0-9][A-Za-z0-9._-]*$".r

  private def refFile(name: String): Path = {
    require(RefName.matches(name),
      s"invalid ref name '$name' (letters, digits, dot, underscore, dash)")
    metaDir.resolve(s"ref-$name.json")
  }

  def createTag(name: String, version: Int): Unit = {
    Files.createDirectories(metaDir)
    try
      Files.writeString(refFile(name), s"""{"version": $version}""",
        java.nio.file.StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(s"tag '$name' already exists")
    }
  }

  def dropTag(name: String): Boolean = Files.deleteIfExists(refFile(name))

  def tag(name: String): Option[Int] = {
    val f = refFile(name)
    if (!Files.exists(f)) None
    else {
      import org.json4s._
      val j = org.json4s.jackson.JsonMethods.parse(Files.readString(f))
      (j \ "version") match {
        case JInt(v) => Some(v.toInt)
        case _ => None
      }
    }
  }

  def tags(): Map[String, Int] = {
    if (!Files.isDirectory(metaDir)) return Map.empty
    val stream = Files.list(metaDir)
    try
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("ref-") && s.endsWith(".json") =>
          s.stripPrefix("ref-").stripSuffix(".json")
        }
        .flatMap(n => tag(n).map(n -> _))
        .toMap
    finally stream.close()
  }

  /** Publish `build(parent)` as the next version. `build` is re-invoked
    * with the freshly-read parent on every retry so the caller always
    * commits against the latest table state.
    */
  def commit(build: Option[Snapshot] => Snapshot,
             retries: Int = 10, minWaitMs: Long = 100, maxWaitMs: Long = 60000): Snapshot = {
    Files.createDirectories(metaDir)
    var attempt = 0
    while (true) {
      val parent = current()
      val nextVersion = parent.map(_.version + 1).getOrElse(0)
      val snap = build(parent).copy(
        version = nextVersion,
        parentId = parent.map(_.snapshotId),
        timestampMs = System.currentTimeMillis())
      val tmp = Files.createTempFile(metaDir, ".commit-", ".json.tmp")
      Files.writeString(tmp, Snapshot.toJson(snap))
      val target = versionFile(nextVersion)
      val won =
        try { Files.createLink(target, tmp); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: UnsupportedOperationException =>
            // FS without hard links. ATOMIC_MOVE is NOT create-if-absent:
            // POSIX rename silently replaces an existing target, so two
            // racing committers would both "win" and the first winner's
            // snapshot would be clobbered (lost commit). Files.copy without
            // REPLACE_EXISTING opens the target CREATE_NEW — the existence
            // check is atomic at open, before any bytes land.
            try {
              Files.copy(tmp, target)
              true
            } catch { case _: java.nio.file.FileAlreadyExistsException => false }
        }
      Files.deleteIfExists(tmp)
      if (won) return snap
      attempt += 1
      graft.observability.Log.warn("commit conflict, retrying",
        "table" -> tableDir, "attempt" -> attempt, "version" -> nextVersion)
      if (attempt > retries)
        throw new IllegalStateException(
          s"Commit conflict on $tableDir after $retries retries")
      val backoff = math.min(maxWaitMs, minWaitMs * (1L << math.min(attempt, 16)))
      Thread.sleep(minWaitMs + Random.nextLong(math.max(1, backoff - minWaitMs)))
    }
    sys.error("unreachable")
  }

  /** Remove the whole log (drop table). */
  def destroy(): Unit = {
    if (Files.isDirectory(metaDir)) {
      val stream = Files.walk(metaDir)
      try stream.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.deleteIfExists(p))
      finally stream.close()
    }
  }
}
