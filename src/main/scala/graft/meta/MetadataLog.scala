package graft.meta

import java.nio.charset.StandardCharsets
import scala.util.Random

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** The table's versioned metadata log: `_meta/v%08d.json` snapshot files.
  *
  * Commit protocol — optimistic concurrency exactly in the spirit of the
  * reference's `commit.retry.*` table properties
  * (`core/config.py:15-17`):
  *   1. read the current max version N (directory listing);
  *   2. write the new snapshot to a temp file;
  *   3. atomically publish it as `v(N+1)` — create-if-absent, so the
  *      publish fails if another writer won the race;
  *   4. on conflict, back off (bounded exponential + jitter) and retry
  *      from (1) up to `commit.retry.num-retries` times.
  *
  * The log is the source of truth; no mutable pointer file exists, so a
  * crashed writer can never leave the table unreadable — readers always
  * see the highest fully-published version.
  *
  * All IO goes through `org.apache.hadoop.fs.FileSystem`, so the table
  * root may live on any Hadoop-supported store (the reference reaches
  * S3/MinIO through PyIceberg FileIO, `examples/catalog.py:11-17`).
  * The atomic create-if-absent publish has two strategies:
  *   - `file://` roots: java.nio hard-link (CREATE_NEW copy fallback) —
  *     truly atomic on POSIX, and Hadoop's local rename would silently
  *     replace an existing target (lost commit);
  *   - everything else: write-temp + `FileSystem.rename`, which on HDFS
  *     (and stores with atomic metadata ops) is atomic and FAILS when
  *     the destination exists — the standard rename-based commit.
  *
  * CAVEAT for bare object stores: S3A's rename is a non-atomic
  * check-then-copy, so CONCURRENT writers to one s3a:// table root can
  * race past each other. Upstream Iceberg draws the same boundary —
  * commits to S3 require a catalog (or conditional-PUT support) to
  * arbitrate. Here the gap is closed by an OPTIONAL commit lease
  * (`graft.commit.lease.enabled`): writers serialize on a
  * create-if-absent `_meta/commit.lock` carrying writer id + expiry,
  * with expired leases stolen and a fencing re-read before the
  * publishing rename. The lease narrows the lost-commit window from
  * every-commit to simultaneous-acquisition-inside-one-HEAD/PUT-window
  * (milliseconds, vs the lease term) — multi-writer s3a:// roots are
  * safe with the lease enabled; single-writer s3a:// tables and all
  * HDFS-like stores are safe without it.
  */
final class MetadataLog(val tableDir: HPath, conf: Configuration,
                        val branch: Option[String] = None) {

  /** Convenience for POSIX-local tables (tests, single-node use). */
  def this(dir: java.nio.file.Path) = this(new HPath(dir.toUri), new Configuration())

  val fs: FileSystem = tableDir.getFileSystem(conf)

  /** Filesystem for METADATA IO (snapshots, manifests, refs). On local
    * roots this is the raw (checksum-free) local filesystem: Hadoop's
    * default `file:` FS is a ChecksumFileSystem that writes a `.crc`
    * sidecar per file and re-verifies every read — redundant on local
    * disk (the kernel already guarantees read-back integrity) and, at a
    * metadata file per commit plus a manifest per write batch, a real
    * tax on the write path (round-8 measurement: 2.4–3.9× on
    * delete-rewrite/pruned-scan/z-order). HDFS/S3/etc. resolve to
    * themselves — checksumming there is the store's business, not ours.
    * DATA files keep using [[fs]] so Spark-written `.crc` sidecars are
    * cleaned up by the same (checksummed) FS that created them.
    */
  val metaFs: FileSystem = MetadataLog.rawIfLocal(fs)
  private val metaDir = new HPath(tableDir, "_meta")

  // ---- branches ------------------------------------------------------
  // A branch is an independent VERSION log under `_meta/branches/<name>/`
  // sharing the main log's manifest namespace (manifests live in `_meta`
  // root and are immutable + UUID-named, so branch and main commits
  // reference each other's file groups freely — a branch fork is one
  // O(metadata) commit, no data movement). Everything else — optimistic
  // create-if-absent publish, lease, snapshot/manifest caches — applies
  // per log, so branch commits contend only with that branch's writers.

  /** Where THIS log's version files (and its commit lock) live. */
  private val versionsDir =
    branch.map(b => new HPath(metaDir, s"branches/$b")).getOrElse(metaDir)

  /** The log of branch `name` over the same table. Branch names share
    * the ref-name grammar; forks of forks are not modeled (branches
    * hang off the table, not off each other).
    */
  def branchLog(name: String): MetadataLog = {
    require(RefName.matches(name), s"invalid branch name '$name'")
    new MetadataLog(tableDir, conf, Some(name))
  }

  def listBranches(): Seq[String] =
    try metaFs.listStatus(new HPath(metaDir, "branches")).toSeq
      .filter(_.isDirectory).map(_.getPath.getName).sorted
    catch { case _: java.io.FileNotFoundException => Nil }

  /** Every log over this table — main plus all branches, this one
    * included. File/manifest liveness for GC must union the whole
    * family: a data file referenced only from a branch is live.
    */
  def family(): Seq[MetadataLog] = {
    val main = if (branch.isEmpty) this else new MetadataLog(tableDir, conf)
    main +: main.listBranches().map(b =>
      if (branch.contains(b)) this else main.branchLog(b))
  }

  private def versionFile(v: Int): HPath = new HPath(versionsDir, f"v$v%08d.json")

  /** The table root as a java.nio path when it RESOLVES to the local
    * filesystem — gates the hard-link publish fast path. The check must
    * consult the resolved FileSystem, not the raw URI: a scheme-less
    * path on a cluster with `fs.defaultFS=hdfs://…` resolves to HDFS
    * for every read/list in this class, and routing only the publish
    * through java.nio would split-brain the commit (published locally,
    * invisible on the filesystem everything else uses).
    */
  private def localPath(p: HPath): Option[java.nio.file.Path] = {
    val qualified = fs.makeQualified(p)
    if (qualified.toUri.getScheme == "file")
      Some(java.nio.file.Paths.get(qualified.toUri.getPath))
    else None
  }

  private def readString(p: HPath): String = {
    val in = metaFs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  private def writeString(p: HPath, s: String): Unit = {
    val out = metaFs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  // ---- commit lease (non-atomic-rename stores) -----------------------
  // `rename` on bare object stores is check-then-copy: two writers can
  // both observe "v5 absent" and both publish, the second silently
  // clobbering the first. When enabled, writers serialize on a
  // create-if-absent lock file so at most one is inside the publish
  // window at a time; expiry bounds the damage of a crashed holder.
  //
  // Soundness rests on the store's `create(path, overwrite=false)`
  // being ATOMIC — true on HDFS (namenode-arbitrated) and on object
  // stores with conditional writes (S3 If-None-Match, GCS
  // if-generation-match). It is NOT true of Hadoop's raw local
  // filesystem (check-then-create) — local roots never reach this code
  // (they take the hard-link publish path, atomic on its own).

  private val leaseEnabled = conf.getBoolean("graft.commit.lease.enabled", false)
  private val leaseDurationMs =
    math.max(1L, conf.getLong("graft.commit.lease.duration-ms", 60000L))

  /** Identity for lease fencing — per LOG HANDLE, so two handles in one
    * JVM contend like two processes would.
    */
  private val writerId = java.util.UUID.randomUUID().toString

  private def lockFile: HPath = new HPath(versionsDir, "commit.lock")

  /** (writer, expiryMs) of the current lease holder; None when absent
    * or unreadable (a torn lock write reads as absent — the next acquire
    * attempt simply finds the file present and waits out its expiry).
    */
  private def readLease(): Option[(String, Long)] =
    try {
      import org.json4s._
      val j = org.json4s.jackson.JsonMethods.parse(readString(lockFile))
      for {
        w <- (j \ "writer") match { case JString(s) => Some(s); case _ => None }
        e <- (j \ "expiry") match { case JInt(v) => Some(v.toLong); case _ => None }
      } yield (w, e)
    } catch {
      case _: java.io.FileNotFoundException => None
      case _: com.fasterxml.jackson.core.JacksonException => None
    }

  /** Take the lease: create-if-absent loop with jittered backoff,
    * stealing expired holders. Bounded at 2 lease terms of waiting so a
    * wedged store surfaces as an error, not a hang.
    */
  private def acquireLease(): Unit = {
    val deadline = System.currentTimeMillis() + 2 * leaseDurationMs
    while (true) {
      val now = System.currentTimeMillis()
      val won =
        try {
          val out = metaFs.create(lockFile, false) // throws when present
          try out.write(
            s"""{"writer": "$writerId", "expiry": ${now + leaseDurationMs}}"""
              .getBytes(StandardCharsets.UTF_8))
          finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      if (won) return
      readLease() match {
        case Some((_, expiry)) if expiry < System.currentTimeMillis() =>
          deleteQuiet(lockFile) // expired: steal (next loop re-creates)
        case Some(_) => ()
        case None =>
          // lock exists (create lost) but carries no readable lease: a
          // claimant that crashed between create and content write, or
          // a torn in-flight write. The content never self-expires, so
          // fall back to the FILE's age — steal once it has outlived a
          // full lease term. Without this, one crashed claimant wedges
          // every writer until the acquire deadline.
          try {
            val age = System.currentTimeMillis() -
              metaFs.getFileStatus(lockFile).getModificationTime
            if (age > leaseDurationMs) deleteQuiet(lockFile)
          } catch { case _: java.io.FileNotFoundException => () }
      }
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"commit lease on $tableDir unavailable after ${2 * leaseDurationMs} ms " +
            s"(holder: ${readLease()})")
      Thread.sleep(25 + Random.nextLong(50))
    }
  }

  /** Fencing check: the lease is still OURS and unexpired. Re-read
    * immediately before the publishing rename — a holder that slept past
    * expiry and was stolen from must NOT publish.
    */
  private def holdsLease(): Boolean =
    readLease().exists { case (w, e) =>
      w == writerId && e >= System.currentTimeMillis()
    }

  private def releaseLease(): Unit =
    if (readLease().exists(_._1 == writerId)) { deleteQuiet(lockFile); () }

  /** Atomically publish `content` at `target` iff no file exists there.
    * Returns true when this writer won. Never leaves a partial target:
    * content always lands in a temp file first and appears at `target`
    * via link/rename.
    */
  private def publishAtomic(target: HPath, content: String): Boolean =
    localPath(target) match {
      case Some(lp) =>
        val dir = lp.getParent
        java.nio.file.Files.createDirectories(dir)
        val tmp = java.nio.file.Files.createTempFile(dir, ".publish-", ".json.tmp")
        // the temp file must not outlive this call on ANY exit — a
        // permission/disk-full error mid-link would otherwise leak
        // .publish-*.json.tmp files into _meta forever
        try {
          java.nio.file.Files.writeString(tmp, content)
          try { java.nio.file.Files.createLink(lp, tmp); true }
          catch {
            case _: java.nio.file.FileAlreadyExistsException => false
            case _: UnsupportedOperationException =>
              // FS without hard links. ATOMIC_MOVE is NOT create-if-absent:
              // POSIX rename silently replaces an existing target, so two
              // racing committers would both "win" and the first winner's
              // file would be clobbered. Files.copy without REPLACE_EXISTING
              // opens the target CREATE_NEW — the existence check is atomic
              // at open, before any bytes land.
              try { java.nio.file.Files.copy(tmp, lp); true }
              catch { case _: java.nio.file.FileAlreadyExistsException => false }
          }
        } finally java.nio.file.Files.deleteIfExists(tmp)
      case None =>
        metaFs.mkdirs(target.getParent)
        if (!leaseEnabled) renamePublish(target, content)
        else {
          acquireLease()
          try {
            // fenced: a holder that slept past expiry and was stolen
            // from must not publish — report a conflict so the commit
            // loop re-reads the parent and retries under a fresh lease
            if (!holdsLease()) false
            else renamePublish(target, content)
          } finally releaseLease()
        }
    }

  /** The write-temp + rename publish (non-local branch's primitive). */
  private def renamePublish(target: HPath, content: String): Boolean = {
    val tmp = new HPath(target.getParent,
      s".publish-${java.util.UUID.randomUUID().toString.take(12)}.tmp")
    writeString(tmp, content)
    var won = false
    try {
      won = try metaFs.rename(tmp, target)
            catch { case _: java.io.IOException => false }
    } finally if (!won) deleteQuiet(tmp)
    // rename returning false means EITHER "destination exists"
    // (a lost race — retryable) or an unrelated failure
    // (permissions, dead namenode). Only the first may burn a
    // retry; anything else must surface as the IO error it is,
    // not as a bogus "commit conflict after N retries".
    if (!won && !metaFs.exists(target))
      throw new java.io.IOException(
        s"atomic publish to $target failed without a competing file " +
          "(rename returned false); check filesystem health/permissions")
    won
  }

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
      Snapshot.manifestFromJson(readString(new HPath(metaDir, relPath)))
    })

  /** Publish a new immutable manifest for `files`; returns the group
    * (with a summary when the table schema is supplied — the write
    * paths always do, so new snapshots carry manifest-skip metadata).
    */
  def writeManifest(files: Seq[DataFile],
                    schema: Option[org.apache.spark.sql.types.StructType] = None): FileGroup = {
    metaFs.mkdirs(metaDir)
    val name = s"m-${java.util.UUID.randomUUID().toString.take(16)}.json"
    writeString(new HPath(metaDir, name), Snapshot.manifestToJson(files))
    manifestCache.put(name, files)
    FileGroup(name, files, schema)
  }

  /** Delete tolerating absence (some FileSystems throw where local
    * returns false); returns whether anything was removed. Metadata
    * written before the raw-local switch carries `.crc` sidecars from
    * Hadoop's ChecksumFileSystem; the raw FS won't clean those
    * implicitly, so sweep the sidecar alongside its file.
    */
  private def deleteQuiet(p: HPath, recursive: Boolean = false): Boolean = {
    val removed =
      try metaFs.delete(p, recursive)
      catch { case _: java.io.FileNotFoundException => false }
    if ((metaFs ne fs) && !recursive && Option(p.getParent).isDefined) {
      try metaFs.delete(new HPath(p.getParent, s".${p.getName}.crc"), false)
      catch { case _: java.io.FileNotFoundException => () }
    }
    removed
  }

  def deleteManifest(relPath: String): Unit = {
    manifestCache.remove(relPath)
    deleteQuiet(new HPath(metaDir, relPath))
    ()
  }

  def exists(): Boolean = currentVersion().isDefined

  def listVersions(): Seq[Int] =
    try metaFs.listStatus(versionsDir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt
      }
      .sorted
    catch { case _: java.io.FileNotFoundException => Nil }

  def currentVersion(): Option[Int] = listVersions().lastOption

  /** Published snapshot files are immutable, so parsed snapshots cache
    * per version like manifests do — `current()` runs on every table
    * operation (property lookups, schema reads, write planning) and
    * must not re-read + re-parse the same JSON each time. Freshness
    * still comes from the directory listing in `currentVersion()`;
    * only the (version → parsed snapshot) step is cached. `delete`
    * (expire_snapshots) invalidates its entry.
    */
  private val snapshotCache =
    scala.collection.concurrent.TrieMap.empty[Int, Snapshot]

  def read(version: Int): Snapshot =
    snapshotCache.getOrElseUpdate(version,
      Snapshot.fromJson(readString(versionFile(version)), readManifest))

  def current(): Option[Snapshot] = currentVersion().map(read)

  def snapshots(): Seq[Snapshot] = listVersions().map(read)

  def delete(version: Int): Unit = {
    snapshotCache.remove(version)
    deleteQuiet(versionFile(version))
    ()
  }

  // ---- named refs (tags) ---------------------------------------------
  // One file per ref (`_meta/ref-<name>.json`): create goes through the
  // same atomic create-if-absent publish as the commit protocol
  // (duplicate tag = natural failure, no read-modify-write race, and a
  // crash can never leave a partial ref file), drop is a delete,
  // listing is a directory scan — refs inherit the commit protocol's
  // portability story.

  private val RefName = "^[A-Za-z0-9][A-Za-z0-9._-]*$".r

  private def refFile(name: String): HPath = {
    require(RefName.matches(name),
      s"invalid ref name '$name' (letters, digits, dot, underscore, dash)")
    new HPath(metaDir, s"ref-$name.json")
  }

  def createTag(name: String, version: Int): Unit = {
    // refs live in the metadata root and name MAIN-log versions; a tag
    // against a branch-local version number would silently pin the
    // wrong snapshot
    require(branch.isEmpty, "tags are main-log scoped; fast-forward first")
    if (!publishAtomic(refFile(name), s"""{"version": $version}"""))
      throw new IllegalStateException(s"tag '$name' already exists")
  }

  def dropTag(name: String): Boolean = deleteQuiet(refFile(name))

  def tag(name: String): Option[Int] =
    try {
      import org.json4s._
      val j = org.json4s.jackson.JsonMethods.parse(readString(refFile(name)))
      (j \ "version") match {
        case JInt(v) => Some(v.toInt)
        case _ => None
      }
    } catch {
      case _: java.io.FileNotFoundException => None
      // an unparseable ref (pre-port partial write, manual damage) reads
      // as absent rather than poisoning tags()/time travel. ONLY parse
      // failures though: a transient IO error (network, auth, throttle)
      // must surface as the IO error it is — "tag absent" would send
      // time travel to 'unknown tag' and let expireSnapshots collect a
      // tagged version during an outage.
      case _: com.fasterxml.jackson.core.JacksonException => None
    }

  def tags(): Map[String, Int] =
    try metaFs.listStatus(metaDir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("ref-") && s.endsWith(".json") =>
        s.stripPrefix("ref-").stripSuffix(".json")
      }
      .flatMap(n => tag(n).map(n -> _))
      .toMap
    catch { case _: java.io.FileNotFoundException => Map.empty }

  /** Publish `build(parent)` as the next version. `build` is re-invoked
    * with the freshly-read parent on every retry so the caller always
    * commits against the latest table state.
    */
  /** Post-commit hook: [[graft.table.GraftTable]] registers Spark-side
    * cache invalidation here, so EVERY internal write path (loader,
    * MV refresh, compaction, expire — none of which pass through
    * Spark's DSv2 write-path cache refresh) recaches any cached plan
    * over this table. Must never fail a commit that already published.
    */
  @volatile private var commitListener: () => Unit = () => ()
  private[graft] def onCommit(f: () => Unit): Unit = commitListener = f

  def commit(build: Option[Snapshot] => Snapshot,
             retries: Int = 10, minWaitMs: Long = 100, maxWaitMs: Long = 60000): Snapshot = {
    metaFs.mkdirs(versionsDir)
    var attempt = 0
    while (true) {
      val parent = current()
      val nextVersion = parent.map(_.version + 1).getOrElse(0)
      val built = build(parent)
      val snap = built.copy(
        version = nextVersion,
        parentId = parent.map(_.snapshotId),
        timestampMs = System.currentTimeMillis(),
        // normalize the name-evolution log: entries covering no live
        // group can never be consulted again (compaction rewrites old
        // groups to a fresh top seq, which is how the log — and the
        // scan perks its presence suspends — naturally clears)
        schemaLog = {
          val covered = built.fileGroups
            .map(g => built.schemaLog.indexWhere(g.seq <= _._1))
            .filter(_ >= 0).toSet
          if (covered.size == built.schemaLog.size) built.schemaLog
          else built.schemaLog.zipWithIndex.collect { case (e, i) if covered(i) => e }
        })
      if (publishAtomic(versionFile(nextVersion), Snapshot.toJson(snap))) {
        snapshotCache.put(nextVersion, snap)
        try commitListener() catch { case _: Throwable => () }
        return snap
      }
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

  /** Remove the whole log. For the MAIN log this drops the table's
    * entire metadata tree, branches included; for a branch log only
    * that branch's version chain goes (shared manifests stay — they
    * may be referenced elsewhere; orphan GC sweeps the unreferenced
    * ones by family-wide liveness).
    */
  def destroy(): Unit = {
    snapshotCache.clear()
    manifestCache.clear()
    deleteQuiet(if (branch.isDefined) versionsDir else metaDir, recursive = true)
    ()
  }
}

object MetadataLog {
  /** Checksum-free view of a filesystem. Hadoop's `file:` FS is a
    * [[org.apache.hadoop.fs.LocalFileSystem]] (a ChecksumFileSystem):
    * every create writes a `.crc` sidecar and every read re-verifies
    * against it — redundant on local disk and a measurable tax on
    * metadata/footer IO. Its raw inner FS skips both. Any other
    * filesystem (HDFS, S3A, mocks) passes through untouched: remote
    * stores own their integrity story, and the FileSystem.CACHE means
    * mutating checksum flags on the shared instance would leak into
    * Spark's own IO — so we swap instances instead of flags.
    */
  def rawIfLocal(fs: FileSystem): FileSystem = fs match {
    case local: org.apache.hadoop.fs.LocalFileSystem => local.getRaw
    case other => other
  }

  /** Recursively list the regular files under `dir`, tolerating its
    * absence. On local filesystems this walks with `listStatus`:
    * Hadoop's `listFiles(recursive)` materializes a LocatedFileStatus
    * per entry, whose construction loads POSIX permissions by shelling
    * out when native libhadoop is absent — ~10 ms per entry, so a
    * partitioned commit listing ~100 directories pays over a second
    * before reading a single footer (measured 1.5 s vs 0.005 s for the
    * same 168-entry tree). `listStatus` keeps permissions lazy and never
    * pays that. Non-local filesystems keep `listFiles(recursive)`: on
    * object stores it is one flat LIST (a round trip per ~1000 keys),
    * where a per-directory walk would be a round trip per "directory".
    * Checksum sidecars are filtered on both branches (the local walk
    * runs on the RAW fs, which exposes `.crc` files a checksummed
    * listing hides).
    */
  def listFilesRecursive(fs: FileSystem, dir: HPath): Seq[org.apache.hadoop.fs.FileStatus] =
    fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem | _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val raw = rawIfLocal(fs)
        def walk(p: HPath): Seq[org.apache.hadoop.fs.FileStatus] =
          raw.listStatus(p).toSeq.flatMap { st =>
            if (st.isDirectory) walk(st.getPath)
            else if (st.getPath.getName.startsWith(".")) Nil // .crc sidecars
            else Seq(st)
          }
        try walk(dir)
        catch { case _: java.io.FileNotFoundException => Nil }
      case other =>
        val buf = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
        try {
          val it = other.listFiles(dir, true)
          while (it.hasNext) {
            val st = it.next()
            if (st.isFile) buf += st
          }
        } catch { case _: java.io.FileNotFoundException => () }
        buf.result()
    }
}
