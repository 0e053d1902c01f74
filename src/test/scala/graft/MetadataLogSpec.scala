package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.meta.{MetadataLog, Snapshot}
import graft.table.Projection

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Local disk presented under a non-`file` scheme with HDFS rename
  * semantics (rename FAILS when the destination exists — raw POSIX
  * rename would silently replace it), so tests can drive the
  * rename-based publish branch of [[MetadataLog]] under the contract
  * it targets.
  */
class MockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean =
    !exists(dst) && super.rename(src, dst)
}

/** S3A-shaped rename: check-then-copy with the window between the
  * existence check and the replacing rename WIDENED to tens of
  * milliseconds, so an unserialized two-writer race reliably loses a
  * commit (both observe "absent", both rename, the second clobbers the
  * first). The commit-lease tests drive MetadataLog over this.
  */
class RacyFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "racyfs"
  override def getUri: java.net.URI = java.net.URI.create("racyfs:///")
  // create-if-absent is ATOMIC (O_CREAT|O_EXCL) — the one primitive the
  // commit lease requires of a store, and one real object stores do
  // provide even though their rename is not atomic (HDFS create, GCS
  // if-generation-match:0, S3 conditional PUT If-None-Match).
  // RawLocalFileSystem's own overwrite=false is check-then-create,
  // which would let two lease claimants both "win". BOTH create
  // overloads must be intercepted: `FileSystem.create(path, false)`
  // dispatches through the non-permission overload on
  // RawLocalFileSystem, never reaching the permission-taking one.
  private def atomicCreateIfAbsent(f: org.apache.hadoop.fs.Path): Unit = {
    java.nio.file.Files.createFile(java.nio.file.Paths.get(f.toUri.getPath)); ()
  }
  override def create(f: org.apache.hadoop.fs.Path,
                      permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) atomicCreateIfAbsent(f)
    super.create(f, permission, true, bufferSize, replication, blockSize, progress)
  }
  override def create(f: org.apache.hadoop.fs.Path, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) atomicCreateIfAbsent(f)
    super.create(f, true, bufferSize, replication, blockSize, progress)
  }
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = {
    if (exists(dst)) return false
    Thread.sleep(20) // the non-atomic check-then-copy window
    // POSIX rename replaces an existing destination silently — exactly
    // the lost-commit mode a bare object store exposes
    java.nio.file.Files.move(
      java.nio.file.Paths.get(src.toUri.getPath),
      java.nio.file.Paths.get(dst.toUri.getPath),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    true
  }
}

/** Commit-protocol invariants (M2, `core/config.py:15-17` semantics). */
class MetadataLogSpec extends AnyFunSuite with Matchers {

  private val schema = Projection.assignFieldIds(
    StructType(Seq(StructField("id", LongType))))

  private def snap(op: String) = Snapshot(0, 1L, None, 0L, op, schema, 0, None, Map.empty, Nil)

  private def freshLog() = new MetadataLog(Files.createTempDirectory("mlog"))

  test("versions are sequential; current is the highest") {
    val log = freshLog()
    log.exists() shouldBe false
    log.commit(_ => snap("a")).version shouldBe 0
    log.commit(_ => snap("b")).version shouldBe 1
    log.currentVersion() shouldBe Some(1)
    log.current().get.operation shouldBe "b"
    log.snapshots().map(_.operation) shouldBe Seq("a", "b")
  }

  test("commit stamps parent id and timestamp") {
    val log = freshLog()
    val s0 = log.commit(_ => snap("a"))
    val s1 = log.commit(_ => snap("b"))
    s1.parentId shouldBe Some(s0.snapshotId)
    s1.timestampMs should be >= s0.timestampMs
  }

  test("build callback receives the freshly-read parent on each attempt") {
    val log = freshLog()
    log.commit(_ => snap("base"))
    val seen = new AtomicInteger(0)
    log.commit { parent =>
      seen.incrementAndGet()
      parent.get.operation shouldBe "base"
      snap("next")
    }
    seen.get() shouldBe 1
  }

  test("concurrent committers all land distinct versions") {
    val log = freshLog()
    val threads = (1 to 8).map { i =>
      new Thread(() => { log.commit(_ => snap(s"t$i")): Unit })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    log.listVersions() shouldBe (0 to 7)
    log.snapshots().map(_.operation).toSet.size shouldBe 8
  }

  test("delete removes one version; readers still see the rest") {
    val log = freshLog()
    log.commit(_ => snap("a")); log.commit(_ => snap("b")); log.commit(_ => snap("c"))
    log.delete(1)
    log.listVersions() shouldBe Seq(0, 2)
    log.current().get.operation shouldBe "c"
  }

  test("rename-based publish path (non-local scheme) commits, conflicts, and tags") {
    // a local-disk filesystem that reports a NON-file scheme, forcing
    // MetadataLog.publishAtomic down the write-temp + rename branch the
    // hard-link fast path otherwise shadows on every local test
    val dir = Files.createTempDirectory("mlog-mockfs")
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.setClass("fs.mockfs.impl", classOf[MockFs], classOf[org.apache.hadoop.fs.FileSystem])
    val log = new MetadataLog(
      new org.apache.hadoop.fs.Path("mockfs:" + dir.toString), conf)
    log.commit(_ => snap("a")).version shouldBe 0
    log.commit(_ => snap("b")).version shouldBe 1
    log.snapshots().map(_.operation) shouldBe Seq("a", "b")
    // a competing file at the next version forces a conflict retry: the
    // build callback re-reads the new parent and lands one version later
    Files.writeString(dir.resolve("_meta").resolve("v00000002.json"),
      graft.meta.Snapshot.toJson(snap("intruder").copy(version = 2)))
    val landed = log.commit { p => p.get.version shouldBe 2; snap("c") }
    landed.version shouldBe 3
    // tags publish through the same primitive: duplicates fail cleanly,
    // no partial ref files exist afterwards
    log.createTag("pin", 1)
    log.tag("pin") shouldBe Some(1)
    intercept[IllegalStateException] { log.createTag("pin", 3) }
    log.tag("pin") shouldBe Some(1)
  }

  test("commit lease serializes contending writers on a check-then-copy store") {
    val dir = Files.createTempDirectory("mlog-lease")
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.setClass("fs.racyfs.impl", classOf[RacyFs], classOf[org.apache.hadoop.fs.FileSystem])
    conf.setBoolean("graft.commit.lease.enabled", true)
    val path = new org.apache.hadoop.fs.Path("racyfs:" + dir.toString)
    // one MetadataLog handle per writer: each carries its own lease
    // identity, contending purely through the filesystem
    val logs = (0 until 4).map(_ => new MetadataLog(path, conf))
    // a writer-thread exception must fail the test loudly — a silently
    // dead thread would report as a lost commit and mask the real cause
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = logs.zipWithIndex.map { case (log, i) =>
      new Thread(() =>
        try (0 until 3).foreach { j => log.commit(_ => snap(s"w$i-$j")): Unit }
        catch { case t: Throwable => failures.add(t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    if (!failures.isEmpty) fail(s"writer thread threw: ${failures.peek()}", failures.peek())
    val verify = new MetadataLog(path, conf)
    // RacyFs's widened window clobbers commits when unserialized; under
    // the lease every one of the 12 lands on its own version
    verify.listVersions() shouldBe (0 until 12)
    verify.snapshots().map(_.operation).toSet.size shouldBe 12
    // the lease is released after the last commit
    verify.fs.exists(new org.apache.hadoop.fs.Path(path, "_meta/commit.lock")) shouldBe false
  }

  test("an expired lease is stolen; a live one is waited out") {
    val dir = Files.createTempDirectory("mlog-lease2")
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.setClass("fs.racyfs.impl", classOf[RacyFs], classOf[org.apache.hadoop.fs.FileSystem])
    conf.setBoolean("graft.commit.lease.enabled", true)
    conf.setLong("graft.commit.lease.duration-ms", 400)
    val path = new org.apache.hadoop.fs.Path("racyfs:" + dir.toString)
    val log = new MetadataLog(path, conf)
    log.commit(_ => snap("a")).version shouldBe 0
    val meta = dir.resolve("_meta")
    // a crashed writer's EXPIRED lease must not block commits
    Files.writeString(meta.resolve("commit.lock"),
      s"""{"writer": "dead-writer", "expiry": ${System.currentTimeMillis() - 1000}}""")
    log.commit(_ => snap("b")).version shouldBe 1
    // a LIVE foreign lease is honored: the commit waits for expiry
    // before stealing, so it lands but only after the lease term
    Files.writeString(meta.resolve("commit.lock"),
      s"""{"writer": "slow-writer", "expiry": ${System.currentTimeMillis() + 400}}""")
    val t0 = System.nanoTime()
    log.commit(_ => snap("c")).version shouldBe 2
    val waitedMs = (System.nanoTime() - t0) / 1000000
    waitedMs should be >= 300L
  }

  test("two separate JVMs appending concurrently lose no commits") {
    // thread contention exercises the in-process race; the hard-link
    // protocol's real adversary is a SECOND PROCESS — no shared JVM
    // state, only the filesystem's atomic create-if-absent between them
    val dir = Files.createTempDirectory("mlog-xproc")
    val n = 12
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val procs = Seq("a", "b").map { id =>
      new ProcessBuilder(
        javaBin, "-Xmx512m", "-cp", cp,
        "graft.ConcurrentWriterMain", dir.toString, id, n.toString)
        .redirectErrorStream(true)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .start()
    }
    procs.foreach { p =>
      p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS) shouldBe true
      p.exitValue() shouldBe 0
    }
    val log = new MetadataLog(dir)
    // version monotonicity: a contiguous 0..2n-1 ladder, no gaps
    log.listVersions() shouldBe (0 until 2 * n)
    // no lost commits: the FINAL snapshot carries every writer's every
    // file (each commit appended one group to the freshly-read parent)
    val files = log.current().get.files.map(_.path).toSet
    files shouldBe (0 until n).flatMap(i =>
      Seq(s"data/a-$i.parquet", s"data/b-$i.parquet")).toSet
    // row-count conservation: one row per appended file
    log.current().get.rowCount shouldBe 2L * n
  }
}
