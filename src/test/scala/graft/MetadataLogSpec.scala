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
