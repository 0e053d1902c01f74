package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}

import graft.connector.{GraftViewStore, StoredView}

import org.apache.hadoop.fs.{Path => HPath}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression pins for the view store's write protocol (round-13 torn
  * -read fix + the atomic create-if-absent claim): a reader racing a
  * replace must always parse a COMPLETE document, two racing CREATEs
  * must decide at the filesystem (exactly one wins), and the temp
  * staging files must never linger or surface in listings.
  */
class GraftViewStoreSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def store(): (GraftViewStore, org.apache.hadoop.fs.FileSystem, HPath) = {
    val wh = new HPath(Files.createTempDirectory("graft-viewstore").toString)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (new GraftViewStore(fs, wh), fs, wh)
  }

  private def view(tag: String): StoredView = StoredView(
    sql = s"SELECT '$tag' AS v FROM t",
    currentCatalog = "graft",
    currentNamespace = Seq("ns"),
    schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType))),
    queryColumnNames = Seq("v"),
    columnAliases = Nil,
    columnComments = Nil,
    properties = Map("tag" -> tag),
    schemaMode = "SchemaCompensation")

  test("racing CREATE VIEWs: exactly one wins, the loser sees already-exists") {
    val pool = Executors.newFixedThreadPool(2)
    try {
      for (round <- 0 until 20) {
        val (vs, _, _) = store()
        val barrier = new CyclicBarrier(2)
        val results = (0 until 2).map { i =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            override def call(): Boolean = {
              barrier.await(10, TimeUnit.SECONDS)
              vs.create("ns", "v", view(s"writer$i"), replace = false)
            }
          })
        }
        val wins = results.map(_.get(30, TimeUnit.SECONDS))
        withClue(s"round=$round ") {
          wins.count(identity) shouldBe 1
          // the stored document is the WINNER's, complete
          val stored = vs.load("ns", "v").get
          val winner = wins.indexOf(true)
          stored.properties("tag") shouldBe s"writer$winner"
        }
      }
    } finally pool.shutdownNow()
  }

  test("a reader racing replaces always parses a complete document") {
    val (vs, _, _) = store()
    vs.create("ns", "v", view("gen0"), replace = false) shouldBe true
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    val started = new CountDownLatch(1)
    val reader = new Thread(() => {
      started.countDown()
      while (!stop.get()) {
        try {
          val sv = vs.load("ns", "v")
          // the view exists throughout — a not-found or torn document
          // is the regression this pins
          require(sv.isDefined, "view vanished mid-replace")
          require(sv.get.properties("tag").startsWith("gen"),
            s"torn document: ${sv.get.properties}")
          reads.incrementAndGet()
        } catch {
          case t: Throwable => failures.compareAndSet(null, t); stop.set(true)
        }
      }
    })
    reader.start()
    started.await(10, TimeUnit.SECONDS)
    for (gen <- 1 to 120)
      vs.create("ns", "v", view(s"gen$gen"), replace = true) shouldBe true
    stop.set(true)
    reader.join(10000)
    Option(failures.get()).foreach(t => fail(s"reader failed: $t"))
    reads.get() should be > 0L
    vs.load("ns", "v").get.properties("tag") shouldBe "gen120"
  }

  test("temp staging files never linger or surface in list()") {
    val (vs, fs, wh) = store()
    vs.create("ns", "a", view("x"), replace = false)
    for (i <- 1 to 10) vs.create("ns", "a", view(s"x$i"), replace = true)
    vs.create("ns", "a", view("dup"), replace = false) shouldBe false
    vs.list("ns") shouldBe Seq("a")
    val leftovers = fs.listStatus(new HPath(wh, "ns/_views"))
      .map(_.getPath.getName).filterNot(_ == "a.json")
    leftovers shouldBe empty
  }

  test("create-if-absent is case-insensitive like lookup") {
    val (vs, _, _) = store()
    vs.create("ns", "Daily", view("orig"), replace = false) shouldBe true
    vs.create("ns", "daily", view("clash"), replace = false) shouldBe false
    vs.load("ns", "DAILY").get.properties("tag") shouldBe "orig"
    // a replace under a different case keeps ONE file, new casing
    vs.create("ns", "daily", view("repl"), replace = true) shouldBe true
    vs.list("ns") shouldBe Seq("daily")
  }

  // Only the NO-HARD-LINKS signatures degrade the atomic createLink
  // claim to probe+rename; everything else (EPERM, quota, transient
  // IO) must re-raise — degrading exactly when the filesystem
  // misbehaves would let two racing CREATEs both win.
  test("createLink degradation triggers only on linkless signatures") {
    import graft.connector.GraftViewStore.linklessSignature
    import java.nio.file.FileSystemException
    linklessSignature(new UnsupportedOperationException()) shouldBe true
    linklessSignature(
      new FileSystemException("f", null, "Operation not supported")) shouldBe true
    linklessSignature(
      new FileSystemException("f", null, "Function not implemented")) shouldBe true
    linklessSignature(
      new FileSystemException("f", null, "Invalid cross-device link")) shouldBe true
    linklessSignature(
      new FileSystemException("f", null, "Operation not permitted")) shouldBe false
    linklessSignature(
      new FileSystemException("f", null, "Disk quota exceeded")) shouldBe false
    linklessSignature(new FileSystemException("f")) shouldBe false
    linklessSignature(new RuntimeException("x")) shouldBe false
  }
}
