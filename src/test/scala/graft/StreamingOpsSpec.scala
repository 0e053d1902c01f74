package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.SessionEvent

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class StreamingOpsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked windowed counts finalize once the watermark passes") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val windows = StreamingOps.windowedEventCounts(
      ms.toDF().toDF("ts", "event_type", "value"),
      windowLen = "10 minutes", watermark = "10 minutes")
    val q = windows.writeStream.format("memory").queryName("wincounts")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      ms.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0), (ts(7), "view", 1.0))
      q.processAllAvailable()
      // watermark still inside the first window: nothing finalized
      s.table("wincounts").count() shouldBe 0
      // event far ahead pushes the watermark past 10:10 -> first window emits
      ms.addData((ts(40), "click", 1.0))
      q.processAllAvailable()
      ms.addData((ts(59), "click", 1.0))
      q.processAllAvailable()
      val rows = s.table("wincounts")
        .select(date_format(col("window_start"), "HH:mm").as("w"), col("event_type"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      rows should contain(("10:00", "click", 2L))
      rows should contain(("10:00", "view", 1L))
    } finally q.stop()
  }

  test("streaming dedup drops repeated content across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, String)]
    val deduped = StreamingOps.dedupStream(
      ms.toDF().toDF("id", "text"), contentCols = Seq("text"))
    val q = deduped.writeStream.format("memory").queryName("dedupstream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      ms.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      // dup within the first batch dropped
      s.table("dedupstream").count() shouldBe 2
      // repeats in a LATER micro-batch are dropped by the state store
      ms.addData((4L, "alpha"), (5L, "gamma"), (6L, "beta"))
      q.processAllAvailable()
      val texts = s.table("dedupstream").select("text")
        .collect().map(_.getString(0)).toSet
      texts shouldBe Set("alpha", "beta", "gamma")
      s.table("dedupstream").count() shouldBe 3
    } finally q.stop()
  }

  test("dedup-at-ingest: each micro-batch dedups against the target graft table itself") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val c = graft.table.GraftCatalog(s,
      Files.createTempDirectory("graft-ingest").toString)
    val tbl = c.ensure(graft.table.TableIdent("ns", "ingest"))
    val ms = MemoryStream[(Long, String)]
    // THE LLM ingestion loop: within-batch exact dedup, then the
    // bloom-pruned anti join against the ACCUMULATED table (its row
    // count is free metadata, so the sizing pass is skipped), then one
    // append commit per batch — corpus state lives in the table, not
    // the driver
    val q = ms.toDF().toDF("id", "text").writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val withinBatch = graft.operators.Dedup.exact(batch, Seq("text"), "id")
        val unique = tbl.current() match {
          case Some(snap) =>
            graft.operators.Dedup.exactAgainst(withinBatch, tbl.scan(),
              Seq("text"), "id", expectedExistingKeys = snap.rowCount)
          case None => withinBatch
        }
        if (!unique.isEmpty) { tbl.append(unique); () }
      }
      .start()
    try {
      ms.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      tbl.scan().count() shouldBe 2 // within-batch dup dropped
      ms.addData((4L, "alpha"), (5L, "gamma"), (6L, "beta"))
      q.processAllAvailable()
      // cross-batch dups died against the table; only gamma landed
      tbl.scan().select("text").collect().map(_.getString(0)).toSet shouldBe
        Set("alpha", "beta", "gamma")
      tbl.snapshots().map(_.operation) shouldBe Seq("append", "append")
      // an all-duplicate batch commits nothing
      ms.addData((7L, "alpha"))
      q.processAllAvailable()
      tbl.snapshots().size shouldBe 2
    } finally q.stop()
  }

  test("streaming near-dedup via foreachBatch: fingerprint state survives across batches") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    // retained state = fingerprints only (8 bytes/doc), exactly what a
    // production foreachBatch sink would append to a graft table in the
    // same transaction as the surviving rows
    val retained = scala.collection.mutable.ArrayBuffer.empty[Long]
    val survived = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "text").writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val fps =
          if (retained.isEmpty) s.emptyDataset[Long].toDF("fp")
          else retained.toSeq.toDF("fp")
        val out = graft.operators.Dedup
          .simhashAgainst(batch, fps, "text", "id").collect()
        survived ++= out.map(_.getAs[Long]("id"))
        retained ++= out.map(_.getAs[Long]("fp"))
        ()
      }
      .start()
    try {
      def doc(i: Long) =
        s"the quick brown fox $i jumps over the lazy dog near river $i bank today"
      ms.addData((1L, doc(1)), (2L, doc(2)))
      q.processAllAvailable()
      survived.toSet shouldBe Set(1L, 2L)
      // batch 2: a copy of doc 1 (dropped by CROSS-BATCH state), a
      // reordered doc 2 (same token multiset -> hamming 0, dropped),
      // and a genuinely new doc (kept)
      ms.addData((10L, doc(1)),
        (11L, doc(2).split(" ").reverse.mkString(" ")),
        (12L, "entirely new material with distinct vocabulary here"))
      q.processAllAvailable()
      survived.toSet shouldBe Set(1L, 2L, 12L)
      retained.size shouldBe 3
    } finally q.stop()
  }

  test("watermarked streaming dedup drops identical content at DIFFERENT event times") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val deduped = StreamingOps.dedupStream(
      ms.toDF().toDF("ts", "text"), contentCols = Seq("text"),
      tsCol = Some("ts"), watermark = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedupwm")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      // same content, different event timestamps: only the first survives
      ms.addData((ts(1), "alpha"), (ts(5), "alpha"), (ts(2), "beta"))
      q.processAllAvailable()
      ms.addData((ts(20), "alpha"), (ts(25), "gamma"))
      q.processAllAvailable()
      s.table("dedupwm").select("text").collect().map(_.getString(0)).toSet shouldBe
        Set("alpha", "beta", "gamma")
      s.table("dedupwm").count() shouldBe 3
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap and frees state") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[SessionEvent]
    // NoTimeout keeps the run bounded (a ProcessingTime-timeout query
    // stays alive to fire pending timeouts); gap closure on arrival is
    // the path under test. AvailableNow drains the source then stops.
    val sessions = StreamingOps.sessionize(ms.toDS(), gapMs = 5 * 60 * 1000,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
    // user 1: two bursts separated by >5min -> first burst closes when
    // the second arrives (same micro-batch group processing)
    ms.addData(SessionEvent(1L, ts(0)), SessionEvent(1L, ts(2)),
      SessionEvent(1L, ts(20)), SessionEvent(2L, ts(1)))
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      q.awaitTermination(120000) shouldBe true
      val out = s.table("sessions").as[StreamingOps.SessionOut].collect()
      out.length shouldBe 1
      out(0).user_id shouldBe 1L
      out(0).events shouldBe 2 // the 10:00 + 10:02 burst
      out(0).session_start shouldBe ts(0)
      out(0).session_end shouldBe ts(2)
    } finally q.stop()
  }
}
