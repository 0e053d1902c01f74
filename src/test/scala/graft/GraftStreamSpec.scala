package graft

import java.nio.file.Files

import graft.config.{LoaderConfig, WriteMode}
import graft.streaming.GraftStream
import graft.table.{GraftCatalog, TableIdent}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Structured Streaming → graft table: one micro-batch ⇒ one snapshot,
  * first-batch overwrite semantics, checkpointed batch ids.
  */
class GraftStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def cat() = GraftCatalog(spark, Files.createTempDirectory("graft-stream").toString)

  test("each micro-batch commits one append snapshot") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val c = cat()
    val id = TableIdent("ns", "s1")
    val ms = MemoryStream[(Long, String)]
    val q = GraftStream.writer(ms.toDF().toDF("id", "name"), c, id,
        LoaderConfig(writeMode = WriteMode.Append))
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    try {
      ms.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      ms.addData((3L, "c")); q.processAllAvailable()
      val t = c.load(id)
      t.snapshots().size shouldBe 2
      t.snapshots().map(_.operation).distinct shouldBe Seq("append")
      t.scan().count() shouldBe 3
    } finally q.stop()
  }

  test("overwrite mode: batch 0 overwrites pre-existing data, later batches append") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val c = cat()
    val id = TableIdent("ns", "s2")
    // pre-existing data the stream's FIRST batch must clobber exactly once
    c.ensure(id).append(Seq((100L, "old")).toDF("id", "name"))
    val ms = MemoryStream[(Long, String)]
    val q = GraftStream.writer(ms.toDF().toDF("id", "name"), c, id,
        LoaderConfig(writeMode = WriteMode.Overwrite))
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    try {
      ms.addData((1L, "a")); q.processAllAvailable()
      ms.addData((2L, "b")); q.processAllAvailable()
      val ids = c.load(id).scan().select("id").collect().map(_.getLong(0)).sorted
      ids.toSeq shouldBe Seq(1L, 2L) // old row gone once, both batches kept
    } finally q.stop()
  }

  test("load timestamp is stamped on every micro-batch (P4)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val c = cat()
    val id = TableIdent("ns", "s3")
    val ts = java.time.Instant.parse("2024-06-01T00:00:00Z")
    val ms = MemoryStream[(Long, String)]
    val q = GraftStream.writer(ms.toDF().toDF("id", "name"), c, id,
        LoaderConfig(writeMode = WriteMode.Append, loadTimestamp = Some(ts)))
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    try {
      ms.addData((1L, "a")); q.processAllAvailable()
      val t = c.load(id)
      t.schema.fieldNames should contain("_load_dttm")
      t.scan().select("_load_dttm").collect()(0).getTimestamp(0).toInstant shouldBe ts
    } finally q.stop()
  }
}
