package graft

import java.nio.file.Files
import java.time.Instant

import graft.config.{LoaderConfig, WriteMode}
import graft.loader.Loader
import graft.sources.JsonIngest
import graft.table.{GraftCatalog, TableIdent}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** End-to-end parity with the reference's example scenarios 1–5
  * (`examples/advanced_scenarios.py:20-198`): the same dict-shaped
  * inputs through messy ingest + loader + table, with the same
  * row-count verifications (and value checks the reference only logs).
  */
class ScenarioSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def cat() = GraftCatalog(spark, Files.createTempDirectory("graft-scen").toString)

  private def rec(kvs: (String, Any)*): JsonIngest.Record = kvs

  private val day1: Seq[JsonIngest.Record] = Seq(
    rec("id" -> 1, "category" -> "A", "ts" -> "2023-01-01", "value" -> 100),
    rec("id" -> 2, "category" -> "B", "ts" -> "2023-01-01", "value" -> 200))

  test("scenario 1: initial append, day-partitioned on the injected load timestamp") {
    val c = cat()
    val id = TableIdent("default", "s1")
    val loader = new Loader(c, LoaderConfig(
      writeMode = WriteMode.Append,
      partitionCol = Some("day(dttm)"),
      schemaEvolution = true,
      loadTimestamp = Some(Instant.parse("2023-06-01T10:00:00Z")),
      loadTsCol = "dttm"))
    loader.loadData(JsonIngest.createDataFrame(spark, day1), id)
    val t = c.load(id)
    t.scan().count() shouldBe 2
    t.schema.fieldNames should contain("dttm")
    t.scan().select("dttm").distinct().count() shouldBe 1 // constant stamp
    t.currentOrFail().partitionSpec shouldBe Some("day(dttm)")
  }

  test("scenario 2: append into a new month partition") {
    val c = cat()
    val id = TableIdent("default", "s2")
    val loader = new Loader(c, LoaderConfig(
      writeMode = WriteMode.Append, partitionCol = Some("month(ts)"), schemaEvolution = true))
    loader.loadData(JsonIngest.createDataFrame(spark, day1), id)
    new Loader(c, LoaderConfig(writeMode = WriteMode.Append)).loadData(
      JsonIngest.createDataFrame(spark, Seq(
        rec("id" -> 3, "category" -> "A", "ts" -> "2023-01-02", "value" -> 150))), id)
    c.load(id).scan().count() shouldBe 3
    // P5: the string ts column was promoted for the month transform
    c.load(id).schema("ts").dataType shouldBe org.apache.spark.sql.types.TimestampNTZType
  }

  test("scenario 3: idempotent replace of day 1") {
    val c = cat()
    val id = TableIdent("default", "s3")
    val base = day1 :+ rec("id" -> 3, "category" -> "A", "ts" -> "2023-01-02", "value" -> 150)
    new Loader(c, LoaderConfig(writeMode = WriteMode.Append,
      partitionCol = Some("ts"), schemaEvolution = true))
      .loadData(JsonIngest.createDataFrame(spark, base), id)
    val corrected = Seq(
      rec("id" -> 1, "category" -> "A", "ts" -> "2023-01-01", "value" -> 999),
      rec("id" -> 2, "category" -> "B", "ts" -> "2023-01-01", "value" -> 200))
    // python-style == accepted and normalized (config.py parity)
    new Loader(c, LoaderConfig(writeMode = WriteMode.Append,
      replaceFilter = Some("ts == '2023-01-01'")))
      .loadData(JsonIngest.createDataFrame(spark, corrected), id)
    val t = c.load(id)
    t.scan().count() shouldBe 3
    t.scan().where("id = 1").select("value").collect()(0).getLong(0) shouldBe 999L
    t.scan().where("id = 3").count() shouldBe 1 // day 2 untouched
  }

  test("scenario 4: schema evolution adds new_col") {
    val c = cat()
    val id = TableIdent("default", "s4")
    new Loader(c, LoaderConfig(writeMode = WriteMode.Append,
      partitionCol = Some("ts"), schemaEvolution = true))
      .loadData(JsonIngest.createDataFrame(spark, Seq(day1.head)), id)
    new Loader(c, LoaderConfig(writeMode = WriteMode.Append, schemaEvolution = true))
      .loadData(JsonIngest.createDataFrame(spark, Seq(
        rec("id" -> 2, "category" -> "B", "ts" -> "2023-01-02", "value" -> 200,
          "new_col" -> "extra_info"))), id)
    val t = c.load(id)
    t.scan().count() shouldBe 2
    t.schema.fieldNames should contain("new_col")
    t.scan().where("id = 1").select("new_col").collect()(0).isNullAt(0) shouldBe true
  }

  test("scenario 5: full overwrite with an evolved schema") {
    val c = cat()
    val id = TableIdent("default", "s5")
    new Loader(c, LoaderConfig(writeMode = WriteMode.Append,
      partitionCol = Some("ts"), schemaEvolution = true))
      .loadData(JsonIngest.createDataFrame(spark, day1), id)
    new Loader(c, LoaderConfig(writeMode = WriteMode.Overwrite, schemaEvolution = true))
      .loadData(JsonIngest.createDataFrame(spark, Seq(
        rec("id" -> 99, "category" -> "Z", "ts" -> "2023-12-31", "value" -> 0,
          "new_col" -> "reset"))), id)
    val t = c.load(id)
    t.scan().count() shouldBe 1
    t.scan().select("id").collect()(0).getLong(0) shouldBe 99L
    t.schema.fieldNames should contain("new_col")
  }

  test("scenario 6: one table's lifecycle through the round-11 surfaces") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val c = cat()
    val t = c.ensure(TableIdent("default", "s6"), Some("day"))
    // two days of raw events
    t.append(Seq((1L, "d1", 10L), (2L, "d1", 20L), (3L, "d2", 30L))
      .toDF("id", "day", "amount"))
    // day d1's pipeline re-runs with corrected rows: dynamic overwrite
    t.overwriteDynamic(Seq((1L, "d1", 11L), (2L, "d1", 21L))
      .toDF("id", "day", "amount"))
    // a conditional general merge applies late adjustments
    t.mergeRows(
      Seq((2L, 100L), (3L, 0L), (9L, 5L)).toDF("_s_0", "_s_1"),
      "_t_id = _s_0",
      matched = Seq(
        graft.table.MergeClause("update", Some("_s_1 > 50"),
          Seq(("amount", "_t_amount + _s_1"))),
        graft.table.MergeClause("delete", Some("_s_1 = 0"), Nil)),
      notMatched = Seq(
        graft.table.MergeClause("insert", None,
          Seq(("id", "_s_0"), ("day", "'d3'"), ("amount", "_s_1")))),
      notMatchedBySource = Nil,
      pruneKeys = Seq(("id", "_s_0")), equiCondition = true)
    // rename survives everything above: old files map by field id
    t.renameColumn("amount", "value")
    t.scan().orderBy("id").select("id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((1L, 11L), (2L, 121L), (9L, 5L)) // 3 deleted; 2 = 21+100; 9 inserted
    // post-rename writes and the changelog agree on the new name
    t.append(Seq((10L, "d4", 7L)).toDF("id", "day", "value"))
    val head = t.currentOrFail().version
    val ch = t.scanChangesBetween(head - 1, head)
    ch.columns should contain("value")
    ch.where(col("_change_type") === "insert").count() shouldBe 1
    // compact migrates every file to the current naming; history clears
    t.compact(1)
    t.currentOrFail().schemaLog shouldBe empty
    t.scan().agg(sum(col("value"))).head.getLong(0) shouldBe (11 + 121 + 5 + 7)
  }
}
