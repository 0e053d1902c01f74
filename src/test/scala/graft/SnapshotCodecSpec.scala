package graft

import graft.meta.{DataFile, FileGroup, Snapshot}
import graft.table.Projection

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SnapshotCodecSpec extends AnyFunSuite with Matchers {

  private val schema = Projection.assignFieldIds(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampNTZType),
    StructField("v", ArrayType(FloatType)))))

  private val g1 = FileGroup("m-aa.json", Seq(
    DataFile("data/ab/part-0.parquet", 100, 2048,
      Some(Map("ts_day" -> Some("2024-01-15")))),
    DataFile("data/ab/part-1.parquet", 7, 99,
      Some(Map("ts_day" -> None))))) // Hive default (null) partition
  private val g2 = FileGroup("m-bb.json", Seq(
    DataFile("data/cd/part-0.parquet", 0, 10, None)))

  private def sample = Snapshot(
    version = 3, snapshotId = 123456789L, parentId = Some(42L),
    timestampMs = 1700000000123L, operation = "append",
    schema = schema, schemaVersion = 1,
    partitionSpec = Some("day(ts)"),
    properties = Map("format-version" -> "2", "k" -> "v"),
    fileGroups = Seq(g1, g2))

  private val manifests = Map("m-aa.json" -> g1.files, "m-bb.json" -> g2.files)

  test("snapshot JSON round-trip preserves every field via manifest refs") {
    val s = sample
    Snapshot.fromJson(Snapshot.toJson(s), manifests) shouldBe s
  }

  test("schema log (name-evolution history) round-trips with field ids") {
    val old = Projection.assignFieldIds(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampNTZType),
      StructField("v_old", ArrayType(FloatType)))))
    val s = sample.copy(schemaLog = Seq(5L -> old), lastSeq = 7L)
    val rt = Snapshot.fromJson(Snapshot.toJson(s), manifests)
    rt shouldBe s
    rt.schemaLog.head._1 shouldBe 5L
    Projection.fieldId(rt.schemaLog.head._2.fields(2)) shouldBe
      Projection.fieldId(old.fields(2))
    // writeSchemaFor: first covering entry, else current
    rt.writeSchemaFor(3L).fieldNames should contain("v_old")
    rt.writeSchemaFor(6L).fieldNames should contain("v")
    // legacy snapshots (no schema_log key) parse as empty
    Snapshot.fromJson(Snapshot.toJson(sample), manifests).schemaLog shouldBe empty
  }

  test("snapshot JSON stores manifest references, never inline file lists") {
    val json = Snapshot.toJson(sample)
    json should include("m-aa.json")
    (json should not).include("part-0.parquet") // files live in manifests only
  }

  test("manifest JSON round-trips its data files") {
    Snapshot.manifestFromJson(Snapshot.manifestToJson(g1.files)) shouldBe g1.files
  }

  test("field IDs survive the round-trip inside schema metadata") {
    val back = Snapshot.fromJson(Snapshot.toJson(sample), manifests)
    Projection.fieldId(back.schema("id")) shouldBe Some(1L)
    Projection.fieldId(back.schema("v")) shouldBe Some(3L)
  }

  test("rowCount sums file rows across groups") {
    sample.rowCount shouldBe 107
  }

  test("None vs Some(null) partition values are distinguished") {
    val back = Snapshot.fromJson(Snapshot.toJson(sample), manifests)
    back.fileGroups.head.files(1).partitionValues shouldBe Some(Map("ts_day" -> None))
    back.fileGroups(1).files.head.partitionValues shouldBe None
  }
}
