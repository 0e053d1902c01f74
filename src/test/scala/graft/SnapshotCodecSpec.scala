package graft

import graft.meta.{DataFile, Snapshot}
import graft.table.Projection

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SnapshotCodecSpec extends AnyFunSuite with Matchers {

  private val schema = Projection.assignFieldIds(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampNTZType),
    StructField("v", ArrayType(FloatType)))))

  private def sample = Snapshot(
    version = 3, snapshotId = 123456789L, parentId = Some(42L),
    timestampMs = 1700000000123L, operation = "append",
    schema = schema, schemaVersion = 1,
    partitionSpec = Some("day(ts)"),
    properties = Map("format-version" -> "2", "k" -> "v"),
    files = Seq(
      DataFile("data/ab/part-0.parquet", 100, 2048,
        Some(Map("ts_day" -> Some("2024-01-15")))),
      DataFile("data/ab/part-1.parquet", 7, 99,
        Some(Map("ts_day" -> None))), // Hive default (null) partition
      DataFile("data/cd/part-0.parquet", 0, 10, None)))

  test("JSON round-trip preserves every field") {
    val s = sample
    val back = Snapshot.fromJson(Snapshot.toJson(s))
    back shouldBe s
  }

  test("field IDs survive the round-trip inside schema metadata") {
    val back = Snapshot.fromJson(Snapshot.toJson(sample))
    Projection.fieldId(back.schema("id")) shouldBe Some(1L)
    Projection.fieldId(back.schema("v")) shouldBe Some(3L)
  }

  test("rowCount sums file rows") {
    sample.rowCount shouldBe 107
  }

  test("None vs Some(null) partition values are distinguished") {
    val back = Snapshot.fromJson(Snapshot.toJson(sample))
    back.files(1).partitionValues shouldBe Some(Map("ts_day" -> None))
    back.files(2).partitionValues shouldBe None
  }
}
