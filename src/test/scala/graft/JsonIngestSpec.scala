package graft

import graft.sources.JsonIngest

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Messy list-of-dicts ingestion parity (`utils/arrow.py:19-72,137-156`,
  * `tests/test_arrow_utils.py:18-82`).
  */
class JsonIngestSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("nested dict/list values are JSON-serialized to strings") {
    // golden values per tests/test_arrow_utils.py:34-43
    JsonIngest.toJsonString(Map("k" -> "v", "n" -> 2)) shouldBe """{"k":"v","n":2}"""
    JsonIngest.toJsonString(Seq("x", 1, true)) shouldBe """["x",1,true]"""
    JsonIngest.toJsonString(null) shouldBe "null"
    JsonIngest.toJsonString("a\"b\n") shouldBe "\"a\\\"b\\n\""
  }

  test("column set is union of keys in first-seen order") {
    val df = JsonIngest.createDataFrame(spark, Seq(
      Seq("a" -> 1, "b" -> "x"),
      Seq("b" -> "y", "c" -> 2.5)))
    df.schema.fieldNames.toSeq shouldBe Seq("a", "b", "c")
  }

  test("type inference: ints->Long, mixed numeric->Double, mixed->String fallback") {
    val df = JsonIngest.createDataFrame(spark, Seq(
      Seq("i" -> 1, "f" -> 1, "m" -> 7, "s" -> "x", "b" -> true),
      Seq("i" -> 2, "f" -> 2.5, "m" -> "seven", "s" -> "y", "b" -> false)))
    df.schema("i").dataType shouldBe LongType
    df.schema("f").dataType shouldBe DoubleType
    df.schema("m").dataType shouldBe StringType // mixed ⇒ string fallback
    df.schema("s").dataType shouldBe StringType
    df.schema("b").dataType shouldBe BooleanType
    // scalar str() coercion of the mixed column's int value
    df.orderBy("i").collect().map(_.getAs[String]("m")).toSeq shouldBe Seq("7", "seven")
  }

  test("all-null columns become string (utils/types.py:60-61)") {
    val df = JsonIngest.createDataFrame(spark, Seq(
      Seq("id" -> 1, "ghost" -> null),
      Seq("id" -> 2)))
    df.schema("ghost").dataType shouldBe StringType
    df.collect().foreach(_.isNullAt(1) shouldBe true)
  }

  test("chunked splits 25 records into 10/10/5 (test_arrow_utils.py:46-53)") {
    val records = (1 to 25).map(i => Seq("id" -> i): JsonIngest.Record)
    val sizes = JsonIngest.chunked(spark, records.iterator, batchSize = 10)
      .map(_.count()).toSeq
    sizes shouldBe Seq(10L, 10L, 5L)
  }

  test("zero records raise") {
    an[IllegalArgumentException] should be thrownBy
      JsonIngest.createDataFrame(spark, Seq.empty)
  }
}
