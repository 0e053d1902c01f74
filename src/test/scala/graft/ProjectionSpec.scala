package graft

import graft.table.Projection

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Schema-evolution + field-ID rules (`core/schema.py:52-78,210-251`,
  * parity with `tests/test_iceberg_loader.py:157-198`).
  */
class ProjectionSpec extends AnyFunSuite with Matchers {

  test("assignFieldIds numbers fields 1..n") {
    val s = Projection.assignFieldIds(StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))
    Projection.fieldId(s("a")) shouldBe Some(1L)
    Projection.fieldId(s("b")) shouldBe Some(2L)
  }

  test("evolve appends new columns as nullable with max+1 ids") {
    val current = Projection.assignFieldIds(StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))
    val incoming = StructType(Seq(
      StructField("b", StringType), StructField("c", DoubleType, nullable = false)))
    val evolved = Projection.evolve(current, incoming).get
    evolved.fieldNames.toSeq shouldBe Seq("a", "b", "c")
    evolved("c").nullable shouldBe true
    Projection.fieldId(evolved("a")) shouldBe Some(1L) // preserved
    Projection.fieldId(evolved("b")) shouldBe Some(2L)
    Projection.fieldId(evolved("c")) shouldBe Some(3L) // max+1
  }

  test("evolve is a no-op when nothing is new (case-insensitive)") {
    val current = Projection.assignFieldIds(StructType(Seq(StructField("Col", LongType))))
    Projection.evolve(current, StructType(Seq(StructField("col", StringType)))) shouldBe None
  }

  test("evolution is additive only: drops/renames never remove columns") {
    val current = Projection.assignFieldIds(StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))
    val incoming = StructType(Seq(StructField("z", LongType)))
    val evolved = Projection.evolve(current, incoming).get
    evolved.fieldNames.toSeq shouldBe Seq("a", "b", "z")
  }

  test("ids survive a second evolution round") {
    val v0 = Projection.assignFieldIds(StructType(Seq(StructField("a", LongType))))
    val v1 = Projection.evolve(v0, StructType(Seq(StructField("b", LongType)))).get
    val v2 = Projection.evolve(v1, StructType(Seq(StructField("c", LongType)))).get
    Projection.fieldId(v2("a")) shouldBe Some(1L)
    Projection.fieldId(v2("b")) shouldBe Some(2L)
    Projection.fieldId(v2("c")) shouldBe Some(3L)
  }
}
