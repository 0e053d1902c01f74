package graft

import graft.types.TypeRegistry

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Type-widening parity with the reference registry
  * (`utils/types.py:24-86`, `tests/test_type_mappings.py:8-39`).
  */
class TypeRegistrySpec extends AnyFunSuite with Matchers {
  private val reg = TypeRegistry()

  test("narrow ints widen to Integer, 64-bit to Long") {
    reg.canonicalize(ByteType) shouldBe IntegerType
    reg.canonicalize(ShortType) shouldBe IntegerType
    reg.canonicalize(IntegerType) shouldBe IntegerType
    reg.canonicalize(LongType) shouldBe LongType
  }

  test("arrow-name widening: uints, uint64 -> Decimal(20,0)") {
    reg.fromArrowName("uint8") shouldBe IntegerType
    reg.fromArrowName("uint16") shouldBe IntegerType
    reg.fromArrowName("uint32") shouldBe LongType
    reg.fromArrowName("uint64") shouldBe DecimalType(20, 0) // utils/types.py:70-71
  }

  test("timestamps: tz-aware -> Timestamp, naive -> TimestampNTZ") {
    reg.fromArrowName("timestamp[us]") shouldBe TimestampNTZType
    reg.fromArrowName("timestamp[ns]") shouldBe TimestampNTZType
    reg.fromArrowName("timestamp[ms, tz=UTC]") shouldBe TimestampType
    reg.fromArrowName("timestamp[s, tz=+02:00]") shouldBe TimestampType
  }

  test("null-typed columns become string") {
    reg.canonicalize(NullType) shouldBe StringType
    reg.fromArrowName("null") shouldBe StringType
  }

  test("decimal passes through") {
    reg.canonicalize(DecimalType(12, 2)) shouldBe DecimalType(12, 2)
    reg.fromArrowName("decimal(10,3)") shouldBe DecimalType(10, 3)
    reg.fromArrowName("decimal128(20, 0)") shouldBe DecimalType(20, 0)
  }

  test("unsupported types raise, like utils/types.py:86") {
    an[IllegalArgumentException] should be thrownBy reg.canonicalize(CalendarIntervalType)
    an[IllegalArgumentException] should be thrownBy reg.fromArrowName("duration[s]")
    an[IllegalArgumentException] should be thrownBy reg.fromArrowName("whatever")
  }

  test("custom registrations are consulted before defaults") {
    val custom = reg.register(BinaryType, StringType)
    custom.canonicalize(BinaryType) shouldBe StringType
    reg.canonicalize(BinaryType) shouldBe BinaryType // original untouched
  }

  test("arrays canonicalize element types (embedding extension)") {
    reg.canonicalize(ArrayType(FloatType)) shouldBe ArrayType(FloatType)
    reg.canonicalize(ArrayType(ShortType)) shouldBe ArrayType(IntegerType)
  }

  test("canonicalizeSchema maps every field") {
    val in = StructType(Seq(
      StructField("a", ShortType), StructField("b", NullType)))
    reg.canonicalizeSchema(in) shouldBe StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
  }
}
