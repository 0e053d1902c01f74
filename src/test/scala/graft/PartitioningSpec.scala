package graft

import graft.partitioning.{PartitionExpr, PartitionField, Transform}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Parser + naming parity with the reference
  * (`core/partitioning.py:21-62`, `tests/test_partitioning.py:36-89`).
  */
class PartitioningSpec extends AnyFunSuite with Matchers {

  test("bare column parses as identity") {
    PartitionExpr.parse("ts") shouldBe PartitionField("ts", Transform.Identity)
    PartitionExpr.parse("  _col9  ") shouldBe PartitionField("_col9", Transform.Identity)
  }

  test("unary time transforms parse") {
    PartitionExpr.parse("year(ts)").transform shouldBe Transform.Year
    PartitionExpr.parse("month(ts)").transform shouldBe Transform.Month
    PartitionExpr.parse("day( ts )").transform shouldBe Transform.Day
    PartitionExpr.parse("hour(ts)").transform shouldBe Transform.Hour
    PartitionExpr.parse("void(x)").transform shouldBe Transform.Void
  }

  test("binary transforms parse with parameter") {
    PartitionExpr.parse("bucket(16, id)") shouldBe PartitionField("id", Transform.Bucket(16))
    PartitionExpr.parse("truncate(4,name)") shouldBe PartitionField("name", Transform.Truncate(4))
  }

  test("invalid expressions raise, like the reference parser") {
    an[Exception] should be thrownBy PartitionExpr.parse("")
    an[Exception] should be thrownBy PartitionExpr.parse("cube(ts)")
    an[Exception] should be thrownBy PartitionExpr.parse("bucket(ts)")
    an[Exception] should be thrownBy PartitionExpr.parse("bucket(x, 16)")
    an[Exception] should be thrownBy PartitionExpr.parse("bucket(0, id)")
    an[Exception] should be thrownBy PartitionExpr.parse("truncate(-1, id)")
    an[Exception] should be thrownBy PartitionExpr.parse("day(ts); DROP TABLE x")
  }

  test("derived partition-field names follow the reference convention") {
    // `core/schema.py:177-186`: col, col_<transform>, col_bucket_N, col_trunc_N, col_void
    PartitionExpr.parse("ts").fieldName shouldBe "ts"
    PartitionExpr.parse("day(ts)").fieldName shouldBe "ts_day"
    PartitionExpr.parse("hour(ts)").fieldName shouldBe "ts_hour"
    PartitionExpr.parse("bucket(8, id)").fieldName shouldBe "id_bucket_8"
    PartitionExpr.parse("truncate(3, name)").fieldName shouldBe "name_trunc_3"
    PartitionExpr.parse("void(x)").fieldName shouldBe "x_void"
  }

  test("parse is total over generated valid inputs (property-style)") {
    val cols = Seq("a", "ts", "_x1", "colName", "z9")
    for (c <- cols) {
      PartitionExpr.parse(c).sourceCol shouldBe c
      for (t <- Seq("year", "month", "day", "hour", "void"))
        PartitionExpr.parse(s"$t($c)").sourceCol shouldBe c
      for (n <- Seq(1, 7, 1024)) {
        PartitionExpr.parse(s"bucket($n, $c)") shouldBe PartitionField(c, Transform.Bucket(n))
        PartitionExpr.parse(s"truncate($n, $c)") shouldBe PartitionField(c, Transform.Truncate(n))
      }
    }
  }

  test("round-trip: toString re-parses to the same field") {
    val exprs = Seq("ts", "day(ts)", "hour(ts)", "year(d)", "month(d)",
      "bucket(16, id)", "truncate(4, name)", "void(x)")
    for (e <- exprs) {
      val pf = PartitionExpr.parse(e)
      PartitionExpr.parse(pf.toString) shouldBe pf
    }
  }

  test("validate degrades to None on missing column or bad type") {
    val schema = StructType(Seq(
      StructField("ts", TimestampNTZType), StructField("id", LongType),
      StructField("name", StringType), StructField("arr", ArrayType(IntegerType))))
    PartitionExpr.validate(PartitionExpr.parse("day(ts)"), schema) shouldBe defined
    PartitionExpr.validate(PartitionExpr.parse("day(name)"), schema) shouldBe None
    PartitionExpr.validate(PartitionExpr.parse("day(nope)"), schema) shouldBe None
    PartitionExpr.validate(PartitionExpr.parse("bucket(4, arr)"), schema) shouldBe None
    PartitionExpr.validate(PartitionExpr.parse("truncate(2, ts)"), schema) shouldBe None
    PartitionExpr.validate(PartitionExpr.parse("truncate(2, id)"), schema) shouldBe defined
  }

  test("time transforms accept only date/timestamp types") {
    for (t <- Seq(Transform.Year, Transform.Month, Transform.Day, Transform.Hour)) {
      t.accepts(DateType) shouldBe true
      t.accepts(TimestampType) shouldBe true
      t.accepts(TimestampNTZType) shouldBe true
      t.accepts(StringType) shouldBe false
      t.accepts(LongType) shouldBe false
    }
  }

  test("bucket rejects nested types, accepts scalars") {
    val b = Transform.Bucket(4)
    b.accepts(LongType) shouldBe true
    b.accepts(StringType) shouldBe true
    b.accepts(TimestampNTZType) shouldBe true
    b.accepts(ArrayType(IntegerType)) shouldBe false
    b.accepts(StructType(Nil)) shouldBe false
    b.accepts(MapType(StringType, StringType)) shouldBe false
  }
}
