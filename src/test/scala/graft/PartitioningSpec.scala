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

  /** Temporal derivation must be timezone-FREE: wall-clock for
    * DATE/TIMESTAMP_NTZ, UTC for zoned TIMESTAMP — never the writer's
    * session timezone. The old `date_format` derivation round-tripped
    * NTZ through the session zone, so a wall time inside a DST
    * spring-forward gap (02:30 on America/Denver's 2024-03-10) stored a
    * shifted key ("…-03") that disagreed with the scan pruner's and the
    * SPJ V2 functions' wall-clock reading, and zoned keys silently
    * changed meaning with the writer's zone.
    */
  test("temporal derive is wall-clock/UTC under ANY session timezone") {
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Denver")
    try {
      import org.apache.spark.sql.functions.col
      val df = spark.sql(
        """SELECT TIMESTAMP_NTZ'2024-03-10 02:30:00' AS ntz,
          |       TIMESTAMP'2024-03-10 09:30:00 UTC' AS ts,
          |       DATE'2024-03-10' AS d,
          |       CAST(NULL AS TIMESTAMP_NTZ) AS nul,
          |       TIMESTAMP_NTZ'1969-12-31 23:30:00' AS pre,
          |       TIMESTAMP_NTZ'10000-01-02 03:00:00' AS wide""".stripMargin)
      def one(t: Transform, c: String, dt: DataType): String = {
        val r = df.select(t.derive(col(c), dt).as("v")).head
        if (r.isNullAt(0)) null else r.getString(0)
      }
      // NTZ inside the Denver spring-forward gap: wall clock, not shifted
      one(Transform.Hour, "ntz", TimestampNTZType) shouldBe "2024-03-10-02"
      one(Transform.Day, "ntz", TimestampNTZType) shouldBe "2024-03-10"
      one(Transform.Month, "ntz", TimestampNTZType) shouldBe "2024-03"
      one(Transform.Year, "ntz", TimestampNTZType) shouldBe "2024"
      // zoned: UTC components (09:30Z), not the Denver local rendering
      one(Transform.Hour, "ts", TimestampType) shouldBe "2024-03-10-09"
      one(Transform.Day, "ts", TimestampType) shouldBe "2024-03-10"
      one(Transform.Month, "ts", TimestampType) shouldBe "2024-03"
      one(Transform.Year, "ts", TimestampType) shouldBe "2024"
      // DATE: pure calendar; hour renders the historical midnight "00"
      one(Transform.Hour, "d", DateType) shouldBe "2024-03-10-00"
      one(Transform.Day, "d", DateType) shouldBe "2024-03-10"
      // NULL propagates (null partition value, not a "null" string)
      one(Transform.Day, "nul", TimestampNTZType) shouldBe null
      one(Transform.Hour, "nul", TimestampNTZType) shouldBe null
      // pre-1970: floor semantics, the day before the epoch
      one(Transform.Day, "pre", TimestampNTZType) shouldBe "1969-12-31"
      one(Transform.Hour, "pre", TimestampNTZType) shouldBe "1969-12-31-23"
      // 5-digit years must not be truncated by the zero-padding
      one(Transform.Year, "wide", TimestampNTZType) shouldBe "10000"
      one(Transform.Day, "wide", TimestampNTZType) shouldBe "10000-01-02"
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
