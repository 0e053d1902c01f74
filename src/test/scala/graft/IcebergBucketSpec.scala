package graft

import graft.functions.IcebergBucketExpr

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Iceberg-spec bucket transform pinned against the hash test vectors
  * published in the Apache Iceberg table spec (Appendix B), resolved
  * through `GraftExtensions` as SQL `iceberg_bucket(col, n)`.
  */
class IcebergBucketSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def longLE(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var x = v; var i = 0
    while (i < 8) { b(i) = (x & 0xFF).toByte; x >>>= 8; i += 1 }
    b
  }

  test("murmur3 hash matches the published Iceberg spec vectors") {
    // int/long 34 hash as 8-byte little-endian long
    IcebergBucketExpr.hashBytes(longLE(34L)) shouldBe 2017239379
    // string "iceberg" as UTF-8 bytes
    IcebergBucketExpr.hashBytes("iceberg".getBytes("UTF-8")) shouldBe 1210000089
    // date 2017-11-16 as epoch days
    IcebergBucketExpr.hashBytes(
      longLE(java.time.LocalDate.of(2017, 11, 16).toEpochDay)) shouldBe -653330422
    // timestamp 2017-11-16T22:31:08 UTC as epoch micros
    IcebergBucketExpr.hashBytes(longLE(1510871468000000L)) shouldBe -2047944441
    // decimal 14.20: unscaled 1420 as minimal big-endian two's complement
    IcebergBucketExpr.hashBytes(
      java.math.BigInteger.valueOf(1420).toByteArray) shouldBe -500754589
    // float/double 1.0 via doubleToLongBits
    IcebergBucketExpr.hashBytes(
      longLE(java.lang.Double.doubleToLongBits(1.0))) shouldBe -142385009
    // raw bytes 0x00010203
    IcebergBucketExpr.hashBytes(Array[Byte](0, 1, 2, 3)) shouldBe -188683207
  }

  test("iceberg_bucket evaluates per type through a real plan (codegen path)") {
    val s = spark
    import s.implicits._
    val n = 1 << 30
    val df = Seq((34, 34L, "iceberg", BigDecimal("14.20"), 1.0f, 1.0d))
      .toDF("i", "l", "str", "dec", "f", "d")
      .withColumn("dec", col("dec").cast(DecimalType(9, 2)))
      .withColumn("dt", lit(java.sql.Date.valueOf("2017-11-16")))
    val r = df.select(
      expr(s"iceberg_bucket(i, $n)"), expr(s"iceberg_bucket(l, $n)"),
      expr(s"iceberg_bucket(str, $n)"), expr(s"iceberg_bucket(dec, $n)"),
      expr(s"iceberg_bucket(f, $n)"), expr(s"iceberg_bucket(d, $n)"),
      expr(s"iceberg_bucket(dt, $n)")).collect()(0)
    def b(h: Int) = ((h % n) + n) % n
    r.getInt(0) shouldBe b(2017239379)
    r.getInt(1) shouldBe b(2017239379)
    r.getInt(2) shouldBe b(1210000089)
    r.getInt(3) shouldBe b(-500754589)
    r.getInt(4) shouldBe b(-142385009)
    r.getInt(5) shouldBe b(-142385009)
    r.getInt(6) shouldBe b(-653330422)
  }

  test("nulls propagate; int and long of equal value agree (spec requirement)") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(42), Some(42L)), (None, None)).toDF("i", "l")
    val rows = df.select(
      expr("iceberg_bucket(i, 16)").as("bi"),
      expr("iceberg_bucket(l, 16)").as("bl")).collect()
    rows(0).getInt(0) shouldBe rows(0).getInt(1) // int 42 == long 42
    rows(1).isNullAt(0) shouldBe true
    rows(1).isNullAt(1) shouldBe true
  }

  test("unsupported types fail analysis, bad arity fails resolution") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Seq(1, 2))).toDF("arr")
    an[Exception] should be thrownBy df.select(expr("iceberg_bucket(arr, 16)")).collect()
    an[Exception] should be thrownBy df.select(expr("iceberg_bucket(arr)")).collect()
  }

  test("doGenCode actually compiles (no silent interpreted fallback)") {
    // GenerateUnsafeProjection.generate throws on janino failure, unlike
    // the query path which quietly falls back to interpreted mode — this
    // pins the codegen contract the Scaladoc claims
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
    val exprs: Seq[Expression] = Seq(
      IcebergBucketExpr(BoundReference(0, LongType, nullable = true), 16),
      IcebergBucketExpr(BoundReference(1, StringType, nullable = true), 16),
      IcebergBucketExpr(BoundReference(2, DoubleType, nullable = true), 16))
    noException should be thrownBy GenerateUnsafeProjection.generate(exprs)
  }
}
