package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-spec-exact `bucket[N]` transform as a native Catalyst
  * expression with whole-stage codegen.
  *
  * The graft table format's own `bucket(n, col)` uses Spark's `hash`
  * (internally consistent, SURVEY §2.5). This expression instead
  * reproduces the Apache Iceberg partition-spec hash — murmur3_x86_32
  * (seed 0) over Iceberg's canonical byte encodings (int/long/date/
  * timestamp as 8-byte little-endian long, string as UTF-8 bytes,
  * decimal as minimal big-endian two's-complement of the unscaled
  * value, float/double via `doubleToLongBits`) — so bucket values
  * computed here agree with any Iceberg-ecosystem engine reading the
  * same data. Not expressible with built-in functions: Spark's `hash`
  * uses different per-type encodings.
  *
  * A custom `Expression` (not a UDF) keeps this inside whole-stage
  * codegen: `doGenCode` emits a static call, no boxing, null handling
  * inherited from `UnaryExpression`.
  */
final case class IcebergBucketExpr(child: Expression, numBuckets: Int)
    extends UnaryExpression {
  require(numBuckets > 0, "numBuckets must be positive")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
           StringType | BinaryType | FloatType | DoubleType | _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket does not support type $other")
    }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType => IcebergBucketExpr.bucketLong(input.asInstanceOf[Int].toLong, numBuckets)
    case LongType    => IcebergBucketExpr.bucketLong(input.asInstanceOf[Long], numBuckets)
    case DateType    => IcebergBucketExpr.bucketLong(input.asInstanceOf[Int].toLong, numBuckets)
    case TimestampType | TimestampNTZType =>
      IcebergBucketExpr.bucketLong(input.asInstanceOf[Long], numBuckets)
    case FloatType   => IcebergBucketExpr.bucketDouble(input.asInstanceOf[Float].toDouble, numBuckets)
    case DoubleType  => IcebergBucketExpr.bucketDouble(input.asInstanceOf[Double], numBuckets)
    case StringType  => IcebergBucketExpr.bucketBytes(input.asInstanceOf[UTF8String].getBytes, numBuckets)
    case BinaryType  => IcebergBucketExpr.bucketBytes(input.asInstanceOf[Array[Byte]], numBuckets)
    case _: DecimalType =>
      IcebergBucketExpr.bucketBytes(
        input.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue.toByteArray, numBuckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the companion's MODULE$ field lives on the module class
    // (`IcebergBucketExpr$`), NOT on the case class — stripping the `$`
    // makes janino fail and Spark silently fall back to interpreted mode
    val helper = IcebergBucketExpr.getClass.getName + ".MODULE$"
    val call = child.dataType match {
      case IntegerType | DateType => (c: String) => s"$helper.bucketLong((long) $c, $numBuckets)"
      case LongType | TimestampType | TimestampNTZType =>
        (c: String) => s"$helper.bucketLong($c, $numBuckets)"
      case FloatType  => (c: String) => s"$helper.bucketDouble((double) $c, $numBuckets)"
      case DoubleType => (c: String) => s"$helper.bucketDouble($c, $numBuckets)"
      case StringType => (c: String) => s"$helper.bucketBytes($c.getBytes(), $numBuckets)"
      case BinaryType => (c: String) => s"$helper.bucketBytes($c, $numBuckets)"
      case _: DecimalType =>
        (c: String) => s"$helper.bucketBytes($c.toJavaBigDecimal().unscaledValue().toByteArray(), $numBuckets)"
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketExpr =
    copy(child = newChild)
}

object IcebergBucketExpr {

  /** Registration triple for `SparkSessionExtensions.injectFunction` —
    * SQL surface: `iceberg_bucket(col, n)`.
    */
  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("iceberg_bucket"),
    new ExpressionInfo(classOf[IcebergBucketExpr].getName, "iceberg_bucket"),
    (args: Seq[Expression]) => args match {
      case Seq(child, Literal(n: Int, IntegerType)) => IcebergBucketExpr(child, n)
      case _ => throw new IllegalArgumentException(
        "usage: iceberg_bucket(col, <int literal bucket count>)")
    })

  // ---- Iceberg spec appendix B: 32-bit murmur3, seed 0 ----------------

  def bucketLong(v: Long, n: Int): Int = {
    val bytes = new Array[Byte](8) // little-endian long
    var i = 0
    var x = v
    while (i < 8) { bytes(i) = (x & 0xFF).toByte; x >>>= 8; i += 1 }
    bucketBytes(bytes, n)
  }

  def bucketDouble(v: Double, n: Int): Int = {
    val canonical = if (v == 0.0d) 0.0d else v // -0.0 hashes as +0.0
    bucketLong(java.lang.Double.doubleToLongBits(canonical), n)
  }

  def bucketBytes(bytes: Array[Byte], n: Int): Int =
    ((hashBytes(bytes) % n) + n) % n

  /** murmur3_x86_32(bytes, seed = 0) — public algorithm (Austin Appleby,
    * public domain), as specified by the Iceberg table spec.
    */
  def hashBytes(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h1 = 0 // seed
    val roundedEnd = len & 0xfffffffc
    var i = 0
    while (i < roundedEnd) {
      var k1 = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | (data(i + 3) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    if ((len & 0x03) >= 3) k1 ^= (data(roundedEnd + 2) & 0xff) << 16
    if ((len & 0x03) >= 2) k1 ^= (data(roundedEnd + 1) & 0xff) << 8
    if ((len & 0x03) >= 1) {
      k1 ^= data(roundedEnd) & 0xff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }
}
