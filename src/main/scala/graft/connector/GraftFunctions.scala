package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Murmur3Hash, Pmod}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The `bucket` V2 function exposed through the catalog's
  * `FunctionCatalog` face. Spark resolves it when it turns a reported
  * `bucket(n, col)` scan partitioning into a Catalyst
  * `TransformExpression` — the resolution step storage-partitioned
  * joins need before two co-bucketed graft tables can join with zero
  * shuffle. Two scans are join-compatible when their bound functions
  * share a `canonicalName`, so the name embeds the value type (an INT
  * and a BIGINT column hash differently and must never co-partition).
  *
  * Semantics are BY CONSTRUCTION identical to the write path
  * ([[graft.partitioning.Transform.Bucket]], `pmod(hash(col), n)`):
  * the bound function evaluates the same Catalyst `Pmod(Murmur3Hash,
  * n)` expression interpreted — called only on compatibility/shuffle
  * planning paths, never per-row in the no-shuffle join itself.
  */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, col): graft's write-side partition transform, pmod(murmur3_hash(col), n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets INT, value), got ${inputType.simpleString}")
    val vt = inputType.fields(1).dataType
    require(graft.partitioning.Transform.Bucket(1).accepts(vt),
      s"bucket does not accept ${vt.catalogString}")
    new Bound(vt)
  }

  private final class Bound(vt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, vt)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${vt.catalogString})"

    // the exact write-path expression, bound to (numBuckets, value):
    // Murmur3Hash returns its seed for a null child, so null values
    // land in a real bucket here exactly as they do in written files
    @transient private lazy val expr =
      Pmod(new Murmur3Hash(Seq(BoundReference(1, vt, nullable = true))),
        BoundReference(0, IntegerType, nullable = false))

    override def produceResult(input: InternalRow): Integer =
      expr.eval(input).asInstanceOf[Int]
  }
}

/** The `days` V2 function — resolved when Spark turns a reported
  * `days(ts)` scan partitioning into a Catalyst `TransformExpression`,
  * which is what lets two tables day-partitioned on the same column
  * join their temporal key shuffle-free. Result is DATE (internal
  * epoch days), the type [[GraftPartitionKeys]] parses the stored
  * `yyyy-MM-dd` partition-value strings into.
  *
  * Semantics match the write path ([[graft.partitioning.Transform.Day]]):
  * wall-clock day for DATE and TIMESTAMP_NTZ sources, UTC day for zoned
  * TIMESTAMP — all three timezone-free by construction (the write path
  * derives keys from raw values with exact integer/calendar math, never
  * through the writer's session timezone), so stored keys and this
  * function agree for every writer.
  */
object GraftDaysFunction extends UnboundFunction {

  override def name(): String = "days"

  override def description(): String =
    "days(ts): graft's day partition transform, the source's calendar day"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"days expects one argument, got ${inputType.simpleString}")
    val vt = inputType.fields(0).dataType
    vt match {
      case DateType | TimestampNTZType | TimestampType => new Bound(vt)
      case other => throw new UnsupportedOperationException(
        s"days does not accept ${other.catalogString}")
    }
  }

  private final class Bound(vt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(vt)
    override def resultType(): DataType = DateType
    override def isResultNullable: Boolean = true
    override def name(): String = "days"
    override def canonicalName(): String = s"graft.days(${vt.catalogString})"

    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(0)) null
      else vt match {
        case DateType => Integer.valueOf(input.getInt(0))
        // NTZ micros are wall micros; zoned micros are epoch micros and
        // the key is the UTC day — identical floorDiv either way.
        case _ =>
          Integer.valueOf(Math.floorDiv(input.getLong(0), 86400000000L).toInt)
      }
  }
}

/** Shared shape of the remaining temporal V2 functions (`years`,
  * `months`, `hours`) — epoch-relative INT keys over DATE /
  * TIMESTAMP_NTZ / zoned TIMESTAMP sources, matching
  * [[GraftPartitionKeys.parseTransform]]'s reading of the stored
  * `yyyy` / `yyyy-MM` / `yyyy-MM-dd-HH` strings. NTZ keys are
  * wall-clock, zoned keys are UTC — both reduce to the same math over
  * the raw micros, and the write path derives the stored strings the
  * same way, so the clustering claim holds for every writer timezone.
  */
private[connector] abstract class GraftTemporalFunction(fnName: String)
    extends UnboundFunction {

  protected def ofEpochDay(day: Long): Int
  protected def ofWallMicros(micros: Long): Int

  override def name(): String = fnName
  override def description(): String =
    s"$fnName(ts): graft's $fnName partition transform as an epoch-relative INT"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"$fnName expects one argument, got ${inputType.simpleString}")
    val vt = inputType.fields(0).dataType
    vt match {
      case DateType | TimestampNTZType | TimestampType => new Bound(vt)
      case other => throw new UnsupportedOperationException(
        s"$fnName does not accept ${other.catalogString}")
    }
  }

  private final class Bound(vt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(vt)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true
    override def name(): String = fnName
    override def canonicalName(): String = s"graft.$fnName(${vt.catalogString})"
    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(0)) null
      else vt match {
        case DateType => Integer.valueOf(ofEpochDay(input.getInt(0).toLong))
        case _ => Integer.valueOf(ofWallMicros(input.getLong(0)))
      }
  }
}

object GraftYearsFunction extends GraftTemporalFunction("years") {
  override protected def ofEpochDay(day: Long): Int =
    java.time.LocalDate.ofEpochDay(day).getYear - 1970
  override protected def ofWallMicros(micros: Long): Int =
    ofEpochDay(Math.floorDiv(micros, 86400000000L))
}

object GraftMonthsFunction extends GraftTemporalFunction("months") {
  override protected def ofEpochDay(day: Long): Int = {
    val d = java.time.LocalDate.ofEpochDay(day)
    (d.getYear - 1970) * 12 + d.getMonthValue - 1
  }
  override protected def ofWallMicros(micros: Long): Int =
    ofEpochDay(Math.floorDiv(micros, 86400000000L))
}

object GraftHoursFunction extends GraftTemporalFunction("hours") {
  override protected def ofEpochDay(day: Long): Int = (day * 24).toInt
  override protected def ofWallMicros(micros: Long): Int =
    Math.floorDiv(micros, 3600000000L).toInt
}
