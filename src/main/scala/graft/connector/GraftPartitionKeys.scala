package graft.connector

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ONE definition of which identity-partition key domains
  * round-trip exactly from stored partition-value strings, and the
  * parser back to Catalyst internal values. Storage-partitioned-join
  * keys (GraftNativeScan) and grouped aggregate pushdown
  * (GraftAggPushdown) must agree on this — a divergence would let the
  * two features disagree about the same table's partition values, so
  * both call here.
  */
private[connector] object GraftPartitionKeys {

  def keyDomain(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType | DateType => true
    case _ => false
  }

  /** Stored partition-value string → Catalyst internal value. */
  def parse(dt: DataType, s: String): Option[Any] =
    try dt match {
      case ByteType => Some(java.lang.Byte.valueOf(s.toByte))
      case ShortType => Some(java.lang.Short.valueOf(s.toShort))
      case IntegerType => Some(java.lang.Integer.valueOf(s.toInt))
      case LongType => Some(java.lang.Long.valueOf(s.toLong))
      case StringType => Some(UTF8String.fromString(s))
      case DateType =>
        Some(java.lang.Integer.valueOf(java.time.LocalDate.parse(s).toEpochDay.toInt))
      case _ => None
    } catch { case _: RuntimeException => None }
}
