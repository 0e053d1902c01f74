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

  /** Stored partition-value string → Catalyst internal value, for a
    * specific TRANSFORM's value syntax — the temporal transforms store
    * formatted strings (`yyyy`, `yyyy-MM`, `yyyy-MM-dd-HH`) whose SPJ
    * keys are the epoch-relative INTs the matching V2 functions
    * (`years`/`months`/`hours`) report. `day` stores `yyyy-MM-dd`,
    * which IS the DateType syntax. Everything else defers to the type
    * parser.
    */
  def parseTransform(tf: graft.partitioning.Transform, dt: DataType,
                     s: String): Option[Any] =
    try tf match {
      case graft.partitioning.Transform.Year =>
        Some(java.lang.Integer.valueOf(s.toInt - 1970))
      case graft.partitioning.Transform.Month =>
        val ym = java.time.YearMonth.parse(s)
        Some(java.lang.Integer.valueOf((ym.getYear - 1970) * 12 + ym.getMonthValue - 1))
      case graft.partitioning.Transform.Hour =>
        // yyyy-MM-dd-HH
        if (s.length != 13 || s.charAt(10) != '-') None
        else {
          val d = java.time.LocalDate.parse(s.substring(0, 10))
          val h = s.substring(11).toInt
          if (h < 0 || h > 23) None
          else Some(java.lang.Integer.valueOf((d.toEpochDay * 24 + h).toInt))
        }
      case _ => parse(dt, s)
    } catch { case _: RuntimeException => None }
}
