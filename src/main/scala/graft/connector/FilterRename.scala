package graft.connector

import org.apache.spark.sql.sources._

/** Translate a v1 `Filter`'s column references through a current-name →
  * physical-era-name map, so row-group pruning keeps working inside
  * pre-rename files (their footers carry the OLD column names). `None`
  * when any referenced column has no physical counterpart in the era
  * (dropped-name reuse reads salted, columns added later may collide)
  * or the filter shape is unrecognized — the caller simply doesn't
  * push that filter, and since every filter stays residual above the
  * scan, translation can only ever buy speed, never change rows.
  */
private[graft] object FilterRename {

  def apply(f: Filter, m: Map[String, String]): Option[Filter] = {
    def col(a: String): Option[String] = m.get(a.toLowerCase)
    f match {
      case AlwaysTrue() => Some(f)
      case AlwaysFalse() => Some(f)
      case EqualTo(a, v) => col(a).map(EqualTo(_, v))
      case EqualNullSafe(a, v) => col(a).map(EqualNullSafe(_, v))
      case GreaterThan(a, v) => col(a).map(GreaterThan(_, v))
      case GreaterThanOrEqual(a, v) => col(a).map(GreaterThanOrEqual(_, v))
      case LessThan(a, v) => col(a).map(LessThan(_, v))
      case LessThanOrEqual(a, v) => col(a).map(LessThanOrEqual(_, v))
      case In(a, vs) => col(a).map(In(_, vs))
      case IsNull(a) => col(a).map(IsNull(_))
      case IsNotNull(a) => col(a).map(IsNotNull(_))
      case StringStartsWith(a, v) => col(a).map(StringStartsWith(_, v))
      case StringEndsWith(a, v) => col(a).map(StringEndsWith(_, v))
      case StringContains(a, v) => col(a).map(StringContains(_, v))
      case And(l, r) => for { lt <- apply(l, m); rt <- apply(r, m) } yield And(lt, rt)
      case Or(l, r) => for { lt <- apply(l, m); rt <- apply(r, m) } yield Or(lt, rt)
      case Not(c) => apply(c, m).map(Not(_))
      case _ => None
    }
  }

  /** The current→physical map of an era, from [[graft.table.GraftTable
    * .nameMapping]]'s pairs over the FULL current schema (filters may
    * reference unprojected columns). Physical names a file cannot
    * contain (the salted absent-column reads) are excluded, as is any
    * name absent from the era's write schema — a lookup miss drops the
    * filter instead of pushing an unanswerable one.
    */
  def eraMap(writeSchema: org.apache.spark.sql.types.StructType,
             pairs: Option[Seq[(String, org.apache.spark.sql.types.StructField)]],
             currentSchema: org.apache.spark.sql.types.StructType): Map[String, String] = {
    val eraCols = writeSchema.fieldNames.map(_.toLowerCase).toSet
    val base = pairs match {
      case None => currentSchema.fieldNames.map(n => n.toLowerCase -> n).toMap
      case Some(m) => m.map { case (phys, f) => f.name.toLowerCase -> phys }.toMap
    }
    base.filter { case (_, phys) =>
      !phys.startsWith("__graft_absent_") && eraCols.contains(phys.toLowerCase)
    }
  }
}
