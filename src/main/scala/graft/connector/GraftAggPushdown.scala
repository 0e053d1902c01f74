package graft.connector

import graft.meta.{ColumnStats, FileGroup, Snapshot}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.LocalScan
import org.apache.spark.sql.types._

/** Metadata-only aggregate pushdown (DSv2 `SupportsPushDownAggregates`).
  *
  * `SELECT count(*) / count(col) / min(col) / max(col) FROM t` is
  * answered from the manifest-LIST summaries inline in the snapshot
  * file — O(#manifests) driver work, zero data files opened, zero
  * Spark jobs. This is the capability Iceberg exposes through its
  * manifest-list column stats, and at 10⁵-file scale it turns a
  * full-table scan into a metadata lookup.
  *
  * Soundness rules (bail ⇒ Spark runs the ordinary scan, so a refusal
  * is never wrong, only slower):
  *
  *  - Only when NO filter is pushed: this builder reports every filter
  *    as residual, so Spark only attempts aggregate pushdown on
  *    filterless scans — checked again defensively here.
  *  - `count(*)`: sum of per-group row counts (always available; a
  *    group predating summaries forces one manifest parse).
  *  - `count(col)`: requires every group to carry a summary with a
  *    merged null count for `col` (rows − nulls is then exact).
  *    Zero-row groups contribute nothing.
  *  - `min/max(col)`: requires every non-empty group's summary to have
  *    min/max for `col`, and the column's stat domain to round-trip
  *    EXACTLY — numeric/date/timestamp/decimal do (canonical
  *    BigDecimal strings, epoch days/micros). Strings do NOT (parquet
  *    footers may truncate binary stats: the recorded max can be a
  *    prefix above the true max — sound for pruning, wrong for an
  *    answer) and are never pushed. Float/double bail when the extreme
  *    is ±0.0, whose sign the stat string cannot preserve.
  *  - `DISTINCT`, group-by columns, and every other aggregate bail.
  */
private[connector] object GraftAggPushdown {

  /** Plan the pushed aggregation against snapshot metadata: the scan
    * output schema (positional, as DSv2 requires) and its single
    * result row — or None when any piece cannot be answered exactly.
    */
  def plan(snap: Snapshot, agg: Aggregation): Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val groups = snap.fileGroups
    val planned = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        Some((StructField("count(*)", LongType, nullable = false),
          java.lang.Long.valueOf(groups.map(_.rows).sum): Any))
      case c: Count if !c.isDistinct =>
        for {
          f <- field(snap.schema, c.column)
          n <- countCol(groups, f.name)
        } yield (StructField(s"count(${f.name})", LongType, nullable = false),
          java.lang.Long.valueOf(n): Any)
      case m: Min =>
        for {
          f <- field(snap.schema, m.column)
          v <- extreme(groups, f, isMin = true)
        } yield (StructField(s"min(${f.name})", f.dataType), v)
      case m: Max =>
        for {
          f <- field(snap.schema, m.column)
          v <- extreme(groups, f, isMin = false)
        } yield (StructField(s"max(${f.name})", f.dataType), v)
      case _ => None
    }
    if (planned.exists(_.isEmpty)) None
    else {
      val cols = planned.map(_.get)
      Some((StructType(cols.map(_._1)),
        new GenericInternalRow(cols.map(_._2).toArray)))
    }
  }

  /** Resolve a pushed column reference against the snapshot schema
    * (case-insensitively, like the rest of the SQL surface).
    */
  private def field(schema: StructType, e: Expression): Option[StructField] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      schema.fields.find(_.name.equalsIgnoreCase(nr.fieldNames()(0)))
    case _ => None
  }

  /** Exact non-null count for `col`, or None if any non-empty group
    * lacks a summary null count (e.g. pre-evolution groups that never
    * saw the column).
    */
  private def countCol(groups: Seq[FileGroup], col: String): Option[Long] =
    groups.foldLeft(Option(0L)) { (acc, g) =>
      acc.flatMap { sum =>
        g.summary match {
          case _ if g.summary.exists(_.rows == 0L) => Some(sum)
          case Some(s) => s.stats.get(col).flatMap(_.nullCount).map(n => sum + s.rows - n)
          case None => None
        }
      }
    }

  /** Exact min/max as a Catalyst internal value (null over an empty or
    * all-null column), or None when stats are missing or the domain is
    * inexact. Groups that are provably all-null for the column (no
    * min/max, null count == group rows) contribute no values — exactly
    * SQL min/max semantics.
    */
  private def extreme(groups: Seq[FileGroup], f: StructField, isMin: Boolean): Option[Any] = {
    val nonEmpty = groups.filter(g => g.summary.forall(_.rows > 0L))
    if (nonEmpty.isEmpty) return Some(null)
    // per group: Some(Some(bound)) value-bearing, Some(None) provably
    // all-null, None unknown → bail
    val bounds: Seq[Option[Option[String]]] = nonEmpty.map { g =>
      g.summary.flatMap { s =>
        s.stats.get(f.name).flatMap { cs =>
          val b = if (isMin) cs.min else cs.max
          if (b.isDefined) Some(b)
          else if (cs.nullCount.contains(s.rows)) Some(None)
          else None
        }
      }
    }
    if (bounds.exists(_.isEmpty)) return None
    val vals = bounds.flatMap(_.get)
    if (vals.isEmpty) return Some(null)
    try {
      val ds = vals.map(BigDecimal(_))
      toInternal(f.dataType, if (isMin) ds.min else ds.max)
    } catch { case _: NumberFormatException => None }
  }

  /** Canonical stat value → Catalyst internal representation, only for
    * domains where the round-trip is exact (see class doc).
    */
  private def toInternal(dt: DataType, v: BigDecimal): Option[Any] = dt match {
    case ByteType => Some(java.lang.Byte.valueOf(v.toByteExact))
    case ShortType => Some(java.lang.Short.valueOf(v.toShortExact))
    case IntegerType | DateType => Some(java.lang.Integer.valueOf(v.toIntExact))
    case LongType | TimestampType | TimestampNTZType =>
      Some(java.lang.Long.valueOf(v.toLongExact))
    case FloatType =>
      val f = v.toFloat
      if (f == 0.0f) None else Some(java.lang.Float.valueOf(f))
    case DoubleType =>
      val d = v.toDouble
      if (d == 0.0d) None else Some(java.lang.Double.valueOf(d))
    case d: DecimalType =>
      val dec = Decimal(v)
      if (dec.changePrecision(d.precision, d.scale)) Some(dec) else None
    case _ => None
  }
}

/** The pushed-aggregate scan: one driver-side row, planned by Spark as
  * a `LocalTableScan` — the explain-visible proof that no file was
  * read.
  */
final class GraftAggScan(out: StructType, result: InternalRow, table: String)
    extends LocalScan {
  override def readSchema(): StructType = out
  override def rows(): Array[InternalRow] = Array(result)
  override def description(): String =
    s"GraftAggScan(metadata-only aggregate over $table)"
}
