package graft.connector

import graft.meta.{ColumnStats, DataFile, FileGroup, Snapshot}
import graft.partitioning.{PartitionExpr, Transform}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.LocalScan
import org.apache.spark.sql.types._
/** Metadata-only aggregate pushdown (DSv2 `SupportsPushDownAggregates`).
  *
  * `SELECT count(*) / count(col) / min(col) / max(col) FROM t` is
  * answered from the manifest-LIST summaries inline in the snapshot
  * file — O(#manifests) driver work, zero data files opened, zero
  * Spark jobs. With `GROUP BY <identity partition column>` the same
  * aggregates are answered per partition value from per-FILE metadata
  * (O(#files) driver work, still no data read) — the hidden-
  * partitioning invariant guarantees every row of a file shares the
  * file's partition value. This is the capability Iceberg exposes
  * through its manifest-list column stats, and at 10⁵-file scale it
  * turns a full-table scan into a metadata lookup.
  *
  * Soundness rules (bail ⇒ Spark runs the ordinary scan, so a refusal
  * is never wrong, only slower):
  *
  *  - Only when NO filter is pushed: this builder reports every filter
  *    as residual, so Spark only attempts aggregate pushdown on
  *    filterless scans — checked again defensively here.
  *  - `count(*)`: sum of per-group row counts (always available; a
  *    group predating summaries forces one manifest parse).
  *  - `count(col)`: requires every group to carry a merged null count
  *    for `col` (rows − nulls is then exact). Zero-row groups
  *    contribute nothing.
  *  - `min/max(col)`: requires every non-empty group's stats to have
  *    min/max for `col` (or be provably all-null: no range, null
  *    count == rows), and the column's stat domain to round-trip
  *    EXACTLY — numeric/date/timestamp/decimal do (canonical
  *    BigDecimal strings, epoch days/micros). Strings do NOT (parquet
  *    footers may truncate binary stats: the recorded max can be a
  *    prefix above the true max — sound for pruning, wrong for an
  *    answer) and are never pushed. Float/double bail when the extreme
  *    is ±0.0, whose sign the stat string cannot preserve.
  *  - Grouped pushes additionally require: every group key an IDENTITY
  *    partition source column of the spec (any subset of a multi-field
  *    spec — the per-field hidden-partitioning invariant keeps a
  *    partial tuple exact), a key domain that round-trips from
  *    partition-value strings (integral, string, date), every file
  *    carrying its partition values, and a bounded group count
  *    (driver-side rows).
  *  - `DISTINCT` and every other aggregate bail.
  */
private[connector] object GraftAggPushdown {

  /** Partition-value groups beyond this plan as a normal scan — a
    * LocalTableScan materializes on the driver, and a layout with that
    * many identity partitions is mis-partitioned anyway.
    */
  private val MaxGroups = 100000

  /** Plan the pushed aggregation against snapshot metadata: the scan
    * output schema (positional, as DSv2 requires: group columns first,
    * then aggregates) and its result rows — or None when any piece
    * cannot be answered exactly.
    */
  def plan(snap: Snapshot, agg: Aggregation): Option[(StructType, Array[InternalRow])] =
    agg.groupByExpressions.toSeq match {
      case Seq() =>
        planGlobal(snap, agg).map { case (sch, row) => (sch, Array(row)) }
      case gbs => planGrouped(snap, gbs, agg)
    }

  // ---- global (no GROUP BY): manifest summaries ----------------------

  private def planGlobal(snap: Snapshot, agg: Aggregation): Option[(StructType, InternalRow)] = {
    val groups = snap.fileGroups
    def entries(col: String): Option[Seq[(Long, Option[ColumnStats])]] = {
      val es = groups.map(_.summary.map(s => (s.rows, s.stats.get(col))))
      if (es.exists(_.isEmpty)) None else Some(es.map(_.get))
    }
    val planned = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        Some((StructField("count(*)", LongType, nullable = false),
          java.lang.Long.valueOf(groups.map(_.rows).sum): Any))
      case c: Count if !c.isDistinct =>
        for {
          f <- field(snap.schema, c.column)
          es <- entries(f.name)
          n <- countFrom(es)
        } yield (StructField(s"count(${f.name})", LongType, nullable = false),
          java.lang.Long.valueOf(n): Any)
      case m: Min =>
        for {
          f <- field(snap.schema, m.column)
          es <- entries(f.name)
          v <- extremeFrom(es, f.dataType, isMin = true)
        } yield (StructField(s"min(${f.name})", f.dataType), v)
      case m: Max =>
        for {
          f <- field(snap.schema, m.column)
          es <- entries(f.name)
          v <- extremeFrom(es, f.dataType, isMin = false)
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

  // ---- GROUP BY identity partition column(s): per-file metadata ------

  /** Each group key must be an IDENTITY field of the partition spec
    * (any subset of a multi-field spec, in any order) with a
    * round-tripping key domain — the hidden-partitioning invariant
    * holds per field, so grouping files by the value tuple of just the
    * requested fields stays exact whatever the other fields are.
    */
  private def planGrouped(snap: Snapshot, gbs: Seq[Expression],
                          agg: Aggregation): Option[(StructType, Array[InternalRow])] = {
    val specFields = snap.partitionSpec.map(s =>
      scala.util.Try(PartitionExpr.parseSpec(s)).toOption.getOrElse(Nil)).getOrElse(Nil)
    for {
      gbFields <- sequence(gbs.map { gb =>
        field(snap.schema, gb).flatMap { gbField =>
          specFields.find(pf => pf.transform == Transform.Identity &&
            pf.sourceCol.equalsIgnoreCase(gbField.name) &&
            GraftPartitionKeys.keyDomain(gbField.dataType)).map(gbField -> _)
        }
      })
      if gbFields.map(_._2.fieldName).distinct.size == gbFields.size
      files = snap.files
      keyed <- sequence(files.map { f =>
        sequence(gbFields.map { case (_, pf) =>
          f.partitionValues.flatMap(_.get(pf.fieldName))
        }).map(_ -> f)
      })
      // Hive default-partition encoding conflates null and '' for string
      // keys: a file recorded with a null partition value may actually
      // hold ''-keyed rows, so a GROUP BY answered from metadata would
      // return a null group where the real scan returns ''. Bail — a
      // refusal is never wrong, only slower.
      if !gbFields.map(_._1).zipWithIndex.exists { case (gbField, i) =>
        gbField.dataType == StringType && keyed.exists(_._1(i).isEmpty)
      }
      grouped = keyed.groupBy(_._1) if grouped.size <= MaxGroups
      rows <- sequence(grouped.toSeq.map { case (k, kfs) =>
        groupRow(snap.schema, gbFields.map(_._1), k, kfs.map(_._2), agg)
      })
      aggFields <- aggSchema(snap.schema, agg)
    } yield (StructType(gbFields.map(_._1) ++ aggFields), rows.toArray)
  }

  /** One result row for one partition-value tuple: the parsed keys
    * followed by each aggregate computed over the tuple's files.
    */
  private def groupRow(schema: StructType, gbFields: Seq[StructField],
                       key: Seq[Option[String]], fs: Seq[DataFile],
                       agg: Aggregation): Option[InternalRow] = {
    val keyVals: Option[Seq[Any]] = sequence(gbFields.zip(key).map {
      case (_, None) => Some(null: Any)
      case (f, Some(s)) => GraftPartitionKeys.parse(f.dataType, s)
    })
    def entries(col: String): Seq[(Long, Option[ColumnStats])] =
      fs.map(f => (f.rows, f.stats.get(col)))
    val vals = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(java.lang.Long.valueOf(fs.map(_.rows).sum): Any)
      case c: Count if !c.isDistinct =>
        field(schema, c.column).flatMap(f => countFrom(entries(f.name)))
          .map(java.lang.Long.valueOf(_): Any)
      case m: Min =>
        field(schema, m.column).flatMap(f =>
          extremeFrom(entries(f.name), f.dataType, isMin = true))
      case m: Max =>
        field(schema, m.column).flatMap(f =>
          extremeFrom(entries(f.name), f.dataType, isMin = false))
      case _ => None
    }
    for { ks <- keyVals; vs <- sequence(vals) }
      yield new GenericInternalRow((ks ++ vs).toArray)
  }

  /** The aggregate part of the grouped output schema (shared shape with
    * the global plan; computed once, not per group).
    */
  private def aggSchema(schema: StructType, agg: Aggregation): Option[Seq[StructField]] =
    sequence(agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(StructField("count(*)", LongType, nullable = false))
      case c: Count if !c.isDistinct =>
        field(schema, c.column).map(f =>
          StructField(s"count(${f.name})", LongType, nullable = false))
      case m: Min => field(schema, m.column).map(f => StructField(s"min(${f.name})", f.dataType))
      case m: Max => field(schema, m.column).map(f => StructField(s"max(${f.name})", f.dataType))
      case _ => None
    })

  // ---- shared stat folding -------------------------------------------

  /** Resolve a pushed column reference against the snapshot schema
    * (case-insensitively, like the rest of the SQL surface).
    */
  private def field(schema: StructType, e: Expression): Option[StructField] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      schema.fields.find(_.name.equalsIgnoreCase(nr.fieldNames()(0)))
    case _ => None
  }

  /** Exact non-null count over (rows, stats) entries, or None if any
    * non-empty entry lacks a null count.
    */
  private def countFrom(entries: Seq[(Long, Option[ColumnStats])]): Option[Long] =
    entries.foldLeft(Option(0L)) { case (acc, (rows, stats)) =>
      acc.flatMap { sum =>
        if (rows == 0L) Some(sum)
        else stats.flatMap(_.nullCount).map(n => sum + rows - n)
      }
    }

  /** Exact min/max over (rows, stats) entries as a Catalyst internal
    * value (null over empty/all-null), or None when stats are missing
    * or the domain is inexact. Entries provably all-null (no range,
    * null count == rows) contribute no values — SQL min/max semantics.
    */
  private def extremeFrom(entries: Seq[(Long, Option[ColumnStats])],
                          dt: DataType, isMin: Boolean): Option[Any] = {
    val nonEmpty = entries.filter(_._1 > 0L)
    if (nonEmpty.isEmpty) return Some(null)
    // per entry: Some(Some(bound)) value-bearing, Some(None) provably
    // all-null, None unknown → bail
    val bounds: Seq[Option[Option[String]]] = nonEmpty.map { case (rows, statsOpt) =>
      statsOpt.flatMap { cs =>
        val b = if (isMin) cs.min else cs.max
        if (b.isDefined) Some(b)
        else if (cs.nullCount.contains(rows)) Some(None)
        else None
      }
    }
    if (bounds.exists(_.isEmpty)) return None
    val vals = bounds.flatMap(_.get)
    if (vals.isEmpty) return Some(null)
    try {
      val ds = vals.map(BigDecimal(_))
      toInternal(dt, if (isMin) ds.min else ds.max)
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

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}

/** The pushed-aggregate scan: driver-side rows (one per group; one
  * total without GROUP BY), planned by Spark as a `LocalTableScan` —
  * the explain-visible proof that no file was read.
  */
final class GraftAggScan(out: StructType, result: Array[InternalRow], table: String)
    extends LocalScan {
  override def readSchema(): StructType = out
  override def rows(): Array[InternalRow] = result
  override def description(): String =
    s"GraftAggScan(metadata-only aggregate over $table)"
}
