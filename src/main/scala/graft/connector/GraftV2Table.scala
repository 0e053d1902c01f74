package graft.connector

import java.util

import graft.table.GraftTable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DSv2 `Table` over a [[GraftTable]]: reads bridge through `V1Scan`
  * into the snapshot scan planner (pushed-down filters prune FILES via
  * the partition + zone-map pruners; Spark still evaluates every filter
  * on the surviving rows, so pruning is pure speedup, never semantics),
  * and writes bridge through `V1Write` into the optimistic-commit
  * append/overwrite path — the same pattern Spark's own JDBC source
  * uses for v1 engines behind the v2 API.
  *
  * `asOf` pins the table to a snapshot for SQL time travel
  * (`VERSION AS OF` / `TIMESTAMP AS OF`); pinned tables are read-only
  * and scan their snapshot without file pruning (time-travel reads are
  * the rare path). `DELETE FROM ... WHERE` bridges to the copy-on-write
  * [[GraftTable.deleteWhere]] when every filter is translatable.
  */
final class GraftV2Table(tbl: GraftTable, ident: Identifier,
                         asOf: Option[Either[Int, Long]] = None)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  override def name(): String = ident.toString

  /** The table-format handle, for sibling command rewrites (MERGE). */
  private[connector] def underlying: GraftTable = tbl

  // resolved once: Spark calls schema()/readSchema several times during
  // analysis, and each scanAsOf* re-reads the snapshot log + manifests
  private lazy val pinnedDf: DataFrame = asOf match {
    case Some(Left(version)) => tbl.scanAsOfVersion(version)
    case Some(Right(tsMs)) => tbl.scanAsOfTimestamp(tsMs)
    case None => tbl.scan()
  }

  override def schema(): StructType = asOf match {
    case None => tbl.schema
    case Some(_) => pinnedDf.schema
  }

  override def capabilities(): util.Set[TableCapability] =
    if (asOf.isDefined) util.EnumSet.of(TableCapability.BATCH_READ)
    else util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def properties(): util.Map[String, String] =
    (tbl.currentOrFail().properties ++
      Map("format" -> "graft/parquet",
          "location" -> tbl.tableDir.toString)).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    asOf match {
      case None => new GraftScanBuilder(tbl)
      case Some(_) => new PinnedScanBuilder(() => pinnedDf)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty, "cannot write to a time-travel (AS OF) table")
    new GraftWriteBuilder(tbl)
  }

  // ---- DELETE FROM ... WHERE ----------------------------------------

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    asOf.isEmpty && filters.forall(f => FilterSql.toSql(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val preds = filters.flatMap(FilterSql.toSql)
    val sql = if (preds.isEmpty) "true" else preds.mkString("(", ") AND (", ")")
    tbl.deleteWhere(sql)
  }
}

/** Scan for a snapshot-pinned (time travel) table: no pruning, Spark
  * applies all filters on the scanned rows.
  */
final class PinnedScanBuilder(df: () => DataFrame) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: Option[StructType] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)
  override def build(): Scan = new V1Scan {
    override def readSchema(): StructType = required.getOrElse(df().schema)
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T = {
      val outSchema = readSchema()
      val relation = new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = outSchema
        override def buildScan(): RDD[Row] = {
          val base = df()
          val projected =
            if (outSchema.isEmpty) base.select()
            else base.select(outSchema.fieldNames.map(n => base(s"`$n`")): _*)
          projected.rdd
        }
      }
      relation.asInstanceOf[T]
    }
  }
}

final class GraftScanBuilder(tbl: GraftTable)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: Option[StructType] = None

  /** Keep the translatable filters for FILE pruning but return every
    * filter as residual — Spark re-evaluates them row-level, so an
    * unsound pruner translation can only cost performance, never rows.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => FilterSql.toSql(f).isDefined)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  override def build(): Scan = new GraftV1Scan(tbl, pushed, required)
}

final class GraftV1Scan(tbl: GraftTable, pushed: Array[Filter],
                        required: Option[StructType]) extends V1Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = required.getOrElse(tbl.schema)

  /** translated pushed filters, shared by scan, stats, and description
    * so the three can never diverge */
  private lazy val predSql: Option[String] = {
    val preds = pushed.flatMap(FilterSql.toSql)
    if (preds.isEmpty) None else Some(preds.mkString("(", ") AND (", ")"))
  }

  /** Exact statistics from snapshot metadata (post file-pruning).
    * NOTE: Spark's `V1ScanWrapper` does not forward this interface, so
    * these numbers do NOT reach static join planning through the V1
    * bridge today — AQE's runtime sizes handle the broadcast decision
    * there. The implementation exists for direct consumers and for any
    * future path that reads the scan unwrapped; it is exercised by
    * ConnectorSpec.
    */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(statsFiles.map(_.sizeBytes).sum)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(statsFiles.map(_.rows).sum)
    }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val outSchema = readSchema()
    val relation = new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = outSchema
      override def buildScan(): RDD[Row] = {
        val df = predSql match {
          case None => tbl.scan()
          case Some(p) => tbl.scanWhere(p)
        }
        val projected =
          if (outSchema.isEmpty) df.select()
          else df.select(outSchema.fieldNames.map(n => df(s"`$n`")): _*)
        projected.rdd
      }
    }
    relation.asInstanceOf[T]
  }

  private lazy val statsFiles: Seq[graft.meta.DataFile] = predSql match {
    case None => tbl.currentOrFail().files
    case Some(p) => tbl.prunedFiles(p)
  }

  override def description(): String =
    s"GraftScan(files pruned by: ${predSql.getOrElse("<none>")})"
}

final class GraftWriteBuilder(tbl: GraftTable)
    extends WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {

  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, ovr: Boolean): Unit =
          if (overwrite || ovr) tbl.overwrite(data) else tbl.append(data)
      }
  }
}

/** v1 `sources.Filter` → SQL predicate text for the driver-side file
  * pruners. Untranslatable filters return None and simply don't prune.
  */
object FilterSql {

  def toSql(f: Filter): Option[String] = f match {
    case sources.AlwaysTrue() => Some("true")
    case sources.AlwaysFalse() => Some("false")
    case sources.EqualTo(a, v) => bin(a, "=", v)
    case sources.GreaterThan(a, v) => bin(a, ">", v)
    case sources.GreaterThanOrEqual(a, v) => bin(a, ">=", v)
    case sources.LessThan(a, v) => bin(a, "<", v)
    case sources.LessThanOrEqual(a, v) => bin(a, "<=", v)
    case sources.IsNull(a) => col(a).map(c => s"$c IS NULL")
    case sources.IsNotNull(a) => col(a).map(c => s"$c IS NOT NULL")
    case sources.In(a, vs) if vs.nonEmpty && vs.forall(_ != null) =>
      for { c <- col(a); ls <- sequence(vs.toSeq.map(lit)) }
        yield s"$c IN (${ls.mkString(", ")})"
    case sources.And(l, r) =>
      for { ls <- toSql(l); rs <- toSql(r) } yield s"($ls) AND ($rs)"
    case sources.Or(l, r) =>
      for { ls <- toSql(l); rs <- toSql(r) } yield s"($ls) OR ($rs)"
    case sources.Not(c) => toSql(c).map(s => s"NOT ($s)")
    case _ => None
  }

  private def bin(a: String, op: String, v: Any): Option[String] =
    for { c <- col(a); l <- lit(v) } yield s"$c $op $l"

  /** Top-level columns only — nested fields don't reach the pruners. */
  private def col(a: String): Option[String] =
    if (a.contains('.')) None else Some(s"`$a`")

  private def lit(v: Any): Option[String] = v match {
    case null => None
    // Spark SQL single-quoted literals treat backslash as an escape —
    // an unescaped backslash would change the value and prune the
    // WRONG files (data loss, not just a slow read)
    case s: String =>
      Some("'" + s.replace("\\", "\\\\").replace("'", "''") + "'")
    case b: Boolean => Some(b.toString)
    // NaN / Infinity have no SQL literal form — don't translate (the
    // filter simply won't prune; Spark still applies it to rows)
    case f: Float if f.isNaN || f.isInfinite => None
    case d: Double if d.isNaN || d.isInfinite => None
    case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double) =>
      Some(n.toString)
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: java.sql.Date => Some(s"DATE '$d'")
    case d: java.time.LocalDate => Some(s"DATE '$d'")
    // render LTZ instants in ISO-8601 UTC ('Z' suffix): Timestamp
    // .toString is JVM-default-timezone local text, which reparsed
    // under spark.sql.session.timeZone would SHIFT the instant —
    // authoritative in DELETE and in scanWhere's row filter
    case t: java.sql.Timestamp => Some(s"TIMESTAMP '${t.toInstant}'")
    case t: java.time.Instant => Some(s"TIMESTAMP '$t'")
    // NTZ literal keeps the comparison timezone-independent (a plain
    // TIMESTAMP literal is LTZ and would shift under non-UTC sessions)
    case t: java.time.LocalDateTime => Some(s"TIMESTAMP_NTZ '$t'")
    case _ => None
  }

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}
