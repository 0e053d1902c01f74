package graft.connector

import java.util

import graft.meta.DataFile
import graft.table.GraftTable

import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The CDC surface of a graft table as a DSv2 relation —
  * `graft.ns.t.changes` — completing the Iceberg-changelog / Delta-CDF
  * analogy whose batch side is [[GraftTable.scanChangesBetween]]:
  *
  * {{{
  * -- batch: commits in (startingVersion, endingVersion]
  * spark.read.option("startingVersion", 0).table("graft.ns.t.changes")
  * -- streaming: offset = table version, rows tagged insert/delete
  * spark.readStream.option("streamStartVersion", "-1").table("graft.ns.t.changes")
  * }}}
  *
  * Schema = the table's columns + `_change_type` ('insert' | 'delete')
  * + `_commit_version`. Every commit kind is consumable — rewriting
  * commits (delete-where, upsert, compaction) emit file-level
  * delete+insert pairs, so unlike the plain append stream
  * ([[GraftMicroBatchStream]]) a CDC stream never aborts on them;
  * net-zero rewrites net to zero under inserts-minus-deletes.
  *
  * Planning is pure metadata (per-version manifest diffs on the
  * driver); files are read by the same native ParquetScan machinery as
  * batch scans, with the two CDC columns appended per-partition by a
  * reader wrapper — the tag is constant per (file, commit) so it costs
  * a JoinedRow, not a per-row computation. Column pruning and data-
  * column filters push through to the parquet scan: a consumer
  * projecting two columns reads two columns, and every filter stays
  * residual so pushdown is pure speedup, never semantics.
  */
final class GraftChangesTable(tbl: GraftTable, ident: Identifier)
    extends Table with SupportsRead {

  override def name(): String = ident.toString

  override def schema(): StructType = GraftCdc.changeSchema(tbl.schema)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftChangesScanBuilder(tbl, options)
}

final class GraftChangesScanBuilder(tbl: GraftTable,
                                    options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = GraftCdc.changeSchema(tbl.schema)
  private var pushed: Array[Filter] = Array.empty
  private var all: Array[Filter] = Array.empty

  /** Keep data-column filters for parquet row-group pruning; return
    * EVERY filter residual (Spark re-evaluates row-level), so CDC-
    * column predicates and untranslatable shapes lose nothing. The
    * full conjunction is also kept: predicates on the metadata columns
    * prune at PLAN time (skip change sides / whole versions) — see
    * [[GraftCdc.MetaPruning]].
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val dataCols = tbl.schema.fieldNames.map(_.toLowerCase).toSet
    pushed = filters.filter(_.references.forall(r => dataCols.contains(r.toLowerCase)))
    all = filters
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftChangesScan(tbl, options, required, pushed, GraftCdc.MetaPruning(all))
}

final class GraftChangesScan(tbl: GraftTable, options: CaseInsensitiveStringMap,
                             required: StructType, pushed: Array[Filter],
                             metaPrune: GraftCdc.MetaPruning)
    extends Scan {

  // the pruned read split into its parquet part and its constant part
  private val dataPart = StructType(
    required.fields.filter(f => tbl.schema.fieldNames.contains(f.name)))
  private val metaPart: Seq[String] =
    required.fields.map(_.name).filter(GraftCdc.MetaCols.contains).toSeq

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftChanges(${tbl.tableDir}, read=${required.fieldNames.mkString(",")}, " +
      s"pushed=[${pushed.mkString(", ")}], meta=$metaPrune)"

  override def toBatch: Batch = new Batch {
    private val from = Option(options.get("startingVersion")).map(_.toInt).getOrElse(0)
    private val to = Option(options.get("endingVersion")).map(_.toInt)
      .getOrElse(tbl.currentOrFail().version)

    override def planInputPartitions(): Array[InputPartition] =
      GraftCdc.partitionsBetween(tbl, from, to, dataPart, pushed, metaPrune)

    override def createReaderFactory(): PartitionReaderFactory =
      GraftCdc.readerFactory(tbl, dataPart, metaPart, pushed)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftCdcMicroBatchStream(tbl, options, dataPart, metaPart, pushed, metaPrune)
}

/** Streaming CDC: offset = metadata-log version (same durable total
  * order as [[GraftMicroBatchStream]], so the two stream kinds share
  * checkpoint semantics). `streamStartVersion` / `streamStartTimestamp`
  * choose the replay point (default: only commits AFTER stream start;
  * `-1` = genesis, emitting v0's state as inserts at version 0).
  * Catch-up pacing: `maxVersionsPerTrigger` caps the version span;
  * `maxFilesPerTrigger` / `maxRowsPerTrigger` reuse the append
  * stream's admission walk over per-version CHANGE sizes (insert +
  * delete sides) — admission stays version-granular either way, so
  * exactly-once per version is preserved.
  */
final class GraftCdcMicroBatchStream(tbl: GraftTable,
                                     options: CaseInsensitiveStringMap,
                                     dataPart: StructType,
                                     metaPart: Seq[String],
                                     pushed: Array[Filter],
                                     metaPrune: GraftCdc.MetaPruning =
                                       GraftCdc.MetaPruning.all)
    extends MicroBatchStream with SupportsTriggerAvailableNow
    with org.apache.spark.sql.connector.read.streaming.ReportsSourceMetrics {

  /** Same lag surface as the append stream: versions the consumer
    * trails the table head by, in `StreamingQueryProgress.sources[i]
    * .metrics` — the number an operator alarms on.
    */
  override def metrics(latestConsumed: java.util.Optional[Offset])
      : java.util.Map[String, String] = {
    val head = tbl.currentOrFail().version
    val consumed =
      if (latestConsumed.isPresent) latestConsumed.get match {
        case g: GraftStreamOffset => g.version
        case o => GraftStreamOffset.fromJson(o.json).version
      }
      else -1
    java.util.Map.of(
      "tableVersion", head.toString,
      "consumedVersion", consumed.toString,
      "versionsBehind", math.max(0, head - consumed).toString)
  }

  private val maxVersions = Option(options.get("maxVersionsPerTrigger")).map(_.toInt)

  @volatile private var availableNowEnd: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(tbl.currentOrFail().version)

  override def initialOffset(): Offset = {
    val v = Option(options.get("streamStartVersion")).map(_.toInt)
      .orElse(Option(options.get("streamStartTimestamp")).map { ts =>
        try tbl.snapshotAsOfTimestamp(ts.toLong - 1).version
        catch { case _: IllegalArgumentException => -1 }
      })
      .getOrElse(tbl.currentOrFail().version)
    GraftStreamOffset(v)
  }

  override def latestOffset(): Offset =
    GraftStreamOffset(availableNowEnd.getOrElse(tbl.currentOrFail().version))

  override def getDefaultReadLimit: ReadLimit = {
    val limits = Seq(
      Option(options.get("maxFilesPerTrigger")).map(s => ReadLimit.maxFiles(s.toInt)),
      Option(options.get("maxRowsPerTrigger")).map(s => ReadLimit.maxRows(s.toLong))).flatten
    limits match {
      case Seq()  => ReadLimit.allAvailable()
      case Seq(l) => l
      case ls     => ReadLimit.compositeLimit(ls.toArray)
    }
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftStreamOffset].version
    val latest = availableNowEnd.getOrElse(tbl.currentOrFail().version)
    def caps(l: ReadLimit): (Option[Int], Option[Long]) = l match {
      case f: ReadMaxFiles => (Some(f.maxFiles), None)
      case r: ReadMaxRows => (None, Some(r.maxRows))
      case c: CompositeReadLimit =>
        c.getReadLimits.map(caps).reduce { (a, b) =>
          (Seq(a._1, b._1).flatten.minOption, Seq(a._2, b._2).flatten.minOption)
        }
      case _ => (None, None)
    }
    val (maxFiles, maxRows) = caps(limit)
    val admitted =
      if (maxFiles.isEmpty && maxRows.isEmpty) latest
      else GraftMicroBatchStream.admitWalk(from, latest, maxFiles, maxRows) { v =>
        val (ins, del) = GraftCdc.diffAt(tbl, v)
        ((ins.size + del.size).toLong, ins.map(_.rows).sum + del.map(_.rows).sum)
      }
    GraftStreamOffset(maxVersions match {
      case Some(m) if admitted > from => math.min(from + math.max(1, m), admitted)
      case _ => admitted
    })
  }

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GraftCdc.partitionsBetween(tbl,
      start.asInstanceOf[GraftStreamOffset].version,
      end.asInstanceOf[GraftStreamOffset].version,
      dataPart, pushed, metaPrune)

  override def createReaderFactory(): PartitionReaderFactory =
    GraftCdc.readerFactory(tbl, dataPart, metaPart, pushed)

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint
  override def stop(): Unit = ()
}

private[graft] object GraftCdc {

  val MetaCols: Set[String] = Set("_change_type", "_commit_version")

  /** Plan-time pruning derived from predicates on the CDC metadata
    * columns. The filter array Spark pushes is a CONJUNCTION of
    * top-level filters, so any single conjunct bounding `_change_type`
    * or `_commit_version` may prune sides/versions soundly — every
    * filter also stays residual, so an unrecognized shape (Or, Not,
    * casts) merely loses the pruning, never rows. `WHERE _change_type =
    * 'insert'` plans zero delete-side scans; `WHERE _commit_version =
    * 5` walks one version instead of the whole range.
    */
  final case class MetaPruning(changeTypes: Option[Set[String]],
                               minVersion: Option[Int],
                               maxVersion: Option[Int],
                               versionSet: Option[Set[Int]]) {
    def sideAllowed(tag: String): Boolean = changeTypes.forall(_.contains(tag))
    def versionAllowed(v: Int): Boolean =
      minVersion.forall(v >= _) && maxVersion.forall(v <= _) &&
        versionSet.forall(_.contains(v))
    override def toString: String = {
      val parts = changeTypes.map(t => s"type in ${t.mkString("{", ",", "}")}").toSeq ++
        minVersion.map(v => s"v>=$v") ++ maxVersion.map(v => s"v<=$v") ++
        versionSet.map(s => s"v in ${s.toSeq.sorted.mkString("{", ",", "}")}")
      if (parts.isEmpty) "all" else parts.mkString(" and ")
    }
  }

  object MetaPruning {
    val all: MetaPruning = MetaPruning(None, None, None, None)

    def apply(filters: Array[Filter]): MetaPruning = {
      import org.apache.spark.sql.sources._
      def asInt(v: Any): Option[Int] = v match {
        case i: Int => Some(i)
        case l: Long if l.isValidInt => Some(l.toInt)
        case s: Short => Some(s.toInt)
        case _ => None
      }
      var ct: Option[Set[String]] = None
      var lo: Option[Int] = None
      var hi: Option[Int] = None
      var vs: Option[Set[Int]] = None
      def tightenCt(s: Set[String]): Unit =
        ct = Some(ct.map(_.intersect(s)).getOrElse(s))
      def tightenLo(v: Int): Unit = lo = Some(lo.map(math.max(_, v)).getOrElse(v))
      def tightenHi(v: Int): Unit = hi = Some(hi.map(math.min(_, v)).getOrElse(v))
      filters.foreach {
        case EqualTo("_change_type", s: String) => tightenCt(Set(s))
        case EqualNullSafe("_change_type", s: String) => tightenCt(Set(s))
        case In("_change_type", vals) =>
          tightenCt(vals.collect { case s: String => s }.toSet)
        case EqualTo("_commit_version", v) =>
          asInt(v).foreach { i => tightenLo(i); tightenHi(i) }
        case EqualNullSafe("_commit_version", v) =>
          asInt(v).foreach { i => tightenLo(i); tightenHi(i) }
        case GreaterThan("_commit_version", v) => asInt(v).foreach(i => tightenLo(i + 1))
        case GreaterThanOrEqual("_commit_version", v) => asInt(v).foreach(tightenLo)
        case LessThan("_commit_version", v) => asInt(v).foreach(i => tightenHi(i - 1))
        case LessThanOrEqual("_commit_version", v) => asInt(v).foreach(tightenHi)
        case In("_commit_version", vals) =>
          val ints = vals.flatMap(asInt).toSet
          if (ints.size == vals.length)
            vs = Some(vs.map(_.intersect(ints)).getOrElse(ints))
        case _ => () // unrecognized conjunct: no pruning from it
      }
      MetaPruning(ct, lo, hi, vs)
    }
  }

  def changeSchema(dataSchema: StructType): StructType =
    StructType(dataSchema.fields :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", IntegerType, nullable = false))

  /** (inserted, deleted) file sets of commit `v` — the same snapshot
    * diff [[GraftTable.scanChangesBetween]] walks, shared by admission
    * sizing and partition planning.
    *
    * Merge-on-read interplay: the DSv2 change feed reads RAW file
    * diffs (one parquet partition per changed file), which is exact
    * only while no merge-on-read delete is involved. Three shapes
    * can't be represented as file scans and fail loudly with guidance
    * instead of silently emitting wrong rows: (1) the commit ADDED
    * delete groups (its change is a join, not a file diff); (2) it
    * removed files that pending deletes applied to (their raw rows
    * overstate the delete side); (3) it re-added files under pending
    * deletes (rollback). Plain appends on a table with pending deletes
    * are fine — new files carry a higher data seq than every delete.
    * `GraftTable.scanChangesBetween` handles all three exactly;
    * `compact()` clears the state for the feed.
    */
  def diffAt(tbl: GraftTable, v: Int): (Seq[DataFile], Seq[DataFile]) = {
    def morUnsupported(what: String): Nothing =
      throw new UnsupportedOperationException(
        s"graft change feed over ${tbl.tableDir}: commit v$v $what; the DSv2 " +
          "changes relation reads raw file diffs and cannot apply " +
          "merge-on-read deletes — read this range with " +
          "GraftTable.scanChangesBetween (exact), or compact() the table " +
          "so later commits are delete-free")
    val cur = tbl.snapshotAt(v)
    // Raw file scans read with the relation's CURRENT column names;
    // ranges touching name-evolution history (files written under an
    // older naming, or a rename/drop after this commit) would misread
    // those physical names — fail with guidance like the MoR shapes.
    def renameUnsupported(): Nothing =
      throw new UnsupportedOperationException(
        s"graft change feed over ${tbl.tableDir}: commit v$v touches column " +
          "rename/drop history; the DSv2 changes relation reads raw file " +
          "scans by current column names — read this range with " +
          "GraftTable.scanChangesBetween (maps physical names by field id), " +
          "or compact() the table so files carry the current names")
    def naming(s: StructType) = s.fields
      .flatMap(f => graft.table.Projection.fieldId(f).map(_ -> f.name)).toMap
    val nowNaming = naming(tbl.currentOrFail().schema)
    if (cur.schemaLog.nonEmpty ||
        naming(cur.schema).exists { case (id, n) => nowNaming.get(id).exists(_ != n) })
      renameUnsupported()
    if (v == 0) (cur.files, Seq.empty)
    else {
      val prev = tbl.snapshotAt(v - 1)
      if (prev.schemaLog.nonEmpty) renameUnsupported()
      val before = prev.files.map(_.path).toSet
      val after = cur.files.map(_.path).toSet
      val prevSeqs = prev.deleteGroups.map(_.seq).toSet
      if (cur.deleteGroups.exists(d => !prevSeqs.contains(d.seq)))
        morUnsupported("added merge-on-read delete groups")
      if (prev.deleteGroups.nonEmpty &&
          prev.fileGroups.exists(g => prev.deleteGroups.exists(_.appliesTo(g.seq)) &&
            g.files.exists(f => !after.contains(f.path))))
        morUnsupported("rewrote files under pending merge-on-read deletes")
      val ins = cur.files.filterNot(f => before.contains(f.path))
      if (cur.deleteGroups.nonEmpty && ins.nonEmpty) {
        val insPaths = ins.map(_.path).toSet
        if (cur.fileGroups.exists(g => cur.deleteGroups.exists(_.appliesTo(g.seq)) &&
            g.files.exists(f => insPaths.contains(f.path))))
          morUnsupported("re-added files under pending merge-on-read deletes")
      }
      (ins, prev.files.filterNot(f => after.contains(f.path)))
    }
  }

  /** One CDC partition = a delegate parquet partition plus the constant
    * (change side, commit version) it carries.
    */
  final case class CdcPartition(delegate: InputPartition, changeType: String,
                                version: Int) extends InputPartition {
    override def preferredLocations(): Array[String] = delegate.preferredLocations()
  }

  /** Per-version file diffs of (`from`, `to`] as tagged partitions —
    * the same commit walk as [[GraftTable.scanChangesBetween]], emitted
    * as DSv2 partitions instead of a unioned plan. O(changed manifests)
    * metadata work per version; a version's insert and delete sides
    * each plan through one native ParquetScan.
    */
  def partitionsBetween(tbl: GraftTable, from: Int, to: Int,
                        dataPart: StructType,
                        pushed: Array[Filter],
                        metaPrune: MetaPruning = MetaPruning.all): Array[InputPartition] = {
    require(from <= to, s"bad change range: $from..$to")
    val out = Array.newBuilder[InputPartition]
    var v = math.max(from + 1, 0)
    try {
      while (v <= to) {
        if (metaPrune.versionAllowed(v)) {
          val (ins, del) = diffAt(tbl, v)
          if (ins.nonEmpty && metaPrune.sideAllowed("insert"))
            out ++= scanFor(tbl, ins, dataPart, pushed).toBatch.planInputPartitions()
              .map(p => CdcPartition(p, "insert", v))
          if (del.nonEmpty && metaPrune.sideAllowed("delete"))
            out ++= scanFor(tbl, del, dataPart, pushed).toBatch.planInputPartitions()
              .map(p => CdcPartition(p, "delete", v))
        }
        v += 1
      }
    } catch {
      case e @ (_: java.nio.file.NoSuchFileException | _: java.io.FileNotFoundException) =>
        throw new IllegalStateException(
          s"graft change feed over ${tbl.tableDir} needs version $v, which has " +
            "been removed by expire_snapshots; the requested range is gone and " +
            "cannot be replayed. Restart from a live startingVersion / fresh " +
            "checkpoint.", e)
    }
    out.result()
  }

  /** One template factory serves every batch: file identity rides in
    * each delegate FilePartition; the wrapper appends the requested CDC
    * columns.
    */
  def readerFactory(tbl: GraftTable, dataPart: StructType,
                    metaPart: Seq[String],
                    pushed: Array[Filter]): PartitionReaderFactory =
    new CdcReaderFactory(
      scanFor(tbl, Nil, dataPart, pushed).toBatch.createReaderFactory(), metaPart)

  private def scanFor(tbl: GraftTable, files: Seq[DataFile],
                      dataPart: StructType, pushed: Array[Filter]): ParquetScan = {
    val spark = tbl.spark
    ParquetScan(
      sparkSession = spark,
      hadoopConf = GraftSqlShim.newHadoopConf(spark),
      fileIndex = new GraftFileIndex(spark, tbl.tableDir, files, tbl.schema),
      dataSchema = tbl.schema,
      readDataSchema = dataPart,
      readPartitionSchema = StructType(Nil),
      pushedFilters = pushed, // row-group pruning only; all residual above
      options = CaseInsensitiveStringMap.empty())
  }

  /** Wraps the parquet reader, appending the REQUESTED subset of
    * (`_change_type`, `_commit_version`) via a reused JoinedRow.
    * Row-based on purpose: the appended columns are partition
    * constants, and forcing the row path keeps the wrapper a 5-line
    * JoinedRow instead of a columnar-batch rebuild.
    */
  private final class CdcReaderFactory(delegate: PartitionReaderFactory,
                                       metaPart: Seq[String])
      extends PartitionReaderFactory {

    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      partition match {
        case c: CdcPartition =>
          val inner = delegate.createReader(c.delegate)
          val meta = new GenericInternalRow(metaPart.map {
            case "_change_type" => UTF8String.fromString(c.changeType): Any
            case "_commit_version" => c.version: Any
          }.toArray)
          val joined = new JoinedRow
          new PartitionReader[InternalRow] {
            override def next(): Boolean = inner.next()
            override def get(): InternalRow = joined(inner.get(), meta)
            override def close(): Unit = inner.close()
          }
        case other => delegate.createReader(other)
      }

    override def supportColumnarReads(partition: InputPartition): Boolean = false
  }
}
