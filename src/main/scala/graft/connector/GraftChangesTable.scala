package graft.connector

import java.util

import graft.meta.DataFile
import graft.table.GraftTable

import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
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
  * a JoinedRow, not a per-row computation.
  */
final class GraftChangesTable(tbl: GraftTable, ident: Identifier)
    extends Table with SupportsRead {

  override def name(): String = ident.toString

  override def schema(): StructType = GraftCdc.changeSchema(tbl.schema)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftChangesScan(tbl, options)
}

final class GraftChangesScan(tbl: GraftTable, options: CaseInsensitiveStringMap)
    extends Scan {

  override def readSchema(): StructType = GraftCdc.changeSchema(tbl.schema)

  override def description(): String = s"GraftChanges(${tbl.tableDir})"

  override def toBatch: Batch = new Batch {
    private val from = Option(options.get("startingVersion")).map(_.toInt).getOrElse(0)
    private val to = Option(options.get("endingVersion")).map(_.toInt)
      .getOrElse(tbl.currentOrFail().version)

    override def planInputPartitions(): Array[InputPartition] =
      GraftCdc.partitionsBetween(tbl, from, to)

    override def createReaderFactory(): PartitionReaderFactory =
      GraftCdc.readerFactory(tbl)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftCdcMicroBatchStream(tbl, options)
}

/** Streaming CDC: offset = metadata-log version (same durable total
  * order as [[GraftMicroBatchStream]], so the two stream kinds share
  * checkpoint semantics). `streamStartVersion` / `streamStartTimestamp`
  * choose the replay point (default: only commits AFTER stream start;
  * `-1` = genesis, emitting v0's state as inserts at version 0);
  * `maxVersionsPerTrigger` paces catch-up — admission is version-
  * granular, preserving exactly-once per version.
  */
final class GraftCdcMicroBatchStream(tbl: GraftTable,
                                     options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

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

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftStreamOffset].version
    val latest = availableNowEnd.getOrElse(tbl.currentOrFail().version)
    GraftStreamOffset(maxVersions match {
      case Some(m) if latest > from => math.min(from + math.max(1, m), latest)
      case _ => latest
    })
  }

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GraftCdc.partitionsBetween(tbl,
      start.asInstanceOf[GraftStreamOffset].version,
      end.asInstanceOf[GraftStreamOffset].version)

  override def createReaderFactory(): PartitionReaderFactory =
    GraftCdc.readerFactory(tbl)

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint
  override def stop(): Unit = ()
}

private[connector] object GraftCdc {

  def changeSchema(dataSchema: StructType): StructType =
    StructType(dataSchema.fields :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", IntegerType, nullable = false))

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
  def partitionsBetween(tbl: GraftTable, from: Int, to: Int): Array[InputPartition] = {
    require(from <= to, s"bad change range: $from..$to")
    val out = Array.newBuilder[InputPartition]
    var v = math.max(from + 1, 0)
    try {
      while (v <= to) {
        val cur = tbl.snapshotAt(v)
        val (ins, del) =
          if (v == 0) (cur.files, Seq.empty[DataFile])
          else {
            val prev = tbl.snapshotAt(v - 1)
            val before = prev.files.map(_.path).toSet
            val after = cur.files.map(_.path).toSet
            (cur.files.filterNot(f => before.contains(f.path)),
              prev.files.filterNot(f => after.contains(f.path)))
          }
        if (ins.nonEmpty)
          out ++= scanFor(tbl, ins).toBatch.planInputPartitions()
            .map(p => CdcPartition(p, "insert", v))
        if (del.nonEmpty)
          out ++= scanFor(tbl, del).toBatch.planInputPartitions()
            .map(p => CdcPartition(p, "delete", v))
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
    * each delegate FilePartition; the wrapper appends the CDC columns.
    */
  def readerFactory(tbl: GraftTable): PartitionReaderFactory =
    new CdcReaderFactory(scanFor(tbl, Nil).toBatch.createReaderFactory())

  private def scanFor(tbl: GraftTable, files: Seq[DataFile]): ParquetScan = {
    val spark = tbl.spark
    ParquetScan(
      sparkSession = spark,
      hadoopConf = GraftSqlShim.newHadoopConf(spark),
      fileIndex = new GraftFileIndex(spark, tbl.tableDir, files, tbl.schema),
      dataSchema = tbl.schema,
      readDataSchema = tbl.schema,
      readPartitionSchema = StructType(Nil),
      pushedFilters = Array.empty,
      options = CaseInsensitiveStringMap.empty())
  }

  /** Wraps the parquet reader, appending (`_change_type`,
    * `_commit_version`) via a reused JoinedRow. Row-based on purpose:
    * the two appended columns are partition constants, and forcing the
    * row path keeps the wrapper a 5-line JoinedRow instead of a
    * columnar-batch rebuild.
    */
  private final class CdcReaderFactory(delegate: PartitionReaderFactory)
      extends PartitionReaderFactory {

    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      partition match {
        case c: CdcPartition =>
          val inner = delegate.createReader(c.delegate)
          val meta = new GenericInternalRow(Array[Any](
            UTF8String.fromString(c.changeType), c.version))
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
