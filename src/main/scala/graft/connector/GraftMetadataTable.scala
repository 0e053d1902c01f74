package graft.connector

import java.util

import graft.table.GraftTable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style SQL metadata tables: `SELECT * FROM graft.ns.t.history`
  * (= `.snapshots`) and `graft.ns.t.files` — the commit log and the
  * current snapshot's file inventory as queryable relations. Served as
  * a [[LocalScan]]: the rows ARE driver-side metadata (the snapshot
  * log), so shipping them through a distributed scan would only add
  * overhead. Row counts are O(commits) / O(files of one snapshot) —
  * the same order the driver already holds to plan any query.
  *
  * `asOfVersion` pins the relation to a historic snapshot (SQL
  * `VERSION AS OF v`, the Iceberg metadata-table time-travel surface):
  * `.files` lists THAT snapshot's inventory, `.history`/`.snapshots`
  * truncate to commits ≤ v — what the log looked like then.
  */
final class GraftMetadataTable(tbl: GraftTable, kind: String,
                               fullName: String,
                               asOfVersion: Option[Int] = None)
    extends Table with SupportsRead {

  override def name(): String = fullName

  override def schema(): StructType = kind match {
    case "history" | "snapshots" => GraftMetadataTable.HistorySchema
    case "files" => GraftMetadataTable.FilesSchema
    case "partitions" => GraftMetadataTable.PartitionsSchema
    case "refs" => GraftMetadataTable.RefsSchema
    case "deletes" => GraftMetadataTable.DeletesSchema
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  private def rows(): Array[InternalRow] = kind match {
    case "history" | "snapshots" =>
      tbl.historyTuples()
        .filter { case (v, _, _, _, _, _, _, _) => asOfVersion.forall(v <= _) }
        .map { case (v, sid, pid, ts, op, sv, fc, rc) =>
          new GenericInternalRow(Array[Any](
            v, sid, pid.map(Long.box).orNull, ts, UTF8String.fromString(op),
            sv, fc, rc))
        }.toArray
    case "files" =>
      asOfVersion.map(tbl.snapshotAt).getOrElse(tbl.currentOrFail()).files.map { f =>
        // zone maps as a compact text column: the small-file / skew /
        // clustering-health diagnosis surface without parsing manifests
        val stats = f.stats.toSeq.sortBy(_._1).map { case (c, cs) =>
          s"$c=[${cs.min.getOrElse("")}..${cs.max.getOrElse("")}" +
            cs.nullCount.map(n => s", nulls=$n").getOrElse("") + "]"
        }.mkString("; ")
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(f.path), f.rows, f.sizeBytes,
          renderPartition(f).orNull,
          if (stats.isEmpty) null else UTF8String.fromString(stats)))
      }.toArray
    case "partitions" =>
      asOfVersion.map(tbl.snapshotAt).getOrElse(tbl.currentOrFail()).files
        .groupBy(f => renderPartition(f))
        .toSeq.sortBy(_._1.map(_.toString).getOrElse(""))
        .map { case (part, fs) =>
          new GenericInternalRow(Array[Any](
            part.orNull, fs.size, fs.map(_.rows).sum, fs.map(_.sizeBytes).sum))
        }.toArray
    case "refs" =>
      // tags pin a MAIN-log version; branch rows report the branch
      // HEAD (version in the branch's own numbering), Iceberg's
      // two-kind .refs surface
      val tagRows = tbl.tags().toSeq.sortBy(_._1).map { case (name, v) =>
        val snap = tbl.snapshotAt(v)
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(name), UTF8String.fromString("TAG"),
          v, snap.snapshotId, snap.timestampMs))
      }
      val branchRows = tbl.listBranches().map { name =>
        val head = tbl.branch(name).currentOrFail()
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(name), UTF8String.fromString("BRANCH"),
          head.version, head.snapshotId, head.timestampMs))
      }
      (tagRows ++ branchRows).toArray
    case "deletes" =>
      asOfVersion.map(tbl.snapshotAt).getOrElse(tbl.currentOrFail())
        .deleteGroups.sortBy(_.seq).map {
          case e: graft.meta.EqualityDeleteGroup =>
            new GenericInternalRow(Array[Any](
              e.seq, UTF8String.fromString("equality"),
              UTF8String.fromString(s"keys(${e.keys.mkString(", ")})"),
              e.group.rows, e.group.bytes))
          case graft.meta.PredicateDeleteGroup(seq, pred) =>
            new GenericInternalRow(Array[Any](
              seq, UTF8String.fromString("predicate"),
              UTF8String.fromString(pred), null, null))
          case graft.meta.PositionDeleteGroup(seq, group) =>
            new GenericInternalRow(Array[Any](
              seq, UTF8String.fromString("position"),
              UTF8String.fromString("(file, pos)"),
              group.rows, group.bytes))
        }.toArray
  }

  private def renderPartition(f: graft.meta.DataFile): Option[UTF8String] =
    f.partitionValues.map(pv => UTF8String.fromString(
      pv.toSeq.sortBy(_._1).map { case (k, v) => s"$k=${v.getOrElse("null")}" }
        .mkString(", ")))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new LocalScan {
      override def rows(): Array[InternalRow] = GraftMetadataTable.this.rows()
      override def readSchema(): StructType = schema()
      override def description(): String = s"GraftMetadata($fullName)"
    }
}

object GraftMetadataTable {
  val Kinds: Set[String] = Set("history", "snapshots", "files", "partitions", "refs", "deletes")

  val HistorySchema: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false),
    StructField("parent_id", LongType),
    StructField("timestamp_ms", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("schema_version", IntegerType, nullable = false),
    StructField("file_count", IntegerType, nullable = false),
    StructField("row_count", LongType, nullable = false)))

  val FilesSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("partition_values", StringType),
    StructField("column_stats", StringType)))

  /** Per-partition rollup of the (possibly version-pinned) snapshot's
    * inventory — the small-file / skew diagnosis surface (Iceberg's
    * `.partitions`). NULL partition = unpartitioned table's files.
    */
  val PartitionsSchema: StructType = StructType(Seq(
    StructField("partition_values", StringType),
    StructField("file_count", IntegerType, nullable = false),
    StructField("row_count", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  /** Named refs (tags + branches): `SELECT * FROM g.ns.t.refs` — which
    * versions are pinned/forked and reproducible (Iceberg's `.refs`,
    * including its TAG/BRANCH `type` discriminator).
    */
  val RefsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("version", IntegerType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false)))

  /** `graft.ns.t.deletes` — the pending merge-on-read delete groups:
    * the operator's "how much masked data is my table carrying, should
    * I compact" dashboard.
    */
  val DeletesSchema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("detail", StringType, nullable = false),
    StructField("key_rows", LongType, nullable = true),
    StructField("bytes", LongType, nullable = true)))
}
