package graft.connector

import graft.meta.DataFile

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.execution.datasources.{PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.types.StructType

import scala.collection.mutable

/** A `FileIndex` fed ENTIRELY from graft snapshot metadata: file paths
  * and sizes come from the manifest's [[DataFile]] records, so planning
  * a scan performs ZERO filesystem listing or stat calls — the property
  * that matters on an object store with 10⁵ files per snapshot, where a
  * driver-side recursive listing is the slowest (and most throttled)
  * part of query planning. This is the graft analogue of Iceberg's
  * scan-task planning, expressed as the interface Spark's own DSv2
  * Parquet reader consumes.
  *
  * Partition pruning already happened upstream (manifest summaries +
  * per-file partition/zone-map pruners chose `dataFiles`), so the index
  * reports an empty partition spec and every file as one leaf — Spark
  * sees exactly the pruned file set and plans splits over it.
  */
final class GraftFileIndex(
    spark: SparkSession,
    tableRoot: HPath,
    dataFiles: Seq[DataFile],
    tableSchema: StructType)
    extends PartitioningAwareFileIndex(spark, Map.empty, Some(tableSchema)) {

  // modification time 0 is deliberate: metadata-derived statuses must be
  // stable so FileScan equality/caching keys don't churn, and graft data
  // files are immutable anyway. Paths are FS-qualified because
  // PartitioningAwareFileIndex.allFiles matches root paths against the
  // leaf maps via qualified-path equality (file:///x and file:/x are
  // DIFFERENT hadoop Paths).
  private val statuses: Seq[FileStatus] = {
    val fs = tableRoot.getFileSystem(GraftSqlShim.newHadoopConf(spark))
    dataFiles.map { f =>
      new FileStatus(f.sizeBytes, false, 1, 128L * 1024 * 1024, 0L,
        fs.makeQualified(new HPath(tableRoot, f.path)))
    }
  }

  /** The leaf DIRECTORIES (one per commit/partition dir): `allFiles`
    * looks each root path up in `leafDirToChildrenFiles`.
    */
  override def rootPaths: Seq[HPath] = statuses.map(_.getPath.getParent).distinct

  // precomputed vals, not defs: PartitioningAwareFileIndex.allFiles /
  // listFiles consult these maps several times per planning pass, and
  // the file set is immutable for the pinned snapshot — rebuilding a
  // 10⁵-entry map per call is pure waste at the scale this index targets
  private val leafFileMap: mutable.LinkedHashMap[HPath, FileStatus] = {
    val m = mutable.LinkedHashMap.empty[HPath, FileStatus]
    statuses.foreach(s => m.put(s.getPath, s))
    m
  }

  private val leafDirMap: Map[HPath, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).view.mapValues(_.toArray).toMap

  override protected def leafFiles: mutable.LinkedHashMap[HPath, FileStatus] = leafFileMap

  override protected def leafDirToChildrenFiles: Map[HPath, Array[FileStatus]] = leafDirMap

  // the index IS the file list: skip the base class's per-call
  // root-path walk over the leaf maps (O(files) rebuild per planner
  // call) and hand back the immutable statuses directly
  override def allFiles(): Seq[FileStatus] = statuses

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override def refresh(): Unit = () // snapshot-pinned: nothing to refresh

  override def sizeInBytes: Long = dataFiles.map(_.sizeBytes).sum
}
