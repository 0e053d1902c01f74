package graft

import graft.meta.{DataFile, MetadataLog, Snapshot}

import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Forked-JVM writer for the cross-process commit-contention test
  * ([[MetadataLogSpec]]): appends `n` single-file snapshots to the table
  * at `args(0)`, tagging each data-file path with this writer's id so
  * the parent process can verify that no commit was lost. No Spark
  * session — the contention under test lives entirely in
  * [[MetadataLog.commit]]'s atomic-publish protocol.
  */
object ConcurrentWriterMain {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    val writerId = args(1)
    val n = args(2).toInt
    val log = new MetadataLog(dir)
    val schema = StructType(Seq(StructField("id", LongType)))
    var i = 0
    while (i < n) {
      val group = log.writeManifest(
        Seq(DataFile(s"data/$writerId-$i.parquet", 1L, 1L, None)), Some(schema))
      log.commit { parent =>
        parent match {
          case Some(p) => p.copy(
            snapshotId = java.util.UUID.randomUUID().getMostSignificantBits,
            operation = "append",
            fileGroups = p.fileGroups :+ group)
          case None => Snapshot(
            version = 0,
            snapshotId = java.util.UUID.randomUUID().getMostSignificantBits,
            parentId = None,
            timestampMs = 0L,
            operation = "append",
            schema = schema,
            schemaVersion = 0,
            partitionSpec = None,
            properties = Map.empty,
            fileGroups = Seq(group))
        }
      }
      i += 1
    }
  }
}
