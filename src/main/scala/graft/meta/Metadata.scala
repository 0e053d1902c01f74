package graft.meta

import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** One data file tracked by a snapshot.
  *
  * `path` is relative to the table root (files are immutable and uniquely
  * named, so snapshots can share them). `partitionValues` maps derived
  * partition-field name → string value for file-level pruning; `None`
  * marks an unpartitioned file, `Some(... -> null)` a null partition
  * value (Hive default partition).
  */
final case class DataFile(
    path: String,
    rows: Long,
    sizeBytes: Long,
    partitionValues: Option[Map[String, Option[String]]])

/** A committed table version.
  *
  * Reproduces the observable snapshot semantics of the reference
  * (ids + timestamps at `core/loader.py:246-248`, one snapshot per flush
  * transaction at `core/strategies.py:32`, schema versions with preserved
  * field IDs at `core/schema.py:210-251`). Each snapshot is
  * self-contained — full schema, partition spec, properties, and file
  * list — so any version can be read (time travel) or expired
  * independently. At very large file counts the file list would move to
  * Iceberg-style manifest files; the commit protocol is unchanged by
  * that extension.
  *
  * Field IDs live in each StructField's metadata under `graft.field-id`
  * and survive schema evolution (`core/schema.py:210-251`).
  */
final case class Snapshot(
    version: Int,
    snapshotId: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String,
    schema: StructType,
    schemaVersion: Int,
    partitionSpec: Option[String],
    properties: Map[String, String],
    files: Seq[DataFile]) {
  def rowCount: Long = files.map(_.rows).sum
}

object Snapshot {
  val FieldIdKey = "graft.field-id"

  def toJson(s: Snapshot): String = {
    val files = JArray(s.files.map { f =>
      JObject(
        "path"  -> JString(f.path),
        "rows"  -> JLong(f.rows),
        "bytes" -> JLong(f.sizeBytes),
        "partition" -> (f.partitionValues match {
          case None => JNull
          case Some(vals) =>
            JObject(vals.toList.sortBy(_._1).map { case (k, v) =>
              k -> v.map(JString(_)).getOrElse(JNull)
            })
        }))
    }.toList)
    val obj = JObject(
      "version"        -> JInt(s.version),
      "snapshot_id"    -> JLong(s.snapshotId),
      "parent_id"      -> s.parentId.map(JLong(_)).getOrElse(JNull),
      "timestamp_ms"   -> JLong(s.timestampMs),
      "operation"      -> JString(s.operation),
      "schema"         -> JsonMethods.parse(s.schema.json),
      "schema_version" -> JInt(s.schemaVersion),
      "partition_spec" -> s.partitionSpec.map(JString(_)).getOrElse(JNull),
      "properties"     -> JObject(s.properties.toList.sortBy(_._1).map { case (k, v) => k -> JString(v) }),
      "files"          -> files)
    JsonMethods.pretty(JsonMethods.render(obj))
  }

  def fromJson(json: String): Snapshot = {
    val j = JsonMethods.parse(json)
    def str(f: JValue): String = f match { case JString(s) => s; case x => sys.error(s"bad string: $x") }
    def lng(f: JValue): Long = f match {
      case JLong(v) => v; case JInt(v) => v.toLong; case JDouble(v) => v.toLong
      case x => sys.error(s"bad long: $x")
    }
    def opt(f: JValue): Option[JValue] = f match { case JNull | JNothing => None; case v => Some(v) }
    val schema = DataType.fromJson(JsonMethods.compact(JsonMethods.render(j \ "schema"))).asInstanceOf[StructType]
    val files = (j \ "files") match {
      case JArray(arr) => arr.map { f =>
        val pv = (f \ "partition") match {
          case JNull | JNothing => None
          case JObject(kvs) => Some(kvs.map { case (k, v) =>
            k -> (v match { case JNull => None; case JString(s) => Some(s); case x => Some(x.toString) })
          }.toMap)
          case x => sys.error(s"bad partition: $x")
        }
        DataFile(str(f \ "path"), lng(f \ "rows"), lng(f \ "bytes"), pv)
      }
      case _ => Nil
    }
    val props = (j \ "properties") match {
      case JObject(kvs) => kvs.map { case (k, v) => k -> str(v) }.toMap
      case _            => Map.empty[String, String]
    }
    Snapshot(
      version = lng(j \ "version").toInt,
      snapshotId = lng(j \ "snapshot_id"),
      parentId = opt(j \ "parent_id").map(lng),
      timestampMs = lng(j \ "timestamp_ms"),
      operation = str(j \ "operation"),
      schema = schema,
      schemaVersion = lng(j \ "schema_version").toInt,
      partitionSpec = opt(j \ "partition_spec").map(str),
      properties = props,
      files = files)
  }
}
