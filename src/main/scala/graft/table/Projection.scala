package graft.table

import graft.meta.Snapshot

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema projection / coercion (reference P1/P2,
  * `src/iceberg_loader/utils/arrow.py:75-134`).
  *
  * Projects an incoming DataFrame onto a target table schema:
  *   - columns are reordered to the target order;
  *   - missing columns are null-filled (`utils/arrow.py:121-126`);
  *   - present columns are cast with null-on-failure semantics via
  *     `try_cast` (per-value, a strict improvement over the reference's
  *     whole-column null-fill — SURVEY §7.4 documents the divergence);
  *   - extra incoming columns are dropped (the reference's projection
  *     selects only target fields, `utils/arrow.py:128-132`).
  *
  * Everything is a plain `select`, so Catalyst folds it into the write
  * plan — no extra pass over the data at any scale.
  */
object Projection {

  /** Case-insensitive column resolution, like Spark's default analyzer. */
  private def find(df: DataFrame, name: String): Option[StructField] =
    df.schema.fields.find(_.name.equalsIgnoreCase(name))

  def project(df: DataFrame, target: StructType): DataFrame = {
    val cols: Seq[Column] = target.fields.toSeq.map { tf =>
      find(df, tf.name) match {
        case Some(sf) if sf.dataType == tf.dataType =>
          col(s"`${sf.name}`").as(tf.name)
        case Some(sf) =>
          col(s"`${sf.name}`").try_cast(tf.dataType).as(tf.name)
        case None =>
          lit(null).cast(tf.dataType).as(tf.name)
      }
    }
    df.select(cols: _*)
  }

  /** Is `to` a legal type WIDENING of `from`? The Iceberg promotion
    * set (int→long, float→double, decimal precision growth) plus the
    * smaller integrals and decimal scale growth — every case is one
    * Spark 4's vectorized parquet reader upcasts natively, so files
    * written under the old type read back through the widened schema
    * without a rewrite. Value-preserving only: the integer part of a
    * decimal may never shrink, and no narrowing is ever legal.
    */
  def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (f: DecimalType, t: DecimalType) =>
      (t.precision - t.scale) >= (f.precision - f.scale) && t.scale >= f.scale &&
        (t.precision > f.precision || t.scale > f.scale)
    case _ => false
  }

  /** Top-level schema evolution (reference `core/schema.py:52-78`,
    * plus type widening the reference punts on): new incoming columns
    * are appended as nullable fields with `max(id)+1` IDs
    * (`core/schema.py:210-251`); existing columns whose incoming type
    * is a legal [[widens]] promotion take the wider type, KEEPING
    * their field ID — old data files read back through the widened
    * schema via the parquet reader's native upcast (no rewrite).
    * Returns None when nothing changes.
    */
  def evolve(current: StructType, incoming: StructType,
             minFieldId: Long = 0L): Option[StructType] = {
    var widenedAny = false
    val widened = current.fields.map { cf =>
      incoming.fields.find(_.name.equalsIgnoreCase(cf.name)) match {
        case Some(inf) if widens(cf.dataType, inf.dataType) =>
          widenedAny = true
          cf.copy(dataType = inf.dataType) // metadata (field ID) preserved
        case _ => cf
      }
    }
    val existingNames = current.fieldNames.map(_.toLowerCase).toSet
    val newFields = incoming.fields.filterNot(f => existingNames.contains(f.name.toLowerCase))
    if (newFields.isEmpty && !widenedAny) None
    else {
      // `minFieldId` floors the assignment above every id the table's
      // naming history ever used: a DROPPED column's id must never be
      // recycled, or the by-id physical-name mapping would resurrect
      // the dead column's values from pre-drop files
      var nextId = math.max(maxFieldId(current), minFieldId) + 1
      val appended = newFields.map { f =>
        val m = new MetadataBuilder()
          .withMetadata(f.metadata)
          .putLong(Snapshot.FieldIdKey, nextId)
          .build()
        nextId += 1
        StructField(f.name, f.dataType, nullable = true, m)
      }
      Some(StructType(widened ++ appended))
    }
  }

  /** Assign fresh sequential field IDs to a brand-new table schema. */
  def assignFieldIds(schema: StructType): StructType =
    StructType(schema.fields.zipWithIndex.map { case (f, i) =>
      val m = new MetadataBuilder()
        .withMetadata(f.metadata)
        .putLong(Snapshot.FieldIdKey, (i + 1).toLong)
        .build()
      f.copy(metadata = m)
    })

  def maxFieldId(schema: StructType): Long =
    schema.fields.flatMap { f =>
      if (f.metadata.contains(Snapshot.FieldIdKey)) Some(f.metadata.getLong(Snapshot.FieldIdKey))
      else None
    }.foldLeft(0L)(math.max)

  def fieldId(f: StructField): Option[Long] =
    if (f.metadata.contains(Snapshot.FieldIdKey)) Some(f.metadata.getLong(Snapshot.FieldIdKey))
    else None
}
