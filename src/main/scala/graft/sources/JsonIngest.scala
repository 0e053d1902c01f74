package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Messy list-of-dicts → DataFrame normalization (S4/S5, mirrors
  * `src/iceberg_loader/utils/arrow.py:19-72,137-156`).
  *
  * Reference semantics reproduced:
  *   - column set = union of keys across all records, in first-seen
  *     order (`utils/arrow.py:27-29`);
  *   - nested dict/list values are JSON-serialized to strings
  *     (`utils/arrow.py:58-59`);
  *   - per-column type inference with fallback to string when values
  *     conflict (`utils/arrow.py:31-42`);
  *   - all-null columns become string (`utils/arrow.py:65-67`).
  *
  * Inference covers the reference registry's scalar shapes: Boolean,
  * Long (any int), Double, String. This runs on the DRIVER over
  * in-memory records — exactly like the reference, whose input is an
  * in-memory `list[dict]`; large JSON corpora go through
  * `spark.read.json` instead (distributed, same fallback behavior via
  * permissive mode).
  */
object JsonIngest {

  type Record = Seq[(String, Any)]

  def toJsonString(v: Any): String = v match {
    case null => "null"
    case m: Map[_, _] =>
      m.map { case (k, mv) => "\"" + escape(k.toString) + "\":" + toJsonString(mv) }
        .mkString("{", ",", "}")
    case s: Seq[_]  => s.map(toJsonString).mkString("[", ",", "]")
    case s: String  => "\"" + escape(s) + "\""
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Double | _: Float | _: Short | _: Byte) => n.toString
    case other => "\"" + escape(other.toString) + "\""
  }

  private def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Infer one column's Spark type from its non-null scalar values;
    * None means "fall back to string".
    */
  private def inferType(values: Seq[Any]): Option[DataType] = {
    val nonNull = values.filter(_ != null)
    if (nonNull.isEmpty) None // all-null ⇒ string (`utils/types.py:60-61`)
    else if (nonNull.forall(_.isInstanceOf[Boolean])) Some(BooleanType)
    else if (nonNull.forall(v => v.isInstanceOf[Int] || v.isInstanceOf[Long] ||
                                 v.isInstanceOf[Short] || v.isInstanceOf[Byte]))
      Some(LongType)
    else if (nonNull.forall {
      case _: Int | _: Long | _: Short | _: Byte | _: Double | _: Float => true
      case _ => false
    }) Some(DoubleType)
    else if (nonNull.forall(_.isInstanceOf[String])) Some(StringType)
    else None // mixed ⇒ string fallback (`utils/arrow.py:37-42`)
  }

  def createDataFrame(spark: SparkSession, records: Seq[Record]): DataFrame = {
    require(records.nonEmpty, "Cannot create a table from zero records")
    val colNames: Seq[String] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      records.foreach(_.foreach { case (k, _) => seen += k })
      seen.toSeq
    }
    // nested → JSON string first, then infer
    val normalized: Seq[Map[String, Any]] = records.map { rec =>
      rec.toMap.map {
        case (k, m: Map[_, _]) => k -> toJsonString(m)
        case (k, s: Seq[_])    => k -> toJsonString(s)
        case (k, v)            => k -> v
      }
    }
    val colTypes: Seq[(String, DataType)] = colNames.map { c =>
      val values = normalized.map(_.getOrElse(c, null))
      c -> inferType(values).getOrElse(StringType)
    }
    val schema = StructType(colTypes.map { case (n, t) => StructField(n, t, nullable = true) })
    val rows = normalized.map { rec =>
      Row.fromSeq(colTypes.map { case (n, t) =>
        val v = rec.getOrElse(n, null)
        coerce(v, t)
      })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  private def coerce(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (x: Int, LongType) => x.toLong
    case (x: Short, LongType) => x.toLong
    case (x: Byte, LongType) => x.toLong
    case (x: Long, LongType) => x
    case (x: Int, DoubleType) => x.toDouble
    case (x: Long, DoubleType) => x.toDouble
    case (x: Float, DoubleType) => x.toDouble
    case (x: Double, DoubleType) => x
    case (x: Boolean, BooleanType) => x
    case (x, StringType) => x.toString // scalar str() coercion (`utils/arrow.py:39,61`)
    case (x, _) => x
  }

  /** S5: chunk an iterator of records into size-n batches
    * (`utils/arrow.py:137-156`; default 10,000).
    */
  def chunked(spark: SparkSession, records: Iterator[Record],
              batchSize: Int = 10000): Iterator[DataFrame] =
    records.grouped(batchSize).map(g => createDataFrame(spark, g.toSeq))
}
