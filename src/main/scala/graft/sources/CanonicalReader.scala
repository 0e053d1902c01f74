package graft.sources

import graft.types.TypeRegistry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Read any Spark source and coerce the result onto the canonical type
  * system (the reference's registry applied at the ingest boundary,
  * `utils/types.py:24-86`): narrow ints widen to Integer, null-typed
  * columns become string, unsupported types raise immediately instead
  * of surfacing mid-write. The cast plan is a plain `select`, folded by
  * Catalyst into the scan.
  */
object CanonicalReader {

  def canonicalize(df: DataFrame, registry: TypeRegistry = TypeRegistry()): DataFrame = {
    val target = registry.canonicalizeSchema(df.schema) // raises on unsupported
    val cols = df.schema.fields.zip(target.fields).map { case (src, tgt) =>
      if (src.dataType == tgt.dataType) col(s"`${src.name}`")
      else col(s"`${src.name}`").cast(tgt.dataType).as(tgt.name)
    }
    df.select(cols.toSeq: _*)
  }

  def parquet(spark: SparkSession, path: String,
              registry: TypeRegistry = TypeRegistry()): DataFrame =
    canonicalize(spark.read.parquet(path), registry)

  def csv(spark: SparkSession, path: String, header: Boolean = true,
          registry: TypeRegistry = TypeRegistry()): DataFrame =
    canonicalize(spark.read.option("header", header.toString)
      .option("inferSchema", "true").csv(path), registry)

  def jsonLines(spark: SparkSession, path: String,
                registry: TypeRegistry = TypeRegistry()): DataFrame =
    canonicalize(spark.read.json(path), registry)
}
