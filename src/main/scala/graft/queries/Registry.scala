package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One harness query: the Spark implementation plus (when the operator
  * is SQL-expressible) a DuckDB oracle dual. Column names/ordering MUST
  * match between the two — the driver sorts columns by name and hashes
  * values.
  */
final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object QueryHelpers {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has drifted across testdata generations — some write
    * TIMESTAMP(NANOS) (which Spark can only read as a raw long via the
    * legacy conf), others plain timestamp[us]. Adapt to whatever the
    * footer actually says instead of assuming either:
    *   - LongType        → nanos file: convert nanos → micros timestamp
    *   - TimestampNTZType→ micros file, no UTC adjustment: cast to the
    *                       session-zoned timestamp the rest of the
    *                       registry expects (value-identity under the
    *                       harness's UTC session timezone)
    *   - TimestampType   → use as-is
    * The nanosAsLong conf must be set BEFORE the read: a NANOS footer
    * throws at schema inference without it, and the conf is a no-op for
    * micros files — so setting it unconditionally is what makes the
    * dtype branch below reachable for both generations.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / lit(1000L)).cast("long")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Exact money arithmetic both engines agree on bit-for-bit: sum in
    * decimal (exact), convert once to double (same IEEE rounding in
    * Spark and DuckDB). Never sum raw doubles across engines — addition
    * order differs.
    */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** DuckDB-side duals. */
  val DSUM = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(12,2))) AS DOUBLE)"
  val DAVG = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)"
}

/** The full harness registry; modules register their queries here. */
object Registry {
  def all: Map[String, Q] =
    RelationalQueries.queries ++
      TransformQueries.queries ++
      TableQueries.queries ++
      PipelineQueries.queries
}
