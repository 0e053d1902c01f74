package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real surface lives in [[graft.queries.Registry]]; this object
  * just adapts it to the harness shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The 5-table star join exercises scan, broadcast joins,
    * exact decimal aggregation and ordering in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.all.view.mapValues(_.fn).toMap

  /** DuckDB duals for every SQL-expressible query; hash-based operators
    * (murmur3 bucket, minhash/simhash LSH, xxhash features) are
    * internal-consistency checked and recorded rows-only.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Registry.all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}
