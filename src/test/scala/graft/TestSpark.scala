package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all forked test suites (matches the driver's
  * verify config: local[4], 4 shuffle partitions, UTC).
  */
object TestSpark {

  /** The one warehouse behind the SQL catalog `graft`. Spark caches
    * catalog instances after first initialize, so per-suite
    * `conf.set("spark.sql.catalog.graft.warehouse", ...)` silently
    * does nothing once another suite has touched the catalog — suites
    * MUST share this warehouse (isolating by namespace) or SQL writes
    * land in a different directory than direct GraftCatalog handles
    * read (suite-order-dependent failures).
    */
  lazy val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft_test_wh").toString

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.connector.GraftSparkCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
