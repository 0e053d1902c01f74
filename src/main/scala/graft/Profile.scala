package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries (cold + warm) at a given SF dir.
  * Usage: runMain graft.Profile <sfDir> <queryName>[,<queryName>...]
  * Pass "all" to time every registered query.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1 && args(1) != "all") args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    val explain = sys.env.get("GRAFT_EXPLAIN").contains("1")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"$n: UNKNOWN")
        case Some(fn) if explain =>
          println(s"==== $n ====")
          println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        case Some(fn) =>
          val t0 = System.nanoTime()
          val c = fn(spark, sfDir).count()
          val cold = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          fn(spark, sfDir).count()
          val warm = (System.nanoTime() - t1) / 1e9
          println(f"$n%-28s cold=$cold%7.2fs warm=$warm%7.2fs rows=$c")
      }
    }
    spark.stop()
  }
}
