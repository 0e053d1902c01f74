package graft.tmp

import org.apache.spark.sql.SparkSession

/** Isolated per-query timer: runs the named SparkEntry queries N times
  * each (fresh fixture per run, same as Bench) and prints min/all walls.
  * Usage: runMain graft.tmp.TimeQ q83_changelog q85_changes_feed
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("TIMEQ_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $name min=${walls.min}%.2f all=${walls.map(w => f"$w%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
