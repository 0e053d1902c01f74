package graft.tmp

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

object ObsTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val obs = Observation()
    val df = spark.range(12345).toDF("id")
      .observe(obs, count(lit(1)).as("n")).localCheckpoint()
    // does the observation fill from the checkpoint's own action?
    val n2 = try {
      val fut = scala.concurrent.Future(obs.get("n"))(
        scala.concurrent.ExecutionContext.global)
      scala.concurrent.Await.result(fut, scala.concurrent.duration.Duration("20s"))
    } catch { case e: Throwable => s"ERR ${e.getClass.getSimpleName}" }
    println(s"MARKER get=$n2 dfcount=${df.count()}")
    // job count check: how many jobs did the count trigger?
    spark.stop()
  }
}
