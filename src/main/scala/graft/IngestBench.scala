package graft

import graft.config.LoaderConfig
import graft.loader.Loader
import graft.table.{GraftCatalog, TableIdent}

import org.apache.spark.sql.SparkSession

/** Write-path throughput bench mirroring the reference's own harness
  * (`/root/reference/examples/load_stream.py:17,30-33`): a stream of
  * 200,000-row batches with an int64 + string column, `append` mode,
  * `commit_interval = 5`. The reference publishes no numbers for this
  * harness (BASELINE.md), so this main records ours: rows/sec,
  * snapshots committed, and commit granularity.
  *
  * Usage: runMain graft.IngestBench  (env: GRAFT_INGEST_BATCHES,
  * GRAFT_INGEST_BATCH_ROWS, SPARK_GRAFT_CPUS)
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val batches = sys.env.getOrElse("GRAFT_INGEST_BATCHES", "20").toInt
    val batchRows = sys.env.getOrElse("GRAFT_INGEST_BATCH_ROWS", "200000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warehouse = java.nio.file.Files.createTempDirectory("ingest_bench")
    val catalog = GraftCatalog(spark, warehouse.toString)
    val loader = new Loader(catalog)
    // reference stream shape: int64 id + string col (load_stream.py:30-33)
    val stream = Iterator.tabulate(batches) { b =>
      spark.range(b * batchRows, (b + 1) * batchRows)
        .selectExpr("id", "concat('val_', id) AS name")
    }
    // warm the table/write machinery so the timed run measures steady state
    val res = loader.loadData(
      spark.range(1000).selectExpr("id", "concat('w_', id) AS name"),
      TableIdent("bench", "warm"))
    val t1 = System.nanoTime()
    val result = loader.loadBatches(stream, TableIdent("bench", "stream"),
      Some(LoaderConfig(writeMode = graft.config.WriteMode.Append, commitInterval = 5)))
    val sec = (System.nanoTime() - t1) / 1e9
    val rows = result.rowsLoaded
    println(s"""{"metric":"ingest_rows_per_sec","value":${(rows / sec).toLong},""" +
      s""""rows":$rows,"sec":${"%.2f".formatLocal(java.util.Locale.ROOT, sec)},"batches":${result.batchesProcessed},""" +
      s""""commit_interval":5,"snapshots":${catalog.load(TableIdent("bench", "stream")).snapshots().size}}""")
    spark.stop()
    val _ = res
  }
}
