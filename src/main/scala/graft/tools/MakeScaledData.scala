package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off generator for the sf1 scaling check (round-12 stretch):
  * derives a 10x replica of the driver's sf0.1 tables under a scratch
  * directory — never touching `/root/testdata` — by unioning 10
  * key-offset copies of each fact table. Dimension tables (region,
  * nation, part, supplier) copy through unchanged so join fan-out
  * scales linearly, like a real 10x ingest against stable dims.
  * Document text and embeddings are per-copy perturbed: verbatim
  * copies would turn the whole corpus into one giant duplicate class
  * and measure a pathological corpus, not scale.
  *
  * Usage: `runMain graft.tools.MakeScaledData /root/testdata/sf0.1 /tmp/sf1 10`
  */
object MakeScaledData {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def src(name: String): DataFrame = spark.read.parquet(s"$srcDir/$name.parquet")
    def write(name: String, df: DataFrame, files: Int): Unit =
      df.repartition(files).write.mode("overwrite")
        .option("compression", "zstd").parquet(s"$dstDir/$name.parquet")

    def scaled(name: String, files: Int)(copy: (DataFrame, Int) => DataFrame): Unit = {
      val base = src(name)
      write(name, (0 until copies).map(i => copy(base, i)).reduce(_.unionByName(_)), files)
      println(s"scaled: $name x$copies")
    }

    // key offsets keep every copy's keys disjoint, so joins stay 1:N
    // with the same N as sf0.1 — 10x rows, 10x matches, never 100x.
    // Deliberately NOT round powers of ten: harness queries synthesize
    // "match-nothing" keys by adding 1e8-style offsets, and a copy
    // stride of exactly 1e8 made those keys collide with copy 1's real
    // rows (q97/q99 then correctly raised MERGE cardinality errors —
    // against pathological data, not a bug). Strides also stay small
    // enough that 10 copies keep every key inside INT range: the
    // widening family (q93) casts keys to INT by design.
    val ordOff = 214748364L
    val custOff = 19700003L

    scaled("lineitem", 32) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * ordOff))
    }
    scaled("orders", 8) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * ordOff))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custOff))
    }
    scaled("customer", 4) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * custOff))
    }
    scaled("events", 8) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * ordOff))
    }
    scaled("documents", 4) { (df, i) =>
      // distinct doc ids; text perturbed with a per-copy suffix token —
      // the copies stay NEAR-duplicates (shingle overlap ~1), which is
      // the hard case for the dedup family, without being byte-equal
      df.withColumn("doc_id", col("doc_id") + lit(i * custOff))
        .withColumn("text",
          if (i == 0) col("text") else concat(col("text"), lit(s" copyv$i")))
    }
    scaled("embeddings", 4) { (df, i) =>
      // tiny deterministic per-copy, per-component jitter: copies stay
      // near-duplicates in cosine without collapsing to exact ties
      df.withColumn("vec_id", col("vec_id") + lit(i * custOff))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else expr(s"transform(embedding, (x, j) -> cast(x + 0.001 * $i * cos(j + vec_id) as float))"))
    }
    Seq("region", "nation", "part", "supplier").foreach { name =>
      write(name, src(name), 1)
      println(s"copied: $name")
    }
    spark.stop()
  }
}
