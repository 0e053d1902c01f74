package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-phase scaling evidence for the FULL MV algebra (round 19,
  * closes r18 verdict #2): the all-groups fixtures (q137/q139) touch
  * every partition group by construction, so their whole-fixture wall
  * cannot demonstrate the O(changelog + touched groups) refresh bound.
  * This tool builds the SPARSE shapes (q142 FULL-window, q143
  * FULL-over-union — high-cardinality keys, churn bounded to a
  * CONSTANT key range `okey < 20000` that selects the same rows at
  * every scale factor) and times each phase SEPARATELY:
  *
  *   create_s        — the initial materialization, expected ~linear in SF
  *   refresh_*_s     — the incremental refreshes, expected ~flat in SF
  *                     if the touched-group bound is real
  *
  * Usage: runMain graft.tools.SparseChurnBench <sfDir> [window|union|both]
  * Prints one JSON line per shape. Run at /root/testdata/sf0.1 and at
  * /tmp/sf1 (graft.tools.MakeScaledData) in clean windows, min-of-N by
  * re-running; record the ratios in BENCH_sf1.json.
  */
object SparseChurnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    val wh = java.nio.file.Files.createTempDirectory("graft-scb").toString
    spark.conf.set("spark.sql.catalog.graftscb", "graft.connector.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.graftscb.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftscb.bench")
    spark.read.parquet(s"$sfDir/lineitem.parquet").createOrReplaceTempView("scb_li")
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("scb_ord")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def f(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    if (which == "window" || which == "both") {
      spark.sql("DROP TABLE IF EXISTS graftscb.bench.li")
      spark.sql("DROP TABLE IF EXISTS graftscb.bench.ord")
      spark.sql("""CREATE TABLE graftscb.bench.li (okey BIGINT, ln INT, qty DOUBLE)
                  |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
      spark.sql("""CREATE TABLE graftscb.bench.ord (okeyd BIGINT, grp BIGINT)
                  |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
      spark.sql("""INSERT INTO graftscb.bench.li
                  |SELECT l_orderkey, l_linenumber, l_quantity
                  |FROM scb_li WHERE l_quantity < 45.0 AND l_orderkey % 2 = 0""".stripMargin)
      spark.sql("""INSERT INTO graftscb.bench.ord
                  |SELECT o_orderkey, o_orderkey DIV 64 FROM scb_ord
                  |WHERE o_orderkey % 3 != 0""".stripMargin)
      val (mode, createS) = timed {
        spark.sql(
          """CALL graftscb.system.create_mview('bench', 'fws',
            |  'SELECT grp, okey, ln, qty, rn FROM (
            |     SELECT grp, okey, ln, qty,
            |       ROW_NUMBER() OVER (PARTITION BY grp
            |         ORDER BY qty DESC NULLS LAST, okey, ln, okeyd) AS rn
            |     FROM graftscb.bench.li FULL JOIN graftscb.bench.ord
            |       ON okey = okeyd
            |   ) WHERE rn <= 2')""".stripMargin).head.getString(0)
      }
      require(mode == "window", s"expected window mode, got $mode")
      spark.sql("""INSERT INTO graftscb.bench.li
                  |SELECT l_orderkey, l_linenumber, l_quantity FROM scb_li
                  |WHERE l_quantity < 45.0 AND l_orderkey % 2 = 1
                  |  AND l_orderkey < 20000""".stripMargin)
      spark.sql("DELETE FROM graftscb.bench.li WHERE qty >= 40.0 AND okey < 5000")
      val (a1, refFactS) = timed {
        spark.sql("CALL graftscb.system.refresh_mview('bench', 'fws', false)")
          .head.getString(2)
      }
      require(a1 == "incremental", s"expected incremental, got $a1")
      spark.sql("""INSERT INTO graftscb.bench.ord
                  |SELECT o_orderkey, o_orderkey DIV 64 FROM scb_ord
                  |WHERE o_orderkey % 3 = 0 AND o_orderkey < 20000""".stripMargin)
      spark.sql("DELETE FROM graftscb.bench.ord WHERE okeyd >= 1000 AND okeyd < 1300")
      val (a2, refDimS) = timed {
        spark.sql("CALL graftscb.system.refresh_mview('bench', 'fws', false)")
          .head.getString(2)
      }
      require(a2 == "incremental", s"expected incremental, got $a2")
      val rows = spark.sql("SELECT COUNT(*) FROM graftscb.bench.fws").head.getLong(0)
      spark.sql("CALL graftscb.system.drop_mview('bench', 'fws')")
      println(s"""{"shape":"full_window_sparse","sf":"$sfDir","create_s":${f(createS)},"refresh_fact_s":${f(refFactS)},"refresh_dim_s":${f(refDimS)},"rows":$rows}""")
    }

    if (which == "union" || which == "both") {
      spark.sql("DROP TABLE IF EXISTS graftscb.bench.s0")
      spark.sql("DROP TABLE IF EXISTS graftscb.bench.s1")
      spark.sql("DROP TABLE IF EXISTS graftscb.bench.uord")
      spark.sql("""CREATE TABLE graftscb.bench.s0 (okey BIGINT, qty DECIMAL(12,2))
                  |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
      spark.sql("""CREATE TABLE graftscb.bench.s1 (oid BIGINT, qty2 DECIMAL(12,2))
                  |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
      spark.sql("""CREATE TABLE graftscb.bench.uord (okeyd BIGINT, grp BIGINT)
                  |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
      spark.sql("""INSERT INTO graftscb.bench.s0
                  |SELECT l_orderkey, l_quantity FROM scb_li
                  |WHERE l_orderkey % 2 = 0 AND l_orderkey % 5 != 0""".stripMargin)
      spark.sql("""INSERT INTO graftscb.bench.s1
                  |SELECT l_orderkey, l_quantity FROM scb_li
                  |WHERE l_orderkey % 2 = 1""".stripMargin)
      spark.sql("""INSERT INTO graftscb.bench.uord
                  |SELECT o_orderkey, o_orderkey DIV 64 FROM scb_ord
                  |WHERE o_orderkey % 3 != 0""".stripMargin)
      val (mode, createS) = timed {
        spark.sql(
          """CALL graftscb.system.create_mview('bench', 'fus',
            |  'SELECT grp, CAST(SUM(qty) AS DOUBLE) AS sq, COUNT(*) AS n
            |   FROM (SELECT okey, qty FROM graftscb.bench.s0
            |         UNION ALL
            |         SELECT oid AS okey, qty2 AS qty FROM graftscb.bench.s1)
            |     FULL OUTER JOIN graftscb.bench.uord ON okey = okeyd
            |   GROUP BY grp')""".stripMargin).head.getString(0)
      }
      require(mode == "incremental", s"expected incremental mode, got $mode")
      spark.sql("""INSERT INTO graftscb.bench.s0
                  |SELECT l_orderkey, l_quantity FROM scb_li
                  |WHERE l_orderkey % 2 = 0 AND l_orderkey % 5 = 0
                  |  AND l_orderkey < 20000""".stripMargin)
      spark.sql("DELETE FROM graftscb.bench.s1 WHERE qty2 >= 45.0 AND oid < 5000")
      spark.sql("""INSERT INTO graftscb.bench.uord
                  |SELECT o_orderkey, o_orderkey DIV 64 FROM scb_ord
                  |WHERE o_orderkey % 3 = 0 AND o_orderkey < 20000""".stripMargin)
      spark.sql("DELETE FROM graftscb.bench.uord WHERE okeyd >= 1000 AND okeyd < 1300")
      val (a1, refS) = timed {
        spark.sql("CALL graftscb.system.refresh_mview('bench', 'fus', false)")
          .head.getString(2)
      }
      require(a1 == "incremental", s"expected incremental, got $a1")
      val rows = spark.sql("SELECT COUNT(*) FROM graftscb.bench.fus").head.getLong(0)
      spark.sql("CALL graftscb.system.drop_mview('bench', 'fus')")
      println(s"""{"shape":"full_union_sparse","sf":"$sfDir","create_s":${f(createS)},"refresh_s":${f(refS)},"rows":$rows}""")
    }
    spark.stop()
  }
}
