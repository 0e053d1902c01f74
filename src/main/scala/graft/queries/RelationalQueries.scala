package graft.queries

import QueryHelpers._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Read-path relational surface over the raw testdata star schema —
  * scan/filter/project, aggregation, joins (broadcast, star, semi,
  * anti), window, sort/limit, distinct, set ops, conditional
  * aggregation. These come "free" from Catalyst (SURVEY §2.4); wiring
  * them into the harness proves the read surface and gives the bench
  * its headline numbers.
  *
  * Determinism contract with the DuckDB oracle: every query ends in a
  * total ORDER BY, money math goes through exact decimal sums (see
  * [[QueryHelpers]]), and no raw-double aggregate crosses engines.
  */
object RelationalQueries {

  val queries: Map[String, Q] = Map(

    // S8/P-style scan + filter + project; filter pushdown reaches parquet
    "q01_scan_filter" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1997-02-01" &&
          col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          dec(col("l_extendedprice")).cast("double").as("price"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
             |  AND l_discount > 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // TPC-H Q1 shape: the canonical partial-agg + shuffle-agg plan
    "q02_agg_pricing" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${DSUM("l_quantity")} AS sum_qty,
              |  ${DSUM("l_extendedprice")} AS sum_base,
              |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
              |  ${DAVG("l_quantity")} AS avg_qty,
              |  COUNT(*) AS count_order
              |FROM lineitem GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // broadcast join: customer is the small dim — explicit broadcast()
    "q03_join_broadcast" -> Q(
      (s, dir) => t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("order_count"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("c_mktsegment")),
      Some(s"""SELECT c_mktsegment, COUNT(*) AS order_count,
              |  ${DSUM("o_totalprice")} AS revenue
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // 5-table star join; dims broadcast, fact streams
    "q04_star_join" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(12, 2)) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("lines"))
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS lines
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // window: top-2 orders per customer
    "q05_window_topn" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= 2)
          .select(col("o_custkey"), col("o_orderkey"), col("rank"))
          .orderBy(col("o_custkey"), col("rank"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, rank FROM (
             |  SELECT o_custkey, o_orderkey,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
             |  FROM orders) WHERE rank <= 2
             |ORDER BY o_custkey, rank, o_orderkey""".stripMargin)),

    // global sort + limit (TakeOrdered physical op, no full sort at scale)
    "q06_sort_limit" -> Q(
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"), dec(col("o_totalprice")).cast("double").as("total"))
        .orderBy(col("total").desc, col("o_orderkey"))
        .limit(100),
      Some("""SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total
             |FROM orders ORDER BY total DESC, o_orderkey LIMIT 100""".stripMargin)),

    "q07_distinct" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // set op: UNION (distinct) of two key sets
    "q08_union" -> Q(
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct().orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    // left-semi join (EXISTS)
    "q09_semi_join" -> Q(
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("active_customers"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, COUNT(*) AS active_customers
             |FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE c.c_custkey = o.o_custkey)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // left-anti join (NOT EXISTS)
    "q10_anti_join" -> Q(
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("inactive_customers"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, COUNT(*) AS inactive_customers
             |FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE c.c_custkey = o.o_custkey)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    "q11_having" -> Q(
      (s, dir) => t(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("parts"), davg(col("p_retailprice")).as("avg_price"))
        .where(col("parts") > 5)
        .orderBy(col("p_brand")),
      Some(s"""SELECT p_brand, COUNT(*) AS parts, ${DAVG("p_retailprice")} AS avg_price
              |FROM part GROUP BY p_brand HAVING COUNT(*) > 5 ORDER BY p_brand""".stripMargin)),

    // conditional aggregation (CASE WHEN inside agg)
    "q12_conditional_agg" -> Q(
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_totalprice") > 200000, 1).otherwise(0)).as("big_orders"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("finished"),
          count(lit(1)).as("total"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
             |  CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS big_orders,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished,
             |  COUNT(*) AS total
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // correlated scalar-subquery shape: customers above their nation's avg balance
    "q13_above_avg" -> Q(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val nationAvg = c.groupBy(col("c_nationkey").as("nk"))
          .agg(avg(dec(col("c_acctbal")).cast("double")).as("nation_avg"))
        c.join(broadcast(nationAvg), col("c_nationkey") === col("nk"))
          .where(dec(col("c_acctbal")).cast("double") > col("nation_avg"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("above_avg"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT c_nationkey, COUNT(*) AS above_avg FROM customer c1
             |WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) >
             |  (SELECT AVG(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE)) FROM customer c2
             |   WHERE c2.c_nationkey = c1.c_nationkey)
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // A1: count verification across tables (the reference's only
    // "aggregate" — num_rows checks, examples/advanced_scenarios.py:191-198)
    "q51_count_verify" -> Q(
      (s, dir) => {
        import s.implicits._
        Seq("customer", "lineitem", "nation", "orders", "part", "region", "supplier")
          .map(n => (n, t(s, dir, n).count()))
          .toDF("table_name", "row_count")
          .orderBy(col("table_name"))
      },
      Some("""SELECT * FROM (
             |  SELECT 'customer' AS table_name, COUNT(*) AS row_count FROM customer
             |  UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
             |  UNION ALL SELECT 'nation', COUNT(*) FROM nation
             |  UNION ALL SELECT 'orders', COUNT(*) FROM orders
             |  UNION ALL SELECT 'part', COUNT(*) FROM part
             |  UNION ALL SELECT 'region', COUNT(*) FROM region
             |  UNION ALL SELECT 'supplier', COUNT(*) FROM supplier)
             |ORDER BY table_name""".stripMargin)),

    // analytic windows: lag + running sum per customer
    "q53_window_running" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        t(s, dir, "orders")
          .where(col("o_custkey") < 50)
          .select(col("o_custkey"), col("o_orderkey"),
            lag(col("o_orderkey"), 1).over(w).as("prev_order"),
            sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some(s"""SELECT o_custkey, o_orderkey,
              |  LAG(o_orderkey, 1) OVER w AS prev_order,
              |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS running_total
              |FROM orders WHERE o_custkey < 50
              |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
              |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // set ops: INTERSECT / EXCEPT (distinct semantics)
    "q54_intersect_except" -> Q(
      (s, dir) => {
        val custNations = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val suppNations = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        val both = custNations.intersect(suppNations)
          .withColumn("relation", lit("both"))
        val custOnly = custNations.except(suppNations)
          .withColumn("relation", lit("customers_only"))
        both.unionByName(custOnly).orderBy(col("relation"), col("nationkey"))
      },
      Some("""SELECT * FROM (
             |  SELECT nationkey, 'both' AS relation FROM
             |    (SELECT c_nationkey AS nationkey FROM customer
             |     INTERSECT SELECT s_nationkey FROM supplier)
             |  UNION ALL
             |  SELECT nationkey, 'customers_only' AS relation FROM
             |    (SELECT c_nationkey AS nationkey FROM customer
             |     EXCEPT SELECT s_nationkey FROM supplier))
             |ORDER BY relation, nationkey""".stripMargin)),

    // scalar-function surface: string/date/conditional built-ins
    "q55_scalar_funcs" -> Q(
      (s, dir) => t(s, dir, "orders")
        .where(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          upper(substring(col("o_orderpriority"), 1, 1)).as("prio_initial"),
          length(col("o_orderpriority")).as("prio_len"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
          date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_or_open"),
          (dec(col("o_totalprice")) % 100).cast("double").as("cents_mod"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  UPPER(SUBSTRING(o_orderpriority, 1, 1)) AS prio_initial,
             |  LEN(o_orderpriority) AS prio_len,
             |  CONCAT_WS('-', o_orderstatus, o_orderpriority) AS status_prio,
             |  STRFTIME(o_orderdate, '%Y-%m') AS order_month,
             |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) % 100 AS DOUBLE) AS cents_mod
             |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),

    // approximate sketches (HyperLogLog distinct + quantile sketch):
    // the summaries a 100 TB profile pass uses instead of exact
    // distinct/sort. Sketch outputs are engine-specific, so the query
    // VALIDATES them in-plan against exact values and emits the exact
    // numbers plus the validation verdicts for the oracle.
    "q61_approx_sketches" -> Q(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        // keep distinct aggregates and percentile buffers in SEPARATE
        // aggregations: combined they force an Expand plan that
        // evaluates the percentile buffer per expanded row (measured
        // 56s vs 3s at sf0.1)
        // the two exact-baseline scans are independent Spark jobs — run
        // them concurrently (halves wall-clock; scheduler interleaves
        // their stages across the same executor pool)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val cdF = Future(li.agg(
          countDistinct(col("l_orderkey")).as("exact_cd"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_cd"))
          .collect()(0))
        // exact median via a distributed VALUE HISTOGRAM, not
        // percentile(): Spark's exact percentile buffers EVERY value
        // into one aggregation buffer and degrades superlinearly (15x
        // wall for 10x data at sf1). groupBy(value).count() is
        // map-side-combinable and O(distinct values) post-shuffle; the
        // driver fold runs over the distinct histogram only (guarded —
        // the fallback keeps the exact baseline honest, never silent).
        // The interpolation below is percentile()'s own formula, so the
        // value is bit-identical to the old exact baseline.
        val pctF = Future {
          val hist = li.groupBy(col("l_quantity").cast("double").as("v"))
            .agg(count(lit(1)).as("c"))
            .where(col("v").isNotNull).orderBy(col("v")).collect()
          require(hist.length <= 1000000,
            s"histogram percentile: ${hist.length} distinct values — " +
              "use a sampled baseline for continuous domains")
          val n = hist.iterator.map(_.getLong(1)).sum
          val rank = (n - 1) * 0.5
          val loIdx = math.floor(rank).toLong
          val hiIdx = math.ceil(rank).toLong
          def valueAt(idx: Long): Double = {
            var cum = 0L
            hist.find { r => cum += r.getLong(1); cum > idx }.get.getDouble(0)
          }
          val lower = valueAt(loIdx)
          val upper = valueAt(hiIdx)
          val exact = lower + (rank - loIdx) * (upper - lower)
          val approx = li.agg(
            expr("approx_percentile(l_quantity, 0.5, 10000)").cast("double"))
            .collect()(0).getDouble(0)
          (exact, approx)
        }
        val cd = Await.result(cdF, Duration.Inf)
        val (exactP50, approxP50) = Await.result(pctF, Duration.Inf)
        val exactCd = cd.getAs[Long]("exact_cd")
        val approxCd = cd.getAs[Long]("approx_cd")
        val cdOk = math.abs(approxCd - exactCd).toDouble / exactCd < 0.05
        val pctOk = math.abs(approxP50 - exactP50) <= 1.0
        require(cdOk, s"HLL estimate off: $approxCd vs $exactCd")
        require(pctOk, s"quantile sketch off: $approxP50 vs $exactP50")
        import s.implicits._
        Seq((exactCd, exactP50, cdOk, pctOk))
          .toDF("distinct_orders", "median_qty", "hll_within_5pct", "pctl_within_1")
      },
      Some("""SELECT COUNT(DISTINCT l_orderkey) AS distinct_orders,
             |  MEDIAN(l_quantity) AS median_qty,
             |  true AS hll_within_5pct, true AS pctl_within_1
             |FROM lineitem""".stripMargin)),

    // pivot: status columns per priority (DuckDB dual via conditional
    // aggregation — the portable form of PIVOT)
    "q62_pivot" -> Q(
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(dec(col("o_totalprice"))).cast("double"))
        .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o", "P" -> "total_p"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS total_f,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS total_o,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS total_p
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // unpivot (wide → long melt), the inverse reshaping of q62
    "q62b_unpivot" -> Q(
      (s, dir) => t(s, dir, "part")
        .where(col("p_partkey") < 100)
        .select(col("p_partkey"),
          col("p_retailprice").cast("double").as("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(Array(col("p_partkey")), "metric", "value")
        .orderBy(col("p_partkey"), col("metric")),
      Some("""SELECT p_partkey, 'p_retailprice' AS metric,
             |  CAST(p_retailprice AS DOUBLE) AS value
             |FROM part WHERE p_partkey < 100
             |UNION ALL
             |SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE)
             |FROM part WHERE p_partkey < 100
             |ORDER BY p_partkey, metric""".stripMargin)),

    // grouping sets / rollup
    "q14_rollup" -> Q(
      (s, dir) => t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"))
        .orderBy(col("status"), col("priority")),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             |       COALESCE(o_orderpriority, 'ALL') AS priority,
             |       COUNT(*) AS n
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // hot-key salted join: result-identical to the plain equi-join (the
    // oracle), with each big-side key's rows spread across `factor`
    // reducers via a deterministic content-derived salt — the manual
    // skew tool for when AQE's sort-merge skew split doesn't apply
    "q74_skew_join" -> Q(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_suppkey").as("suppkey"), col("l_quantity"), col("l_orderkey"))
        val sup = t(s, dir, "supplier")
          .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
        graft.operators.Skew.saltedJoin(li, sup, Seq("suppkey"),
            factor = 8, spreadCol = Some("l_orderkey"))
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("s_nationkey"))
      },
      Some(s"""SELECT s_nationkey, COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_qty
              |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)))
}
