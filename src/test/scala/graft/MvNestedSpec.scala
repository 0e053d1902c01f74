package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** MV over MV — the cascading derived-data story: a second-level MV's
  * fact is the first MV's STORAGE table (reached through its public
  * view by shape analysis' projection inlining), and the storage
  * table's own changelog — written exactly-once by level-1's keyed
  * refresh merges — drives level-2's incremental maintenance. The
  * staleness contract composes: refresh m1, then m2; each is
  * O(changes at its own level).
  */
class MvNestedSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("MV over MV: both levels maintain incrementally through mutation bursts") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    for (seed <- 0 until seeds) {
      val rnd = new Random(4000 + seed)
      val ns = s"mvn$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
      spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, sub STRING, v DOUBLE)")
      var nextId = 0L
      def insertBurst(): Unit = {
        val burst = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          s"($nextId, 'g${rnd.nextInt(3)}', 's${rnd.nextInt(4)}', ${rnd.nextInt(50)}.0)"
        }
        spark.sql(s"INSERT INTO graft.$ns.src VALUES ${burst.mkString(", ")}")
      }
      insertBurst()
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm1',
           |  'SELECT g, sub, SUM(v) AS sv, COUNT(*) AS n
           |   FROM graft.$ns.src GROUP BY g, sub')""".stripMargin)
        .head.getString(0) shouldBe "incremental"
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm2',
           |  'SELECT g, SUM(sv) AS total, SUM(n) AS rows_total,
           |          COUNT(*) AS nsub, MAX(sv) AS msv
           |   FROM graft.$ns.m1 GROUP BY g')""".stripMargin)
        .head.getString(0) shouldBe "incremental"
      def check(step: String): Unit = withClue(s"seed=$seed $step ") {
        spark.sql(s"SELECT g, total, rows_total, nsub, msv FROM graft.$ns.m2 ORDER BY g")
          .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq shouldBe
          spark.sql(
            s"""SELECT g, SUM(sv) AS total, SUM(n) AS rows_total,
               |       COUNT(*) AS nsub, MAX(sv) AS msv
               |FROM (SELECT g, sub, SUM(v) AS sv, COUNT(*) AS n
               |      FROM graft.$ns.src GROUP BY g, sub)
               |GROUP BY g ORDER BY g""".stripMargin)
            .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
      }
      check("create")
      for (step <- 0 until 6) {
        rnd.nextInt(3) match {
          case 0 => insertBurst()
          case 1 => // group and subgroup wipes cascade as storage deletes
            if (rnd.nextBoolean())
              spark.sql(s"DELETE FROM graft.$ns.src WHERE g = 'g${rnd.nextInt(3)}'")
            else
              spark.sql(s"DELETE FROM graft.$ns.src WHERE sub = 's${rnd.nextInt(4)}' " +
                s"AND v >= ${rnd.nextInt(30)}.0")
          case 2 => insertBurst()
        }
        val a1 = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'm1', false)").head.getString(2)
        Seq("incremental", "empty", "noop") should contain(a1)
        val a2 = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'm2', false)").head.getString(2)
        Seq("incremental", "empty", "noop") should contain(a2)
        check(s"step=$step m1=$a1 m2=$a2")
      }
      // un-refreshed level-2 keeps serving the OLD consistent state
      // (stale, never wrong) — then one refresh catches it up
      insertBurst()
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm1', false)")
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm2', false)")
        .head.getString(2) shouldBe "incremental"
      check("final")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm2')")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm1')")
      spark.sql(s"DROP TABLE graft.$ns.src")
    }
  }

  // Round-17: an aggregate OVER a window subquery auto-cascades from
  // ONE create — a hidden window MV <name>__w plus the aggregate over
  // its storage; one refresh call maintains both levels, and drop
  // removes both.
  test("aggregate over a window subquery auto-cascades from one CREATE") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    for (seed <- 0 until seeds) {
      val rnd = new Random(5200 + seed)
      val ns = s"mvaw$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
      spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, v DOUBLE)")
      var nextId = 0L
      def insertBurst(): Unit = {
        val burst = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          val g = if (rnd.nextInt(9) == 0) "CAST(NULL AS STRING)"
                  else s"'g${rnd.nextInt(3)}'"
          s"($nextId, $g, ${rnd.nextInt(30)}.0)"
        }
        spark.sql(s"INSERT INTO graft.$ns.src VALUES ${burst.mkString(", ")}")
      }
      insertBurst()
      val defSql =
        s"""SELECT g, SUM(v) AS sp, COUNT(*) AS n FROM (
           |  SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g
           |    ORDER BY v DESC, id) AS rn
           |  FROM graft.$ns.src WHERE v >= 1.0) WHERE rn <= 3 GROUP BY g""".stripMargin
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'aow',
           |  '${defSql.replace("'", "''")}')""".stripMargin)
        .head.getString(0) shouldBe "incremental"
      // the hidden inner registered in window mode
      val dash = spark.sql(s"CALL graft.system.mviews('$ns')").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      dash("aow__w") shouldBe "window"
      dash("aow") shouldBe "incremental"
      def check(step: String): Unit = withClue(s"seed=$seed $step ") {
        spark.sql(s"SELECT g, sp, n FROM graft.$ns.aow").collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted shouldBe
          spark.sql(defSql).collect()
            .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
      }
      check("create")
      for (step <- 0 until 8) {
        rnd.nextInt(3) match {
          case 0 => insertBurst()
          case 1 =>
            spark.sql(s"DELETE FROM graft.$ns.src WHERE v >= ${15 + rnd.nextInt(10)}.0")
          case 2 =>
            val id = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(s"DELETE FROM graft.$ns.src WHERE id = $id")
        }
        // ONE call refreshes the hidden window level then the aggregate
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'aow', false)").head.getString(2)
        Seq("incremental", "empty", "noop") should contain(action)
        check(s"step=$step action=$action")
      }
      // drop removes BOTH levels (hidden storage included)
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'aow')")
      spark.sql(s"SHOW TABLES IN graft.$ns").collect()
        .map(_.getString(1)) should not contain "aow__w__rows"
      spark.sql(s"DROP TABLE graft.$ns.src")
    }
  }

  // Round-17: the DUAL — a window OVER an aggregate subquery (the
  // rank-over-rollup dashboard: top-N groups per partition by their
  // aggregate) auto-cascades from ONE create — a hidden incremental agg
  // MV <name>__a plus the user's window MV over its storage changelog;
  // one refresh call maintains both levels, and drop removes both.
  test("window over an aggregate subquery auto-cascades from one CREATE") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    for (seed <- 0 until seeds) {
      val rnd = new Random(6400 + seed)
      val ns = s"mvwa$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
      spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, sub STRING, v DOUBLE)")
      var nextId = 0L
      def insertBurst(): Unit = {
        val burst = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          val g = if (rnd.nextInt(9) == 0) "CAST(NULL AS STRING)"
                  else s"'g${rnd.nextInt(3)}'"
          s"($nextId, $g, 's${rnd.nextInt(5)}', ${rnd.nextInt(40)}.0)"
        }
        spark.sql(s"INSERT INTO graft.$ns.src VALUES ${burst.mkString(", ")}")
      }
      insertBurst()
      // two-block spelling: rank filter over a ROW_NUMBER whose order
      // is the aggregate output (sub breaks ties — total order)
      val defSql =
        s"""SELECT g, sub, sv, rn FROM (
           |  SELECT g, sub, sv, ROW_NUMBER() OVER (PARTITION BY g
           |    ORDER BY sv DESC, sub) AS rn
           |  FROM (SELECT g, sub, SUM(v) AS sv, COUNT(*) AS cnt
           |        FROM graft.$ns.src WHERE v >= 1.0 GROUP BY g, sub)
           |) WHERE rn <= 2""".stripMargin
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'woa',
           |  '${defSql.replace("'", "''")}')""".stripMargin)
        .head.getString(0) shouldBe "window"
      // the hidden inner registered as an incremental aggregate MV
      val dash = spark.sql(s"CALL graft.system.mviews('$ns')").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      dash("woa__a") shouldBe "incremental"
      dash("woa") shouldBe "window"
      def check(step: String): Unit = withClue(s"seed=$seed $step ") {
        spark.sql(s"SELECT g, sub, sv, rn FROM graft.$ns.woa").collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted shouldBe
          spark.sql(defSql).collect()
            .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
      }
      check("create")
      for (step <- 0 until 8) {
        rnd.nextInt(4) match {
          case 0 => insertBurst()
          case 1 => // band delete retracts stored per-group sums
            spark.sql(s"DELETE FROM graft.$ns.src WHERE v >= ${20 + rnd.nextInt(15)}.0")
          case 2 => // single-row delete: thins one (g, sub) aggregate
            val id = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(s"DELETE FROM graft.$ns.src WHERE id = $id")
          case 3 => // subgroup wipe: a whole rollup row vanishes
            spark.sql(s"DELETE FROM graft.$ns.src WHERE sub = 's${rnd.nextInt(5)}'")
        }
        // ONE call refreshes the hidden aggregate level then the window
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'woa', false)").head.getString(2)
        Seq("incremental", "empty", "noop") should contain(action)
        check(s"step=$step action=$action")
      }
      // the hidden inner refuses direct drop while the outer reads it
      val e = intercept[Exception](
        spark.sql(s"CALL graft.system.drop_mview('$ns', 'woa__a')"))
      e.getMessage should include("read its storage")
      // drop removes BOTH levels (hidden storage included)
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'woa')")
      spark.sql(s"SHOW TABLES IN graft.$ns").collect()
        .map(_.getString(1)) should not contain "woa__a__rows"
      spark.sql(s"DROP TABLE graft.$ns.src")
    }
  }

  // one-block spelling: the window's ORDER BY references the aggregate
  // expression itself (the analyzer hoists it into the Aggregate as a
  // hidden `_w0`-style output, which the cascade renders as an inner
  // public column) — plus a running window with no rank filter
  test("one-block window-over-aggregate and running windows cascade too") {
    val ns = "mvwa1b"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, sub STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES " +
      "(1,'a','x',5.0),(2,'a','y',9.0),(3,'b','x',2.0),(4,'b','y',7.0),(5,'a','x',1.0)")
    val defSql =
      s"""SELECT g, sub, RANK() OVER (PARTITION BY g ORDER BY SUM(v) DESC) AS rk,
         |       SUM(SUM(v)) OVER (PARTITION BY g ORDER BY sub
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
         |FROM graft.$ns.src GROUP BY g, sub""".stripMargin
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'obl',
         |  '${defSql.replace("'", "''")}')""".stripMargin)
      .head.getString(0) shouldBe "window"
    def check(step: String): Unit = withClue(step) {
      spark.sql(s"SELECT g, sub, rk, running FROM graft.$ns.obl").collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted shouldBe
        spark.sql(defSql).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    }
    check("create")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES (6,'a','z',20.0),(7,'b','x',3.0)")
    spark.sql(s"DELETE FROM graft.$ns.src WHERE id = 2")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'obl', false)")
      .head.getString(2) shouldBe "incremental"
    check("after burst")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'obl')")
    spark.sql(s"DROP TABLE graft.$ns.src")
  }

  // ADVICE r17 (high): a cascade must NEVER claim an inner name the user
  // already owns — the old Failure cleanup could drop an unrelated
  // pre-existing MV named `<name>__a`. Now the cascade pre-checks the
  // name and skips to FULL mode, leaving the user's object untouched.
  test("cascade skips to FULL mode when the hidden inner name is user-owned") {
    val ns = "mvclaim"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, sub STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES " +
      "(1,'a','x',5.0),(2,'a','y',9.0),(3,'b','x',2.0),(4,'b','y',7.0)")
    // the user owns `woa2__a` — an unrelated incremental MV with data
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'woa2__a',
         |  'SELECT sub, COUNT(*) AS n FROM graft.$ns.src GROUP BY sub')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    val userRows = spark.sql(s"SELECT sub, n FROM graft.$ns.woa2__a ORDER BY sub")
      .collect().map(_.toSeq.mkString("|")).toSeq
    // a window-over-aggregate shape that WOULD cascade into `woa2__a`
    val defSql =
      s"""SELECT g, sub, sv, rn FROM (
         |  SELECT g, sub, sv, ROW_NUMBER() OVER (PARTITION BY g
         |    ORDER BY sv DESC, sub) AS rn
         |  FROM (SELECT g, sub, SUM(v) AS sv FROM graft.$ns.src GROUP BY g, sub)
         |) WHERE rn <= 1""".stripMargin
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'woa2',
         |  '${defSql.replace("'", "''")}')""".stripMargin)
      .head.getString(0) shouldBe "full"
    // the pre-existing user MV survives, data intact
    spark.sql(s"SELECT sub, n FROM graft.$ns.woa2__a ORDER BY sub")
      .collect().map(_.toSeq.mkString("|")).toSeq shouldBe userRows
    // the FULL-mode outer still answers correctly
    spark.sql(s"SELECT g, sub, sv, rn FROM graft.$ns.woa2").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted shouldBe
      spark.sql(defSql).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'woa2')")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'woa2__a')")
    spark.sql(s"DROP TABLE graft.$ns.src")
  }

  // ADVICE r17 (low): a group key that is a COMPUTED projection below
  // the aggregate (SELECT upper(g) AS gu ... GROUP BY gu) used to render
  // as a bare `gu` in the cascade's innerSql — a column the base table
  // doesn't have — silently felling the whole CREATE to FULL mode. The
  // substAgg rendering now inlines the expression, so it cascades.
  test("window-over-agg cascade handles projected group keys") {
    val ns = "mvproj"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, sub STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES " +
      "(1,'a','x',5.0),(2,'A','y',9.0),(3,'b','x',2.0),(4,'B','y',7.0),(5,'a','y',4.0)")
    val defSql =
      s"""SELECT gu, sub, sv, rn FROM (
         |  SELECT gu, sub, sv, ROW_NUMBER() OVER (PARTITION BY gu
         |    ORDER BY sv DESC, sub) AS rn
         |  FROM (SELECT gu, sub, SUM(v) AS sv
         |        FROM (SELECT upper(g) AS gu, sub, v FROM graft.$ns.src)
         |        GROUP BY gu, sub)
         |) WHERE rn <= 1""".stripMargin
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'proj',
         |  '${defSql.replace("'", "''")}')""".stripMargin)
      .head.getString(0) shouldBe "window"
    def check(step: String): Unit = withClue(step) {
      spark.sql(s"SELECT gu, sub, sv, rn FROM graft.$ns.proj").collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted shouldBe
        spark.sql(defSql).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    }
    check("create")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES (6,'A','x',20.0),(7,'c','y',3.0)")
    spark.sql(s"DELETE FROM graft.$ns.src WHERE id = 2")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'proj', false)")
      .head.getString(2) shouldBe "incremental"
    check("after burst")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'proj')")
    spark.sql(s"DROP TABLE graft.$ns.src")
  }

  // Round 18 (r17 verdict #6): the window-over-aggregate cascade
  // renders union'd facts faithfully — the inner aggregate registers
  // incrementally over a sharded UNION ALL (per-leg pins), and FULL
  // dims render as FULL JOIN for create() to adjudicate.
  test("window-over-agg cascade accepts a sharded UNION ALL inner fact") {
    val ns = "mvwus"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.s0")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.s1")
    spark.sql(s"CREATE TABLE graft.$ns.s0 (id BIGINT, g STRING, sub STRING, v DOUBLE)")
    spark.sql(s"CREATE TABLE graft.$ns.s1 (id BIGINT, g STRING, sub STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.s0 VALUES " +
      "(1,'a','x',5.0),(2,'a','y',9.0),(3,'b','x',2.0)")
    spark.sql(s"INSERT INTO graft.$ns.s1 VALUES " +
      "(4,'b','y',7.0),(5,'a','z',4.0),(6,'c','x',6.0)")
    val defSql =
      s"""SELECT g, sub, sv, rn FROM (
         |  SELECT g, sub, sv, ROW_NUMBER() OVER (PARTITION BY g
         |    ORDER BY sv DESC, sub) AS rn
         |  FROM (SELECT g, sub, SUM(v) AS sv FROM (
         |          SELECT g, sub, v FROM graft.$ns.s0
         |          UNION ALL
         |          SELECT g, sub, v FROM graft.$ns.s1)
         |        GROUP BY g, sub)
         |) WHERE rn <= 2""".stripMargin
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'wus',
         |  '${defSql.replace("'", "''")}')""".stripMargin)
      .head.getString(0) shouldBe "window"
    // BOTH levels registered incrementally (the old renderer felled
    // union'd inner facts to FULL mode)
    val dash = spark.sql(s"CALL graft.system.mviews('$ns')").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    dash("wus__a") shouldBe "incremental"
    dash("wus") shouldBe "window"
    def check(step: String): Unit = withClue(step) {
      spark.sql(s"SELECT g, sub, sv, rn FROM graft.$ns.wus").collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted shouldBe
        spark.sql(defSql).collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    }
    check("create")
    // churn BOTH shards in one refresh window
    spark.sql(s"INSERT INTO graft.$ns.s0 VALUES (7,'c','y',20.0),(8,'a','x',1.0)")
    spark.sql(s"DELETE FROM graft.$ns.s1 WHERE v >= 6.0")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'wus', false)")
      .head.getString(2) shouldBe "incremental"
    check("after both-shard churn")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'wus')")
    spark.sql(s"DROP TABLE graft.$ns.s0")
    spark.sql(s"DROP TABLE graft.$ns.s1")
  }

  // ADVICE r17 (low): the cascade marker must land in the outer
  // storage's CREATION commit — a crash between "outer created" and a
  // separate marker commit would leave a window MV whose hidden inner
  // level is never refreshed (silent staleness).
  test("cascade marker rides in the outer storage's creation commit") {
    import graft.table.{GraftCatalog, TableIdent}
    val ns = "mvatomic"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, sub STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES " +
      "(1,'a','x',5.0),(2,'a','y',9.0),(3,'b','x',2.0)")
    val defSql =
      s"""SELECT g, sub, sv, rn FROM (
         |  SELECT g, sub, sv, ROW_NUMBER() OVER (PARTITION BY g
         |    ORDER BY sv DESC, sub) AS rn
         |  FROM (SELECT g, sub, SUM(v) AS sv FROM graft.$ns.src GROUP BY g, sub)
         |) WHERE rn <= 1""".stripMargin
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'atom',
         |  '${defSql.replace("'", "''")}')""".stripMargin)
      .head.getString(0) shouldBe "window"
    val cat = GraftCatalog(spark, spark.conf.get("spark.sql.catalog.graft.warehouse"))
    val snaps = cat.load(TableIdent(ns, "atom__rows")).snapshots()
    // exactly the creation append, and it already carries the marker
    snaps.size shouldBe 1
    snaps.head.properties.get("graft.mview.cascade") shouldBe Some(s"$ns/atom__a")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'atom')")
    spark.sql(s"DROP TABLE graft.$ns.src")
  }
}
