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
}
