package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** Randomized differential check for incremental materialized-view
  * maintenance: random mutation sequences (multi-row inserts with NULL
  * measure values, predicate deletes, keyed MERGE upserts) against a
  * source table, an incremental refresh after each burst — the MV view
  * read must equal the inline aggregation recomputed from the live
  * source EVERY time, including groups that vanish (maintained count
  * hits zero) and sums whose inputs are all NULL (must stay NULL, not
  * drift to 0). Widen one-off sweeps with GRAFT_MV_SEEDS.
  */
class MvRandomSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def agg(sqlFrom: String): Seq[String] =
    spark.sql(
      s"""SELECT g, total, nv, n FROM $sqlFrom ORDER BY g""")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  test("random mutation bursts: incremental MV == inline recompute at every refresh") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    for (seed <- 0 until seeds) {
      val rnd = new Random(seed)
      val ns = s"mvr$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
      spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, v DOUBLE)")
      var nextId = 0L
      def insertBurst(): Unit = {
        val rows = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          val g = s"g${rnd.nextInt(4)}"
          // NULL measures exercise the per-sum non-null counters
          val v = if (rnd.nextInt(4) == 0) "CAST(NULL AS DOUBLE)"
                  else (rnd.nextInt(100) - 20).toString + ".0"
          s"($nextId, '$g', $v)"
        }
        spark.sql(s"INSERT INTO graft.$ns.src VALUES ${rows.mkString(", ")}")
      }
      insertBurst()
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm',
           |  'SELECT g, SUM(v) AS total, COUNT(v) AS nv, COUNT(*) AS n
           |   FROM graft.$ns.src WHERE v IS NULL OR v > -10.0 GROUP BY g')""".stripMargin)
        .head.getString(0) shouldBe "incremental"

      for (step <- 0 until 6) {
        rnd.nextInt(3) match {
          case 0 => insertBurst()
          case 1 =>
            // predicate delete: sometimes wipes whole groups
            if (rnd.nextBoolean())
              spark.sql(s"DELETE FROM graft.$ns.src WHERE g = 'g${rnd.nextInt(4)}'")
            else {
              val lo = 1 + rnd.nextInt(math.max(1, nextId.toInt))
              spark.sql(s"DELETE FROM graft.$ns.src WHERE id >= $lo AND id < ${lo + 3}")
            }
          case _ =>
            val id = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(
              s"""MERGE INTO graft.$ns.src t
                 |USING (SELECT CAST($id AS BIGINT) AS id, 'g${rnd.nextInt(4)}' AS g,
                 |              ${rnd.nextInt(50)}.0 AS v) s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'm', false)").head.getString(2)
        Seq("incremental", "empty", "noop") should contain(action)
        withClue(s"seed=$seed step=$step action=$action ") {
          agg(s"graft.$ns.m") shouldBe agg(
            s"""(SELECT g, SUM(v) AS total, COUNT(v) AS nv, COUNT(*) AS n
               |  FROM graft.$ns.src WHERE v IS NULL OR v > -10.0 GROUP BY g)""".stripMargin)
        }
      }
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
      spark.sql(s"DROP TABLE graft.$ns.src")
    }
  }

  // ------------------------------------------------------------------
  // Widened algebra: AVG + MIN + MAX, NULL group keys, binary-float
  // group keys — all maintained INCREMENTALLY. The NULL-producing CASE
  // group key exercises the null-safe keyed merge; the DOUBLE group key
  // k2 differentially pins the cur-scan float-bound skip (a wrong
  // range filter would drop the boundary group and overwrite its
  // stored aggregate with delta-only values); deletes that remove a
  // group's extreme exercise the targeted MIN/MAX recompute.
  // ------------------------------------------------------------------

  private def agg2(sqlFrom: String): Seq[String] =
    spark.sql(
      s"""SELECT gk, k2, total, av, mn, mx, mxs, nv, n, fpos, fav, fnn, rat, np1, tag FROM $sqlFrom
         |ORDER BY gk NULLS FIRST, k2 NULLS FIRST""".stripMargin)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  test("widened algebra: AVG/MIN/MAX with NULL and double group keys stay incremental") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    val defn =
      """SELECT CASE WHEN id % 5 = 0 THEN NULL ELSE g END AS gk, k2,
        |       SUM(v) AS total, AVG(v) AS av, MIN(v) AS mn, MAX(v) AS mx,
        |       MAX(s) AS mxs, COUNT(v) AS nv, COUNT(*) AS n,
        |       SUM(v) FILTER (WHERE v > 0.0) AS fpos,
        |       AVG(v) FILTER (WHERE v < 50.0) AS fav,
        |       COUNT(*) FILTER (WHERE v IS NULL) AS fnn,
        |       SUM(v) / COUNT(v) AS rat, COUNT(*) + 1 AS np1,
        |       concat(CASE WHEN id % 5 = 0 THEN NULL ELSE g END,
        |              CAST(k2 AS STRING)) AS tag
        |FROM graft.%NS%.src WHERE v IS NULL OR v > -20.0
        |GROUP BY CASE WHEN id % 5 = 0 THEN NULL ELSE g END, k2""".stripMargin
    for (seed <- 0 until seeds) {
      val rnd = new Random(1000 + seed)
      val ns = s"mvw$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
      spark.sql(
        s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, k2 DOUBLE, v DOUBLE, s STRING)")
      var nextId = 0L
      def insertBurst(): Unit = {
        val rows = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          val g = s"g${rnd.nextInt(3)}"
          val k2 = if (rnd.nextInt(5) == 0) "CAST(NULL AS DOUBLE)"
                   else s"${rnd.nextInt(3)}.5"
          val v = if (rnd.nextInt(4) == 0) "CAST(NULL AS DOUBLE)"
                  else (rnd.nextInt(120) - 30).toString + ".0"
          val s = s"'s${rnd.nextInt(40)}'"
          s"($nextId, '$g', $k2, $v, $s)"
        }
        spark.sql(s"INSERT INTO graft.$ns.src VALUES ${rows.mkString(", ")}")
      }
      insertBurst()
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm',
           |  '${defn.replace("%NS%", ns).replace("\n", " ")}')""".stripMargin)
        .head.getString(0) shouldBe "incremental"

      for (step <- 0 until 6) {
        rnd.nextInt(4) match {
          case 0 => insertBurst()
          case 1 =>
            // deletes aimed at extremes: retract the stored MIN/MAX so
            // the targeted recompute path actually runs
            if (rnd.nextBoolean())
              spark.sql(s"DELETE FROM graft.$ns.src WHERE v >= ${30 + rnd.nextInt(40)}.0")
            else
              spark.sql(s"DELETE FROM graft.$ns.src WHERE v <= ${-rnd.nextInt(20)}.0")
          case 2 =>
            if (rnd.nextBoolean())
              spark.sql(s"DELETE FROM graft.$ns.src WHERE g = 'g${rnd.nextInt(3)}'")
            else {
              val lo = 1 + rnd.nextInt(math.max(1, nextId.toInt))
              spark.sql(s"DELETE FROM graft.$ns.src WHERE id >= $lo AND id < ${lo + 4}")
            }
          case _ =>
            val id = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(
              s"""MERGE INTO graft.$ns.src t
                 |USING (SELECT CAST($id AS BIGINT) AS id, 'g${rnd.nextInt(3)}' AS g,
                 |              ${rnd.nextInt(3)}.5 AS k2, ${rnd.nextInt(90)}.0 AS v,
                 |              's${rnd.nextInt(40)}' AS s) u
                 |ON t.id = u.id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'm', false)").head.getString(2)
        Seq("incremental", "empty", "noop") should contain(action)
        withClue(s"seed=$seed step=$step action=$action ") {
          agg2(s"graft.$ns.m") shouldBe agg2(
            s"(${defn.replace("%NS%", ns)})")
        }
      }
      // the incremental end state must ALSO equal a forced full rebuild
      spark.sql(s"INSERT INTO graft.$ns.src VALUES (${nextId + 1}, 'g0', 0.5, 7.0, 's1')")
      val incr = { spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)"); agg2(s"graft.$ns.m") }
      spark.sql(s"INSERT INTO graft.$ns.src VALUES (${nextId + 2}, 'g1', 1.5, 9.0, 's2')")
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', true)")
      val full = agg2(s"graft.$ns.m")
      incr should not be full // the full rebuild saw one more row
      full shouldBe agg2(s"(${defn.replace("%NS%", ns)})")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
      spark.sql(s"DROP TABLE graft.$ns.src")
    }
  }

  // ------------------------------------------------------------------
  // Join MVs: one FACT joined to dimensions, group keys and measures
  // drawn from BOTH sides. The fact changelog maintains incrementally
  // against pinned dims; a moved INNER dim maintains incrementally too
  // via the telescoped delta (fact slice at old pins + fact@head
  // against each moved dim's signed slice). A moved LEFT dim flips
  // NULL-extensions non-linearly and re-pins via one full recompute.
  // ------------------------------------------------------------------

  private def aggJ(sqlFrom: String): Seq[String] =
    spark.sql(s"SELECT cat, t, av, mx, n, tw, dv FROM $sqlFrom ORDER BY cat NULLS FIRST")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  test("join MV: fact AND inner-dim changes maintain incrementally (telescoped)") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    val defn =
      """SELECT cat, SUM(v) AS t, AVG(v) AS av, MAX(v) AS mx, COUNT(*) AS n,
        |       SUM(v * wt) AS tw, COUNT(DISTINCT v) AS dv
        |FROM graft.%NS%.fact JOIN graft.%NS%.dim ON g = dg
        |                     JOIN graft.%NS%.dim2 ON r = dr
        |WHERE v IS NULL OR v > -50.0
        |GROUP BY cat""".stripMargin
    for (seed <- 0 until seeds) {
      val rnd = new Random(7000 + seed)
      val ns = s"mvj$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.fact")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.dim")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.dim2")
      spark.sql(s"CREATE TABLE graft.$ns.fact (id BIGINT, g STRING, r INT, v DOUBLE)")
      // odd seeds: merge-on-read dims — their deletes reach the
      // telescope as delete-group pre-images, not rewritten files
      val dimProps =
        if (seed % 2 == 1) " TBLPROPERTIES ('graft.delete.mode' = 'mor')" else ""
      spark.sql(s"CREATE TABLE graft.$ns.dim (dg STRING, cat STRING)$dimProps")
      spark.sql(s"CREATE TABLE graft.$ns.dim2 (dr INT, wt DOUBLE)$dimProps")
      // 4 fact groups onto 2 categories; g3/r2 dangle (inner join drops
      // them) until a dim insert pulls their fact rows IN — group-key
      // coverage includes join-miss rows flipping to hits and back
      spark.sql(
        s"""INSERT INTO graft.$ns.dim VALUES
           |('g0', 'c0'), ('g1', 'c0'), ('g2', 'c1')""".stripMargin)
      spark.sql(s"INSERT INTO graft.$ns.dim2 VALUES (0, 1.0), (1, 2.5)")
      var nextId = 0L
      def insertBurst(): Unit = {
        val rows = (0 until (1 + rnd.nextInt(5))).map { _ =>
          nextId += 1
          val g = s"g${rnd.nextInt(4)}"
          val v = if (rnd.nextInt(5) == 0) "CAST(NULL AS DOUBLE)"
                  else (rnd.nextInt(100) - 20).toString + ".0"
          s"($nextId, '$g', ${rnd.nextInt(3)}, $v)"
        }
        spark.sql(s"INSERT INTO graft.$ns.fact VALUES ${rows.mkString(", ")}")
      }
      insertBurst()
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm',
           |  '${defn.replace("%NS%", ns).replace("\n", " ")}')""".stripMargin)
        .head.getString(0) shouldBe "incremental"

      var dimMoves = 0
      for (step <- 0 until 8) {
        rnd.nextInt(6) match {
          case 0 => insertBurst()
          case 1 =>
            val lo = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(s"DELETE FROM graft.$ns.fact WHERE id >= $lo AND id < ${lo + 4}")
          case 2 =>
            spark.sql(s"DELETE FROM graft.$ns.fact WHERE v >= ${40 + rnd.nextInt(40)}.0")
          case 3 =>
            // dim insert — may pull dangling fact groups into the join
            dimMoves += 1
            spark.sql(s"INSERT INTO graft.$ns.dim VALUES " +
              s"('g3', 'c${rnd.nextInt(3)}')")
          case 4 =>
            // dim re-categorization (delete + insert, two commits) —
            // every joined fact row retracts then re-adds under the
            // new category
            dimMoves += 1
            val g = s"g${rnd.nextInt(3)}"
            spark.sql(s"DELETE FROM graft.$ns.dim WHERE dg = '$g'")
            if (rnd.nextBoolean())
              spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('$g', 'c${rnd.nextInt(3)}')")
          case _ =>
            // dim2 weight update — SUM(v*wt) shifts for every joined row
            dimMoves += 1
            val r = rnd.nextInt(3)
            spark.sql(s"DELETE FROM graft.$ns.dim2 WHERE dr = $r")
            spark.sql(s"INSERT INTO graft.$ns.dim2 VALUES ($r, ${rnd.nextInt(5)}.5)")
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'm', false)").head.getString(2)
        withClue(s"seed=$seed step=$step ") {
          // inner-dim moves must NEVER fall back to full
          Seq("incremental", "empty", "noop") should contain(action)
          aggJ(s"graft.$ns.m") shouldBe aggJ(s"(${defn.replace("%NS%", ns)})")
        }
      }
      // force at least one dim-only refresh window (fact untouched):
      // the staleness dashboard flags it, the refresh stays incremental
      spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g9', 'c1')")
      spark.sql(s"CALL graft.system.mviews('$ns')")
        .head.getBoolean(6) shouldBe true
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
        .head.getString(2) should (be("incremental") or be("empty"))
      spark.sql(s"CALL graft.system.mviews('$ns')")
        .head.getBoolean(6) shouldBe false
      aggJ(s"graft.$ns.m") shouldBe aggJ(s"(${defn.replace("%NS%", ns)})")
      insertBurst()
      // a burst can land entirely on dangling keys (every g deleted by
      // re-categorization steps, r=2 never covered) — the inner join
      // then nets nothing and the refresh is legitimately "empty"
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
        .head.getString(2) should (be("incremental") or be("empty"))
      aggJ(s"graft.$ns.m") shouldBe aggJ(s"(${defn.replace("%NS%", ns)})")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
      spark.sql(s"DROP TABLE graft.$ns.fact")
      spark.sql(s"DROP TABLE graft.$ns.dim")
      spark.sql(s"DROP TABLE graft.$ns.dim2")
    }
  }

  test("UNION ALL MV: every leg maintains with its own pin") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    // legs 0 and 2 carry their OWN retention predicates (the shard-
    // with-different-retention shape) on top of the shared WHERE;
    // leg 1 is bare — mixed per-leg filters maintain incrementally
    val defn =
      """SELECT g, SUM(v) AS t, COUNT(*) AS n, AVG(v) AS av, MAX(v) AS mx,
        |       COUNT(DISTINCT v) AS dv
        |FROM (SELECT * FROM graft.%NS%.s0 WHERE id % 7 != 0 UNION ALL
        |      SELECT * FROM graft.%NS%.s1 UNION ALL
        |      SELECT * FROM graft.%NS%.s2 WHERE v IS NULL OR v < 40.0)
        |WHERE v IS NULL OR v > -20.0
        |GROUP BY g""".stripMargin
    def rows(sqlFrom: String): Seq[String] =
      spark.sql(s"SELECT g, t, n, av, mx, dv FROM $sqlFrom ORDER BY g NULLS FIRST")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    for (seed <- 0 until seeds) {
      val rnd = new Random(9500 + seed)
      val ns = s"mvu$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      for (i <- 0 to 2) {
        spark.sql(s"DROP TABLE IF EXISTS graft.$ns.s$i")
        // middle shard merge-on-read: leg deletes arrive as delete
        // groups, exercising the per-leg changelog's MoR pre-images
        val p = if (i == 1) " TBLPROPERTIES ('graft.delete.mode' = 'mor')" else ""
        spark.sql(s"CREATE TABLE graft.$ns.s$i (id BIGINT, g STRING, v DOUBLE)$p")
      }
      var nextId = 0L
      def insertBurst(leg: Int): Unit = {
        val r = (0 until (1 + rnd.nextInt(5))).map { _ =>
          nextId += 1
          val g = s"g${rnd.nextInt(4)}"
          val v = if (rnd.nextInt(5) == 0) "CAST(NULL AS DOUBLE)"
                  else (rnd.nextInt(80) - 30).toString + ".0"
          s"($nextId, '$g', $v)"
        }
        spark.sql(s"INSERT INTO graft.$ns.s$leg VALUES ${r.mkString(", ")}")
      }
      insertBurst(0); insertBurst(1)
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm',
           |  '${defn.replace("%NS%", ns).replace("\n", " ")}')""".stripMargin)
        .head.getString(0) shouldBe "incremental"
      for (step <- 0 until 7) {
        val leg = rnd.nextInt(3)
        rnd.nextInt(3) match {
          case 0 => insertBurst(leg)
          case 1 =>
            val lo = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(
              s"DELETE FROM graft.$ns.s$leg WHERE id >= $lo AND id < ${lo + 6}")
          case _ =>
            spark.sql(s"DELETE FROM graft.$ns.s$leg WHERE v >= ${30 + rnd.nextInt(40)}.0")
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'm', false)").head.getString(2)
        withClue(s"seed=$seed step=$step leg=$leg ") {
          // a leg move must never fall back to full
          Seq("incremental", "empty", "noop") should contain(action)
          rows(s"graft.$ns.m") shouldBe rows(s"(${defn.replace("%NS%", ns)})")
        }
      }
      // leg-only movement (the tracked first leg untouched) still
      // flags staleness and refreshes incrementally
      insertBurst(2)
      spark.sql(s"CALL graft.system.mviews('$ns')")
        .head.getBoolean(6) shouldBe true
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
        .head.getString(2) should (be("incremental") or be("empty"))
      rows(s"graft.$ns.m") shouldBe rows(s"(${defn.replace("%NS%", ns)})")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
      for (i <- 0 to 2) spark.sql(s"DROP TABLE graft.$ns.s$i")
    }
  }

  test("UNION ALL MV with per-leg SELECT: divergent shard schemas maintain incrementally") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    // three shards with DIVERGENT physical schemas under one MV: s0 is
    // identity (plus its own retention WHERE), s1 (merge-on-read)
    // stores the measure halved under different column names, s2's leg
    // computes upper(g) — every leg read (create scan, head scan,
    // changelog slice incl. MoR pre-images) replays scan → leg WHERE →
    // stored leg SELECT before the shared shape
    val defn =
      """SELECT g, SUM(v) AS t, COUNT(*) AS n, AVG(v) AS av, MAX(v) AS mx,
        |       COUNT(DISTINCT v) AS dv
        |FROM (SELECT id, g, v FROM graft.%NS%.s0 WHERE id % 7 != 0 UNION ALL
        |      SELECT id, cat AS g, v_half * 2.0 AS v FROM graft.%NS%.s1 UNION ALL
        |      SELECT id, upper(g) AS g, v FROM graft.%NS%.s2
        |        WHERE v IS NULL OR v < 40.0)
        |WHERE v IS NULL OR v > -20.0
        |GROUP BY g""".stripMargin
    def rows(sqlFrom: String): Seq[String] =
      spark.sql(s"SELECT g, t, n, av, mx, dv FROM $sqlFrom ORDER BY g NULLS FIRST")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    for (seed <- 0 until seeds) {
      val rnd = new Random(9700 + seed)
      val ns = s"mvup$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.s0")
      spark.sql(s"CREATE TABLE graft.$ns.s0 (id BIGINT, g STRING, v DOUBLE)")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.s1")
      spark.sql(s"CREATE TABLE graft.$ns.s1 (id BIGINT, cat STRING, v_half DOUBLE)" +
        " TBLPROPERTIES ('graft.delete.mode' = 'mor')")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.s2")
      spark.sql(s"CREATE TABLE graft.$ns.s2 (id BIGINT, g STRING, v DOUBLE)")
      var nextId = 0L
      def insertBurst(leg: Int): Unit = {
        val r = (0 until (1 + rnd.nextInt(5))).map { _ =>
          nextId += 1
          val g = s"g${rnd.nextInt(4)}"
          val vi = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(80) - 30)
          val v = vi.map(x => s"$x.0").getOrElse("CAST(NULL AS DOUBLE)")
          val vHalf = vi.map(x => s"${x / 2.0}").getOrElse("CAST(NULL AS DOUBLE)")
          if (leg == 1) s"($nextId, '$g', $vHalf)" else s"($nextId, '$g', $v)"
        }
        spark.sql(s"INSERT INTO graft.$ns.s$leg VALUES ${r.mkString(", ")}")
      }
      insertBurst(0); insertBurst(1)
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm',
           |  '${defn.replace("%NS%", ns).replace("\n", " ")}')""".stripMargin)
        .head.getString(0) shouldBe "incremental"
      for (step <- 0 until 7) {
        val leg = rnd.nextInt(3)
        rnd.nextInt(3) match {
          case 0 => insertBurst(leg)
          case 1 =>
            val lo = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(
              s"DELETE FROM graft.$ns.s$leg WHERE id >= $lo AND id < ${lo + 6}")
          case _ =>
            val bar = 30 + rnd.nextInt(40)
            // the shard's OWN column names — s1 stores the halved value
            if (leg == 1)
              spark.sql(s"DELETE FROM graft.$ns.s1 WHERE v_half >= ${bar / 2.0}")
            else
              spark.sql(s"DELETE FROM graft.$ns.s$leg WHERE v >= $bar.0")
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'm', false)").head.getString(2)
        withClue(s"seed=$seed step=$step leg=$leg ") {
          Seq("incremental", "empty", "noop") should contain(action)
          rows(s"graft.$ns.m") shouldBe rows(s"(${defn.replace("%NS%", ns)})")
        }
      }
      // a projected-leg-only move still flags staleness and refreshes
      // incrementally through its stored SELECT
      insertBurst(1)
      spark.sql(s"CALL graft.system.mviews('$ns')")
        .head.getBoolean(6) shouldBe true
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
        .head.getString(2) should (be("incremental") or be("empty"))
      rows(s"graft.$ns.m") shouldBe rows(s"(${defn.replace("%NS%", ns)})")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
      for (i <- 0 to 2) spark.sql(s"DROP TABLE graft.$ns.s$i")
    }
  }

  test("sharded fact star join MV: union legs JOIN moving dims maintain incrementally") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    // a UNION ALL fact (shard s1 behind a per-leg SELECT with renamed/
    // rescaled columns, MoR deletes) joined to an INNER dim carrying
    // the group key and a LEFT dim — fact bursts on either shard, dim
    // re-categorizations, and LEFT-dim flips all maintain via the
    // telescope with per-leg pins; refresh must never fall back to full
    val defn =
      """SELECT dg, SUM(v) AS t, COUNT(*) AS n, MAX(v) AS mx,
        |       COUNT(DISTINCT v) AS dv, SUM(w) AS tw
        |FROM (SELECT id, g, v FROM graft.%NS%.s0 WHERE id % 7 != 0 UNION ALL
        |      SELECT id, cat AS g, v_half * 2.0 AS v FROM graft.%NS%.s1)
        |  JOIN graft.%NS%.dim ON g = dk
        |  LEFT JOIN graft.%NS%.dim2 ON id % 5 = d2k
        |WHERE v IS NULL OR v > -20.0
        |GROUP BY dg""".stripMargin
    def rows(sqlFrom: String): Seq[String] =
      spark.sql(s"SELECT dg, t, n, mx, dv, tw FROM $sqlFrom ORDER BY dg NULLS FIRST")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    for (seed <- 0 until seeds) {
      val rnd = new Random(9800 + seed)
      val ns = s"mvuj$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.s0")
      spark.sql(s"CREATE TABLE graft.$ns.s0 (id BIGINT, g STRING, v DOUBLE)")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.s1")
      spark.sql(s"CREATE TABLE graft.$ns.s1 (id BIGINT, cat STRING, v_half DOUBLE)" +
        " TBLPROPERTIES ('graft.delete.mode' = 'mor')")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.dim")
      spark.sql(s"CREATE TABLE graft.$ns.dim (dk STRING, dg STRING)")
      spark.sql(s"INSERT INTO graft.$ns.dim VALUES " +
        (0 until 4).map(i => s"('g$i', 'cat${i % 2}')").mkString(", "))
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.dim2")
      spark.sql(s"CREATE TABLE graft.$ns.dim2 (d2k BIGINT, w DOUBLE)")
      spark.sql(s"INSERT INTO graft.$ns.dim2 VALUES (0, 1.0), (2, 2.0)")
      var nextId = 0L
      def insertBurst(leg: Int): Unit = {
        val r = (0 until (1 + rnd.nextInt(5))).map { _ =>
          nextId += 1
          val g = s"g${rnd.nextInt(4)}"
          val vi = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(80) - 30)
          val v = vi.map(x => s"$x.0").getOrElse("CAST(NULL AS DOUBLE)")
          val vHalf = vi.map(x => s"${x / 2.0}").getOrElse("CAST(NULL AS DOUBLE)")
          if (leg == 1) s"($nextId, '$g', $vHalf)" else s"($nextId, '$g', $v)"
        }
        spark.sql(s"INSERT INTO graft.$ns.s$leg VALUES ${r.mkString(", ")}")
      }
      insertBurst(0); insertBurst(1)
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm',
           |  '${defn.replace("%NS%", ns).replace("\n", " ")}')""".stripMargin)
        .head.getString(0) shouldBe "incremental"
      for (step <- 0 until 8) {
        rnd.nextInt(5) match {
          case 0 => insertBurst(rnd.nextInt(2))
          case 1 =>
            val leg = rnd.nextInt(2)
            val bar = 20 + rnd.nextInt(40)
            if (leg == 1)
              spark.sql(s"DELETE FROM graft.$ns.s1 WHERE v_half >= ${bar / 2.0}")
            else
              spark.sql(s"DELETE FROM graft.$ns.s0 WHERE v >= $bar.0")
          case 2 =>
            // re-categorize one dim key (delete + insert = a dim move)
            val k = rnd.nextInt(4)
            spark.sql(s"DELETE FROM graft.$ns.dim WHERE dk = 'g$k'")
            spark.sql(
              s"INSERT INTO graft.$ns.dim VALUES ('g$k', 'cat${rnd.nextInt(3)}')")
          case 3 =>
            // LEFT-dim flips: a bucket gains or loses its weight row
            val b = rnd.nextInt(5)
            spark.sql(s"DELETE FROM graft.$ns.dim2 WHERE d2k = $b")
            if (rnd.nextBoolean())
              spark.sql(
                s"INSERT INTO graft.$ns.dim2 VALUES ($b, ${1 + rnd.nextInt(5)}.0)")
          case _ =>
            val lo = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(s"DELETE FROM graft.$ns.s${rnd.nextInt(2)} " +
              s"WHERE id >= $lo AND id < ${lo + 6}")
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'm', false)").head.getString(2)
        withClue(s"seed=$seed step=$step ") {
          Seq("incremental", "empty", "noop") should contain(action)
          rows(s"graft.$ns.m") shouldBe rows(s"(${defn.replace("%NS%", ns)})")
        }
      }
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
      for (tbl <- Seq("s0", "s1", "dim", "dim2"))
        spark.sql(s"DROP TABLE graft.$ns.$tbl")
    }
  }

  test("DISTINCT MV: set maintenance via row-count bookkeeping, incl. a join + dim move") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    val defn =
      """SELECT DISTINCT cat, k2 % 3 AS kk
        |FROM graft.%NS%.fact JOIN graft.%NS%.dim ON g = dg
        |WHERE v IS NULL OR v > -20.0""".stripMargin
    def rows(ns: String, sqlFrom: String): Seq[String] =
      spark.sql(s"SELECT cat, kk FROM $sqlFrom ORDER BY cat NULLS FIRST, kk NULLS FIRST")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    for (seed <- 0 until seeds) {
      val rnd = new Random(9100 + seed)
      val ns = s"mvd$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.fact")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.dim")
      spark.sql(s"CREATE TABLE graft.$ns.fact (id BIGINT, g STRING, k2 INT, v DOUBLE)")
      spark.sql(s"CREATE TABLE graft.$ns.dim (dg STRING, cat STRING)")
      spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g0','c0'),('g1','c0'),('g2','c1')")
      var nextId = 0L
      def insertBurst(): Unit = {
        val r = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          val g = s"g${rnd.nextInt(4)}"
          val k2 = if (rnd.nextInt(6) == 0) "CAST(NULL AS INT)" else rnd.nextInt(9).toString
          val v = if (rnd.nextInt(5) == 0) "CAST(NULL AS DOUBLE)"
                  else (rnd.nextInt(60) - 30).toString + ".0"
          s"($nextId, '$g', $k2, $v)"
        }
        spark.sql(s"INSERT INTO graft.$ns.fact VALUES ${r.mkString(", ")}")
      }
      insertBurst()
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm',
           |  '${defn.replace("%NS%", ns).replace("\n", " ")}')""".stripMargin)
        .head.getString(0) shouldBe "incremental"
      for (step <- 0 until 6) {
        rnd.nextInt(4) match {
          case 0 => insertBurst()
          case 1 =>
            val lo = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(s"DELETE FROM graft.$ns.fact WHERE id >= $lo AND id < ${lo + 5}")
          case 2 =>
            val g = s"g${rnd.nextInt(3)}"
            spark.sql(s"DELETE FROM graft.$ns.dim WHERE dg = '$g'")
            if (rnd.nextBoolean())
              spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('$g', 'c${rnd.nextInt(3)}')")
          case _ =>
            spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g3', 'c${rnd.nextInt(3)}')")
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'm', false)").head.getString(2)
        withClue(s"seed=$seed step=$step ") {
          Seq("incremental", "empty", "noop") should contain(action)
          rows(ns, s"graft.$ns.m") shouldBe rows(ns, s"(${defn.replace("%NS%", ns)})")
        }
      }
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
      spark.sql(s"DROP TABLE graft.$ns.fact")
      spark.sql(s"DROP TABLE graft.$ns.dim")
    }
  }

  test("join MV: a moved LEFT-joined dim maintains incrementally (NULL-extension flips)") {
    val ns = "mvjl"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.fact")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.dim")
    spark.sql(s"CREATE TABLE graft.$ns.fact (id BIGINT, g STRING, r INT, v DOUBLE)")
    spark.sql(s"CREATE TABLE graft.$ns.dim (dg STRING, cat STRING)")
    spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g0', 'c0'), ('g1', 'c1')")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES " +
      "(1, 'g0', 0, 10.0), (2, 'g1', 1, 20.0), (3, 'g2', 2, 30.0)")
    val defn =
      s"""SELECT cat, SUM(v) AS t, AVG(v) AS av, MAX(v) AS mx, COUNT(*) AS n,
         |       SUM(v * 2.0) AS tw, COUNT(DISTINCT v) AS dv
         |FROM graft.$ns.fact LEFT JOIN graft.$ns.dim ON g = dg
         |GROUP BY cat""".stripMargin
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm',
         |  '${defn.replace("\n", " ")}')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    def refresh(): String =
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
        .head.getString(2)
    // fact-only changes stay incremental with the left dim pinned
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (4, 'g3', 0, 40.0)")
    refresh() shouldBe "incremental"
    aggJ(s"graft.$ns.m") shouldBe aggJ(s"($defn)")
    // the LEFT dim moves: g2's NULL-extension flips to a real match —
    // matched part (+) plus the flip retraction (−), INCREMENTAL now
    spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g2', 'c0')")
    refresh() shouldBe "incremental"
    aggJ(s"graft.$ns.m") shouldBe aggJ(s"($defn)")
    // a dim delete flips g1's fact rows BACK to the NULL-extension
    spark.sql(s"DELETE FROM graft.$ns.dim WHERE dg = 'g1'")
    refresh() shouldBe "incremental"
    aggJ(s"graft.$ns.m") shouldBe aggJ(s"($defn)")
    // a dim retarget that KEEPS matches: matched-part only, no flips
    spark.sql(s"DELETE FROM graft.$ns.dim WHERE dg = 'g0'")
    spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g0', 'c7')")
    refresh() shouldBe "incremental"
    aggJ(s"graft.$ns.m") shouldBe aggJ(s"($defn)")
    // mixed window: fact AND left dim move before one refresh
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (5, 'g2', 1, 50.0), (6, 'g4', 0, 60.0)")
    spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g3', 'c1')")
    refresh() shouldBe "incremental"
    aggJ(s"graft.$ns.m") shouldBe aggJ(s"($defn)")
    // randomized churn across both tables, refresh after every window
    // (seed count scales with GRAFT_MV_SEEDS for deep sweeps)
    val steps = 10 * sys.env.get("GRAFT_MV_SEEDS").map(_.toInt / 4 max 1).getOrElse(1)
    val rnd = new Random(71)
    var nextId = 6L
    var nextDim = 4
    for (step <- 0 until steps) {
      rnd.nextInt(5) match {
        case 0 =>
          nextId += 1
          spark.sql(s"INSERT INTO graft.$ns.fact VALUES " +
            s"($nextId, 'g${rnd.nextInt(6)}', ${rnd.nextInt(3)}, ${rnd.nextInt(90)}.0)")
        case 1 =>
          spark.sql(s"DELETE FROM graft.$ns.fact WHERE v = ${rnd.nextInt(90)}.0")
        case 2 =>
          nextDim += 1
          // may introduce a brand-new key (future facts match it) or a
          // DUPLICATE dg (left join fans out — multiplicity covered)
          spark.sql(s"INSERT INTO graft.$ns.dim VALUES " +
            s"('g${rnd.nextInt(7)}', 'c${rnd.nextInt(4)}')")
        case 3 =>
          spark.sql(s"DELETE FROM graft.$ns.dim WHERE dg = 'g${rnd.nextInt(7)}'")
        case _ =>
          val k = rnd.nextInt(7)
          spark.sql(s"DELETE FROM graft.$ns.dim WHERE dg = 'g$k'")
          spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g$k', 'c${rnd.nextInt(4)}')")
      }
      val action = refresh()
      Seq("incremental", "empty", "noop") should contain(action)
      withClue(s"step=$step action=$action ") {
        aggJ(s"graft.$ns.m") shouldBe aggJ(s"($defn)")
      }
    }
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
    spark.sql(s"DROP TABLE graft.$ns.fact")
    spark.sql(s"DROP TABLE graft.$ns.dim")
  }

  // Round-17: FULL OUTER (single join) maintains with TWO-SIDED flip
  // terms — each side's linear slice left-joined from its own side,
  // the other side's NULL-extensions flipped by slice-bounded
  // semi/anti probes. Unmatched facts group under the NULL dim key;
  // unmatched dims contribute (NULLf, d) rows to their own groups.
  test("join MV: FULL OUTER maintains incrementally through both-side churn") {
    val ns = "mvjf"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.fact")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.dim")
    spark.sql(s"CREATE TABLE graft.$ns.fact (id BIGINT, g STRING, r INT, v DOUBLE)")
    spark.sql(s"CREATE TABLE graft.$ns.dim (dg STRING, cat STRING)")
    spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g0', 'c0'), ('g1', 'c1'), ('g9', 'c9')")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES " +
      "(1, 'g0', 0, 10.0), (2, 'g1', 1, 20.0), (3, 'g2', 2, 30.0)")
    val defn =
      s"""SELECT cat, SUM(v) AS t, AVG(v) AS av, MAX(v) AS mx, COUNT(*) AS n,
         |       COUNT(DISTINCT v) AS dv
         |FROM graft.$ns.fact FULL OUTER JOIN graft.$ns.dim ON g = dg
         |GROUP BY cat""".stripMargin
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm',
         |  '${defn.replace("\n", " ")}')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    def refresh(): String =
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
        .head.getString(2)
    def aggF(sqlFrom: String): Seq[String] =
      spark.sql(s"SELECT cat, t, av, mx, n, dv FROM $sqlFrom ORDER BY cat NULLS FIRST")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    def check(step: String): Unit = withClue(s"$step ") {
      aggF(s"graft.$ns.m") shouldBe aggF(s"($defn)")
    }
    check("create")
    // fact insert matching an UNMATCHED dim: g9's (NULLf, d) retracts
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (4, 'g9', 0, 40.0)")
    refresh() shouldBe "incremental"
    check("fact gains dim's first match")
    // fact delete that was g9's LAST match: (NULLf, d) re-extends
    spark.sql(s"DELETE FROM graft.$ns.fact WHERE id = 4")
    refresh() shouldBe "incremental"
    check("fact loses dim's last match")
    // dim insert matching an unmatched fact: g2's (f, NULLd) flips
    spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g2', 'c0')")
    refresh() shouldBe "incremental"
    check("dim gains fact's first match")
    // dim delete: matched facts flip back AND the dim row's own side goes
    spark.sql(s"DELETE FROM graft.$ns.dim WHERE dg = 'g1'")
    refresh() shouldBe "incremental"
    check("dim loses")
    // both sides move before one refresh
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (5, 'g4', 1, 50.0)")
    spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g5', 'c2')")
    refresh() shouldBe "incremental"
    check("both sides move")
    val steps = 12 * sys.env.get("GRAFT_MV_SEEDS").map(_.toInt / 4 max 1).getOrElse(1)
    val rnd = new Random(93)
    var nextId = 5L
    for (step <- 0 until steps) {
      rnd.nextInt(5) match {
        case 0 =>
          nextId += 1
          spark.sql(s"INSERT INTO graft.$ns.fact VALUES " +
            s"($nextId, 'g${rnd.nextInt(7)}', ${rnd.nextInt(3)}, ${rnd.nextInt(90)}.0)")
        case 1 =>
          spark.sql(s"DELETE FROM graft.$ns.fact WHERE v = ${rnd.nextInt(90)}.0")
        case 2 =>
          spark.sql(s"INSERT INTO graft.$ns.dim VALUES " +
            s"('g${rnd.nextInt(8)}', 'c${rnd.nextInt(4)}')")
        case 3 =>
          spark.sql(s"DELETE FROM graft.$ns.dim WHERE dg = 'g${rnd.nextInt(8)}'")
        case _ =>
          val k = rnd.nextInt(8)
          spark.sql(s"DELETE FROM graft.$ns.dim WHERE dg = 'g$k'")
          spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g$k', 'c${rnd.nextInt(4)}')")
      }
      val action = refresh()
      Seq("incremental", "empty", "noop") should contain(action)
      check(s"step=$step action=$action")
    }
    // round 17: FULL now composes with further dims when it is the
    // FIRST join — but only then; deeper in the chain still refuses
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.dim2x")
    spark.sql(s"CREATE TABLE graft.$ns.dim2x (cat2 STRING, memo STRING)")
    val e = intercept[Exception](spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm2',
         |  'SELECT cat, COUNT(*) AS n FROM graft.$ns.fact
         |   JOIN graft.$ns.dim ON g = dg
         |   FULL OUTER JOIN graft.$ns.dim2x ON cat = cat2 GROUP BY cat')"""
        .stripMargin.replace("\n", " ")))
    (Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")) should
      include("FIRST join")
    spark.sql(s"DROP TABLE graft.$ns.dim2x")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
    spark.sql(s"DROP TABLE graft.$ns.fact")
    spark.sql(s"DROP TABLE graft.$ns.dim")
  }

  // Round-18: FULL OUTER over a SHARDED UNION ALL fact — union is
  // linear leg by leg, so the FULL slice term unions every leg's slice
  // (through its per-leg WHERE/SELECT) and the flip probes read the
  // union'd fact at the per-leg FROM pins and at the head. One shard
  // carries a divergent schema (per-leg SELECT), and a second MV adds
  // a suffix INNER dim so the moved-suffix split-prefix path runs over
  // the union too.
  test("join MV: FULL OUTER over a union'd fact maintains incrementally") {
    val ns = "mvjfu"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    Seq("s0", "s1", "dim", "dim2").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.$t"))
    spark.sql(s"CREATE TABLE graft.$ns.s0 (id BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"CREATE TABLE graft.$ns.s1 (id2 BIGINT, code STRING, amt DOUBLE)")
    spark.sql(s"CREATE TABLE graft.$ns.dim (dg STRING, cat STRING)")
    spark.sql(s"CREATE TABLE graft.$ns.dim2 (cat2 STRING, cls STRING)")
    spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g0','c0'),('g1','c1'),('g9','c9')")
    spark.sql(s"INSERT INTO graft.$ns.dim2 VALUES ('c0','K0'),('c1','K1'),('c9','K9')")
    spark.sql(s"INSERT INTO graft.$ns.s0 VALUES (1,'g0',10.0),(2,'g2',30.0)")
    spark.sql(s"INSERT INTO graft.$ns.s1 VALUES (100,'G1',20.0),(101,'G3',25.0)")
    val union =
      s"""SELECT id, g, v FROM graft.$ns.s0
         | UNION ALL
         | SELECT id2 AS id, lower(code) AS g, amt AS v FROM graft.$ns.s1""".stripMargin
    val defn1 =
      s"""SELECT cat, SUM(v) AS t, MAX(v) AS mx, COUNT(*) AS n,
         |       COUNT(DISTINCT v) AS dv
         |FROM ($union) FULL OUTER JOIN graft.$ns.dim ON g = dg
         |GROUP BY cat""".stripMargin
    val defn2 =
      s"""SELECT cls, SUM(v) AS t, COUNT(*) AS n
         |FROM ($union) FULL OUTER JOIN graft.$ns.dim ON g = dg
         |  JOIN graft.$ns.dim2 ON cat = cat2
         |GROUP BY cls""".stripMargin
    spark.sql(s"CALL graft.system.create_mview('$ns', 'm1', " +
      s"'${defn1.replace("\n", " ").replace("'", "''")}')")
      .head.getString(0) shouldBe "incremental"
    spark.sql(s"CALL graft.system.create_mview('$ns', 'm2', " +
      s"'${defn2.replace("\n", " ").replace("'", "''")}')")
      .head.getString(0) shouldBe "incremental"
    def refresh(m: String): String =
      spark.sql(s"CALL graft.system.refresh_mview('$ns', '$m', false)")
        .head.getString(2)
    def rowsOf(sel: String, from: String): Seq[String] =
      spark.sql(s"SELECT $sel FROM $from ORDER BY 1 NULLS FIRST")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    def check(step: String): Unit = withClue(s"$step ") {
      rowsOf("cat, t, mx, n, dv", s"graft.$ns.m1") shouldBe
        rowsOf("cat, t, mx, n, dv", s"($defn1)")
      rowsOf("cls, t, n", s"graft.$ns.m2") shouldBe
        rowsOf("cls, t, n", s"($defn2)")
    }
    check("create")
    val rnd = new Random(181)
    var nid = 101L
    for (step <- 0 until 16) {
      rnd.nextInt(6) match {
        case 0 => // shard-0 burst (may match unmatched dims or none)
          nid += 1
          spark.sql(s"INSERT INTO graft.$ns.s0 VALUES " +
            s"($nid, 'g${rnd.nextInt(7)}', ${rnd.nextInt(60)}.0)")
        case 1 => // shard-1 burst through the projection
          nid += 1
          spark.sql(s"INSERT INTO graft.$ns.s1 VALUES " +
            s"($nid, 'G${rnd.nextInt(7)}', ${rnd.nextInt(60)}.0)")
        case 2 => // band delete on either shard: partners may re-extend
          if (rnd.nextBoolean())
            spark.sql(s"DELETE FROM graft.$ns.s0 WHERE v >= ${20 + rnd.nextInt(30)}.0")
          else
            spark.sql(s"DELETE FROM graft.$ns.s1 WHERE amt >= ${20 + rnd.nextInt(30)}.0")
        case 3 => // FULL-dim churn: extensions born/killed directly
          val k = rnd.nextInt(8)
          spark.sql(s"DELETE FROM graft.$ns.dim WHERE dg = 'g$k'")
          if (rnd.nextBoolean())
            spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g$k', 'c${rnd.nextInt(4)}')")
        case 4 => // suffix-dim churn: the split-prefix term over the union
          val c = rnd.nextInt(4)
          spark.sql(s"DELETE FROM graft.$ns.dim2 WHERE cat2 = 'c$c'")
          if (rnd.nextBoolean())
            spark.sql(s"INSERT INTO graft.$ns.dim2 VALUES ('c$c', 'K${rnd.nextInt(3)}')")
        case 5 => // several sides move before one refresh
          nid += 1
          spark.sql(s"INSERT INTO graft.$ns.s1 VALUES " +
            s"($nid, 'G${rnd.nextInt(7)}', ${rnd.nextInt(60)}.0)")
          spark.sql(s"UPDATE graft.$ns.dim SET cat = 'c${rnd.nextInt(4)}' " +
            s"WHERE dg = 'g${rnd.nextInt(5)}'")
      }
      val a1 = refresh("m1")
      val a2 = refresh("m2")
      Seq("incremental", "empty", "noop") should contain(a1)
      Seq("incremental", "empty", "noop") should contain(a2)
      check(s"step=$step m1=$a1 m2=$a2")
    }
    // a SECOND FULL join still refuses by name (no single dim side
    // anchors the two-sided flips)
    val e = intercept[Exception](spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm3',
         |  'SELECT cls, COUNT(*) AS n FROM graft.$ns.s0
         |   FULL OUTER JOIN graft.$ns.dim ON g = dg
         |   FULL OUTER JOIN graft.$ns.dim2 ON cat = cat2 GROUP BY cls')"""
        .stripMargin.replace("\n", " ")))
    (Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")) should
      include("more than one FULL")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm2')")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm1')")
    Seq("s0", "s1", "dim", "dim2").foreach(t =>
      spark.sql(s"DROP TABLE graft.$ns.$t"))
  }

  // Round-17: the FULL head join COMPOSES with further inner/left dims
  // — suffix dims ride every FULL term at their telescope pins, and a
  // moved suffix dim's term splits the FULL prefix so fact pruning
  // cannot invent extensions. Differential churn over all four
  // relations: fact, the FULL dim, a dim-keyed INNER suffix dim
  // (extensions survive into it when their key matches), and a
  // fact-keyed LEFT suffix dim (extensions NULL-extend under it).
  test("join MV: FULL OUTER head composes with suffix dims through churn") {
    val ns = "mvjfc"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    for (t <- Seq("fact", "d1", "d2", "d3")) spark.sql(s"DROP TABLE IF EXISTS graft.$ns.$t")
    spark.sql(s"CREATE TABLE graft.$ns.fact (id BIGINT, g STRING, r INT, v DOUBLE)")
    spark.sql(s"CREATE TABLE graft.$ns.d1 (dg STRING, cat STRING)")
    spark.sql(s"CREATE TABLE graft.$ns.d2 (ck STRING, lbl STRING)")
    spark.sql(s"CREATE TABLE graft.$ns.d3 (rk INT, extra STRING)")
    spark.sql(s"INSERT INTO graft.$ns.d1 VALUES ('g0','c0'),('g1','c1'),('g9','c2')")
    spark.sql(s"INSERT INTO graft.$ns.d2 VALUES ('c0','L0'),('c1','L1'),('c2','L2')")
    spark.sql(s"INSERT INTO graft.$ns.d3 VALUES (0,'E0'),(1,'E1')")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES " +
      "(1,'g0',0,10.0),(2,'g1',1,20.0),(3,'g2',2,30.0)")
    val defn =
      s"""SELECT lbl, extra, SUM(v) AS t, AVG(v) AS av, MAX(v) AS mx,
         |       COUNT(*) AS n, COUNT(DISTINCT v) AS dv
         |FROM graft.$ns.fact FULL OUTER JOIN graft.$ns.d1 ON g = dg
         |     JOIN graft.$ns.d2 ON cat = ck
         |     LEFT JOIN graft.$ns.d3 ON r = rk
         |GROUP BY lbl, extra""".stripMargin
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm',
         |  '${defn.replace("\n", " ")}')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    def refresh(): String =
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
        .head.getString(2)
    def aggF(sqlFrom: String): Seq[String] =
      spark.sql(s"SELECT lbl, extra, t, av, mx, n, dv FROM $sqlFrom")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    def check(step: String): Unit = withClue(s"$step ") {
      aggF(s"graft.$ns.m") shouldBe aggF(s"($defn)")
    }
    check("create")
    // the directed cases first: each flip direction with suffix dims on
    // fact gains g9's first match: the (NULLf, g9) extension — alive
    // through d2 via cat c2 — retracts
    spark.sql(s"INSERT INTO graft.$ns.d2 VALUES ('cX','LX')")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (4,'g9',0,40.0)")
    refresh() shouldBe "incremental"
    check("fact gains the FULL dim's first match")
    // fact loses g9's last match: the extension re-appears, and it must
    // re-thread d2 (inner, cat-keyed) and d3 (left, NULL r)
    spark.sql(s"DELETE FROM graft.$ns.fact WHERE id = 4")
    refresh() shouldBe "incremental"
    check("fact loses the FULL dim's last match")
    // the FULL dim moves: g2's unmatched fact row flips matched
    spark.sql(s"INSERT INTO graft.$ns.d1 VALUES ('g2','c1')")
    refresh() shouldBe "incremental"
    check("FULL dim gains an unmatched fact's match")
    // a SUFFIX dim moves while extensions exist (the split-base path:
    // d2 is dim-keyed, so the extension side must survive the prune).
    // The unmatched fact row's own delta nets EMPTY — its NULL cat
    // drops under the inner d2 — which is itself a correctness pin.
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (5,'g7',1,50.0)") // unmatched fact
    Seq("incremental", "empty") should contain(refresh())
    spark.sql(s"UPDATE graft.$ns.d2 SET lbl = 'L2x' WHERE ck = 'c2'")
    refresh() shouldBe "incremental"
    check("inner suffix dim moves under live extensions")
    // the LEFT suffix dim moves: extension rows keep their NULL r
    spark.sql(s"INSERT INTO graft.$ns.d3 VALUES (2,'E2')")
    refresh() shouldBe "incremental"
    check("left suffix dim moves")
    val steps = 14 * sys.env.get("GRAFT_MV_SEEDS").map(_.toInt / 4 max 1).getOrElse(1)
    val rnd = new Random(117)
    var nextId = 5L
    for (step <- 0 until steps) {
      rnd.nextInt(7) match {
        case 0 =>
          nextId += 1
          spark.sql(s"INSERT INTO graft.$ns.fact VALUES " +
            s"($nextId, 'g${rnd.nextInt(7)}', ${rnd.nextInt(4)}, ${rnd.nextInt(90)}.0)")
        case 1 =>
          spark.sql(s"DELETE FROM graft.$ns.fact WHERE v = ${rnd.nextInt(90)}.0")
        case 2 =>
          spark.sql(s"INSERT INTO graft.$ns.d1 VALUES " +
            s"('g${rnd.nextInt(8)}', 'c${rnd.nextInt(4)}')")
        case 3 =>
          spark.sql(s"DELETE FROM graft.$ns.d1 WHERE dg = 'g${rnd.nextInt(8)}'")
        case 4 =>
          val k = rnd.nextInt(4)
          spark.sql(s"DELETE FROM graft.$ns.d2 WHERE ck = 'c$k'")
          spark.sql(s"INSERT INTO graft.$ns.d2 VALUES ('c$k', 'L${rnd.nextInt(5)}')")
        case 5 =>
          spark.sql(s"INSERT INTO graft.$ns.d3 VALUES " +
            s"(${rnd.nextInt(4)}, 'E${rnd.nextInt(5)}')")
        case _ =>
          spark.sql(s"DELETE FROM graft.$ns.d3 WHERE rk = ${rnd.nextInt(4)}")
      }
      val action = refresh()
      Seq("incremental", "empty", "noop") should contain(action)
      check(s"step=$step action=$action")
    }
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
    for (t <- Seq("fact", "d1", "d2", "d3")) spark.sql(s"DROP TABLE graft.$ns.$t")
  }

  // ------------------------------------------------------------------
  // Global aggregates (no GROUP BY): one stored row addressed by the
  // synthetic constant key, incrementally maintained — including the
  // FULL WIPE, where the correct state is one row of count 0 / NULL
  // sums (SQL global-aggregate semantics), never zero rows.
  // ------------------------------------------------------------------

  private def aggG(sqlFrom: String): Seq[String] =
    spark.sql(s"SELECT n, total, av, mn, mx FROM $sqlFrom")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  test("global-aggregate MV: one row maintained incrementally, survives a full wipe") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    val defn =
      """SELECT COUNT(*) AS n, SUM(v) AS total, AVG(v) AS av,
        |       MIN(v) AS mn, MAX(v) AS mx
        |FROM graft.%NS%.src WHERE v IS NULL OR v > -50.0""".stripMargin
    for (seed <- 0 until seeds) {
      val rnd = new Random(3000 + seed)
      val ns = s"mvg$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
      spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, v DOUBLE)")
      var nextId = 0L
      def insertBurst(): Unit = {
        val rows = (0 until (1 + rnd.nextInt(4))).map { _ =>
          nextId += 1
          val v = if (rnd.nextInt(5) == 0) "CAST(NULL AS DOUBLE)"
                  else (rnd.nextInt(100) - 20).toString + ".0"
          s"($nextId, $v)"
        }
        spark.sql(s"INSERT INTO graft.$ns.src VALUES ${rows.mkString(", ")}")
      }
      // created over an EMPTY source: the MV must already hold the
      // one empty-aggregate row (count 0, NULL sums)
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm',
           |  '${defn.replace("%NS%", ns).replace("\n", " ")}')""".stripMargin)
        .head.getString(0) shouldBe "incremental"
      aggG(s"graft.$ns.m") shouldBe aggG(s"(${defn.replace("%NS%", ns)})")
      for (step <- 0 until 6) {
        rnd.nextInt(4) match {
          case 0 | 1 => insertBurst()
          case 2 =>
            val lo = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(s"DELETE FROM graft.$ns.src WHERE id >= $lo AND id < ${lo + 4}")
          case _ =>
            // the full wipe: global agg of an empty table is ONE row
            spark.sql(s"DELETE FROM graft.$ns.src WHERE id >= 0")
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'm', false)").head.getString(2)
        Seq("incremental", "empty", "noop") should contain(action)
        withClue(s"seed=$seed step=$step action=$action ") {
          aggG(s"graft.$ns.m") shouldBe aggG(s"(${defn.replace("%NS%", ns)})")
          spark.sql(s"SELECT COUNT(*) FROM graft.$ns.m").head.getLong(0) shouldBe 1L
        }
      }
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
      spark.sql(s"DROP TABLE graft.$ns.src")
    }
  }

  // ------------------------------------------------------------------
  // HAVING: storage keeps EVERY group (refresh stays O(changes)); the
  // predicate applies at view read over the stored aggregates —
  // including resolver-added extras the SELECT never carried (a hidden
  // COUNT(*) and a hidden group key here), stored as _mv_h<i> columns.
  // Groups must flicker in/out of the view as mutations cross the bar.
  // ------------------------------------------------------------------

  test("HAVING MVs: view-level predicate over incremental storage == inline") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    for (seed <- 0 until seeds) {
      val rnd = new Random(3000 + seed)
      val ns = s"mvh$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
      spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, v DOUBLE)")
      var nextId = 0L
      def insertBurst(): Unit = {
        val rows = (0 until (2 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          val v = if (rnd.nextInt(5) == 0) "CAST(NULL AS DOUBLE)"
                  else (rnd.nextInt(60) - 10).toString + ".0"
          s"($nextId, 'g${rnd.nextInt(4)}', $v)"
        }
        spark.sql(s"INSERT INTO graft.$ns.src VALUES ${rows.mkString(", ")}")
      }
      insertBurst()
      // hidden COUNT(*) (not selected) + selected SUM; group key selected
      val defn =
        s"""SELECT g, SUM(v) AS total FROM graft.$ns.src
           |GROUP BY g HAVING COUNT(*) >= 3 AND SUM(v) IS NOT NULL""".stripMargin
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm', '${defn.replace("'", "''")}')""")
        .head.getString(0) shouldBe "incremental"
      // hidden GROUP KEY: one output row per g, g itself never public
      val defn2 =
        s"""SELECT COUNT(*) AS n, MAX(v) AS mx FROM graft.$ns.src
           |GROUP BY g HAVING g <> ''g3'' AND COUNT(*) >= 2""".stripMargin
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm2', '$defn2')""")
        .head.getString(0) shouldBe "incremental"
      def snap(q: String): Seq[String] =
        spark.sql(q).collect().map(_.toSeq.map(String.valueOf).mkString("|"))
          .sorted.toSeq
      for (step <- 0 until 6) {
        rnd.nextInt(3) match {
          case 0 => insertBurst()
          case 1 =>
            if (rnd.nextBoolean())
              spark.sql(s"DELETE FROM graft.$ns.src WHERE g = 'g${rnd.nextInt(4)}'")
            else {
              val lo = 1 + rnd.nextInt(math.max(1, nextId.toInt))
              spark.sql(s"DELETE FROM graft.$ns.src WHERE id >= $lo AND id < ${lo + 3}")
            }
          case _ =>
            val id = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(
              s"""MERGE INTO graft.$ns.src t
                 |USING (SELECT CAST($id AS BIGINT) AS id, 'g${rnd.nextInt(4)}' AS g,
                 |              ${rnd.nextInt(50)}.0 AS v) s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        }
        spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
        spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm2', false)")
        withClue(s"seed=$seed step=$step ") {
          snap(s"SELECT g, total FROM graft.$ns.m") shouldBe
            snap(s"SELECT g, SUM(v) AS total FROM graft.$ns.src " +
              "GROUP BY g HAVING COUNT(*) >= 3 AND SUM(v) IS NOT NULL")
          snap(s"SELECT n, mx FROM graft.$ns.m2") shouldBe
            snap(s"SELECT COUNT(*) AS n, MAX(v) AS mx FROM graft.$ns.src " +
              "GROUP BY g HAVING g <> 'g3' AND COUNT(*) >= 2")
        }
      }
      // the _mv_h extras never leak into the public read
      spark.sql(s"SELECT * FROM graft.$ns.m2").columns.toSeq shouldBe Seq("n", "mx")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm2')")
      spark.sql(s"DROP TABLE graft.$ns.src")
    }
  }

  // ------------------------------------------------------------------
  // ROLLUP/CUBE/GROUPING SETS: the signed slice re-aggregates through
  // the SAME grouping sets, so every set's subtotal row gets its exact
  // delta; the stored grouping id joins the merge key (a real NULL key
  // and a rolled-up NULL are different rows). grouping()/grouping_id()
  // outputs are view-computed over the stored id. Spark semantics over
  // an empty table = ZERO rows (no grand-total special case) — wipes
  // must converge to empty storage.
  // ------------------------------------------------------------------

  test("grouping sets MVs: rollup/cube subtotals maintain incrementally") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(3)
    for (seed <- 0 until seeds) {
      val rnd = new Random(4000 + seed)
      val ns = s"mvgs$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
      spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, h STRING, v DOUBLE)")
      var nextId = 0L
      def insertBurst(): Unit = {
        val rows = (0 until (2 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          // NULL group values collide with rolled-up NULLs: the gid
          // merge-key component must keep them apart
          val g = if (rnd.nextInt(6) == 0) "NULL" else s"'g${rnd.nextInt(3)}'"
          val h = if (rnd.nextInt(6) == 0) "NULL" else s"'h${rnd.nextInt(2)}'"
          val v = if (rnd.nextInt(5) == 0) "CAST(NULL AS DOUBLE)"
                  else (rnd.nextInt(80) - 20).toString + ".0"
          s"($nextId, $g, $h, $v)"
        }
        spark.sql(s"INSERT INTO graft.$ns.src VALUES ${rows.mkString(", ")}")
      }
      insertBurst()
      val shape = seed % 3 match {
        case 0 => "ROLLUP(g, h)"
        case 1 => "CUBE(g, h)"
        case _ => "GROUPING SETS ((g, h), (h), ())"
      }
      // DISTINCT aggregates under sets ride per-set pair rows: two
      // distinct expressions → two pair tables, with COUNT+SUM+AVG
      // over the first sharing one (values are whole doubles, so the
      // distinct double sums are exact and string-comparable)
      val defn =
        s"""SELECT g, h, SUM(v) AS total, AVG(v) AS av, COUNT(v) AS nv,
           |       COUNT(*) AS n, MIN(v) AS mn, MAX(v) AS mx,
           |       COUNT(DISTINCT v) AS dv, SUM(DISTINCT v) AS sdv,
           |       AVG(DISTINCT v) AS adv,
           |       SUM(DISTINCT id % 5) AS sdi,
           |       grouping_id(g, h) AS gi
           |FROM graft.$ns.src WHERE v IS NULL OR v > -15.0
           |GROUP BY $shape""".stripMargin
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm', '${defn.replace("'", "''")}')""")
        .head.getString(0) shouldBe "incremental"
      def snap(from: String): Seq[String] =
        spark.sql(s"SELECT g, h, total, av, nv, n, mn, mx, dv, sdv, adv, sdi, gi FROM $from")
          .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      for (step <- 0 until 7) {
        rnd.nextInt(3) match {
          case 0 => insertBurst()
          case 1 =>
            if (rnd.nextBoolean())
              spark.sql(s"DELETE FROM graft.$ns.src WHERE g = 'g${rnd.nextInt(3)}'")
            else {
              val lo = 1 + rnd.nextInt(math.max(1, nextId.toInt))
              spark.sql(s"DELETE FROM graft.$ns.src WHERE id >= $lo AND id < ${lo + 4}")
            }
          case _ =>
            val id = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(
              s"""MERGE INTO graft.$ns.src t
                 |USING (SELECT CAST($id AS BIGINT) AS id, 'g${rnd.nextInt(3)}' AS g,
                 |              'h${rnd.nextInt(2)}' AS h, ${rnd.nextInt(60)}.0 AS v) s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'm', false)").head.getString(2)
        Seq("incremental", "empty", "noop") should contain(action)
        withClue(s"seed=$seed shape=$shape step=$step action=$action ") {
          snap(s"graft.$ns.m") shouldBe snap(s"($defn)")
        }
      }
      // a full wipe must converge to ZERO rows (Spark grouping-sets
      // semantics over an empty table), then incrementality resumes
      spark.sql(s"DELETE FROM graft.$ns.src WHERE true")
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
      withClue(s"seed=$seed shape=$shape post-wipe ") {
        spark.sql(s"SELECT * FROM graft.$ns.m").count() shouldBe 0L
      }
      insertBurst()
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
      withClue(s"seed=$seed shape=$shape post-wipe-insert ") {
        snap(s"graft.$ns.m") shouldBe snap(s"($defn)")
      }
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
      spark.sql(s"DROP TABLE graft.$ns.src")
    }
  }

  // Composition: the sets decoder sits ABOVE the relation unroll, so
  // ROLLUP composes with a dim join (telescoped dim moves included)
  // and with UNION ALL legs — subtotal rows maintained incrementally
  // through both.
  test("ROLLUP composes with join dims and UNION ALL legs incrementally") {
    val ns = "mvgsjoin"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    for (t <- Seq("fact", "dim", "s0", "s1"))
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.$t")
    spark.sql(s"CREATE TABLE graft.$ns.fact (id BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"CREATE TABLE graft.$ns.dim (dg STRING, cat STRING)")
    spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g0','c0'), ('g1','c1'), ('g2','c0')")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES " +
      "(1,'g0',1.0), (2,'g1',2.0), (3,'g2',3.0), (4,'g0',4.0)")
    val joinDefn =
      s"""SELECT cat, g, SUM(v) AS t, COUNT(*) AS n,
         |       grouping_id(cat, g) AS gi
         |FROM graft.$ns.fact JOIN graft.$ns.dim ON g = dg
         |GROUP BY ROLLUP(cat, g)""".stripMargin
    spark.sql(s"""CALL graft.system.create_mview('$ns', 'mj',
                 |  '${joinDefn.replace("\n", " ")}')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    def snapJ(from: String): Seq[String] =
      spark.sql(s"SELECT cat, g, t, n, gi FROM $from")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    // fact move, then a dim move (telescope under sets)
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (5,'g1',5.0)")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'mj', false)")
      .head.getString(2) shouldBe "incremental"
    snapJ(s"graft.$ns.mj") shouldBe snapJ(s"($joinDefn)")
    spark.sql(s"DELETE FROM graft.$ns.dim WHERE dg = 'g2'")
    spark.sql(s"INSERT INTO graft.$ns.dim VALUES ('g2','c1')")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'mj', false)")
      .head.getString(2) shouldBe "incremental"
    snapJ(s"graft.$ns.mj") shouldBe snapJ(s"($joinDefn)")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'mj')")
    // ... and over UNION ALL legs with a per-leg WHERE
    spark.sql(s"CREATE TABLE graft.$ns.s0 (id BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"CREATE TABLE graft.$ns.s1 (id BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.s0 VALUES (1,'g0',1.0), (2,'g1',2.0)")
    spark.sql(s"INSERT INTO graft.$ns.s1 VALUES (3,'g0',30.0), (4,'g1',4.0)")
    val uDefn =
      s"""SELECT g, SUM(v) AS t, COUNT(*) AS n
         |FROM (SELECT * FROM graft.$ns.s0 UNION ALL
         |      SELECT * FROM graft.$ns.s1 WHERE v < 20.0)
         |GROUP BY ROLLUP(g)""".stripMargin
    spark.sql(s"""CALL graft.system.create_mview('$ns', 'mu',
                 |  '${uDefn.replace("\n", " ")}')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    def snapU(from: String): Seq[String] =
      spark.sql(s"SELECT g, t, n FROM $from")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    spark.sql(s"INSERT INTO graft.$ns.s1 VALUES (5,'g1',6.0), (6,'g0',50.0)")
    spark.sql(s"DELETE FROM graft.$ns.s0 WHERE id = 1")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'mu', false)")
      .head.getString(2) shouldBe "incremental"
    snapU(s"graft.$ns.mu") shouldBe snapU(s"($uDefn)")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'mu')")
    for (t <- Seq("fact", "dim", "s0", "s1"))
      spark.sql(s"DROP TABLE graft.$ns.$t")
  }

  // The nastiest DISTINCT-under-sets corner: a DISTINCT aggregate
  // whose input IS a grouping key. The pair table's pre-projected
  // value copy keeps the key's set layout intact (the key rolls up
  // normally while the pair keeps its value), so subtotal rows count
  // distinct KEY values incrementally — 1 on detail rows, the real
  // count on rolled-up ones.
  test("DISTINCT over a grouping key under ROLLUP maintains incrementally") {
    val ns = "mvgsdk"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (g STRING, h STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a','x',1.0),('a','y',2.0),('b','x',3.0)")
    val defn = s"SELECT g, h, COUNT(DISTINCT g) AS dg, SUM(DISTINCT v) AS sv, " +
      s"SUM(v) AS total FROM graft.$ns.src GROUP BY ROLLUP(g, h)"
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm', '${defn.replace("'", "''")}')""")
      .head.getString(0) shouldBe "incremental"
    def snap(from: String): Seq[String] =
      spark.sql(s"SELECT g, h, dg, sv, total FROM $from")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    snap(s"graft.$ns.m") shouldBe snap(s"($defn)")
    // a NEW key value moves every rolled-up distinct count; deletes
    // kill key pairs at the subtotal levels
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('c','x',4.0), ('a','x',5.0)")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
      .head.getString(2) shouldBe "incremental"
    snap(s"graft.$ns.m") shouldBe snap(s"($defn)")
    spark.sql(s"DELETE FROM graft.$ns.src WHERE g = 'b'")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
      .head.getString(2) shouldBe "incremental"
    snap(s"graft.$ns.m") shouldBe snap(s"($defn)")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
    spark.sql(s"DROP TABLE graft.$ns.src")
  }

  // Pins the round-13 shape guard: a GROUP BY expression missing from
  // the SELECT is valid SQL but CANNOT be maintained at the stored
  // granularity — it must register in FULL mode (not silently merge
  // distinct source groups) and stay correct across refreshes.
  test("GROUP BY column missing from SELECT registers full and refreshes correctly") {
    val ns = "mvshape"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (g STRING, h STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a','x',1.0),('a','y',2.0),('b','x',3.0)")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm',
         |  'SELECT g, SUM(v) AS total FROM graft.$ns.src GROUP BY g, h')""".stripMargin)
      .head.getString(0) shouldBe "full"
    def read() = spark.sql(s"SELECT g, total FROM graft.$ns.m ORDER BY g, total")
      .collect().map(_.toSeq.mkString("|")).toSeq
    read() shouldBe Seq("a|1.0", "a|2.0", "b|3.0")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a','x',10.0)")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
      .head.getString(2) shouldBe "full"
    read() shouldBe Seq("a|2.0", "a|11.0", "b|3.0")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
    spark.sql(s"DROP TABLE graft.$ns.src")
  }

  // Decimal AVG: exact incremental decomposition at EVERY (p,s) since
  // round 16 — the running sum is exact at the stored sum type
  // (DecimalAddNoOverflowCheck; the plain Column `+` re-rounds at
  // precision 38) and the merge divides with Average's own exact
  // DecimalDivideWithOverflowCheck (quotient rounded once at the avg
  // output scale).
  test("decimal AVG: incremental == recompute, wide decimals included") {
    val ns = "mvdec"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (g STRING, v DECIMAL(10,2))")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a', 1.25), ('a', 2.50)")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm',
         |  'SELECT g, AVG(v) AS av, SUM(v) AS sv FROM graft.$ns.src GROUP BY g')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    spark.sql(s"SELECT av FROM graft.$ns.m").collect().map(_.get(0).toString) shouldBe
      Array("1.875000")
    // repeating-decimal quotients across inserts AND deletes: the
    // merged quotient must equal Spark's own AVG every time
    val rnd = new Random(11)
    for (step <- 0 until 8) {
      if (step % 3 == 2)
        spark.sql(s"DELETE FROM graft.$ns.src WHERE v >= ${1 + rnd.nextInt(80)}.00")
      else {
        val rows = (0 until 3).map(_ =>
          s"('g${rnd.nextInt(3)}', ${rnd.nextInt(97)}.${10 + rnd.nextInt(89)})")
        spark.sql(s"INSERT INTO graft.$ns.src VALUES ${rows.mkString(", ")}")
      }
      val action = spark.sql(
        s"CALL graft.system.refresh_mview('$ns', 'm', false)").head.getString(2)
      Seq("incremental", "empty", "noop") should contain(action)
      withClue(s"step=$step ") {
        spark.sql(s"SELECT g, av, sv FROM graft.$ns.m ORDER BY g")
          .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq shouldBe
          spark.sql(
            s"""SELECT g, AVG(v) AS av, SUM(v) AS sv FROM graft.$ns.src
               |GROUP BY g ORDER BY g""".stripMargin)
            .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
      }
    }
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
    // gate BOUNDARY (p=24, s>2, admitted via the p<=24 arm): the merge
    // path must divide at the stored sum type's precision — the
    // un-cast decimal addition widens precision by one and loses one
    // digit of quotient scale, rounding differently than a recompute
    // (caught live; pinned here with repeating quotients like 1/3)
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.edge")
    spark.sql(s"CREATE TABLE graft.$ns.edge (g STRING, v DECIMAL(24,6))")
    spark.sql(s"INSERT INTO graft.$ns.edge VALUES ('a', 1.000001), ('a', 0.000001)")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'me',
         |  'SELECT g, AVG(v) AS av FROM graft.$ns.edge GROUP BY g')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    val ernd = new Random(17)
    for (step <- 0 until 6) {
      val rows = (0 until (1 + ernd.nextInt(2))).map(_ =>
        s"('g${ernd.nextInt(2)}', ${ernd.nextInt(9)}.${100000 + ernd.nextInt(899999)})")
      spark.sql(s"INSERT INTO graft.$ns.edge VALUES ${rows.mkString(", ")}")
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'me', false)")
      withClue(s"edge step=$step ") {
        spark.sql(s"SELECT g, av FROM graft.$ns.me ORDER BY g")
          .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq shouldBe
          spark.sql(s"SELECT g, AVG(v) AS av FROM graft.$ns.edge GROUP BY g ORDER BY g")
            .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
      }
    }
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'me')")
    spark.sql(s"DROP TABLE graft.$ns.edge")
    // WIDE decimals (p > 24 AND s > 2, the former FULL-fallback class):
    // DECIMAL(30,10) with 19 integer digits and a non-zero 10th frac
    // digit — a single merge that re-rounds the (38,10) running sum at
    // scale 9, or divides at the precision-loss scale instead of the
    // avg output scale, mismatches the recompute immediately. All four
    // decimal kinds (davg / sum / dadistinct / sdistinct) share the
    // churn, deletes included.
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.wide")
    spark.sql(s"CREATE TABLE graft.$ns.wide (g STRING, v DECIMAL(30,10))")
    spark.sql(s"INSERT INTO graft.$ns.wide VALUES ('a', 1.2345678901)")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'mw',
         |  'SELECT g, AVG(v) AS av, SUM(v) AS sv, AVG(DISTINCT v) AS adv,
         |          SUM(DISTINCT v) AS sdv
         |   FROM graft.$ns.wide GROUP BY g')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    val wrnd = new Random(23)
    def wideVal(): String = {
      val intPart = "1" + (0 until 18).map(_ => wrnd.nextInt(10)).mkString
      val fracPart = (0 until 9).map(_ => wrnd.nextInt(10)).mkString +
        (1 + wrnd.nextInt(9))
      s"$intPart.$fracPart"
    }
    for (step <- 0 until 8) {
      if (step % 4 == 3)
        spark.sql(s"DELETE FROM graft.$ns.wide WHERE v >= " +
          s"${3 + wrnd.nextInt(6)}000000000000000000.0")
      else {
        val rows = (0 until (1 + wrnd.nextInt(3))).map(_ =>
          s"('g${wrnd.nextInt(3)}', ${wideVal()})")
        spark.sql(s"INSERT INTO graft.$ns.wide VALUES ${rows.mkString(", ")}")
      }
      val action = spark.sql(
        s"CALL graft.system.refresh_mview('$ns', 'mw', false)").head.getString(2)
      Seq("incremental", "empty", "noop") should contain(action)
      withClue(s"wide step=$step ") {
        spark.sql(s"SELECT g, av, sv, adv, sdv FROM graft.$ns.mw ORDER BY g")
          .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq shouldBe
          spark.sql(
            s"""SELECT g, AVG(v) AS av, SUM(v) AS sv, AVG(DISTINCT v) AS adv,
               |       SUM(DISTINCT v) AS sdv
               |FROM graft.$ns.wide GROUP BY g ORDER BY g""".stripMargin)
            .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
      }
    }
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'mw')")
    spark.sql(s"DROP TABLE graft.$ns.src")
    spark.sql(s"DROP TABLE graft.$ns.wide")
  }

  // ------------------------------------------------------------------
  // COUNT(DISTINCT x): the counting-algorithm dedup-level aux table.
  // Value churn (delete one of several rows sharing an x — distinct
  // unchanged), pair deaths (last carrier deleted), NULL values
  // (ignored by COUNT DISTINCT), NULL group keys, group wipes, mixing
  // with the additive/extreme algebra, the global one-row shape, and a
  // force_full rebuild — MV == inline recompute at every refresh.
  // ------------------------------------------------------------------

  test("COUNT(DISTINCT): incremental via the pair table == inline recompute") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    for (seed <- 0 until seeds) {
      val rnd = new Random(2000 + seed)
      val ns = s"mvd$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
      spark.sql(
        s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, x INT, v DOUBLE, d DECIMAL(12,2))")
      var nextId = 0L
      def insertBurst(): Unit = {
        val rows = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          val g = if (rnd.nextInt(6) == 0) "NULL" else s"'g${rnd.nextInt(3)}'"
          // small x domain → heavy pair sharing → real churn coverage
          val x = if (rnd.nextInt(5) == 0) "CAST(NULL AS INT)"
                  else rnd.nextInt(5).toString
          // decimal domain kept small too: distinct decimal pair churn
          val d = if (rnd.nextInt(6) == 0) "CAST(NULL AS DECIMAL(12,2))"
                  else s"${rnd.nextInt(7)}.25"
          s"($nextId, $g, $x, ${rnd.nextInt(40)}.5, $d)"
        }
        spark.sql(s"INSERT INTO graft.$ns.src VALUES ${rows.mkString(", ")}")
      }
      insertBurst()
      // COUNT+SUM(DISTINCT x) share ONE pair table (same expression);
      // AVG(DISTINCT v) gets its own — sharing and multi-table folds
      // both exercised every step
      val defn =
        s"""SELECT g, COUNT(DISTINCT x) AS dx, SUM(DISTINCT x) AS sx,
           |       AVG(DISTINCT v) AS adv, SUM(DISTINCT d) AS sdd,
           |       AVG(DISTINCT d) AS avd,
           |       MIN(DISTINCT v) AS mnv, COUNT(x) AS nx,
           |       SUM(v) AS total, MAX(v) AS mx, COUNT(*) AS n
           |FROM graft.$ns.src GROUP BY g""".stripMargin
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'm', '${defn.replace("'", "''")}')""")
        .head.getString(0) shouldBe "incremental"
      // dx(0)+sx(1) share x's pair table at the canonical index 0;
      // adv(2) owns v's; decimal sdd(3)+avd(4) share d's; MIN(DISTINCT
      // v) is just MIN and allocates nothing — exactly three aux
      // tables for six DISTINCT spellings
      spark.sql(s"SHOW TABLES IN graft.$ns").collect().map(_.getString(1))
        .filter(_.contains("__dl")).sorted shouldBe
        Array("m__rows__dl0", "m__rows__dl2", "m__rows__dl3")
      def snap(from: String): Seq[String] =
        spark.sql(s"SELECT g, dx, sx, adv, sdd, avd, mnv, nx, total, mx, n FROM $from " +
            "ORDER BY g NULLS FIRST")
          .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
      for (step <- 0 until 8) {
        rnd.nextInt(3) match {
          case 0 => insertBurst()
          case 1 =>
            if (rnd.nextBoolean())
              spark.sql(s"DELETE FROM graft.$ns.src WHERE g = 'g${rnd.nextInt(3)}'")
            else {
              val lo = 1 + rnd.nextInt(math.max(1, nextId.toInt))
              spark.sql(s"DELETE FROM graft.$ns.src WHERE id >= $lo AND id < ${lo + 3}")
            }
          case _ =>
            // churn: retarget one row's x (pair move within a group)
            val id = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(
              s"""MERGE INTO graft.$ns.src t
                 |USING (SELECT CAST($id AS BIGINT) AS id, 'g${rnd.nextInt(3)}' AS g,
                 |              ${rnd.nextInt(5)} AS x, ${rnd.nextInt(40)}.5 AS v,
                 |              CAST(${rnd.nextInt(7)}.25 AS DECIMAL(12,2)) AS d) s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'm', false)").head.getString(2)
        Seq("incremental", "empty", "noop") should contain(action)
        withClue(s"seed=$seed step=$step action=$action ") {
          snap(s"graft.$ns.m") shouldBe snap(s"($defn)")
        }
      }
      // force_full rebuilds the pair table too, and incremental resumes
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', true)")
        .head.getString(2) shouldBe "full"
      insertBurst()
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
      withClue(s"seed=$seed post-full ") {
        snap(s"graft.$ns.m") shouldBe snap(s"($defn)")
      }
      // drop removes the dedup-level aux table with the storage
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
      spark.sql(s"SHOW TABLES IN graft.$ns")
        .collect().map(_.getString(1))
        .exists(_.contains("__dl")) shouldBe false
      spark.sql(s"DROP TABLE graft.$ns.src")
    }
    // global one-row shape: distinct over the whole table, survives a wipe
    val ns = "mvdg"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.t")
    spark.sql(s"CREATE TABLE graft.$ns.t (x STRING)")
    spark.sql(s"INSERT INTO graft.$ns.t VALUES ('a'), ('a'), ('b'), (NULL)")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'mg',
         |  'SELECT COUNT(DISTINCT x) AS dx, COUNT(*) AS n FROM graft.$ns.t')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    def g(): (Long, Long) = {
      val r = spark.sql(s"SELECT dx, n FROM graft.$ns.mg").head
      (r.getLong(0), r.getLong(1))
    }
    g() shouldBe ((2L, 4L))
    spark.sql(s"INSERT INTO graft.$ns.t VALUES ('c'), ('b')")
    spark.sql(s"DELETE FROM graft.$ns.t WHERE x = 'a'")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'mg', false)")
      .head.getString(2) shouldBe "incremental"
    g() shouldBe ((2L, 4L)) // b, c remain distinct; NULL ignored by dx
    spark.sql(s"DELETE FROM graft.$ns.t WHERE true")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'mg', false)")
    g() shouldBe ((0L, 0L))
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'mg')")
    spark.sql(s"DROP TABLE graft.$ns.t")
  }

  test("decimal SUM overflow aborts the merge loudly instead of resurrecting 0") {
    val spark = TestSpark.spark
    val ns = "mvovf"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.t")
    spark.sql(s"CREATE TABLE graft.$ns.t (g STRING, v DECIMAL(38,0))")
    val big = "9" * 38 // ~1e38, two of them overflow DECIMAL(38,0)
    spark.sql(s"INSERT INTO graft.$ns.t VALUES ('a', $big)")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm',
         |  'SELECT g, SUM(v) AS s FROM graft.$ns.t GROUP BY g')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    spark.sql(s"SELECT s FROM graft.$ns.m").head.getDecimal(0)
      .toBigInteger.toString shouldBe big
    // second row overflows the running sum at the merge addition.
    // Under Spark 4's default ANSI mode the addition itself throws —
    // already loud. Under ansi.enabled=false (the legacy mode users
    // still run) the addition yields NULL instead, and WITHOUT the
    // guard the next merge would coalesce the lost sum to 0 and serve
    // a confidently wrong value forever — so exercise that mode and
    // demand the guard's own abort.
    spark.sql(s"INSERT INTO graft.$ns.t VALUES ('a', $big)")
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    val ex =
      try intercept[Exception] {
        spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
      } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    def rootChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    withClue(rootChain(ex).mkString(" | ")) {
      rootChain(ex).exists(_.contains("overflowed DECIMAL(38)")) shouldBe true
    }
    // an untouched group in a later slice still refreshes fine
    spark.sql(s"DELETE FROM graft.$ns.t WHERE v IS NOT NULL")
    spark.sql(s"INSERT INTO graft.$ns.t VALUES ('b', 7)")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', true)") // full rebuild
    spark.sql(s"SELECT g, s FROM graft.$ns.m ORDER BY g")
      .collect().map(r => (r.getString(0), r.getDecimal(1).toBigInteger.intValue)).toSeq shouldBe
      Seq(("b", 7))
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
    spark.sql(s"DROP TABLE graft.$ns.t")
  }
}
