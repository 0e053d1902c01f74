package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** Rank-per-group (analytic window) materialized views — mode "window",
  * maintained by AFFECTED-GROUP recompute: rank functions are not
  * retraction-decomposable, but a window never crosses partitions, so
  * changelog-touched groups recompute from the source AS OF the head
  * and replace their stored rows wholesale while untouched groups keep
  * theirs. Differential contract: MV read == inline recompute of the
  * defining SQL after EVERY refresh. Order expressions use total
  * orders (tie-broken by id) so the recompute is deterministic.
  */
class MvWindowSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def rows(sql: String): Seq[String] =
    spark.sql(sql).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("top-N per group: incremental == recompute through mutation bursts") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    for (seed <- 0 until seeds) {
      val rnd = new Random(3000 + seed)
      val ns = s"mvw$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
      spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, v DOUBLE)")
      var nextId = 0L
      def insertBurst(): Unit = {
        val burst = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          // occasional NULL group key and tied values
          val g = if (rnd.nextInt(8) == 0) "CAST(NULL AS STRING)"
                  else s"'g${rnd.nextInt(4)}'"
          s"($nextId, $g, ${rnd.nextInt(20)}.0)"
        }
        spark.sql(s"INSERT INTO graft.$ns.src VALUES ${burst.mkString(", ")}")
      }
      insertBurst()
      val defSql =
        s"""SELECT g, id, v, rn FROM (
           |  SELECT g, id, v,
           |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn
           |  FROM graft.$ns.src WHERE v >= 1.0) WHERE rn <= 3""".stripMargin
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'top3',
           |  '${defSql.replace("'", "''")}')""".stripMargin)
        .head.getString(0) shouldBe "window"
      def check(step: String): Unit = withClue(s"seed=$seed $step ") {
        rows(s"SELECT g, id, v, rn FROM graft.$ns.top3") shouldBe
          rows(s"SELECT g, id, v, rn FROM ($defSql)")
      }
      check("create")
      for (step <- 0 until 8) {
        rnd.nextInt(3) match {
          case 0 => insertBurst()
          case 1 =>
            if (rnd.nextBoolean()) // group wipe (stored rows must vanish)
              spark.sql(s"DELETE FROM graft.$ns.src WHERE g = 'g${rnd.nextInt(4)}'")
            else // band delete: often retracts a stored top row
              spark.sql(s"DELETE FROM graft.$ns.src WHERE v >= ${10 + rnd.nextInt(10)}.0")
          case 2 => // keyed upsert: moves a row's value (re-ranks its group)
            val id = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            spark.sql(
              s"""MERGE INTO graft.$ns.src t USING
                 |  (SELECT CAST($id AS BIGINT) id, 'g${rnd.nextInt(4)}' g,
                 |          ${rnd.nextInt(20)}.0 v) s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'top3', false)").head.getString(2)
        Seq("incremental", "empty", "noop") should contain(action)
        check(s"step=$step action=$action")
      }
      // force_full rebuilds the same content
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'top3', true)")
        .head.getString(2) shouldBe "full"
      check("force_full")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'top3')")
      spark.sql(s"DROP TABLE graft.$ns.src")
    }
  }

  test("RANK with ties and a hidden partition key maintain incrementally") {
    val ns = "mvwr"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES (1,'a',5.0),(2,'a',5.0),(3,'a',3.0),(4,'b',9.0)")
    // PARTITION BY upper(g): the partition key is an expression NOT in
    // the projection — stored as a hidden _mv_wp column
    val defSql =
      s"""SELECT id, v, r FROM (
         |  SELECT id, v, RANK() OVER (PARTITION BY upper(g) ORDER BY v DESC, id) AS r
         |  FROM graft.$ns.src) WHERE r <= 2""".stripMargin
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'rk',
         |  '${defSql.replace("'", "''")}')""".stripMargin)
      .head.getString(0) shouldBe "window"
    def check(step: String): Unit = withClue(step) {
      rows(s"SELECT id, v, r FROM graft.$ns.rk") shouldBe
        rows(s"SELECT id, v, r FROM ($defSql)")
    }
    check("create")
    // a tie at rank 1 keeps THREE rows when r <= 2 (1,1,... rank 3 skipped)
    spark.sql(s"INSERT INTO graft.$ns.src VALUES (5,'a',5.0),(6,'b',9.0),(7,'b',7.0)")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'rk', false)")
      .head.getString(2) shouldBe "incremental"
    check("tie insert")
    spark.sql(s"DELETE FROM graft.$ns.src WHERE id IN (1, 4)")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'rk', false)")
      .head.getString(2) shouldBe "incremental"
    check("top-row deletes")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'rk')")
    spark.sql(s"DROP TABLE graft.$ns.src")
  }

  // Round-16 extension: the window mode is function-agnostic —
  // affected-group recompute re-evaluates the group, never decomposes
  // the function — so running aggregates and offsets maintain too.
  test("running SUM/AVG and LAG maintain incrementally in window mode") {
    val ns = "mvws"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES (1,'a',5.0),(2,'a',3.0),(3,'b',2.0)")
    val defSql =
      s"""SELECT g, id, v,
         |  SUM(v) OVER (PARTITION BY g ORDER BY id) AS running,
         |  AVG(v) OVER (PARTITION BY g) AS gmean,
         |  LAG(v, 1) OVER (PARTITION BY g ORDER BY id) AS prev
         |FROM graft.$ns.src WHERE v >= 0.0""".stripMargin
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'run',
         |  '${defSql.replace("'", "''")}')""".stripMargin)
      .head.getString(0) shouldBe "window"
    def check(step: String): Unit = withClue(step) {
      rows(s"SELECT g, id, v, running, gmean, prev FROM graft.$ns.run") shouldBe
        rows(s"SELECT g, id, v, running, gmean, prev FROM ($defSql)")
    }
    check("create")
    val rnd = new Random(77)
    var nextId = 3L
    for (step <- 0 until 6) {
      if (step % 3 == 2)
        spark.sql(s"DELETE FROM graft.$ns.src WHERE v >= ${3 + rnd.nextInt(5)}.0")
      else {
        val burst = (0 until (1 + rnd.nextInt(3))).map { _ =>
          nextId += 1
          s"($nextId, 'g${rnd.nextInt(3)}', ${rnd.nextInt(9)}.0)"
        }
        spark.sql(s"INSERT INTO graft.$ns.src VALUES ${burst.mkString(", ")}")
      }
      val action = spark.sql(
        s"CALL graft.system.refresh_mview('$ns', 'run', false)").head.getString(2)
      Seq("incremental", "empty", "noop") should contain(action)
      check(s"step=$step action=$action")
    }
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'run')")
    spark.sql(s"DROP TABLE graft.$ns.src")
  }

  // Round-17: the window's source may be a fact-preserving JOIN onto
  // bare graft dims (the rank-over-join dashboard shape). Dims pin AS
  // OF like agg mode; touched keys derive from the fact changelog
  // joined to pinned+current dims plus the head fact rows matching a
  // moved dim's slice; touched groups recompute from the joined head.
  test("window MV over a joined fact: incremental through fact bursts and dim moves") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    for (seed <- 0 until seeds; joinType <- Seq("JOIN", "LEFT JOIN")) {
      val rnd = new Random(4700 + seed)
      val ns = s"mvwj${seed}_${if (joinType == "JOIN") "i" else "l"}"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.fact")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.dim")
      spark.sql(s"CREATE TABLE graft.$ns.fact (id BIGINT, dk BIGINT, v DOUBLE)")
      spark.sql(s"CREATE TABLE graft.$ns.dim (dkey BIGINT, region STRING)")
      spark.sql(s"INSERT INTO graft.$ns.dim VALUES " +
        (0 until 5).map(k => s"($k, 'r${k % 3}')").mkString(", "))
      var nextId = 0L
      def insertBurst(): Unit = {
        val burst = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          // dk 0..6: keys 5,6 have NO dim row (LEFT-join NULL group)
          s"($nextId, ${rnd.nextInt(7)}, ${rnd.nextInt(20)}.0)"
        }
        spark.sql(s"INSERT INTO graft.$ns.fact VALUES ${burst.mkString(", ")}")
      }
      insertBurst()
      // partition key lives on the DIM; order on the fact
      val defSql =
        s"""SELECT region, id, v, rn FROM (
           |  SELECT region, id, v,
           |    ROW_NUMBER() OVER (PARTITION BY region ORDER BY v DESC, id) AS rn
           |  FROM graft.$ns.fact $joinType graft.$ns.dim ON dk = dkey
           |  WHERE v >= 1.0) WHERE rn <= 3""".stripMargin
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'top3',
           |  '${defSql.replace("'", "''")}')""".stripMargin)
        .head.getString(0) shouldBe "window"
      def check(step: String): Unit = withClue(s"seed=$seed $joinType $step ") {
        rows(s"SELECT region, id, v, rn FROM graft.$ns.top3") shouldBe
          rows(s"SELECT region, id, v, rn FROM ($defSql)")
      }
      check("create")
      for (step <- 0 until 10) {
        rnd.nextInt(5) match {
          case 0 => insertBurst()
          case 1 =>
            spark.sql(s"DELETE FROM graft.$ns.fact WHERE v >= ${10 + rnd.nextInt(10)}.0")
          case 2 => // dim UPDATE: moves fact rows between regions
            val k = rnd.nextInt(5)
            spark.sql(s"UPDATE graft.$ns.dim SET region = 'r${rnd.nextInt(3)}' " +
              s"WHERE dkey = $k")
          case 3 => // dim row appears: LEFT-join facts gain a first match
            val k = 5 + rnd.nextInt(2)
            spark.sql(s"DELETE FROM graft.$ns.dim WHERE dkey = $k")
            if (rnd.nextBoolean())
              spark.sql(s"INSERT INTO graft.$ns.dim VALUES ($k, 'r${rnd.nextInt(3)}')")
          case 4 => // both move before one refresh
            insertBurst()
            spark.sql(s"UPDATE graft.$ns.dim SET region = 'r${rnd.nextInt(3)}' " +
              s"WHERE dkey = ${rnd.nextInt(5)}")
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'top3', false)").head.getString(2)
        Seq("incremental", "empty", "noop") should contain(action)
        check(s"step=$step action=$action")
      }
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'top3', true)")
        .head.getString(2) shouldBe "full"
      check("force_full")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'top3')")
      spark.sql(s"DROP TABLE graft.$ns.fact")
      spark.sql(s"DROP TABLE graft.$ns.dim")
    }
  }

  // Round 18 (r17 verdict #5): FULL OUTER under a window MV. Both
  // sides' NULL extensions participate in groups — dim-side extensions
  // own their dim-derived key (or the NULL group when the key is
  // fact-side), and the touched-key derivation adds dedicated extension
  // terms, so refresh stays incremental through both-side churn.
  test("window MV over a FULL OUTER join: incremental through both-side churn") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    for (seed <- 0 until seeds; keySide <- Seq("dim", "fact")) {
      val rnd = new Random(8100 + seed)
      val ns = s"mvwf${seed}_$keySide"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.fact")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.dim")
      spark.sql(s"CREATE TABLE graft.$ns.fact (id BIGINT, dk BIGINT, g STRING, v DOUBLE)")
      spark.sql(s"CREATE TABLE graft.$ns.dim (dkey BIGINT, region STRING)")
      // dkeys 0..4 matched-ish; 7,8 start as dim-side NULL extensions
      spark.sql(s"INSERT INTO graft.$ns.dim VALUES " +
        ((0 until 5).map(k => s"($k, 'r${k % 3}')") ++
          Seq("(7, 'x7')", "(8, 'x8')")).mkString(", "))
      var nextId = 0L
      def insertBurst(): Unit = {
        val burst = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          // dk 0..6: keys 5,6 have NO dim row (fact-side extensions)
          s"($nextId, ${rnd.nextInt(7)}, 'g${rnd.nextInt(3)}', ${rnd.nextInt(20)}.0)"
        }
        spark.sql(s"INSERT INTO graft.$ns.fact VALUES ${burst.mkString(", ")}")
      }
      insertBurst()
      val key = if (keySide == "dim") "region" else "g"
      // total order: extension rows carry NULLs on one side, so the
      // order must break ties through BOTH sides' key columns
      val defSql =
        s"""SELECT $key, id, dkey, v, rn FROM (
           |  SELECT $key, id, dkey, v,
           |    ROW_NUMBER() OVER (PARTITION BY $key
           |      ORDER BY v DESC, id, dkey) AS rn
           |  FROM graft.$ns.fact FULL JOIN graft.$ns.dim ON dk = dkey
           |) WHERE rn <= 3""".stripMargin
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'ftop',
           |  '${defSql.replace("'", "''")}')""".stripMargin)
        .head.getString(0) shouldBe "window"
      def check(step: String): Unit = withClue(s"seed=$seed key=$keySide $step ") {
        rows(s"SELECT $key, id, dkey, v, rn FROM graft.$ns.ftop") shouldBe
          rows(s"SELECT $key, id, dkey, v, rn FROM ($defSql)")
      }
      check("create")
      for (step <- 0 until 12) {
        rnd.nextInt(6) match {
          case 0 => insertBurst()
          case 1 => // fact rows vanish: partners may re-extend with NULLs
            spark.sql(s"DELETE FROM graft.$ns.fact WHERE v >= ${10 + rnd.nextInt(10)}.0")
          case 2 => // dim relabel: moves rows (and extensions) between groups
            spark.sql(s"UPDATE graft.$ns.dim SET region = 'r${rnd.nextInt(3)}' " +
              s"WHERE dkey = ${rnd.nextInt(5)}")
          case 3 => // dim row appears/disappears at an UNMATCHED key:
            // a pure dim-side extension is born or dies
            val k = 7 + rnd.nextInt(2)
            spark.sql(s"DELETE FROM graft.$ns.dim WHERE dkey = $k")
            if (rnd.nextBoolean())
              spark.sql(s"INSERT INTO graft.$ns.dim VALUES ($k, 'x$k')")
          case 4 => // dim row appears at a FACT-extension key: those fact
            // rows flip from the NULL-dim state to matched
            val k = 5 + rnd.nextInt(2)
            spark.sql(s"DELETE FROM graft.$ns.dim WHERE dkey = $k")
            if (rnd.nextBoolean())
              spark.sql(s"INSERT INTO graft.$ns.dim VALUES ($k, 'r${rnd.nextInt(3)}')")
          case 5 => // both sides move before one refresh
            insertBurst()
            spark.sql(s"UPDATE graft.$ns.dim SET region = 'r${rnd.nextInt(3)}' " +
              s"WHERE dkey = ${rnd.nextInt(5)}")
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'ftop', false)").head.getString(2)
        Seq("incremental", "empty", "noop") should contain(action)
        check(s"step=$step action=$action")
      }
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'ftop', true)")
        .head.getString(2) shouldBe "full"
      check("force_full")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'ftop')")
      spark.sql(s"DROP TABLE graft.$ns.fact")
      spark.sql(s"DROP TABLE graft.$ns.dim")
    }
  }

  test("FULL + suffix dims under a window: incremental through three-side churn") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    // two suffix shapes: an INNER suffix joined on a FACT column (pure
    // extensions drop at the suffix join, exactly as the defining query
    // drops them), and a LEFT suffix joined on the FULL DIM's column
    // with the PARTITION KEY on the suffix dim — extension rows carry
    // real suffix matches, and a suffix move re-keys extension-origin
    // paths (the anti-probed extension chain term)
    for (seed <- 0 until seeds; variant <- Seq("factjoin", "dimjoin")) {
      val rnd = new Random(9100 + seed)
      val ns = s"mvwfs${seed}_$variant"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.fact")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.d1")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.d2")
      spark.sql(s"CREATE TABLE graft.$ns.fact (id BIGINT, dk BIGINT, ck BIGINT, v DOUBLE)")
      spark.sql(s"CREATE TABLE graft.$ns.d1 (dkey BIGINT, region STRING)")
      // dkeys 0..4 matched-ish; 7,8 start as dim-side NULL extensions
      spark.sql(s"INSERT INTO graft.$ns.d1 VALUES " +
        ((0 until 5).map(k => s"($k, 'r${k % 3}')") ++
          Seq("(7, 'r0')", "(8, 'r1')")).mkString(", "))
      val (suffixJoin, part) = variant match {
        case "factjoin" =>
          spark.sql(s"CREATE TABLE graft.$ns.d2 (ckey BIGINT, cls STRING)")
          // ck 0..5 on facts; ckey 5 missing: those fact rows drop at
          // the inner suffix, like the defining query
          spark.sql(s"INSERT INTO graft.$ns.d2 VALUES " +
            (0 until 5).map(k => s"($k, 'c${k % 2}')").mkString(", "))
          (s"JOIN graft.$ns.d2 ON ck = ckey", "region")
        case _ =>
          spark.sql(s"CREATE TABLE graft.$ns.d2 (rname STRING, cls STRING)")
          spark.sql(s"INSERT INTO graft.$ns.d2 VALUES " +
            "('r0', 'c0'), ('r1', 'c1'), ('r2', 'c0')")
          (s"LEFT JOIN graft.$ns.d2 ON region = rname", "cls")
      }
      var nextId = 0L
      def insertBurst(): Unit = {
        val burst = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          // dk 0..6: keys 5,6 have NO d1 row (fact-side extensions)
          s"($nextId, ${rnd.nextInt(7)}, ${rnd.nextInt(6)}, ${rnd.nextInt(20)}.0)"
        }
        spark.sql(s"INSERT INTO graft.$ns.fact VALUES ${burst.mkString(", ")}")
      }
      insertBurst()
      val defSql =
        s"""SELECT $part, id, dkey, v, rn FROM (
           |  SELECT $part, id, dkey, v,
           |    ROW_NUMBER() OVER (PARTITION BY $part
           |      ORDER BY v DESC, id, dkey) AS rn
           |  FROM graft.$ns.fact FULL JOIN graft.$ns.d1 ON dk = dkey
           |    $suffixJoin
           |) WHERE rn <= 3""".stripMargin
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'fsuf',
           |  '${defSql.replace("'", "''")}')""".stripMargin)
        .head.getString(0) shouldBe "window"
      def check(step: String): Unit = withClue(s"seed=$seed $variant $step ") {
        rows(s"SELECT $part, id, dkey, v, rn FROM graft.$ns.fsuf") shouldBe
          rows(s"SELECT $part, id, dkey, v, rn FROM ($defSql)")
      }
      check("create")
      for (step <- 0 until 12) {
        rnd.nextInt(7) match {
          case 0 => insertBurst()
          case 1 => // fact rows vanish: FULL partners may re-extend
            spark.sql(s"DELETE FROM graft.$ns.fact WHERE v >= ${10 + rnd.nextInt(10)}.0")
          case 2 => // FULL dim relabel: re-keys matched AND ext paths
            spark.sql(s"UPDATE graft.$ns.d1 SET region = 'r${rnd.nextInt(3)}' " +
              s"WHERE dkey = ${rnd.nextInt(5)}")
          case 3 => // pure dim-side extension born or dies
            val k = 7 + rnd.nextInt(2)
            spark.sql(s"DELETE FROM graft.$ns.d1 WHERE dkey = $k")
            if (rnd.nextBoolean())
              spark.sql(s"INSERT INTO graft.$ns.d1 VALUES ($k, 'r${rnd.nextInt(3)}')")
          case 4 => // dim row at a FACT-extension key: flips to matched
            val k = 5 + rnd.nextInt(2)
            spark.sql(s"DELETE FROM graft.$ns.d1 WHERE dkey = $k")
            if (rnd.nextBoolean())
              spark.sql(s"INSERT INTO graft.$ns.d1 VALUES ($k, 'r${rnd.nextInt(3)}')")
          case 5 => // SUFFIX dim moves — in the dimjoin variant this
            // re-keys whole partitions including extension-origin paths
            variant match {
              case "factjoin" =>
                spark.sql(s"UPDATE graft.$ns.d2 SET cls = 'c${rnd.nextInt(2)}' " +
                  s"WHERE ckey = ${rnd.nextInt(5)}")
              case _ =>
                spark.sql(s"UPDATE graft.$ns.d2 SET cls = 'c${rnd.nextInt(3)}' " +
                  s"WHERE rname = 'r${rnd.nextInt(3)}'")
            }
          case 6 => // all three sides move before one refresh
            insertBurst()
            spark.sql(s"UPDATE graft.$ns.d1 SET region = 'r${rnd.nextInt(3)}' " +
              s"WHERE dkey = ${rnd.nextInt(5)}")
            variant match {
              case "factjoin" =>
                val k = rnd.nextInt(5)
                spark.sql(s"DELETE FROM graft.$ns.d2 WHERE ckey = $k")
                if (rnd.nextBoolean())
                  spark.sql(s"INSERT INTO graft.$ns.d2 VALUES ($k, 'c${rnd.nextInt(2)}')")
              case _ =>
                spark.sql(s"UPDATE graft.$ns.d2 SET cls = 'c${rnd.nextInt(3)}' " +
                  s"WHERE rname = 'r${rnd.nextInt(3)}'")
            }
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'fsuf', false)").head.getString(2)
        withClue(s"seed=$seed $variant step=$step ") {
          Seq("incremental", "empty", "noop") should contain(action)
        }
        check(s"step=$step action=$action")
      }
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'fsuf', true)")
        .head.getString(2) shouldBe "full"
      check("force_full")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'fsuf')")
      spark.sql(s"DROP TABLE graft.$ns.fact")
      spark.sql(s"DROP TABLE graft.$ns.d1")
      spark.sql(s"DROP TABLE graft.$ns.d2")
    }
  }

  test("second FULL and non-first FULL under a window refuse by name") {
    val ns = "mvwfref"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.fact")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.d1")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.d2")
    spark.sql(s"CREATE TABLE graft.$ns.fact (id BIGINT, dk BIGINT, ck BIGINT, v DOUBLE)")
    spark.sql(s"CREATE TABLE graft.$ns.d1 (dkey BIGINT, region STRING)")
    spark.sql(s"CREATE TABLE graft.$ns.d2 (ckey BIGINT, cls STRING)")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (1, 0, 0, 5.0)")
    spark.sql(s"INSERT INTO graft.$ns.d1 VALUES (0, 'r0')")
    spark.sql(s"INSERT INTO graft.$ns.d2 VALUES (0, 'c0')")
    def tryCreate(joins: String): Exception = {
      val defSql =
        s"""SELECT region, id, rn FROM (
           |  SELECT region, id,
           |    ROW_NUMBER() OVER (PARTITION BY region ORDER BY v DESC, id, dkey) AS rn
           |  FROM graft.$ns.fact $joins
           |) WHERE rn <= 2""".stripMargin
      intercept[Exception](spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'bad',
           |  '${defSql.replace("'", "''")}')""".stripMargin))
    }
    // FULL not first: the extension terms would need the whole join
    // prefix at both telescope endpoints
    tryCreate(s"JOIN graft.$ns.d2 ON ck = ckey " +
      s"FULL JOIN graft.$ns.d1 ON dk = dkey")
      .getMessage should include("not incrementally maintainable")
    // a second FULL has no single dim side to anchor the derivation
    tryCreate(s"FULL JOIN graft.$ns.d1 ON dk = dkey " +
      s"FULL JOIN graft.$ns.d2 ON ck = ckey")
      .getMessage should include("not incrementally maintainable")
    spark.sql(s"DROP TABLE graft.$ns.fact")
    spark.sql(s"DROP TABLE graft.$ns.d1")
    spark.sql(s"DROP TABLE graft.$ns.d2")
  }

  test("window MV over a sharded UNION ALL: per-leg pins, projections, MoR retractions") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    for (seed <- 0 until seeds) {
      val rnd = new Random(3400 + seed)
      val ns = s"mvwu$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.s0")
      spark.sql(s"CREATE TABLE graft.$ns.s0 (id BIGINT, g STRING, v DOUBLE)")
      // the legacy shard: renamed columns, halved measure, MoR deletes
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.s1")
      spark.sql(s"CREATE TABLE graft.$ns.s1 (id BIGINT, cat STRING, vh DOUBLE)" +
        " TBLPROPERTIES ('graft.delete.mode' = 'mor')")
      var nextId = 0L
      def insertBurst(leg: Int): Unit = {
        val burst = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          val g = if (rnd.nextInt(8) == 0) "CAST(NULL AS STRING)"
                  else s"'g${rnd.nextInt(4)}'"
          val v = rnd.nextInt(20)
          if (leg == 1) s"($nextId, $g, ${v / 2.0})" else s"($nextId, $g, $v.0)"
        }
        spark.sql(s"INSERT INTO graft.$ns.s$leg VALUES ${burst.mkString(", ")}")
      }
      insertBurst(0); insertBurst(1)
      val defSql =
        s"""SELECT g, id, v, rn FROM (
           |  SELECT g, id, v,
           |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn
           |  FROM (SELECT id, g, v FROM graft.$ns.s0 WHERE id % 9 != 0
           |        UNION ALL
           |        SELECT id, cat AS g, vh * 2.0 AS v FROM graft.$ns.s1)
           |  WHERE v >= 1.0) WHERE rn <= 3""".stripMargin
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'top3',
           |  '${defSql.replace("'", "''")}'  )""".stripMargin)
        .head.getString(0) shouldBe "window"
      def check(step: String): Unit = withClue(s"seed=$seed $step ") {
        rows(s"SELECT g, id, v, rn FROM graft.$ns.top3") shouldBe
          rows(s"SELECT g, id, v, rn FROM ($defSql)")
      }
      check("create")
      for (step <- 0 until 8) {
        rnd.nextInt(3) match {
          case 0 => insertBurst(rnd.nextInt(2))
          case 1 =>
            if (rnd.nextBoolean()) // group wipe across BOTH shards
              { val g = s"g${rnd.nextInt(4)}"
                spark.sql(s"DELETE FROM graft.$ns.s0 WHERE g = '$g'")
                spark.sql(s"DELETE FROM graft.$ns.s1 WHERE cat = '$g'") }
            else { // band delete in the shard's OWN units — often
                   // retracts a stored top row through the projection
              val bar = 10 + rnd.nextInt(10)
              if (rnd.nextBoolean())
                spark.sql(s"DELETE FROM graft.$ns.s0 WHERE v >= $bar.0")
              else
                spark.sql(s"DELETE FROM graft.$ns.s1 WHERE vh >= ${bar / 2.0}")
            }
          case 2 => // leg-1-only burst: the other leg's pin must hold
            insertBurst(1)
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'top3', false)").head.getString(2)
        withClue(s"seed=$seed step=$step ") {
          Seq("incremental", "empty", "noop") should contain(action)
        }
        check(s"step=$step action=$action")
      }
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'top3', true)")
        .head.getString(2) shouldBe "full"
      check("force_full")
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'top3')")
      spark.sql(s"DROP TABLE graft.$ns.s0")
      spark.sql(s"DROP TABLE graft.$ns.s1")
    }
  }

  test("window MV over union legs JOINED to a moving dim: the full composition") {
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(2)
    // the complete dashboard shape: two shards (one projected) UNION'd,
    // joined to a dim that CARRIES the partition key — fact bursts on
    // either shard, MoR retractions, and dim re-categorizations all
    // bound the touched groups; refresh must never fall back to full
    for (seed <- 0 until seeds) {
      val rnd = new Random(3600 + seed)
      val ns = s"mvwud$seed"
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.s0")
      spark.sql(s"CREATE TABLE graft.$ns.s0 (id BIGINT, g STRING, v DOUBLE)")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.s1")
      spark.sql(s"CREATE TABLE graft.$ns.s1 (id BIGINT, cat STRING, vh DOUBLE)" +
        " TBLPROPERTIES ('graft.delete.mode' = 'mor')")
      spark.sql(s"DROP TABLE IF EXISTS graft.$ns.dim")
      spark.sql(s"CREATE TABLE graft.$ns.dim (dk STRING, dg STRING)")
      spark.sql(s"INSERT INTO graft.$ns.dim VALUES " +
        (0 until 4).map(i => s"('g$i', 'cat${i % 2}')").mkString(", "))
      var nextId = 0L
      def insertBurst(leg: Int): Unit = {
        val burst = (0 until (1 + rnd.nextInt(6))).map { _ =>
          nextId += 1
          val g = s"'g${rnd.nextInt(4)}'"
          val v = rnd.nextInt(20)
          if (leg == 1) s"($nextId, $g, ${v / 2.0})" else s"($nextId, $g, $v.0)"
        }
        spark.sql(s"INSERT INTO graft.$ns.s$leg VALUES ${burst.mkString(", ")}")
      }
      insertBurst(0); insertBurst(1)
      val defSql =
        s"""SELECT dg, id, v, rn FROM (
           |  SELECT dg, id, v,
           |    ROW_NUMBER() OVER (PARTITION BY dg ORDER BY v DESC, id) AS rn
           |  FROM (SELECT id, g, v FROM graft.$ns.s0
           |        UNION ALL
           |        SELECT id, cat AS g, vh * 2.0 AS v FROM graft.$ns.s1)
           |    JOIN graft.$ns.dim ON g = dk
           |  WHERE v >= 1.0) WHERE rn <= 3""".stripMargin
      spark.sql(
        s"""CALL graft.system.create_mview('$ns', 'top3',
           |  '${defSql.replace("'", "''")}')""".stripMargin)
        .head.getString(0) shouldBe "window"
      def check(step: String): Unit = withClue(s"seed=$seed $step ") {
        rows(s"SELECT dg, id, v, rn FROM graft.$ns.top3") shouldBe
          rows(s"SELECT dg, id, v, rn FROM ($defSql)")
      }
      check("create")
      for (step <- 0 until 7) {
        rnd.nextInt(4) match {
          case 0 => insertBurst(rnd.nextInt(2))
          case 1 =>
            val bar = 8 + rnd.nextInt(10)
            if (rnd.nextBoolean())
              spark.sql(s"DELETE FROM graft.$ns.s0 WHERE v >= $bar.0")
            else
              spark.sql(s"DELETE FROM graft.$ns.s1 WHERE vh >= ${bar / 2.0}")
          case 2 => // the dim re-categorizes a key: rows change groups
            val k = rnd.nextInt(4)
            spark.sql(s"DELETE FROM graft.$ns.dim WHERE dk = 'g$k'")
            spark.sql(
              s"INSERT INTO graft.$ns.dim VALUES ('g$k', 'cat${rnd.nextInt(3)}')")
          case _ => insertBurst(1)
        }
        val action = spark.sql(
          s"CALL graft.system.refresh_mview('$ns', 'top3', false)").head.getString(2)
        withClue(s"seed=$seed step=$step ") {
          Seq("incremental", "empty", "noop") should contain(action)
        }
        check(s"step=$step action=$action")
      }
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'top3')")
      for (t <- Seq("s0", "s1", "dim")) spark.sql(s"DROP TABLE graft.$ns.$t")
    }
  }

  test("unpartitioned windows fall back to FULL") {
    val ns = "mvwf"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (id BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES (1,'a',5.0)")
    // no PARTITION BY → whole-table recompute on any change = FULL
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'gr',
         |  'SELECT id, ROW_NUMBER() OVER (ORDER BY v DESC) AS rn
         |   FROM graft.$ns.src')""".stripMargin)
      .head.getString(0) shouldBe "full"
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'gr')")
    spark.sql(s"DROP TABLE graft.$ns.src")
  }
}
