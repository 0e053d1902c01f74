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
    val seeds = sys.env.get("GRAFT_MV_SEEDS").map(_.toInt).getOrElse(6)
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
}
