package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** Randomized differential check for SQL views: for generated query
  * bodies over a graft table, reading the CREATE VIEW of the body must
  * return exactly the rows of executing the body inline — across
  * projections, filters, aggregations, column aliases, and one level of
  * view nesting (the nested body references the first view by its BARE
  * name, exercising stored-context re-qualification). Same workflow as
  * the MERGE/evolution/CDC fuzzes; widen one-off sweeps with
  * GRAFT_VIEW_SEEDS.
  */
class ViewRandomSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private val cols = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  private def randomBody(rnd: Random, from: String): String = {
    val projected = rnd.shuffle(cols).take(1 + rnd.nextInt(cols.size))
    val filter = rnd.nextInt(3) match {
      case 0 => ""
      case 1 => s" WHERE l_orderkey % ${2 + rnd.nextInt(5)} = 0"
      case _ => s" WHERE l_quantity > ${rnd.nextInt(40)}"
    }
    if (rnd.nextBoolean()) {
      val key = projected.head
      s"SELECT $key, COUNT(*) AS n, SUM(l_quantity) AS q FROM $from$filter GROUP BY $key"
    } else
      s"SELECT ${projected.mkString(", ")} FROM $from$filter"
  }

  private def rows(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("random view bodies: view read == inline execution, nested too") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vr")
    spark.sql(
      """CREATE TABLE IF NOT EXISTS graft.vr.li
        |(l_orderkey BIGINT, l_linenumber INT, l_quantity DOUBLE, l_returnflag STRING)""".stripMargin)
    if (spark.sql("SELECT COUNT(*) FROM graft.vr.li").head.getLong(0) == 0L) {
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .selectExpr("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .write.insertInto("graft.vr.li")
    }
    val seeds = sys.env.get("GRAFT_VIEW_SEEDS").map(_.toInt).getOrElse(12)
    for (seed <- 0 until seeds) {
      val rnd = new Random(seed)
      val body = randomBody(rnd, "graft.vr.li")
      spark.sql("DROP VIEW IF EXISTS graft.vr.v_a")
      spark.sql("DROP VIEW IF EXISTS graft.vr.v_b")
      spark.sql(s"CREATE VIEW graft.vr.v_a AS $body")
      withClue(s"seed=$seed body=[$body] ") {
        rows("SELECT * FROM graft.vr.v_a") shouldBe rows(body)
      }
      // nested: a second view over the first by BARE name under USE —
      // the stored context must re-qualify it on every later read
      val outer = {
        val c = spark.table("graft.vr.v_a").columns.head
        s"SELECT `$c` FROM v_a WHERE `$c` IS NOT NULL"
      }
      spark.sql("USE graft.vr")
      try spark.sql(s"CREATE VIEW v_b AS $outer")
      finally spark.sql("USE spark_catalog.default")
      withClue(s"seed=$seed outer=[$outer] ") {
        rows("SELECT * FROM graft.vr.v_b") shouldBe
          rows(outer.replace(" FROM v_a", " FROM graft.vr.v_a"))
      }
    }
    spark.sql("DROP VIEW IF EXISTS graft.vr.v_a")
    spark.sql("DROP VIEW IF EXISTS graft.vr.v_b")
  }
}
