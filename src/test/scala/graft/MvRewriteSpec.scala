package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Transparent MV-based query rewrite (round 18, opt-in via
  * `graft.mview.rewrite=true`): an ad-hoc query whose analyzed plan
  * subtree exactly matches a registered FRESH MV's defining shape is
  * answered from the MV's storage; stale MVs are never substituted.
  */
class MvRewriteSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def usesStorage(sql: String, marker: String): Boolean =
    spark.sql(sql).queryExecution.analyzed.toString.contains(marker)

  private def rows(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      .toSeq.sorted

  private def withRewrite[T](f: => T): T = {
    val prev = spark.conf.getOption("graft.mview.rewrite")
    spark.conf.set("graft.mview.rewrite", "true")
    try f
    finally prev match {
      case Some(v) => spark.conf.set("graft.mview.rewrite", v)
      case None => spark.conf.unset("graft.mview.rewrite")
    }
  }

  test("fresh MV substitutes; stale blocks; refresh re-enables; results equal") {
    val ns = "mvrw1"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"CREATE TABLE graft.$ns.fact (k BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES " +
      "(1,'a',5.0),(2,'a',9.0),(3,'b',2.0),(4,'b',7.0),(5,'c',1.0)")
    val q = s"SELECT g, SUM(v) AS sv, COUNT(*) AS n FROM graft.$ns.fact " +
      "WHERE v > 1.5 GROUP BY g"
    spark.sql(s"CALL graft.system.create_mview('$ns', 'agg', '${q.replace("'", "''")}')")
      .head.getString(0) shouldBe "incremental"
    val base = rows(q)
    withRewrite {
      usesStorage(q, "agg__rows") shouldBe true
      rows(q) shouldBe base
      // an ORDER BY / projection ON TOP of the matched subtree keeps
      // working (subtree substitution, not whole-plan)
      usesStorage(s"SELECT sv FROM ($q) WHERE n > 1 ORDER BY sv", "agg__rows") shouldBe true
      // a DIFFERENT shape (extra group key) must not match
      usesStorage(s"SELECT g, SUM(v) AS sv FROM graft.$ns.fact GROUP BY g",
        "agg__rows") shouldBe false
      // stale: unapplied source changes block substitution
      spark.sql(s"INSERT INTO graft.$ns.fact VALUES (6,'a',3.0)")
      usesStorage(q, "agg__rows") shouldBe false
      rows(q) should not be base // and the base-table answer moved
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'agg', false)")
      usesStorage(q, "agg__rows") shouldBe true
      rows(q) shouldBe spark.sql(s"SELECT g, sv, n FROM graft.$ns.agg")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    }
    // flag off: never substituted even when fresh
    usesStorage(q, "agg__rows") shouldBe false
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'agg')")
    spark.sql(s"DROP TABLE graft.$ns.fact")
  }

  test("dim-join MV: a moved dimension is stale until refresh") {
    val ns = "mvrw2"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"CREATE TABLE graft.$ns.fact (k BIGINT, dk BIGINT, v DOUBLE)")
    spark.sql(s"CREATE TABLE graft.$ns.dim (dkey BIGINT, region STRING)")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (1,0,5.0),(2,1,9.0),(3,0,2.0)")
    spark.sql(s"INSERT INTO graft.$ns.dim VALUES (0,'r0'),(1,'r1')")
    val q = s"SELECT region, SUM(v) AS sv FROM graft.$ns.fact " +
      s"JOIN graft.$ns.dim ON dk = dkey GROUP BY region"
    spark.sql(s"CALL graft.system.create_mview('$ns', 'byreg', '${q.replace("'", "''")}')")
      .head.getString(0) shouldBe "incremental"
    withRewrite {
      usesStorage(q, "byreg__rows") shouldBe true
      // a DIM move (not just the fact) must also block substitution
      spark.sql(s"UPDATE graft.$ns.dim SET region = 'r0x' WHERE dkey = 0")
      usesStorage(q, "byreg__rows") shouldBe false
      rows(q) // still answers correctly from base tables
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'byreg', false)")
      usesStorage(q, "byreg__rows") shouldBe true
      rows(q) shouldBe Seq("r0x|7.0", "r1|9.0")
    }
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'byreg')")
    spark.sql(s"DROP TABLE graft.$ns.fact")
    spark.sql(s"DROP TABLE graft.$ns.dim")
  }

  test("window MV shapes rewrite too") {
    val ns = "mvrw3"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"CREATE TABLE graft.$ns.fact (k BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES " +
      "(1,'a',5.0),(2,'a',9.0),(3,'a',1.0),(4,'b',7.0),(5,'b',3.0)")
    val q =
      s"""SELECT g, k, v, rn FROM (
         |  SELECT g, k, v, ROW_NUMBER() OVER (PARTITION BY g
         |    ORDER BY v DESC, k) AS rn FROM graft.$ns.fact
         |) WHERE rn <= 2""".stripMargin
    spark.sql(s"CALL graft.system.create_mview('$ns', 'top2', '${q.replace("'", "''")}')")
      .head.getString(0) shouldBe "window"
    val base = rows(q)
    withRewrite {
      usesStorage(q, "top2__rows") shouldBe true
      rows(q) shouldBe base
    }
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'top2')")
    spark.sql(s"DROP TABLE graft.$ns.fact")
  }

  test("create_mview with the rewrite flag ON still registers over base tables") {
    val ns = "mvrw4"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"CREATE TABLE graft.$ns.fact (k BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (1,'a',5.0),(2,'b',9.0)")
    val q = s"SELECT g, SUM(v) AS sv FROM graft.$ns.fact GROUP BY g"
    spark.sql(s"CALL graft.system.create_mview('$ns', 'one', '${q.replace("'", "''")}')")
      .head.getString(0) shouldBe "incremental"
    withRewrite {
      // without the re-entrancy guard, `two`'s shape analysis would see
      // `one`'s substituted storage and silently register an MV-over-MV
      spark.sql(s"CALL graft.system.create_mview('$ns', 'two', '${q.replace("'", "''")}')")
        .head.getString(0) shouldBe "incremental"
      import graft.table.{GraftCatalog, TableIdent}
      val cat = GraftCatalog(spark, spark.conf.get("spark.sql.catalog.graft.warehouse"))
      val props = cat.load(TableIdent(ns, "two__rows")).currentOrFail().properties
      props("graft.mview.source") shouldBe s"$ns/fact"
    }
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'two')")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'one')")
    spark.sql(s"DROP TABLE graft.$ns.fact")
  }
}
