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

  test("rollup containment: coarser aggregates answer from MV storage") {
    val ns = "mvrw5"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"CREATE TABLE graft.$ns.fact (k BIGINT, g STRING, b BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES " +
      "(1,'a',0,5.0),(2,'a',1,9.0),(3,'a',1,2.0),(4,'b',0,7.0)," +
      "(5,'b',1,1.0),(6,'b',2,8.0),(7,'c',0,4.0)")
    // MV at (g, b) grain stores SUM/COUNT(*)/COUNT(v)/MIN/MAX
    val defQ = s"SELECT g, b, SUM(v) AS sv, COUNT(*) AS n, COUNT(v) AS nv, " +
      s"MIN(v) AS mn, MAX(v) AS mx FROM graft.$ns.fact WHERE v > 1.5 GROUP BY g, b"
    spark.sql(s"CALL graft.system.create_mview('$ns', 'fine', '${defQ.replace("'", "''")}')")
      .head.getString(0) shouldBe "incremental"
    // the coarser family over the SAME body
    val coarse = s"SELECT g, SUM(v) AS sv, COUNT(*) AS n, MIN(v) AS mn, " +
      s"MAX(v) AS mx, AVG(v) AS av FROM graft.$ns.fact WHERE v > 1.5 GROUP BY g"
    val filtered = s"SELECT g, SUM(v) AS sv FROM graft.$ns.fact " +
      s"WHERE v > 1.5 AND g >= 'b' GROUP BY g"
    val global = s"SELECT COUNT(*) AS n, SUM(v) AS sv, AVG(v) AS av " +
      s"FROM graft.$ns.fact WHERE v > 1.5"
    val keyFn = s"SELECT upper(g) AS ug, SUM(v) AS sv FROM graft.$ns.fact " +
      s"WHERE v > 1.5 GROUP BY upper(g)"
    val distinctQ = s"SELECT g, COUNT(DISTINCT b) AS db FROM graft.$ns.fact " +
      s"WHERE v > 1.5 GROUP BY g"
    val baseline = Seq(coarse, filtered, global, keyFn, distinctQ).map(rows)
    withRewrite {
      for (q <- Seq(coarse, filtered, global, keyFn)) {
        usesStorage(q, "fine__rows") shouldBe true
        // the rewritten plan RE-AGGREGATES over the storage read
        import org.apache.spark.sql.catalyst.plans.logical.Aggregate
        spark.sql(q).queryExecution.analyzed.collectFirst {
          case a: Aggregate if a.collectLeaves().exists(
            _.toString.contains("fine__rows")) => a
        } should not be empty
      }
      // COUNT(DISTINCT) is not re-aggregable from per-group values —
      // must fall through to the base tables (the negative pin)
      usesStorage(distinctQ, "fine__rows") shouldBe false
      Seq(coarse, filtered, global, keyFn, distinctQ).map(rows) shouldBe baseline
      // staleness gates the rollup path exactly like the exact path
      spark.sql(s"INSERT INTO graft.$ns.fact VALUES (8,'c',1,6.0)")
      usesStorage(coarse, "fine__rows") shouldBe false
      spark.sql(s"CALL graft.system.refresh_mview('$ns', 'fine', false)")
      usesStorage(coarse, "fine__rows") shouldBe true
      rows(coarse) shouldBe {
        spark.conf.unset("graft.mview.rewrite")
        try rows(coarse)
        finally spark.conf.set("graft.mview.rewrite", "true")
      }
    }
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'fine')")
    spark.sql(s"DROP TABLE graft.$ns.fact")
  }

  test("ORDER BY definitions: ordering is preserved, never dropped") {
    val ns = "mvrw6"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"CREATE TABLE graft.$ns.fact (k BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES " +
      "(1,'a',5.0),(2,'b',9.0),(3,'c',2.0),(4,'d',7.0),(5,'e',1.0)")
    // a definition WITH ORDER BY registers (full mode); the root Sort
    // is stripped for matching, so the user's own Sort/Limit stays on
    // top of the substituted read (round-19 fix: previously the Sort
    // subtree itself could match and lose the ordering guarantee)
    val defQ = s"SELECT g, SUM(v) AS sv FROM graft.$ns.fact GROUP BY g ORDER BY sv DESC"
    spark.sql(s"CALL graft.system.create_mview('$ns', 'ord', '${defQ.replace("'", "''")}')")
    val topQ = defQ + " LIMIT 2"
    val unordered = s"SELECT g, SUM(v) AS sv FROM graft.$ns.fact GROUP BY g"
    val topBase = spark.sql(topQ).collect().map(_.toSeq.mkString("|")).toSeq
    val ordBase = spark.sql(defQ).collect().map(_.toSeq.mkString("|")).toSeq
    withRewrite {
      usesStorage(topQ, "ord__rows") shouldBe true
      usesStorage(defQ, "ord__rows") shouldBe true
      usesStorage(unordered, "ord__rows") shouldBe true
      // top-n MEMBERSHIP AND ORDER both survive the substitution
      spark.sql(topQ).collect().map(_.toSeq.mkString("|")).toSeq shouldBe topBase
      spark.sql(defQ).collect().map(_.toSeq.mkString("|")).toSeq shouldBe ordBase
      rows(unordered) shouldBe ordBase.sorted
    }
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'ord')")
    spark.sql(s"DROP TABLE graft.$ns.fact")
  }

  test("explain_rewrite names the verdict per candidate") {
    val ns = "mvrw7"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"CREATE TABLE graft.$ns.fact (k BIGINT, g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (1,'a',5.0),(2,'b',9.0)")
    val defQ = s"SELECT g, SUM(v) AS sv, COUNT(v) AS nv FROM graft.$ns.fact GROUP BY g"
    spark.sql(s"CALL graft.system.create_mview('$ns', 'ex', '${defQ.replace("'", "''")}')")
    def verdictOf(q: String): (String, String) =
      spark.sql(s"CALL graft.system.explain_rewrite('${q.replace("'", "''")}')")
        .collect().collectFirst {
          case r if r.getString(0) == s"graft.$ns.ex" =>
            (r.getString(1), r.getString(2))
        }.get
    // fresh + exact: substituted
    val (v1, d1) = verdictOf(defQ)
    v1 shouldBe "substituted"
    d1 should include("ex__rows")
    // fresh + rollup: substituted
    verdictOf(s"SELECT SUM(v) AS sv FROM graft.$ns.fact")._1 shouldBe "substituted"
    // non-re-aggregable: shape_mismatch with the SPECIFIC refusal
    val (v2, d2) = verdictOf(
      s"SELECT g, COUNT(DISTINCT v) AS dv FROM graft.$ns.fact GROUP BY g")
    v2 shouldBe "shape_mismatch"
    d2 should include("DISTINCT")
    // unrelated query: shape_mismatch, generic detail
    verdictOf(s"SELECT k FROM graft.$ns.fact WHERE k > 1")._1 shouldBe "shape_mismatch"
    // stale: names the moved source with pinned vs current version
    spark.sql(s"INSERT INTO graft.$ns.fact VALUES (3,'c',1.0)")
    val (v3, d3) = verdictOf(defQ)
    v3 shouldBe "stale"
    d3 should include(s"$ns/fact")
    d3 should include("pinned")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'ex')")
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
