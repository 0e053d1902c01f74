package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Regression pins for the materialized-view marker guards (round 13):
  * every regular view DDL verb aimed at an MV's public view must fail
  * loudly instead of desyncing the view/storage pair, and no
  * user-facing surface may plant the reserved `graft.mview` marker on
  * an ordinary view (which would brick its regular DDL).
  */
class MvGuardSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def mkMv(ns: String): Unit = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a', 1.0), ('b', 2.0)")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm',
         |  'SELECT g, SUM(v) AS t FROM graft.$ns.src GROUP BY g')""".stripMargin)
  }

  test("regular DDL on an MV-backing view fails loudly") {
    val ns = "mvguard"
    mkMv(ns)
    def deniedBy(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      withClue(s"sql=$sql got=$e ") {
        msg should include("materialized view")
      }
    }
    deniedBy(s"DROP VIEW graft.$ns.m")
    deniedBy(s"ALTER VIEW graft.$ns.m RENAME TO graft.$ns.m2")
    deniedBy(s"ALTER VIEW graft.$ns.m AS SELECT 1 AS x")
    deniedBy(s"ALTER VIEW graft.$ns.m SET TBLPROPERTIES ('a'='b')")
    deniedBy(s"ALTER VIEW graft.$ns.m UNSET TBLPROPERTIES ('a')")
    deniedBy(s"CREATE OR REPLACE VIEW graft.$ns.m AS SELECT 1 AS x")
    // the MV still reads and refreshes after every denial
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a', 10.0)")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
    spark.sql(s"SELECT t FROM graft.$ns.m WHERE g = 'a'")
      .head.getDouble(0) shouldBe 11.0
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
    spark.sql(s"DROP TABLE graft.$ns.src")
  }

  // Round-14 review pins: force_full must rebuild even at an
  // up-to-date marker (it is the documented remedy for corrupted
  // storage rows, which need no new source commit to exist), and the
  // _mv_ bookkeeping namespace must be unclaimable by user output.
  test("force_full rebuilds at an up-to-date marker; _mv_ outputs are rejected") {
    val ns = "mvguard3"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a', 1.0), ('b', 2.0)")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm',
         |  'SELECT g, SUM(v) AS t FROM graft.$ns.src GROUP BY g')""".stripMargin)
    // marker at head: a plain refresh no-ops, a FORCED one rebuilds
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
      .head.getString(2) shouldBe "noop"
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', true)")
      .head.getString(2) shouldBe "full"
    spark.sql(s"SELECT t FROM graft.$ns.m WHERE g = 'a'").head.getDouble(0) shouldBe 1.0
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
    // a user output named into the bookkeeping namespace errors loudly
    // instead of silently vanishing from the public view
    val e = intercept[Exception](spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm2',
         |  'SELECT g, SUM(v) AS _mv_total FROM graft.$ns.src GROUP BY g')""".stripMargin))
    e.getMessage should include("_mv_")
    // a source column colliding with changelog metadata names falls to
    // FULL mode (refresh would corrupt the signed delta otherwise)
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src2")
    spark.sql(s"CREATE TABLE graft.$ns.src2 (g STRING, _sign DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src2 VALUES ('a', 1.0)")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm3',
         |  'SELECT g, SUM(_sign) AS t FROM graft.$ns.src2 GROUP BY g')""".stripMargin)
      .head.getString(0) shouldBe "full"
    spark.sql(s"INSERT INTO graft.$ns.src2 VALUES ('a', 5.0)")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm3', false)")
    spark.sql(s"SELECT t FROM graft.$ns.m3").head.getDouble(0) shouldBe 6.0
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm3')")
    spark.sql(s"DROP TABLE graft.$ns.src")
    spark.sql(s"DROP TABLE graft.$ns.src2")
  }

  // Round-15 verdict carry: ALTER TABLE RENAME/DROP COLUMN on a SOURCE
  // table must consult dependent MVs' pinned SQL — a rename the MV
  // references would otherwise break the next refresh with a raw
  // analysis error. Referenced columns refuse by name with the remedy;
  // unreferenced columns evolve freely and the MV keeps refreshing.
  test("source column rename/drop is refused while a dependent MV references it") {
    val ns = "mvguard4"
    mkMv(ns)
    def refusedBy(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      withClue(s"sql=$sql got=$e ") {
        msg should include("materialized view")
        msg should include(s"$ns.m")
        msg should include("drop_mview")
      }
    }
    refusedBy(s"ALTER TABLE graft.$ns.src RENAME COLUMN v TO v2")
    refusedBy(s"ALTER TABLE graft.$ns.src DROP COLUMN v")
    refusedBy(s"ALTER TABLE graft.$ns.src RENAME COLUMN g TO gg")
    // an UNREFERENCED column evolves freely, and the MV still refreshes
    spark.sql(s"ALTER TABLE graft.$ns.src ADD COLUMN extra INT")
    spark.sql(s"ALTER TABLE graft.$ns.src RENAME COLUMN extra TO extra2")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a', 10.0, 7)")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm', false)")
      .head.getString(2) shouldBe "incremental"
    spark.sql(s"SELECT t FROM graft.$ns.m WHERE g = 'a'")
      .head.getDouble(0) shouldBe 11.0
    spark.sql(s"ALTER TABLE graft.$ns.src DROP COLUMN extra2")
    // once the MV is gone the referenced column evolves too
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm')")
    spark.sql(s"ALTER TABLE graft.$ns.src RENAME COLUMN v TO v2")
    spark.sql(s"SELECT SUM(v2) FROM graft.$ns.src").head.getDouble(0) shouldBe 13.0
    spark.sql(s"DROP TABLE graft.$ns.src")
  }

  test("a joined MV guards its dimension's referenced columns too") {
    val ns = "mvguard5"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.f")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.d")
    spark.sql(s"CREATE TABLE graft.$ns.f (k INT, v DOUBLE)")
    spark.sql(s"CREATE TABLE graft.$ns.d (dk INT, grp STRING, note STRING)")
    spark.sql(s"INSERT INTO graft.$ns.f VALUES (1, 2.0), (2, 3.0)")
    spark.sql(s"INSERT INTO graft.$ns.d VALUES (1, 'x', 'n1'), (2, 'y', 'n2')")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'jm',
         |  'SELECT d.grp, SUM(f.v) AS t FROM graft.$ns.f f
         |   JOIN graft.$ns.d d ON f.k = d.dk GROUP BY d.grp')""".stripMargin)
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE graft.$ns.d RENAME COLUMN grp TO grp2"))
    (Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse(
        "")) should include(s"$ns.jm")
    // a dim column the MV never reads stays evolvable
    spark.sql(s"ALTER TABLE graft.$ns.d RENAME COLUMN note TO note2")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'jm')")
    spark.sql(s"DROP TABLE graft.$ns.f")
    spark.sql(s"DROP TABLE graft.$ns.d")
  }

  // Round-17: a column referenced ONLY inside a union leg's per-leg
  // SELECT/WHERE is still pinned by the stored CREATE SQL — renaming it
  // would break the leg's projection replay at the next refresh, so the
  // DDL refuses by name; a leg column the MV never reads stays free.
  test("a union leg's projected columns get the column guard too") {
    val ns = "mvguard7"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.a")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.b")
    spark.sql(s"CREATE TABLE graft.$ns.a (g STRING, v DOUBLE)")
    spark.sql(s"CREATE TABLE graft.$ns.b (cat STRING, v_half DOUBLE, note STRING)")
    spark.sql(s"INSERT INTO graft.$ns.a VALUES ('x', 2.0)")
    spark.sql(s"INSERT INTO graft.$ns.b VALUES ('y', 1.5, 'n')")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'um',
         |  'SELECT g, SUM(v) AS t FROM (
         |     SELECT g, v FROM graft.$ns.a UNION ALL
         |     SELECT cat AS g, v_half * 2.0 AS v FROM graft.$ns.b)
         |   GROUP BY g')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE graft.$ns.b RENAME COLUMN v_half TO vh"))
    (Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse(
        "")) should include(s"$ns.um")
    // a leg column the MV never reads stays evolvable, and the leg's
    // projection keeps replaying incrementally afterwards
    spark.sql(s"ALTER TABLE graft.$ns.b RENAME COLUMN note TO note2")
    spark.sql(s"INSERT INTO graft.$ns.b VALUES ('x', 4.0, 'n2')")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'um', false)")
      .head.getString(2) shouldBe "incremental"
    spark.sql(s"SELECT t FROM graft.$ns.um WHERE g = 'x'")
      .head.getDouble(0) shouldBe 10.0
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'um')")
    spark.sql(s"DROP TABLE graft.$ns.a")
    spark.sql(s"DROP TABLE graft.$ns.b")
  }

  // Round-16: the rel-level guards — renaming a pinned SOURCE (or an
  // MV's own storage table) and dropping a level-1 MV under a
  // dependent level-2 MV all refuse by name instead of stranding pins.
  test("table rename and MV-cascade drops are refused while depended upon") {
    val ns = "mvguard6"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a', 1.0)")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm1',
         |  'SELECT g, SUM(v) AS t FROM graft.$ns.src GROUP BY g')""".stripMargin)
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm2',
         |  'SELECT SUM(t) AS total, COUNT(*) AS n FROM graft.$ns.m1')""".stripMargin)
    def msgOf(e: Exception): String =
      Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    // renaming the base source: m1 pins it
    val e1 = intercept[Exception](
      spark.sql(s"ALTER TABLE graft.$ns.src RENAME TO $ns.src2"))
    msgOf(e1) should include(s"$ns.m1")
    // renaming m1's storage: it is MV-managed (m2 also pins it as a rel)
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE graft.$ns.m1__rows RENAME TO $ns.x"))
    msgOf(e2) should (include(s"$ns.m1") or include(s"$ns.m2"))
    // dropping m1 while m2 reads its storage
    val e3 = intercept[Exception](
      spark.sql(s"CALL graft.system.drop_mview('$ns', 'm1')"))
    msgOf(e3) should include(s"$ns.m2")
    // both MVs still refresh after every refusal
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a', 4.0)")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm1', false)")
      .head.getString(2) shouldBe "incremental"
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm2', false)")
      .head.getString(2) shouldBe "incremental"
    spark.sql(s"SELECT total FROM graft.$ns.m2").head.getDouble(0) shouldBe 5.0
    // the working order: m2, then m1, then the rename goes through
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm2')")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm1')")
    spark.sql(s"ALTER TABLE graft.$ns.src RENAME TO $ns.src2")
    spark.sql(s"DROP TABLE graft.$ns.src2")
  }

  // Round-17: the column guards hold for WINDOW-mode MVs (bare and
  // joined) and for a level-2 MV reading a level-1 storage table —
  // and MV storage column DDL is refused outright as managed state.
  test("window and nested MV sources get the same column guards") {
    val ns = "mvguard7"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    for (t <- Seq("src", "d", "base")) spark.sql(s"DROP TABLE IF EXISTS graft.$ns.$t")
    spark.sql(s"CREATE TABLE graft.$ns.src (g STRING, v DOUBLE, note STRING)")
    spark.sql(s"CREATE TABLE graft.$ns.d (dk STRING, region STRING, memo STRING)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a', 1.0, 'x'), ('b', 2.0, 'y')")
    spark.sql(s"INSERT INTO graft.$ns.d VALUES ('a', 'r1', 'm1'), ('b', 'r2', 'm2')")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'w',
         |  'SELECT region, v, rn FROM (
         |     SELECT region, v,
         |       ROW_NUMBER() OVER (PARTITION BY region ORDER BY v DESC) AS rn
         |     FROM graft.$ns.src JOIN graft.$ns.d ON g = dk) WHERE rn <= 2')""".stripMargin)
      .head.getString(0) shouldBe "window"
    def refusedBy(sql: String, mv: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      withClue(s"sql=$sql got=$e ") { msg should include(mv) }
    }
    // fact column under a window MV
    refusedBy(s"ALTER TABLE graft.$ns.src RENAME COLUMN v TO v2", s"$ns.w")
    // dim column under a window MV (DimsProp sweep)
    refusedBy(s"ALTER TABLE graft.$ns.d RENAME COLUMN region TO region2", s"$ns.w")
    refusedBy(s"ALTER TABLE graft.$ns.d DROP COLUMN region", s"$ns.w")
    // unreferenced columns evolve freely and the window MV keeps
    // refreshing incrementally
    spark.sql(s"ALTER TABLE graft.$ns.src RENAME COLUMN note TO note2")
    spark.sql(s"ALTER TABLE graft.$ns.d RENAME COLUMN memo TO memo2")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a', 9.0, 'z')")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'w', false)")
      .head.getString(2) shouldBe "incremental"

    // level-2 MV over level-1: renaming a level-1 STORAGE column is
    // refused as managed storage (never silently desynced)
    spark.sql(s"CREATE TABLE graft.$ns.base (flag STRING, q DOUBLE, pad STRING)")
    spark.sql(s"INSERT INTO graft.$ns.base VALUES ('f', 1.0, 'p')")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm1',
         |  'SELECT flag, SUM(q) AS sq FROM graft.$ns.base GROUP BY flag')""".stripMargin)
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'm2',
         |  'SELECT SUM(sq) AS total FROM graft.$ns.m1')""".stripMargin)
    refusedBy(s"ALTER TABLE graft.$ns.m1__rows RENAME COLUMN sq TO sq2",
      "storage of materialized view")
    // a base column referenced by level-1 refuses naming level-1
    refusedBy(s"ALTER TABLE graft.$ns.base RENAME COLUMN q TO q2", s"$ns.m1")
    // an unreferenced base column evolves and the CASCADE keeps
    // refreshing incrementally
    spark.sql(s"ALTER TABLE graft.$ns.base RENAME COLUMN pad TO pad2")
    spark.sql(s"INSERT INTO graft.$ns.base VALUES ('f', 2.0, 'p2')")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm1', false)")
      .head.getString(2) shouldBe "incremental"
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'm2', false)")
      .head.getString(2) shouldBe "incremental"
    spark.sql(s"SELECT total FROM graft.$ns.m2").head.getDouble(0) shouldBe 3.0

    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm2')")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'm1')")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'w')")
    for (t <- Seq("src", "d", "base")) spark.sql(s"DROP TABLE graft.$ns.$t")
  }

  // round 17: the window-over-aggregate cascade's hidden inner agg MV
  // (<name>__a) pins the BASE columns — the same rename/drop guards
  // apply through it, and the pair keeps refreshing after an
  // unreferenced column evolves
  test("a window-over-aggregate cascade guards its base columns through the hidden level") {
    val ns = "mvguard8"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.base")
    spark.sql(s"CREATE TABLE graft.$ns.base (g STRING, sub STRING, v DOUBLE, pad STRING)")
    spark.sql(s"INSERT INTO graft.$ns.base VALUES " +
      "('a','x',1.0,'p'),('a','y',5.0,'p'),('b','x',2.0,'p')")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'woa',
         |  'SELECT g, sub, sv, rn FROM (
         |     SELECT g, sub, sv, ROW_NUMBER() OVER (PARTITION BY g
         |       ORDER BY sv DESC, sub) AS rn
         |     FROM (SELECT g, sub, SUM(v) AS sv FROM graft.$ns.base
         |           GROUP BY g, sub)) WHERE rn <= 2')""".stripMargin)
      .head.getString(0) shouldBe "window"
    def refusedBy(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      withClue(s"sql=$sql got=$e ") { msg should include(needle) }
    }
    // a base column the hidden aggregate level reads refuses BY NAME
    refusedBy(s"ALTER TABLE graft.$ns.base RENAME COLUMN v TO v2", s"$ns.woa__a")
    refusedBy(s"ALTER TABLE graft.$ns.base DROP COLUMN v", s"$ns.woa__a")
    // the hidden level's storage is managed state
    refusedBy(s"ALTER TABLE graft.$ns.woa__a__rows RENAME COLUMN sv TO sv2",
      "storage of materialized view")
    // an unreferenced base column evolves freely and ONE refresh call
    // still cascades both levels incrementally
    spark.sql(s"ALTER TABLE graft.$ns.base RENAME COLUMN pad TO pad2")
    spark.sql(s"INSERT INTO graft.$ns.base VALUES ('b','y',9.0,'q')")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'woa', false)")
      .head.getString(2) shouldBe "incremental"
    spark.sql(s"SELECT sub FROM graft.$ns.woa WHERE g = 'b' AND rn = 1")
      .head.getString(0) shouldBe "y"
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'woa')")
    spark.sql(s"DROP TABLE graft.$ns.base")
  }

  test("the reserved marker cannot be planted on an ordinary view") {
    val ns = "mvguard2"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.t")
    spark.sql(s"CREATE TABLE graft.$ns.t (x INT)")
    // CREATE VIEW ... TBLPROPERTIES may not smuggle the marker (or its
    // namespace) — a hand-marked view would be refused by all regular
    // DDL and removable only by drop_mview
    val e1 = intercept[Exception](spark.sql(
      s"""CREATE VIEW graft.$ns.v TBLPROPERTIES ('graft.mview'='true')
         |AS SELECT x FROM graft.$ns.t""".stripMargin))
    e1.getMessage should include("reserved")
    val e2 = intercept[Exception](spark.sql(
      s"""CREATE VIEW graft.$ns.v TBLPROPERTIES ('graft.mview.custom'='1')
         |AS SELECT x FROM graft.$ns.t""".stripMargin))
    e2.getMessage should include("reserved")
    // ALTER on a legitimate plain view can't plant it either
    spark.sql(s"CREATE VIEW graft.$ns.v AS SELECT x FROM graft.$ns.t")
    val e3 = intercept[Exception](spark.sql(
      s"ALTER VIEW graft.$ns.v SET TBLPROPERTIES ('graft.mview'='true')"))
    e3.getMessage should include("reserved")
    // ordinary properties still work, and the view stays fully DDL-able
    spark.sql(s"ALTER VIEW graft.$ns.v SET TBLPROPERTIES ('note'='ok')")
    spark.sql(s"DROP VIEW graft.$ns.v")
    spark.sql(s"DROP TABLE graft.$ns.t")
  }

  // Round 18 (r17 verdict #4): expire_snapshots must not strand a
  // dependent MV's changelog marker — previously that surfaced only at
  // the next refresh as changelogGone, forcing a full recompute.
  test("expire_snapshots refuses when it would strand a dependent MV marker") {
    import graft.table.{GraftCatalog, TableIdent}
    val ns = "mvexpire"
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"DROP TABLE IF EXISTS graft.$ns.src")
    spark.sql(s"CREATE TABLE graft.$ns.src (g STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a', 1.0), ('b', 2.0)")
    spark.sql(
      s"""CALL graft.system.create_mview('$ns', 'mexp',
         |  'SELECT g, SUM(v) AS t FROM graft.$ns.src GROUP BY g')""".stripMargin)
      .head.getString(0) shouldBe "incremental"
    // the marker sits at version 1; pile on commits the MV hasn't applied
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('a', 3.0)")
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('b', 4.0)")
    val cat = GraftCatalog(spark, spark.conf.get("spark.sql.catalog.graft.warehouse"))
    val src = cat.load(TableIdent(ns, "src"))
    // expiring down to the newest snapshot would drop versions >= marker
    val before = src.snapshots().size
    val e = intercept[IllegalArgumentException](src.expireSnapshots(keepLast = 1))
    e.getMessage should include(s"$ns.mexp")
    e.getMessage should include("refresh_mview")
    src.snapshots().size shouldBe before // nothing was expired
    // refresh advances the marker to head; the same expire now proceeds
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'mexp', false)")
      .head.getString(2) shouldBe "incremental"
    src.expireSnapshots(keepLast = 1) should be > 0
    // and the MV still refreshes incrementally afterwards
    spark.sql(s"INSERT INTO graft.$ns.src VALUES ('c', 5.0)")
    spark.sql(s"CALL graft.system.refresh_mview('$ns', 'mexp', false)")
      .head.getString(2) shouldBe "incremental"
    spark.sql(s"SELECT g, t FROM graft.$ns.mexp ORDER BY g").collect()
      .map(_.toSeq.mkString("|")).toSeq shouldBe Seq("a|4.0", "b|6.0", "c|5.0")
    spark.sql(s"CALL graft.system.drop_mview('$ns', 'mexp')")
    spark.sql(s"DROP TABLE graft.$ns.src")
  }
}
