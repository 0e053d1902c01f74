package graft

import java.nio.file.Files

import scala.util.Random

import graft.table.{GraftCatalog, MergeClause, TableIdent}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Randomized differential test of the general MERGE: every iteration
  * draws a target table, a source, and a random clause set, runs
  * [[graft.table.GraftTable.mergeRows]], and compares the table's end
  * state against an independent in-memory reference evaluator of the
  * SQL-standard semantics (first-match-wins clause order, three-valued
  * conditions, null-filled unassigned insert columns). The
  * merge-on-read strategy is checked against the SAME reference — the
  * two execution paths must be observationally identical.
  */
object MergeRandomSpec {
  // top-level so Spark can derive encoders (inner classes cannot)
  case class T(id: Long, v: Option[String], n: Long)
  case class S(k: Long, x: Long)
}

class MergeRandomSpec extends AnyFunSuite with Matchers {
  import MergeRandomSpec.{T, S}
  private lazy val spark = TestSpark.spark

  // clause conditions: SQL over the prefixed merge frame + the exact
  // same predicate in Scala (null v => condition unknown => false)
  private sealed trait Cond {
    def sql: String
    def m(t: T, s: S): Boolean  // matched context
    def t(t: T): Boolean        // target-only context (NMBS)
    def s(s: S): Boolean        // source-only context (insert)
  }
  private case class TnLt(k: Long) extends Cond {
    def sql = s"_t_n < $k"
    def m(t: T, s: S) = t.n < k; def t(t: T) = t.n < k; def s(s: S) = true
  }
  private case class TvEq(w: String) extends Cond {
    def sql = s"_t_v = '$w'"
    def m(t: T, s: S) = t.v.contains(w); def t(t: T) = t.v.contains(w); def s(s: S) = true
  }
  private case object SxEven extends Cond {
    def sql = "_s_1 % 2 = 0"
    def m(t: T, s: S) = s.x % 2 == 0; def t(t: T) = true; def s(s: S) = s.x % 2 == 0
  }
  private case class SxGt(k: Long) extends Cond {
    def sql = s"_s_1 > $k"
    def m(t: T, s: S) = s.x > k; def t(t: T) = true; def s(s: S) = s.x > k
  }

  private def runOne(seed: Int, mor: Boolean): Unit = {
    val rnd = new Random(seed)
    val nT = 5 + rnd.nextInt(20)
    val target = (0 until nT).map { i =>
      T(rnd.nextInt(15).toLong,
        if (rnd.nextInt(5) == 0) None else Some(Seq("x", "y", "z")(rnd.nextInt(3))),
        rnd.nextInt(100).toLong)
    }
    // distinct source keys (the cardinality contract); some match, some don't
    val srcKeys = rnd.shuffle((0L until 30L).toList).take(3 + rnd.nextInt(10))
    val source = srcKeys.map(k => S(k, rnd.nextInt(200).toLong))

    // SQL scoping: NOT MATCHED conditions see only the source, NOT
    // MATCHED BY SOURCE conditions only the target, MATCHED both
    def someCond(forTarget: Boolean, forSource: Boolean): Option[Cond] =
      rnd.nextInt(4) match {
        case 0 => None
        case 1 => if (forTarget) Some(TnLt(rnd.nextInt(100).toLong))
                  else Some(SxGt(rnd.nextInt(200).toLong))
        case 2 => if (forTarget) Some(TvEq(Seq("x", "y")(rnd.nextInt(2))))
                  else Some(SxGt(rnd.nextInt(200).toLong))
        case _ => if (forSource) Some(SxEven) else Some(TnLt(rnd.nextInt(120).toLong))
      }

    // matched clauses: 0..2 of update/delete with optional conditions
    val matched = (0 until rnd.nextInt(3)).map { _ =>
      val cond = someCond(forTarget = true, forSource = true)
      if (rnd.nextBoolean()) {
        // partial update: n and/or v
        val assigns = Seq.newBuilder[(String, String)]
        val updN = rnd.nextBoolean()
        if (updN) assigns += ("n" -> "_s_1 + _t_n")
        if (!updN || rnd.nextBoolean()) assigns += ("v" -> "concat(coalesce(_t_v, '_'), '!')")
        MergeClause("update", cond.map(_.sql), assigns.result())
      } else MergeClause("delete", cond.map(_.sql), Nil)
    }
    // 0..1 conditional insert with a partial column list
    val notMatched = (0 until rnd.nextInt(2)).map { _ =>
      val cond = someCond(forTarget = false, forSource = true)
      val assigns = Seq(("id", "_s_0")) ++
        (if (rnd.nextBoolean()) Seq(("n", "_s_1")) else Nil)
      MergeClause("insert", cond.map(_.sql), assigns)
    }
    // 0..1 NMBS clause (target-only conditions); skipped in MoR mode
    val nmbs =
      if (mor) Nil
      else (0 until rnd.nextInt(2)).map { _ =>
        val cond = someCond(forTarget = true, forSource = false)
        if (rnd.nextBoolean())
          MergeClause("update", cond.map(_.sql), Seq(("n", "_t_n + 1000")))
        else MergeClause("delete", cond.map(_.sql), Nil)
      }

    // ---- independent reference evaluation --------------------------
    def applyUpdate(t: T, s: Option[S], c: MergeClause): T =
      c.assigns.foldLeft(t) {
        case (acc, ("n", "_s_1 + _t_n")) => acc.copy(n = s.get.x + t.n)
        case (acc, ("n", "_t_n + 1000")) => acc.copy(n = t.n + 1000)
        case (acc, ("n", "_s_1"))        => acc.copy(n = s.get.x)
        case (acc, ("v", _))             => acc.copy(v = Some(t.v.getOrElse("_") + "!"))
        case (acc, _)                    => acc
      }
    val bySrc = source.map(s => s.k -> s).toMap
    val keptRef = target.flatMap { t =>
      bySrc.get(t.id) match {
        case Some(s) =>
          matched.find(c => c.condition.isEmpty ||
            condOf(c).forall(_.m(t, s))) match {
            case Some(c) if c.kind == "delete" => None
            case Some(c) => Some(applyUpdate(t, Some(s), c))
            case None => Some(t)
          }
        case None =>
          nmbs.find(c => c.condition.isEmpty || condOf(c).forall(_.t(t))) match {
            case Some(c) if c.kind == "delete" => None
            case Some(c) => Some(applyUpdate(t, None, c))
            case None => Some(t)
          }
      }
    }
    val targetIds = target.map(_.id).toSet
    val insRef = source.filterNot(s => targetIds.contains(s.k)).flatMap { s =>
      notMatched.find(c => c.condition.isEmpty || condOf(c).forall(_.s(s))).map { c =>
        val n = if (c.assigns.exists(_._1 == "n")) Some(s.x) else None
        (Option(s.k), None: Option[String], n)
      }
    }
    val expected = (keptRef.map(t => (Option(t.id), t.v, Option(t.n))) ++ insRef)
      .sortBy(r => (r._1, r._3, r._2))

    // ---- engine ----------------------------------------------------
    val s0 = spark
    import s0.implicits._
    val cat = GraftCatalog(spark, Files.createTempDirectory("merge-rand").toString)
    val tbl = cat.ensure(TableIdent("mr", s"t$seed${if (mor) "m" else ""}"))
    tbl.append(target.toDF("id", "v", "n"))
    if (mor) tbl.updateProperties(Map(
      graft.table.GraftTable.DeleteModeProp -> "mor"))
    val filesBefore = tbl.currentOrFail().files.map(_.path).toSet
    val src = source.map(s => (s.k, s.x)).toDF("_s_0", "_s_1")
    tbl.mergeRows(src, "_t_id = _s_0", matched, notMatched, nmbs,
      pruneKeys = Seq(("id", "_s_0")), equiCondition = true)
    if (mor && matched.nonEmpty)
      withClue(s"seed $seed: MoR merge rewrote files ") {
        filesBefore.subsetOf(tbl.currentOrFail().files.map(_.path).toSet) shouldBe true
      }
    val got = tbl.scan().select("id", "v", "n").collect().map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
       Option(r.getString(1)),
       if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSeq.sortBy(r => (r._1, r._3, r._2))
    withClue(s"seed=$seed mor=$mor matched=$matched notMatched=$notMatched nmbs=$nmbs ") {
      got shouldBe expected
    }
  }

  private def condOf(c: MergeClause): Option[Cond] = c.condition.map {
    case s if s.startsWith("_t_n < ") => TnLt(s.stripPrefix("_t_n < ").toLong)
    case s if s.startsWith("_t_v = ") => TvEq(s.stripPrefix("_t_v = '").stripSuffix("'"))
    case "_s_1 % 2 = 0" => SxEven
    case s if s.startsWith("_s_1 > ") => SxGt(s.stripPrefix("_s_1 > ").toLong)
  }

  // default seed counts in CI; widen one-off sweeps with
  // GRAFT_MERGE_SEEDS (the pre-round workflow: 150+, commit any
  // bug-finding seed into the default range — seed 118 earned its spot)
  private val extra = sys.env.get("GRAFT_MERGE_SEEDS").map(_.toInt).getOrElse(0)

  test("randomized general MERGE matches the reference evaluator (copy-on-write)") {
    (1 to (12 + extra)).foreach(seed => runOne(seed, mor = false))
  }

  test("randomized general MERGE matches the reference evaluator (merge-on-read)") {
    (101 to (120 + extra)).foreach(seed => runOne(seed, mor = true))
  }
}
