package graft

import java.nio.file.Files

import scala.util.Random

import graft.table.{GraftCatalog, Projection, TableIdent}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Randomized differential test of name evolution: every iteration
  * drives a random op sequence — appends, renames, drops, adds,
  * copy-on-write AND merge-on-read deletes (predicate + equality
  * groups, interleaved with the renames that remap their stored
  * references), delete maintenance (compact_deletes /
  * rewrite_deletes), compactions — against both the table and an
  * in-memory reference that tracks surviving rows BY FIELD ID. After
  * every mutation the full scan must equal the reference projected
  * onto the current schema (values surface under whatever name their
  * field carries NOW; fields added after a row's write read null; a
  * re-added name never resurrects dead values). Rejected evolutions
  * (blocked name reuse, last-column drop) must leave the table
  * unchanged.
  */
class EvolutionRandomSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private val namePool = Vector("a", "b", "c", "d", "e", "f", "g", "h")

  private def runOne(seed: Int): (Int, Int) = { // (renamesApplied, dropsApplied)
    val rnd = new Random(seed)
    val cat = GraftCatalog(spark, Files.createTempDirectory("evo-rand").toString)
    val tbl = cat.ensure(TableIdent("evo", s"t$seed"))

    // reference: surviving rows as fieldId -> value (null allowed)
    var expected = Vector.empty[Map[Long, Any]]
    var renames = 0
    var drops = 0

    def fields: Seq[StructField] = tbl.currentOrFail().schema.fields.toSeq
    def idOf(f: StructField): Long = Projection.fieldId(f).get

    def appendRows(): Unit = {
      val fs = fields
      val k = 2 + rnd.nextInt(5)
      val rows = (0 until k).map { _ =>
        fs.map { f =>
          if (rnd.nextInt(6) == 0) null
          else f.dataType match {
            case LongType    => rnd.nextInt(100).toLong
            case IntegerType => rnd.nextInt(100)
            case _           => Seq("p", "q", "r")(rnd.nextInt(3))
          }
        }
      }
      val schema = StructType(fs.map(f => StructField(f.name, f.dataType, nullable = true)))
      tbl.append(spark.createDataFrame(
        rows.map(r => Row(r: _*)).asJavaList, schema))
      expected ++= rows.map(r => fs.map(idOf).zip(r).filter(_._2 != null).toMap)
    }

    def tryEvolve(op: => Unit): Boolean = {
      val before = tbl.currentOrFail()
      try { op; true }
      catch {
        case _: IllegalArgumentException | _: IllegalStateException =>
          val after = tbl.currentOrFail()
          after.schema shouldBe before.schema
          after.files.map(_.path).toSet shouldBe before.files.map(_.path).toSet
          false
      }
    }

    def verify(): Unit = {
      val fs = fields
      val ids = fs.map(idOf)
      val want = expected
        .map(r => ids.map(id => r.get(id).map(_.toString).orNull))
        .sortBy(_.mkString(""))
      val got = tbl.scan()
        .select(fs.map(f => org.apache.spark.sql.functions.col(s"`${f.name}`")): _*)
        .collect()
        .map(r => ids.indices.map(i => Option(r.get(i)).map(_.toString).orNull).toSeq)
        .sortBy(_.mkString(""))
      withClue(s"seed=$seed schema=${fs.map(f => s"${f.name}#${idOf(f)}").mkString(",")} ") {
        got.toSeq shouldBe want
      }
    }

    // bootstrap: first append defines the schema (a,b,c with field ids)
    tbl.append(spark.createDataFrame(
      Seq(Row(1L, "p", 10L), Row(2L, "q", null)).asJavaList,
      StructType(Seq(StructField("a", LongType), StructField("b", StringType),
        StructField("c", LongType)))))
    expected ++= Vector(
      fields.map(idOf).zip(Seq(1L, "p", 10L)).toMap,
      fields.map(idOf).zip(Seq(2L, "q", null)).filter(_._2 != null).toMap)
    appendRows() // never start empty
    def numericFields: Seq[StructField] = fields.filter(f =>
      f.dataType == LongType || f.dataType == IntegerType)
    (0 until 10).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 => appendRows()
        case 2 => // rename to a pool name (may be occupied/blocked) —
          // legal since round 12 even with pending MoR deletes (their
          // stored keys/predicates remap in the same commit)
          val from = fields(rnd.nextInt(fields.size)).name
          val to = namePool(rnd.nextInt(namePool.size))
          if (tryEvolve(tbl.renameColumn(from, to))) renames += 1
        case 3 => // drop a random column (last-column drop must reject;
          // so must dropping a column a pending MoR delete references)
          val victim = fields(rnd.nextInt(fields.size))
          val vid = idOf(victim)
          if (tryEvolve(tbl.dropColumn(victim.name))) {
            drops += 1
            // a drop kills the values PERMANENTLY: once the last
            // physical carrier is rewritten the engine may legally
            // reuse the id for a brand-new (all-null) column, so the
            // reference must forget the dead id's values too
            expected = expected.map(_ - vid)
          }
        case 4 => // add a pool-named numeric column (may be blocked by
          // history), OR widen an existing int column to long — widening
          // composes with renames: the field id and value survive both
          val name = namePool(rnd.nextInt(namePool.size))
          val ints = fields.filter(_.dataType == IntegerType)
          if (ints.nonEmpty && rnd.nextBoolean()) {
            val f = ints(rnd.nextInt(ints.size))
            tryEvolve(tbl.evolveSchema(StructType(Seq(StructField(f.name, LongType)))))
          } else if (!fields.exists(_.name.equalsIgnoreCase(name)))
            tryEvolve(tbl.evolveSchema(StructType(Seq(StructField(name,
              if (rnd.nextBoolean()) LongType else IntegerType)))))
        case 5 => // range delete on a random numeric column — randomly
          // copy-on-write OR merge-on-read (predicate delete group);
          // the reference applies it eagerly either way, so a later
          // rename exercising the predicate-SQL remap is checked by
          // every subsequent verify()
          val longs = numericFields
          if (longs.nonEmpty) {
            val f = longs(rnd.nextInt(longs.size))
            val k = rnd.nextInt(100)
            val id = idOf(f)
            tbl.updateProperties(Map(graft.table.GraftTable.DeleteModeProp ->
              (if (rnd.nextBoolean()) "mor" else "cow")))
            tbl.deleteWhere(s"`${f.name}` <= $k")
            expected = expected.filterNot(r =>
              r.get(id).exists(_.toString.toLong <= k))
          }
        case 6 => // keyed merge-on-read delete (equality group): the
          // shape whose stored key column names + era-named key FILES
          // must survive later renames (physKeys freezing)
          val longs = numericFields
          if (longs.nonEmpty) {
            val f = longs(rnd.nextInt(longs.size))
            val id = idOf(f)
            val ks = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(100).toLong).distinct
            tbl.updateProperties(Map(graft.table.GraftTable.DeleteModeProp -> "mor"))
            val keyDf = spark.createDataFrame(
              ks.map(v => Row(v)).asJavaList,
              StructType(Seq(StructField(f.name, LongType))))
            tbl.deleteByKeys(keyDf, Seq(f.name))
            expected = expected.filterNot(r =>
              r.get(id).exists(v => ks.contains(v.toString.toLong)))
          }
        case 7 => tbl.compactDeletes() // coalesce pending groups (no-op when none)
        case 8 => tbl.rewriteDeletes() // fold pending groups into data
        case _ => tbl.compact(1)
      }
      verify()
    }
    (renames, drops)
  }

  private implicit class SeqToJava[A](s: Seq[A]) {
    def asJavaList: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add); l
    }
  }

  test("randomized evolution sequences match the by-field-id reference") {
    // default 20 seeds in CI; widen one-off sweeps with GRAFT_EVO_SEEDS
    // (the established pre-round workflow: 150+ seeds, commit any
    // bug-finding seed into the default range)
    val seeds = sys.env.get("GRAFT_EVO_SEEDS").map(_.toInt).getOrElse(20)
    val results = (1 to seeds).map(runOne)
    // the generator must actually exercise the feature, not just skip
    results.map(_._1).sum should be >= 3 // renames applied
    results.map(_._2).sum should be >= 2 // drops applied
  }
}
