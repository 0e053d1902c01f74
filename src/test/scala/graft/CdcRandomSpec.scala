package graft

import scala.util.Random

import graft.table.{GraftCatalog, TableIdent}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Randomized differential test of the DSv2 change feed: every seed
  * drives a random commit history — appends, copy-on-write AND
  * merge-on-read deletes (predicate + equality), SQL MERGE upserts,
  * rename flip-flops, compact_deletes, compactions — and then asserts
  * two exactness properties over the WHOLE range:
  *
  *  1. the `graft.ns.t.changes` relation equals
  *     [[graft.table.GraftTable.scanChangesBetween]] row for row
  *     (tags and commit versions included) — the feed's per-version
  *     decomposition into raw era scans + materialized MoR caches
  *     ([[graft.table.GraftTable.cdcSides]]) must reproduce the batch
  *     changelog's join-shaped plans exactly;
  *  2. the replay invariant: feed inserts minus deletes (multiset)
  *     equals the current table.
  *
  * This is the same differential stance that caught real bugs in the
  * MERGE and evolution fuzzes; seed count widens via GRAFT_CDC_SEEDS.
  */
class CdcRandomSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def runOne(seed: Int): Unit = {
    val s = spark
    import s.implicits._
    val rnd = new Random(seed)
    val ns = s"cdcr$seed"
    s.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    s.sql(s"DROP TABLE IF EXISTS graft.$ns.t")
    val mode = if (rnd.nextBoolean()) "mor" else "auto"
    s.sql(s"""CREATE TABLE graft.$ns.t (id BIGINT, v STRING)
             |TBLPROPERTIES ('graft.delete.mode' = '$mode')""".stripMargin)
    val cat = GraftCatalog(s, s.conf.get("spark.sql.catalog.graft.warehouse"))
    val tbl = cat.load(TableIdent(ns, "t"))

    var nextId = 0L
    def appendSome(): Unit = {
      val vals = (0 until 1 + rnd.nextInt(4)).map { _ =>
        nextId += 1
        s"($nextId, '${Seq("x", "y", "z")(rnd.nextInt(3))}')"
      }
      s.sql(s"INSERT INTO graft.$ns.t VALUES ${vals.mkString(",")}")
    }
    def dataCol: String = tbl.schema.fieldNames.find(n => n == "v" || n == "w").get

    appendSome()
    (0 until 8).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 => appendSome()
        case 2 => // predicate delete (CoW or MoR per table mode); the
          // Scala API takes the modulo predicate DSv2 DELETE cannot
          tbl.deleteWhere(s"id % ${2 + rnd.nextInt(4)} = 0")
        case 3 => // keyed delete (equality MoR group under mode=mor)
          val bound = math.max(1, nextId.toInt)
          val keys = Seq.fill(1 + rnd.nextInt(3))((1 + rnd.nextInt(bound)).toLong).distinct
          tbl.deleteByKeys(keys.toDF("id"), Seq("id"))
        case 4 => // SQL MERGE upsert of one key (update or fresh insert)
          val k = 1 + rnd.nextInt(math.max(1, nextId.toInt) + 2)
          s.sql(
            s"""MERGE INTO graft.$ns.t t
               |USING (SELECT CAST($k AS BIGINT) AS id, 'u' AS nv) src
               |ON t.id = src.id
               |WHEN MATCHED THEN UPDATE SET $dataCol = src.nv
               |WHEN NOT MATCHED THEN INSERT (id, $dataCol) VALUES (src.id, src.nv)""".stripMargin)
          nextId = math.max(nextId, k.toLong)
        case 5 => // rename flip-flop (always legal: same field id)
          tbl.renameColumn(dataCol, if (dataCol == "v") "w" else "v")
        case 6 => tbl.compactDeletes()
        case 7 => tbl.dedupTable() // unique ids: usually a no-op commit
        case 8 => // rollback — MoR deletes may un-happen (reappearances)
          val cur = tbl.currentOrFail().version
          if (cur > 1) tbl.rollbackTo(1 + rnd.nextInt(cur - 1))
        case _ => tbl.compact(1)
      }
    }

    val cur = tbl.currentOrFail().version
    val cols = tbl.schema.fieldNames.toSeq ++ Seq("_change_type", "_commit_version")
    def rows(df: DataFrame): Seq[String] =
      df.select(cols.map(c => col(s"`$c`")): _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val feed = s.read.option("startingVersion", "0")
      .option("endingVersion", cur.toString).table(s"graft.$ns.t.changes")
    withClue(s"seed=$seed mode=$mode feed!=batch ") {
      rows(feed) shouldBe rows(tbl.scanChangesBetween(0, cur))
    }
    // replay invariant: inserts minus deletes == the live table
    val dataCols = tbl.schema.fieldNames.map(c => col(s"`$c`")).toSeq
    def plain(df: DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    withClue(s"seed=$seed mode=$mode replay ") {
      plain(feed.where("_change_type = 'insert'").select(dataCols: _*)
        .exceptAll(feed.where("_change_type = 'delete'").select(dataCols: _*))) shouldBe
        plain(tbl.scan().select(dataCols: _*))
    }
    s.sql(s"DROP TABLE graft.$ns.t")
  }

  test("random commit histories: DSv2 feed == batch changelog; replay == table") {
    val seeds = sys.env.get("GRAFT_CDC_SEEDS").map(_.toInt).getOrElse(10)
    (1 to seeds).foreach(runOne)
  }
}
