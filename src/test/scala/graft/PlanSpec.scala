package graft

import graft.functions.TextFunctions
import graft.operators.{Chunking, Dedup}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Physical-plan regression tests: the scale story depends on specific
  * plan shapes (filter pushdown, column pruning, broadcast joins,
  * shuffle-free column operators, top-k without a global sort). A code
  * change that silently loses one of these still returns correct rows
  * at test scale but regresses catastrophically at 100 TB — so the
  * plans themselves are asserted here.
  */
class PlanSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("scan+filter pushes predicates and prunes columns at the parquet scan") {
    val p = plan(SparkEntry.queries("q01_scan_filter")(spark, sf))
    p should include("PushedFilters: [")
    p should include("IsNotNull(l_shipdate)")
    // projection pruning: the 16-column lineitem scan reads a narrow schema
    p should not include "l_comment"
    p should not include "l_partkey"
  }

  test("dimension joins broadcast the small side") {
    val p = plan(SparkEntry.queries("q03_join_broadcast")(spark, sf))
    p should include("BroadcastHashJoin")
  }

  test("contamination check is a broadcast semi join (no corpus shuffle)") {
    val p = plan(SparkEntry.queries("q68_contamination")(spark, sf))
    p should include("BroadcastHashJoin LeftSemi")
  }

  test("top-k is TakeOrderedAndProject, never a global sort") {
    val p = plan(SparkEntry.queries("q06_sort_limit")(spark, sf))
    p should include("TakeOrderedAndProject")
  }

  test("merge-on-read scan applies equality deletes as a BROADCAST anti join") {
    val s = spark
    import s.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-plan-mor").toString
    val cat = graft.table.GraftCatalog(spark, wh)
    val t = cat.ensure(graft.table.TableIdent("plan", "mor"))
    t.append((1L to 5000L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.updateProperties(Map(graft.table.GraftTable.DeleteModeProp -> "mor"))
    t.deleteByKeys((1L to 50L).toDF("id"), Seq("id"))
    val p = plan(t.scan())
    // the delete-keys side is tiny and must broadcast — a
    // SortMergeJoin here would shuffle the whole corpus per delete
    p should include("BroadcastHashJoin LeftAnti")
    p should not include "SortMergeJoin"
    t.scan().count() shouldBe 4950
  }

  test("MoR scan: files outside a delete's key bounds bypass the anti join") {
    val s = spark
    import s.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-plan-mor2").toString
    val cat = graft.table.GraftCatalog(spark, wh)
    val t = cat.ensure(graft.table.TableIdent("plan", "mor2"))
    // two separate appends = two groups with DISJOINT id ranges, so
    // each file's zone map cleanly contains one range
    t.append((1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.append((100000L to 101000L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.updateProperties(Map(graft.table.GraftTable.DeleteModeProp -> "mor"))
    t.deleteByKeys((10L to 20L).toDF("id"), Seq("id"))
    val p = plan(t.scan())
    // the low-range file needs the anti join; the high-range file reads
    // PLAIN — the delete manifest's own zone map proves it untouched
    p should include("BroadcastHashJoin LeftAnti")
    p should include("Union")
    p.sliding("BroadcastHashJoin LeftAnti".length)
      .count(_ == "BroadcastHashJoin LeftAnti") shouldBe 1
    t.scan().count() shouldBe 1990
    t.scan().where("id BETWEEN 10 AND 20").count() shouldBe 0
  }

  test("position deletes: broadcast anti join; unaddressed files read plain") {
    val s = spark
    import s.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-plan-pos").toString
    val cat = graft.table.GraftCatalog(spark, wh)
    val t = cat.ensure(graft.table.TableIdent("plan", "pos"))
    // first append holds the duplicates; second is duplicate-free, so
    // the delete manifest's file-key range covers only append #1 files
    t.append(((1L to 1000L) ++ (1L to 30L)).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.append((100000L to 101000L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.dedupTable()
    val p = plan(t.scan())
    // the addressed file anti-joins its (file, pos) pairs — broadcast,
    // tiny side; the other file reads plain via the key-range bypass
    p should include("BroadcastHashJoin LeftAnti")
    p should not include "SortMergeJoin"
    p.sliding("BroadcastHashJoin LeftAnti".length)
      .count(_ == "BroadcastHashJoin LeftAnti") shouldBe 1
    p should include("Union")
    t.scan().count() shouldBe 2001
  }

  test("renamed-table scan: one union of era scans, no joins, no shuffle") {
    val s = spark
    import s.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-plan-ren").toString
    val cat = graft.table.GraftCatalog(spark, wh)
    val t = cat.ensure(graft.table.TableIdent("plan", "ren"))
    t.append((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.renameColumn("v", "w")
    t.append((101L to 200L).map(i => (i, s"v$i")).toDF("id", "w").coalesce(1))
    val p = plan(t.scan())
    // the name mapping is a projection per era — never a join or shuffle
    p should include("Union")
    p should not include "Join"
    p should not include "Exchange"
    t.scan().count() shouldBe 200
    // filters on the mapped column push into BOTH parquet scans — the
    // old era's under its PHYSICAL name (through the alias projection)
    val pf = plan(t.scan().where(col("w") === "v1"))
    pf should include("EqualTo(v,v1)") // pre-rename files filter on 'v'
    pf should include("EqualTo(w,v1)") // post-rename files on 'w'
    t.scan().where(col("w") === "v1").count() shouldBe 1
  }

  test("chunking, splits, and stratified sampling are shuffle-free") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val chunked = Chunking.chunkDocuments(docs, "text", "doc_id", maxTokens = 64)
    plan(chunked) should not include "Exchange"
    plan(Chunking.assignSplits(docs, "doc_id")) should not include "Exchange"
    plan(Chunking.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 50))) should
      not include "Exchange"
  }

  test("exact dedup shuffles digests, not document bodies") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(Dedup.exact(docs, Seq("text"), "doc_id"))
    // the keeper aggregate's shuffle partitions on the digest keys
    p should include("hashpartitioning(_k#")
    // and its scan reads only (id, content), not the full doc schema
    p should include("ReadSchema: struct<doc_id:bigint,text:string>")
  }

  test("quality scoring and redaction are a single shuffle-free projection") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(docs.select(
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.redactPii(col("text")).as("r")))
    p should not include "Exchange"
    // one Project directly over the scan: per-row expressions pipeline
    // with the read, no stage break
    p should include("+- * ColumnarToRow")
  }

  test("changelog over a wide range plans two scans, not one pair per commit") {
    import graft.table.{GraftCatalog, TableIdent}
    val s = spark
    import s.implicits._
    val t = GraftCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-cdcplan").toString)
      .ensure(TableIdent("ns", "wide"))
    // 56 appends, a whole-file delete, a rollback that re-adds the
    // deleted file (same path, second insert occurrence), one more
    // append: 59 commits > the grouped threshold (50)
    (0 until 56).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "v")))
    t.deleteWhere("id = 3")
    t.rollbackTo(55)
    t.append(Seq((99L, "z")).toDF("id", "v"))
    val cur = t.currentOrFail().version
    cur should be > graft.table.GraftTable.GroupedChangelogThreshold

    val wide = t.scanChangesBetween(0, cur)
    val p = plan(wide)
    // bounded plan: ONE parquet scan per change side regardless of
    // range width (the per-commit shape would plan ~60 pairs)
    wide.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.size shouldBe 2
    // version recovery is a broadcast of driver-side metadata, never a
    // shuffled join
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"

    // the two plan shapes are interchangeable: same rows, same
    // attributed versions, including the rollback's double-insert
    def key(df: DataFrame) = df
      .select(col("id"), col("_change_type"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
    val grouped = key(t.scanChangesBetweenImpl(0, cur, grouped = true))
    val perCommit = key(t.scanChangesBetweenImpl(0, cur, grouped = false))
    grouped shouldBe perCommit
    // the deleted-then-rolled-back file really does appear as insert
    // twice and delete once
    grouped.collect { case (3L, ct, _) => ct }.sorted shouldBe
      Seq("delete", "insert", "insert")
  }

  test("CDC relation prunes columns and pushes data filters into the parquet scan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.nscdcp")
    spark.sql("CREATE TABLE graft.nscdcp.t (id BIGINT, payload STRING)")
    spark.sql("INSERT INTO graft.nscdcp.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.nscdcp.t VALUES (3, 'c')")

    val pruned = spark.read.option("startingVersion", "0")
      .table("graft.nscdcp.t.changes")
      .where(col("id") > 1)
      .select("id", "_commit_version")
    val p = plan(pruned)
    // payload never leaves the scan; the filter reaches parquet
    p should include("read=id,_commit_version")
    p should not include "payload"
    p should include("GreaterThan(id,1)")
    pruned.collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq shouldBe
      Seq((2L, 1), (3L, 2))

    // pure SQL (no reader options) defaults to the full history
    spark.sql("SELECT COUNT(*) FROM graft.nscdcp.t.changes")
      .head.getLong(0) shouldBe 3L

    // degenerate prunings: only metadata columns, and only data columns
    spark.read.option("startingVersion", "0").table("graft.nscdcp.t.changes")
      .select("_change_type").collect().map(_.getString(0)).toSeq.sorted shouldBe
      Seq("insert", "insert", "insert")
    spark.read.option("startingVersion", "0").table("graft.nscdcp.t.changes")
      .select("payload").collect().map(_.getString(0)).toSeq.sorted shouldBe
      Seq("a", "b", "c")
  }

  test("CDC metadata predicates prune sides and versions at plan time") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.nscdcm")
    spark.sql("CREATE TABLE graft.nscdcm.t (id BIGINT)")
    spark.sql("INSERT INTO graft.nscdcm.t VALUES (1), (2)") // v1
    spark.sql("INSERT INTO graft.nscdcm.t VALUES (3)")      // v2
    spark.sql("DELETE FROM graft.nscdcm.t WHERE id = 1")    // v3
    def feed() = spark.read.option("startingVersion", "0")
      .table("graft.nscdcm.t.changes")
    def planned(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.map(_.inputPartitions.size).sum
    val allParts = planned(feed())

    // side pruning: insert-only plans no delete-side partitions
    val ins = feed().where(col("_change_type") === "insert")
    planned(ins) should be < allParts
    ins.select("id").collect().map(_.getLong(0)).sorted.toSeq shouldBe
      Seq(1L, 2L, 3L)

    // version pruning: a single-commit predicate walks one version
    val v2 = feed().where(col("_commit_version") === 2)
    planned(v2) should be < allParts
    v2.select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe Seq((3L, "insert"))

    // range + IN shapes prune too, and stay correct
    feed().where(col("_commit_version") >= 3).select("id", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "delete"))
    feed().where(col("_commit_version").isin(1, 3))
      .groupBy(col("_change_type")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq shouldBe
      Seq(("delete", 1L), ("insert", 2L))
  }

  test("metadata-backed file index plans 100k files with no filesystem calls") {
    import graft.connector.GraftFileIndex
    import graft.meta.DataFile
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // a table dir that DOESN'T EXIST: every file status must come from
    // snapshot metadata — any listing/stat attempt would throw
    val ghostDir = new org.apache.hadoop.fs.Path("/nonexistent/graft-100k")
    val files = (0 until 100000).map { i =>
      DataFile(f"data/commit-${i / 1000}%03d/part-$i%06d.parquet", 10L, 4096L, None)
    }
    val schema = StructType(Seq(StructField("id", LongType)))
    val idx = new GraftFileIndex(spark, ghostDir, files, schema)
    idx.allFiles().length shouldBe 100000
    idx.sizeInBytes shouldBe 100000L * 4096L
    // leaf maps are precomputed vals: repeated planner calls must not
    // rebuild 100k-entry maps (a rebuild-per-call regression takes this
    // loop from milliseconds to many seconds)
    val t0 = System.nanoTime()
    (0 until 50).foreach(_ => idx.allFiles().length shouldBe 100000)
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    elapsedMs should be < 5000L
  }
}
