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
