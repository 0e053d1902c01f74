package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The driver's t1 contract: `SparkEntry.entry` returns rows on
  * sf0.001, and every registered oracle key has a query.
  */
class SparkEntrySpec extends AnyFunSuite with Matchers {

  test("entry returns rows on sf0.001 (t1 smoke)") {
    SparkEntry.entry(TestSpark.spark).count() should be > 0L
  }

  test("every oracle key has a query; names are unique and well-formed") {
    val queries = SparkEntry.queries
    val oracle = SparkEntry.oracleSql
    oracle.keySet.diff(queries.keySet) shouldBe empty
    queries.keySet.foreach(k => k should fullyMatch regex "[a-z0-9_]+")
    queries.size should be >= 55
  }

  /** Testdata-drift regression gate (round-9 postmortem): the driver
    * regenerated events.parquet with a different `ts` physical type and
    * six queries silently threw at PLAN time for a whole round — caught
    * only at verdict time because nothing constructed the registry
    * against the real testdata under `sbt test`. This case builds every
    * registered query against sf0.001 and forces full analysis
    * (`queryExecution.analyzed`), so the next schema drift fails HERE.
    * Construction only — no execution — so the whole sweep stays cheap.
    */
  test("all registry queries analyze against the live sf0.001 testdata") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/events.parquet").exists(),
      "driver testdata not present in this environment")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(TestSpark.spark, sfDir).queryExecution.analyzed; None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    withClue(failures.mkString("\n")) { failures shouldBe empty }
  }
}
