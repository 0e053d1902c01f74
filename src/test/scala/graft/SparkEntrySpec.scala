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
}
