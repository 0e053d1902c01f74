package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class Q79SmokeSpec extends AnyFunSuite with Matchers {
  test("q79 agg pushdown harness query matches a raw-parquet recompute") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q79_agg_pushdown")(spark, dir).head
    val raw = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("COUNT(*)", "COUNT(o_custkey)", "MIN(o_orderkey)", "MAX(o_orderkey)",
        "MIN(o_totalprice)", "MAX(o_totalprice)", "MIN(o_orderdate)", "MAX(o_orderdate)")
      .head
    (0 until 8).foreach { i => out.get(i) shouldBe raw.get(i) }
  }
}
