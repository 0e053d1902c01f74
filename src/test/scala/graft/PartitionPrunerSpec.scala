package graft

import graft.meta.DataFile
import graft.partitioning.PartitionExpr
import graft.table.PartitionPruner
import graft.table.PartitionPruner.Tri

import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Three-valued file pruning — the scale-critical kernel behind
  * scanWhere/deleteWhere (SURVEY §4 read-path pushdown).
  */
class PartitionPrunerSpec extends AnyFunSuite with Matchers {

  private def file(field: String, value: Option[String]) =
    DataFile("data/x.parquet", 10, 100, Some(Map(field -> value)))

  private def tri(expr: String, spec: String, st: DataType,
                  field: String, value: Option[String]): Tri =
    PartitionPruner.evaluate(file(field, value), PartitionExpr.parse(spec), st,
      CatalystSqlParser.parseExpression(expr))

  test("day transform: range predicates prune and prove all-match") {
    val st = TimestampNTZType
    tri("ts >= '2024-02-01'", "day(ts)", st, "ts_day", Some("2024-01-15")) shouldBe
      Tri(may = false, all = false)
    tri("ts >= '2024-02-01'", "day(ts)", st, "ts_day", Some("2024-03-01")) shouldBe
      Tri(may = true, all = true)
    // boundary: >= at exact midnight of the partition day proves all-match
    tri("ts >= '2024-02-01'", "day(ts)", st, "ts_day", Some("2024-02-01")).all shouldBe true
    // mid-day cutoff: same day may match but not all
    tri("ts >= '2024-02-01 12:00:00'", "day(ts)", st, "ts_day", Some("2024-02-01")) shouldBe
      Tri(may = true, all = false)
  }

  test("identity transform: equality proves all-match (whole-file ops)") {
    tri("day = '2024-01-01'", "day", StringType, "day", Some("2024-01-01")) shouldBe
      Tri(may = true, all = true)
    tri("day = '2024-01-01'", "day", StringType, "day", Some("2024-01-02")) shouldBe
      Tri(may = false, all = false)
    // numeric identity compares numerically, not lexically
    tri("id > 9", "id", LongType, "id", Some("10")) shouldBe Tri(may = true, all = true)
  }

  test("AND / OR / NOT compose three-valued results") {
    val st = StringType
    tri("day >= '2024-01-01' AND day < '2024-02-01'", "day", st, "day", Some("2024-01-15")) shouldBe
      Tri(may = true, all = true)
    tri("NOT (day = '2024-01-15')", "day", st, "day", Some("2024-01-15")) shouldBe
      Tri(may = false, all = false)
    tri("day = 'x' OR day = '2024-01-15'", "day", st, "day", Some("2024-01-15")).may shouldBe true
  }

  test("IN list folds as disjunction of equalities") {
    tri("day IN ('a', 'b')", "day", StringType, "day", Some("b")).may shouldBe true
    tri("day IN ('a', 'b')", "day", StringType, "day", Some("c")).may shouldBe false
  }

  test("bucket: int literal coerced to long column before murmur3 (VERDICT r1)") {
    val spec = "bucket(4, id)"
    // compute the true bucket of 42L via the same write-path expression
    val s = TestSpark.spark
    import org.apache.spark.sql.functions._
    val bucket = s.range(1).select(pmod(hash(lit(42L)), lit(4)).cast("string"))
      .collect()(0).getString(0)
    tri("id = 42", spec, LongType, "id_bucket_4", Some(bucket)).may shouldBe true
    val other = ((bucket.toInt + 1) % 4).toString
    tri("id = 42", spec, LongType, "id_bucket_4", Some(other)).may shouldBe false
  }

  test("malformed bucket partition value degrades to Unknown, not a crash") {
    tri("id = 42", "bucket(4, id)", LongType, "id_bucket_4", Some("not-a-number")) shouldBe
      PartitionPruner.Unknown
  }

  test("unsupported predicate shapes degrade conservatively to Unknown") {
    tri("id + 1 = 42", "id", LongType, "id", Some("41")) shouldBe PartitionPruner.Unknown
    tri("other_col = 1", "id", LongType, "id", Some("5")) shouldBe PartitionPruner.Unknown
  }

  test("null partition value: comparisons exclude, IS NULL includes") {
    // non-string sources: a stored null means all rows are null — exact
    tri("k = 5", "k", LongType, "k", None).may shouldBe false
    tri("k IS NULL", "k", LongType, "k", None) shouldBe Tri(may = true, all = true)
    tri("k IS NOT NULL", "k", LongType, "k", None).may shouldBe false
    tri("day IS NOT NULL", "day", StringType, "day", Some("x")) shouldBe Tri(may = true, all = true)
  }

  test("string null partition value may hide '' rows (Hive default-partition encoding)") {
    // a stored null for a STRING source may be '' rows: IS NULL keeps
    // may but must not claim all (deleteWhere would drop '' rows);
    // IS NOT NULL must not prune (losing '' rows); comparisons keep the
    // ''-evaluated may bound
    tri("day IS NULL", "day", StringType, "day", None) shouldBe Tri(may = true, all = false)
    tri("day IS NOT NULL", "day", StringType, "day", None) shouldBe Tri(may = true, all = false)
    tri("day = '2024-01-01'", "day", StringType, "day", None).may shouldBe false
    tri("day = ''", "day", StringType, "day", None).may shouldBe true
    tri("day < 'a'", "day", StringType, "day", None) shouldBe Tri(may = true, all = false)
  }

  test("unpartitioned file is always Unknown (never wrongly pruned)") {
    val f = DataFile("d.parquet", 1, 1, None)
    PartitionPruner.evaluate(f, PartitionExpr.parse("day"), StringType,
      CatalystSqlParser.parseExpression("day = 'x'")) shouldBe PartitionPruner.Unknown
  }

  test("truncate(int) bins compare numerically including negatives") {
    tri("k >= 1500", "truncate(1000, k)", LongType, "k_trunc_1000", Some("1000")).may shouldBe true
    tri("k >= 2000", "truncate(1000, k)", LongType, "k_trunc_1000", Some("1000")).may shouldBe false
    tri("k = -5", "truncate(10, k)", LongType, "k_trunc_10", Some("-10")).may shouldBe true
  }
}
