package graft

import java.time.Instant

import graft.config.{LoaderConfig, WriteMode}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Config validation parity with the reference's pydantic rules
  * (`core/config.py:36-92`, `tests/test_config_validation.py:9-41`).
  */
class LoaderConfigSpec extends AnyFunSuite with Matchers {

  test("defaults mirror the reference") {
    val c = LoaderConfig()
    c.writeMode shouldBe WriteMode.Overwrite
    c.commitInterval shouldBe 0
    c.loadTsCol shouldBe "_load_dttm"
    LoaderConfig.defaultTableProperties("write.format.default") shouldBe "parquet"
    LoaderConfig.defaultTableProperties("format-version") shouldBe "2"
    LoaderConfig.defaultTableProperties("write.parquet.compression-codec") shouldBe "zstd"
    LoaderConfig.defaultTableProperties("commit.retry.num-retries") shouldBe "10"
  }

  test("writeMode parses and rejects unknowns") {
    WriteMode.parse(" Append ") shouldBe WriteMode.Append
    WriteMode.parse("UPSERT") shouldBe WriteMode.Upsert
    an[IllegalArgumentException] should be thrownBy WriteMode.parse("merge")
  }

  test("commit_interval must be non-negative") {
    an[IllegalArgumentException] should be thrownBy LoaderConfig(commitInterval = -1)
    LoaderConfig(commitInterval = 0).commitInterval shouldBe 0
  }

  test("partition_col must parse under the transform grammar") {
    an[Exception] should be thrownBy LoaderConfig(partitionCol = Some("cube(ts)"))
    an[Exception] should be thrownBy LoaderConfig(partitionCol = Some("  "))
    LoaderConfig(partitionCol = Some("day(ts)")).partitionField.get.fieldName shouldBe "ts_day"
  }

  test("load_ts_col must be a valid identifier") {
    an[IllegalArgumentException] should be thrownBy LoaderConfig(loadTsCol = "9bad")
    an[IllegalArgumentException] should be thrownBy LoaderConfig(loadTsCol = "a b")
    LoaderConfig(loadTsCol = "_ok_2").loadTsCol shouldBe "_ok_2"
  }

  test("join_cols cannot be empty or all-blank") {
    an[IllegalArgumentException] should be thrownBy LoaderConfig(joinCols = Some(Seq("", " ")))
    LoaderConfig(joinCols = Some(Seq(" id ", ""))).cleanedJoinCols shouldBe Some(Seq("id"))
  }

  test("upsert mode forbids replace_filter (config.py:82-83)") {
    an[IllegalArgumentException] should be thrownBy
      LoaderConfig(writeMode = WriteMode.Upsert, replaceFilter = Some("id = 1"))
  }

  test("identity partitioning on the load-timestamp column is rejected") {
    an[IllegalArgumentException] should be thrownBy
      LoaderConfig(partitionCol = Some("_load_dttm"), loadTimestamp = Some(Instant.EPOCH))
    // day(...) on it is fine
    LoaderConfig(partitionCol = Some("day(_load_dttm)"),
      loadTimestamp = Some(Instant.EPOCH)).partitionField shouldBe defined
  }

  test("python-style == is normalized to SQL = outside string literals") {
    LoaderConfig(replaceFilter = Some("ts == '2023-01-01'")).replaceFilterSql shouldBe
      Some("ts = '2023-01-01'")
    // `==` INSIDE a string literal must be preserved (VERDICT r2 #4)
    LoaderConfig(replaceFilter = Some("note == 'a==b'")).replaceFilterSql shouldBe
      Some("note = 'a==b'")
    // already-SQL predicates pass through
    LoaderConfig(replaceFilter = Some("a = 1 AND b != 2")).replaceFilterSql shouldBe
      Some("a = 1 AND b != 2")
  }

  test("malformed replace_filter fails at config time, not mid-write") {
    an[Exception] should be thrownBy LoaderConfig(replaceFilter = Some("a = ((("))
    an[Exception] should be thrownBy LoaderConfig(replaceFilter = Some("foo bar baz"))
  }
}
