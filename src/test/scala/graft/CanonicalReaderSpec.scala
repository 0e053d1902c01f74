package graft

import java.nio.file.Files

import graft.sources.CanonicalReader
import graft.table.{GraftCatalog, TableIdent}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CanonicalReaderSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("canonicalize widens narrow ints and maps null-typed columns to string") {
    val schema = StructType(Seq(
      StructField("b", ByteType), StructField("s", ShortType),
      StructField("n", NullType), StructField("ok", LongType)))
    val rows = java.util.Arrays.asList(Row(1.toByte, 2.toShort, null, 3L))
    val df = spark.createDataFrame(rows, schema)
    val out = CanonicalReader.canonicalize(df)
    out.schema("b").dataType shouldBe IntegerType
    out.schema("s").dataType shouldBe IntegerType
    out.schema("n").dataType shouldBe StringType
    out.schema("ok").dataType shouldBe LongType
    val r = out.collect()(0)
    r.getInt(0) shouldBe 1
    r.isNullAt(2) shouldBe true
  }

  test("csv and json-lines sources read through the canonical boundary") {
    val dir = Files.createTempDirectory("canon")
    Files.writeString(dir.resolve("data.csv"), "id,name,score\n1,a,2.5\n2,b,3.0\n")
    val csv = CanonicalReader.csv(spark, dir.resolve("data.csv").toString)
    csv.schema("id").dataType shouldBe IntegerType
    csv.count() shouldBe 2
    Files.writeString(dir.resolve("data.jsonl"),
      """{"id": 1, "tag": "x"}""" + "\n" + """{"id": 2, "tag": "y"}""" + "\n")
    val jl = CanonicalReader.jsonLines(spark, dir.resolve("data.jsonl").toString)
    jl.schema("id").dataType shouldBe LongType
    jl.count() shouldBe 2
  }

  test("catalog namespaces and rename") {
    val s = spark
    import s.implicits._
    val c = GraftCatalog(spark, Files.createTempDirectory("graft-cat").toString)
    val id = TableIdent("nsA", "orig")
    c.ensure(id).append(Seq((1L, "x")).toDF("id", "v"))
    c.listNamespaces() shouldBe Seq("nsA")
    c.rename(id, TableIdent("nsB", "renamed"))
    c.exists(id) shouldBe false
    c.load(TableIdent("nsB", "renamed")).scan().count() shouldBe 1
    c.listNamespaces() shouldBe Seq("nsB")
    an[Exception] should be thrownBy c.rename(id, TableIdent("nsB", "renamed"))
  }
}
