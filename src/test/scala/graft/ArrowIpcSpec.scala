package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.config.{LoaderConfig, WriteMode}
import graft.loader.Loader
import graft.sources.ArrowIpcSource
import graft.table.{GraftCatalog, TableIdent}

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ATimeUnit}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.jdk.CollectionConverters._

/** Arrow IPC ingestion parity with `tests/test_streaming.py:11-43`
  * (in-memory IPC round-trip: 2 batches → 4 rows → table).
  */
class ArrowIpcSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def field(name: String, t: ArrowType) =
    new Field(name, FieldType.nullable(t), null)

  /** Two-batch IPC stream: (id: int64, name: utf8, score: float64). */
  private def makeStream(): Array[Byte] = {
    val allocator = new RootAllocator()
    val schema = new ArrowSchema(Seq(
      field("id", new ArrowType.Int(64, true)),
      field("name", ArrowType.Utf8.INSTANCE),
      field("score", new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))).asJava)
    val root = VectorSchemaRoot.create(schema, allocator)
    val out = new ByteArrayOutputStream()
    val writer = new ArrowStreamWriter(root, null, out)
    writer.start()
    val id = root.getVector("id").asInstanceOf[BigIntVector]
    val name = root.getVector("name").asInstanceOf[VarCharVector]
    val score = root.getVector("score").asInstanceOf[Float8Vector]
    for (batch <- 0 until 2) {
      root.allocateNew()
      for (i <- 0 until 2) {
        val idx = i
        id.setSafe(idx, batch * 2L + i)
        name.setSafe(idx, s"row-$batch-$i".getBytes(StandardCharsets.UTF_8))
        if (batch == 0 && i == 1) score.setNull(idx) else score.setSafe(idx, batch + i * 0.5)
      }
      root.setRowCount(2)
      writer.writeBatch()
    }
    writer.end(); writer.close(); root.close(); allocator.close()
    out.toByteArray
  }

  test("IPC stream decodes batch-per-DataFrame with widened schema") {
    val dfs = ArrowIpcSource.read(spark, new ByteArrayInputStream(makeStream())).toSeq
    dfs.size shouldBe 2
    dfs.head.schema shouldBe StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val rows = dfs.head.orderBy("id").collect()
    rows(0).getLong(0) shouldBe 0L
    rows(0).getString(1) shouldBe "row-0-0"
    rows(1).isNullAt(2) shouldBe true // null survives decode
  }

  test("loadIpcStream: 2 batches -> 4 rows, per-batch snapshots (test_streaming.py)") {
    val cat = GraftCatalog(spark, Files.createTempDirectory("graft-ipc").toString)
    val id = TableIdent("ns", "ipc")
    val loader = new Loader(cat, LoaderConfig(writeMode = WriteMode.Append, commitInterval = 1))
    val res = loader.loadIpcStream(new ByteArrayInputStream(makeStream()), id)
    res.rowsLoaded shouldBe 4
    res.batchesProcessed shouldBe 2
    res.newTableCreated shouldBe true
    val t = cat.load(id)
    t.snapshots().size shouldBe 2 // one transaction per batch
    t.scan().count() shouldBe 4
  }

  test("type mapping covers the reference registry's widenings") {
    ArrowIpcSource.sparkType(field("a", new ArrowType.Int(8, true))) shouldBe IntegerType
    ArrowIpcSource.sparkType(field("a", new ArrowType.Int(32, true))) shouldBe IntegerType
    ArrowIpcSource.sparkType(field("a", new ArrowType.Int(64, true))) shouldBe LongType
    ArrowIpcSource.sparkType(field("a", new ArrowType.Int(32, false))) shouldBe LongType
    ArrowIpcSource.sparkType(field("a", new ArrowType.Int(64, false))) shouldBe DecimalType(20, 0)
    ArrowIpcSource.sparkType(field("a", new ArrowType.Timestamp(ATimeUnit.MICROSECOND, null))) shouldBe TimestampNTZType
    ArrowIpcSource.sparkType(field("a", new ArrowType.Timestamp(ATimeUnit.MILLISECOND, "UTC"))) shouldBe TimestampType
    ArrowIpcSource.sparkType(field("a", ArrowType.Null.INSTANCE)) shouldBe StringType
    an[IllegalArgumentException] should be thrownBy
      ArrowIpcSource.sparkType(field("a", new ArrowType.Duration(ATimeUnit.SECOND)))
  }
}
