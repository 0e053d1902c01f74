package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Murmur3Hash, Pmod}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The `bucket` V2 function exposed through the catalog's
  * `FunctionCatalog` face. Spark resolves it when it turns a reported
  * `bucket(n, col)` scan partitioning into a Catalyst
  * `TransformExpression` — the resolution step storage-partitioned
  * joins need before two co-bucketed graft tables can join with zero
  * shuffle. Two scans are join-compatible when their bound functions
  * share a `canonicalName`, so the name embeds the value type (an INT
  * and a BIGINT column hash differently and must never co-partition).
  *
  * Semantics are BY CONSTRUCTION identical to the write path
  * ([[graft.partitioning.Transform.Bucket]], `pmod(hash(col), n)`):
  * the bound function evaluates the same Catalyst `Pmod(Murmur3Hash,
  * n)` expression interpreted — called only on compatibility/shuffle
  * planning paths, never per-row in the no-shuffle join itself.
  */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, col): graft's write-side partition transform, pmod(murmur3_hash(col), n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets INT, value), got ${inputType.simpleString}")
    val vt = inputType.fields(1).dataType
    require(graft.partitioning.Transform.Bucket(1).accepts(vt),
      s"bucket does not accept ${vt.catalogString}")
    new Bound(vt)
  }

  private final class Bound(vt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, vt)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${vt.catalogString})"

    // the exact write-path expression, bound to (numBuckets, value):
    // Murmur3Hash returns its seed for a null child, so null values
    // land in a real bucket here exactly as they do in written files
    @transient private lazy val expr =
      Pmod(new Murmur3Hash(Seq(BoundReference(1, vt, nullable = true))),
        BoundReference(0, IntegerType, nullable = false))

    override def produceResult(input: InternalRow): Integer =
      expr.eval(input).asInstanceOf[Int]
  }
}
