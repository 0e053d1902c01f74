package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_might_contain(filterBytes, value)` — membership probe
  * of a string or long against a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (the public sketch
  * `DataFrameStatFunctions.bloomFilter` builds), the map-side pruning
  * half of beyond-broadcast contamination checking
  * (`Dedup.flagContaminatedBloom`) and incremental-ingest dedup
  * (`Dedup.exactAgainst`).
  *
  * A custom `Expression` (not a UDF) keeps the probe inside whole-stage
  * codegen: the filter deserializes ONCE per task from the foldable
  * binary literal (`lazy val` surfaced through `addReferenceObj`), and
  * each row costs just the sketch's own hash probes. Build and probe
  * agree by construction: strings probe `mightContainBinary(utf8Bytes)`
  * — exactly the bytes `BloomFilter.putString` hashed on insert — and
  * longs probe `mightContainLong`, matching the sketch's integral
  * insert path.
  *
  * Null value → false (a null key is in no reference set); the filter
  * argument must be a non-null foldable literal.
  */
final case class BloomMightContainExpr(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName filter argument must be BINARY, got ${left.dataType}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName filter argument must be a foldable literal")
    else if (right.dataType != StringType && right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName value argument must be STRING or BIGINT, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName filter literal is null")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = right.eval(input)
    if (v == null) false
    else right.dataType match {
      case LongType => filter.mightContainLong(v.asInstanceOf[Long])
      case _ => filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized filter rides as a task-level reference object
    // (one deserialization per task); only the value side is
    // row-evaluated — the filter literal never is
    val filterRef = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    val v = right.genCode(ctx)
    val probe = right.dataType match {
      case LongType => s"$filterRef.mightContainLong(${v.value})"
      case _ => s"$filterRef.mightContainBinary(${v.value}.getBytes())"
    }
    ev.copy(
      code = code"""
        ${v.code}
        boolean ${ev.value} = false;
        if (!${v.isNull}) {
          ${ev.value} = $probe;
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomMightContainExpr =
    copy(left = newLeft, right = newRight)
}

object BloomMightContainExpr {
  /** SQL surface: `graft_bloom_might_contain(filterBytes, str)`. */
  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_might_contain"),
    new ExpressionInfo(classOf[BloomMightContainExpr].getName, "graft_bloom_might_contain"),
    (args: Seq[Expression]) => args match {
      case Seq(f, v) => BloomMightContainExpr(f, v)
      case _ => throw new IllegalArgumentException(
        "usage: graft_bloom_might_contain(<binary literal filter>, <string col>)")
    })
}
