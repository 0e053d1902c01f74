package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: each left row picks the latest right row with
  * `rightTs <= leftTs` for the same key — the join Spark lacks natively
  * (the build guidance's canonical custom-operator example; DuckDB ships
  * it as `ASOF JOIN`).
  *
  * Implementation is the scalable union + running-`last` formulation,
  * NOT a range-condition join: a `l.ts >= r.ts` theta join explodes to
  * O(|L|×|R|) pairs per key before taking the max, while this shape is
  * one hash shuffle on the key, one sort per partition, zero
  * amplification:
  *   1. tag and union both sides on (key, ts), right rows sorting
  *      before left rows at equal timestamps (inclusive `>=`);
  *   2. per key, in ts order, carry the last right payload forward
  *      (`last(_, ignoreNulls)` over an unbounded-preceding window);
  *   3. keep left rows; each holds the right payload as-of its ts.
  */
object AsOfJoin {

  /** `rightCols` are projected from the matched right row (null when no
    * right row precedes the left row). Right columns are prefixed only
    * on collision with a left name.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join requires key columns")
    val leftNames = left.columns.toSeq
    val outNames = rightCols.map(c => if (leftNames.contains(c)) s"right_$c" else c)

    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_src", lit(1))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("_ts")) :+
        struct(rightCols.map(col): _*).as("_payload"): _*)
      .withColumn("_src", lit(0))

    // allowMissingColumns null-fills: left rows get a null _payload,
    // right rows get null left columns
    val merged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = merged.withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))

    val projected = leftNames.map(col) ++
      rightCols.zip(outNames).map { case (c, out) => col("_asof").getField(c).as(out) }
    carried.where(col("_src") === 1).select(projected: _*)
  }
}
