package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap (range) join — the second canonical operator Spark
  * lacks natively (a raw `l.start <= r.end AND r.start <= l.end` theta
  * join degenerates to a broadcast-nested-loop over every pair).
  *
  * Binned equi-join formulation: each interval registers in every
  * fixed-width bin it covers (a linear explode), candidates meet
  * through an equi-join on (keys, bin) — hash-shuffled and
  * codegen-friendly — and the exact overlap predicate filters them.
  * Duplicate candidate pairs (intervals sharing several bins) are
  * suppressed by keeping only the first shared bin, so no distinct over
  * the output is needed. Cost: O(intervals × bins-per-interval +
  * true-overlaps); pick `binSize` near the typical interval length.
  */
object RangeJoin {

  /** Join rows of `left` and `right` whose [start, end] intervals
    * overlap (inclusive bounds), optionally also matching on `keys`.
    * Column name collisions on the right get a `right_` prefix.
    */
  def intervals(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftStart: String, leftEnd: String,
                rightStart: String, rightEnd: String,
                binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")

    def binned(df: DataFrame, start: String, end: String, side: String): DataFrame =
      df.withColumn(s"_bin_$side",
        explode(sequence(
          floor(col(start).cast("long") / binSize),
          floor(col(end).cast("long") / binSize))))

    val leftNames = left.columns.toSeq
    val renamedRight = right.columns.foldLeft(right) { (df, c) =>
      if (leftNames.contains(c) && !keys.contains(c)) df.withColumnRenamed(c, s"right_$c")
      else df
    }
    val rs = if (leftNames.contains(rightStart) && !keys.contains(rightStart)) s"right_$rightStart" else rightStart
    val re = if (leftNames.contains(rightEnd) && !keys.contains(rightEnd)) s"right_$rightEnd" else rightEnd

    val l = binned(left, leftStart, leftEnd, "l")
    val r = binned(renamedRight, rs, re, "r")
      .withColumnRenamed("_bin_r", "_bin_l")

    val joined = l.join(r, keys :+ "_bin_l")
      .where(col(leftStart) <= col(re) && col(rs) <= col(leftEnd))
      // emit each true pair once: only in the first bin both cover
      .where(col("_bin_l") ===
        greatest(floor(col(leftStart).cast("long") / binSize),
                 floor(col(rs).cast("long") / binSize)))
    joined.drop("_bin_l")
  }
}
