package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for large joins.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins at
  * runtime; explicit salting remains the tool when one side has a few
  * pathological hot keys and the other side is small enough to
  * replicate but too large to broadcast. The classic recipe:
  * the big side gets a deterministic salt in [0, factor); the small
  * side is exploded ×factor so every (key, salt) bucket finds its
  * match; the join key becomes (key, salt), splitting each hot key's
  * rows across `factor` reducers.
  */
object Skew {

  private val SaltCol = "_graft_salt"

  /** Equi-join `big ⋈ small` on `keys` with `factor`-way salting of hot
    * keys. Deterministic: the big side's salt derives from xxhash64 of
    * its whole row via monotonically-increasing ids would break retries,
    * so we hash the join keys plus a row-content column when provided
    * (`spreadCol`), else spread round-robin by partition-local id.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int, spreadCol: Option[String] = None): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = spreadCol match {
      case Some(c) =>
        big.withColumn(SaltCol, pmod(xxhash64(col(c)), lit(factor.toLong)).cast("int"))
      case None =>
        big.withColumn(SaltCol, (spark_partition_id() % factor).cast("int"))
    }
    val replicated = small
      .withColumn(SaltCol, explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ SaltCol).drop(SaltCol)
  }
}
