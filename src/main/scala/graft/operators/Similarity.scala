package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *   - [[bruteForceTopK]] — exact cosine top-k: one codegen'd pass over
  *     all vectors + a TakeOrdered (no shuffle of the vectors
  *     themselves). The correctness baseline and the right choice when
  *     the query set is small.
  *   - [[lshTopK]] — approximate: random-hyperplane buckets prune the
  *     candidate set before scoring; at 100 TB only the query's bucket
  *     (plus multiprobe neighbors) is read, and bucketing can be
  *     precomputed and partitioned on (an IVF-style layout).
  *
  * All math uses `zip_with`/`aggregate` higher-order functions —
  * codegen'd, no UDF, accumulation in double.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0, lit(0.0)).otherwise(d / nn)
  }

  /** Exact top-k by cosine against a literal query vector. */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol), cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Approximate top-k: score only vectors in the query's hyperplane
    * bucket and its `multiprobe` single-bit-flip neighbor buckets.
    * Recall grows with multiprobe; cost stays ~bucketCount/2^planes of
    * the data.
    */
  def lshTopK(df: DataFrame, vecCol: String, idCol: String,
              query: Seq[Float], k: Int, planes: Int = 6,
              multiprobe: Int = 2): DataFrame = {
    val q = array(query.map(lit): _*)
    val bucketed = df.withColumn("_bucket", Dedup.hyperplaneBucket(col(vecCol), planes))
    // query bucket + its single-bit neighbors, computed as literal set
    val qBucket = bucketed.sparkSession.range(1)
      .select(Dedup.hyperplaneBucket(q, planes).as("b")).collect()(0).getLong(0)
    val probes: Seq[Long] =
      qBucket +: (0 until planes).take(multiprobe).map(b => qBucket ^ (1L << b))
    bucketed
      .where(col("_bucket").isin(probes: _*))
      .select(col(idCol), cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs top-k neighbor join for a (small, broadcastable) query
    * set: each query row gets its k nearest corpus rows. The corpus
    * side streams; queries broadcast.
    */
  def knnJoin(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    import org.apache.spark.sql.expressions.Window
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("corpus_id"), cosine(col("cv"), col("qv")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
