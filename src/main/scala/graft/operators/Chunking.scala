package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data preparation: split documents into token-bounded chunks
  * and assign deterministic dataset splits.
  *
  * Both are pure column expressions — a linear explode for chunking and
  * a hash modulus for splits — so they run shuffle-free over any corpus
  * size (chunk rows land in the same partition as their document).
  */
object Chunking {

  /** Explode each document into word-token windows of `maxTokens` with
    * `overlap` tokens carried between consecutive chunks. Output: one
    * row per chunk with `chunk_index` and `chunk_text` (token-joined).
    * Documents shorter than `maxTokens` yield exactly one chunk.
    */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens, "overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val toks = TextFunctions.wordTokens(col(textCol))
    val n = size(toks)
    // chunk starts: 0, stride, 2*stride, ... while start < n (min 1 chunk)
    val chunkCount = greatest(ceil((n - lit(overlap)).cast("double") / stride).cast("int"), lit(1))
    df.withColumn("_toks", toks)
      .select(col(idCol), posexplode(transform(sequence(lit(0), chunkCount - 1),
        i => array_join(slice(col("_toks"), i * stride + 1, lit(maxTokens)), " "))))
      .withColumnRenamed("pos", "chunk_index")
      .withColumnRenamed("col", "chunk_text")
  }

  /** Sequence packing: greedily assign token-counted rows to "packs"
    * bounded by `maxTokensPerPack` (the context-window filling pass of
    * a training pipeline). First-fit within each partition — rows never
    * shuffle; pack ids are globally unique via the partition id. Rows
    * longer than the budget get a pack of their own. Output adds
    * `pack_id` and `pack_tokens` (the row's token count, capped).
    */
  def packSequences(df: DataFrame, tokenCountCol: String,
                    maxTokensPerPack: Int): DataFrame = {
    require(maxTokensPerPack > 0, "maxTokensPerPack must be positive")
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.sql.Row
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("pack_id", LongType, nullable = false),
      StructField("pack_tokens", LongType, nullable = false)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val tokenIdx = df.schema.fieldIndex(tokenCountCol)
    df.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      // open bins: (binId, tokensUsed) — linear first-fit scan; bin
      // count stays small because full bins are retired
      val open = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var nextBin = 0L
      it.map { r =>
        val t = math.min(r.getAs[Number](tokenIdx).longValue(), maxTokensPerPack.toLong)
        val fit = open.indexWhere(_._2 + t <= maxTokensPerPack)
        val bin =
          if (fit >= 0) { val (id, used) = open(fit); open(fit) = (id, used + t); id }
          else {
            val id = pid * 1000000000L + nextBin
            nextBin += 1
            open += ((id, t))
            if (open.size > 64) open.remove(0) // retire the oldest
            id
          }
        Row.fromSeq(r.toSeq :+ bin :+ t)
      }
    }(enc)
  }

  /** Deterministic OFFSET-based packing: rows ordered by `orderCols`
    * are laid end-to-end and a row's pack is `floor(startOffset /
    * budget)` — the pack where the row STARTS, so a pack may overflow
    * by at most one row's tokens. Fully reproducible across engines and
    * runs — the SQL-expressible counterpart of [[packSequences]]'
    * first-fit, used when cross-engine verifiability matters more than
    * tight fills.
    *
    * The global prefix sum is computed distributed, not through a
    * one-partition window (which moves the whole corpus to a single
    * task): range-partition on the order, per-partition local cumsums,
    * then per-partition totals — O(partitions) rows — are collected,
    * prefix-summed on the driver, and broadcast back as base offsets.
    * Identical values to a global-window cumsum whenever `orderCols`
    * are a unique key (ties may land in either neighboring partition,
    * the same freedom a global window has).
    */
  def packSequencesByOffset(df: DataFrame, tokenCountCol: String,
                            maxTokensPerPack: Int,
                            orderCols: Seq[String]): DataFrame = {
    require(maxTokensPerPack > 0, "maxTokensPerPack must be positive")
    import org.apache.spark.sql.expressions.Window
    val ord = orderCols.map(c => col(s"`$c`"))
    val parted = df.repartitionByRange(ord: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true) // totals + window must read ONE evaluation
    val totals = parted.groupBy("_pid")
      .agg(sum(col(tokenCountCol).cast("long")).as("_tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val bases = {
      var acc = 0L
      totals.map { case (pid, tot) => val b = acc; acc += tot; (pid, b) }
    }
    val baseDf = df.sparkSession.createDataFrame(bases.toSeq).toDF("_pid", "_base")
    val w = Window.partitionBy(col("_pid")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted.join(broadcast(baseDf), Seq("_pid"))
      .withColumn("_start", col("_base") +
        coalesce(sum(col(tokenCountCol).cast("long")).over(w), lit(0L)))
      .withColumn("pack_id",
        floor(col("_start").cast("double") / maxTokensPerPack).cast("long"))
      .drop("_start", "_base", "_pid")
  }

  /** Deterministic train/validation/test assignment from a stable hash
    * of the id — reproducible across runs and clusters, no RNG state.
    * `weights` are percentages summing to 100, mapped to named splits
    * in order.
    *
    * `portableHash = true` derives the bucket from md5 instead of
    * xxhash64: slower per row but reproducible in any engine that has
    * md5 (DuckDB, Trino, Postgres…), so split membership can be
    * re-derived outside Spark. Default stays xxhash64 (codegen'd,
    * fastest at corpus scale).
    */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5),
                   saltCol: Option[String] = None,
                   portableHash: Boolean = false): DataFrame = {
    require(splits.map(_._2).sum == 100, "split weights must sum to 100")
    val salted: Seq[Column] = col(idCol) +: saltCol.map(col).toSeq
    val h =
      if (portableHash) {
        // first 15 hex digits of md5 (60 bits — fits a signed long) of
        // the ""-joined string forms; dual:
        // CAST(('0x' || substring(md5(...), 1, 15)) AS UBIGINT) % 100
        val key = concat_ws("", salted.map(_.cast("string")): _*)
        pmod(conv(substring(md5(key), 1, 15), 16, 10).cast("long"), lit(100L))
      } else pmod(xxhash64(salted: _*), lit(100L))
    val bounds = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    // when-ladder: first matching upper bound wins
    val ladder = splits.zip(bounds).reverse.foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), upper)) => when(h < upper, lit(name)).otherwise(acc)
    }
    df.withColumn("split", ladder)
  }

  /** Deterministic per-stratum sampling: keep a row iff its hash bucket
    * (0–99) falls below the stratum's percentage rate. Reproducible and
    * shuffle-free (a filter), so it composes with any downstream plan;
    * `default` applies to strata missing from `rates`. `portableHash`
    * as in [[assignSplits]].
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       rates: Map[String, Int], default: Int = 0,
                       portableHash: Boolean = false): DataFrame = {
    require((default +: rates.values.toSeq).forall(r => r >= 0 && r <= 100),
      "rates must be percentages in [0, 100]")
    val h =
      if (portableHash)
        pmod(conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long"),
          lit(100L))
      else pmod(xxhash64(col(idCol)), lit(100L))
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (k, r)) => when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.where(h < rate)
  }

  /** Deterministic training-data source mixing: every row of source
    * `s` is emitted `floor(m_s)` times, plus one more copy iff its
    * per-mille hash bucket falls below the fractional remainder — the
    * repeat-small-sources / subsample-large-sources shape of LLM data
    * mixing (multiplicity 2.3 ⇒ two full epochs + a 30% extra-epoch
    * sample; 0.5 ⇒ a half subsample; 0 drops the source). Copies carry
    * a 0-based `_epoch` index so downstream interleaving/shuffling can
    * keep repeats apart. Fully deterministic in the id hash — two runs
    * emit identical mixes, and with `portableHash` any md5-capable
    * engine re-derives membership (q88's DuckDB dual does).
    *
    * Scale: a projection + `explode(sequence(...))` — no shuffle, no
    * RNG state, multiplicities are a literal when-ladder. Rows
    * multiply by at most `ceil(max multiplicity)`, decided per-row
    * inside whole-stage codegen.
    */
  def mixSources(df: DataFrame, sourceCol: String, idCol: String,
                 multiplicity: Map[String, Double], default: Double = 1.0,
                 portableHash: Boolean = false): DataFrame = {
    require((default +: multiplicity.values.toSeq).forall(m => m >= 0 && m <= 100),
      "multiplicities must be in [0, 100]")
    val h =
      if (portableHash)
        pmod(conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long"),
          lit(1000L))
      else pmod(xxhash64(col(idCol)), lit(1000L))
    def epochsOf(m: Double): Long = math.floor(m).toLong
    def permilleOf(m: Double): Long = math.round((m - math.floor(m)) * 1000)
    val ladder = multiplicity.toSeq.sortBy(_._1)
    val epochs = ladder.foldLeft(lit(epochsOf(default))) {
      case (acc, (k, m)) => when(col(sourceCol) === k, lit(epochsOf(m))).otherwise(acc)
    }
    val permille = ladder.foldLeft(lit(permilleOf(default))) {
      case (acc, (k, m)) => when(col(sourceCol) === k, lit(permilleOf(m))).otherwise(acc)
    }
    df.withColumn("_copies", epochs + when(h < permille, lit(1L)).otherwise(lit(0L)))
      .where(col("_copies") > 0)
      .withColumn("_epoch", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_copies")
  }
}
