package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with the decode/feature kernels STUBBED
  * (the container ships no image/audio codecs) behind deterministic
  * fakes — the Spark-side plumbing (schema, partition-preserving
  * mapPartitions, batch shape) is real and tested.
  *
  * At scale the payload column dominates bytes; the design keeps
  * payloads out of every shuffle: metadata-only projections for
  * filtering/routing, and per-partition streaming decode so one task
  * holds one batch of payloads at a time.
  */
object Multimodal {

  /** Canonical multimodal asset schema. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("mime", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** Wrap raw binary rows into the canonical asset schema. */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String,
               modality: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("asset_id"),
      lit(modality).as("modality"),
      lit(mime).as("mime"),
      col(payloadCol).cast(BinaryType).as("payload"),
      map(lit("source"), lit("graft")).as("meta"))

  /** STUB decode kernel: a real deployment would decode the payload
    * (JPEG → pixels, WAV → PCM) inside this per-partition loop using a
    * native codec. The container has none, so the "feature" is a
    * deterministic 8-dim byte-statistics vector — same signature, same
    * batch shape, same partitioning behavior as the real kernel.
    */
  def extractFeatures(assets: DataFrame, dims: Int = 8): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    assets.select("asset_id", "modality", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val modality = r.getString(1)
        val payload = if (r.isNullAt(2)) Array.emptyByteArray else r.getAs[Array[Byte]](2)
        // deterministic fake: bucketed byte histogram, L1-normalized
        val hist = new Array[Float](dims)
        var i = 0
        while (i < payload.length) {
          hist(java.lang.Byte.toUnsignedInt(payload(i)) % dims) += 1f
          i += 1
        }
        val total = math.max(1f, payload.length.toFloat)
        Row(id, modality, payload.length.toLong, hist.map(_ / total).toSeq)
      }
    }(enc)
  }

  /** Metadata-only projection — the common routing/filter path must
    * never deserialize payloads; Parquet column pruning guarantees the
    * payload column is not even read.
    */
  def metadataOnly(assets: DataFrame): DataFrame =
    assets.select(col("asset_id"), col("modality"), col("mime"),
      length(col("payload")).as("payload_bytes"), col("meta"))

  /** Deterministic synthetic asset table derived from any source table
    * — used by tests and the harness since no real binaries ship.
    */
  def syntheticAssets(src: DataFrame, idCol: String, seedCol: String): DataFrame =
    src.select(
      col(idCol).cast(LongType).as("asset_id"),
      when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video").as("modality"),
      lit("application/octet-stream").as("mime"),
      // payload = utf8 bytes of the seed column (deterministic fake)
      encode(col(seedCol).cast(StringType), "UTF-8").as("payload"),
      map(lit("origin"), lit("synthetic")).as("meta"))
}
