package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (builder brief): image/audio/video as
  * opaque `binary` columns with typed metadata, processed by batched
  * executor-side decoders.
  *
  * The container has no image/audio libraries, so the DECODE step is a
  * deterministic stub behind [[MediaDecoder]] (clearly marked); the
  * Spark-side plumbing — schema, binary payloads, partition-local
  * batched iteration, the exact batch shape a vectorized
  * (Arrow/`mapInPandas`-style) UDF would see — is real and tested. In
  * Scala the idiomatic analog of a Pandas UDF is `mapPartitions` over a
  * typed Dataset with explicit internal batching: each executor thread
  * pulls `batchSize` rows, hands the batch to the decoder (where a real
  * implementation would call libjpeg/ffmpeg once per batch), and emits
  * typed rows. No driver materialization anywhere.
  */
object Media {

  /** A media row: opaque payload + typed metadata, the schema a 100 TB
    * multimodal lake table would carry per modality. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded features. For images: width/height/channels; the stub
    * derives them deterministically from the payload bytes. */
  case class MediaFeatures(media_id: Long, n_bytes: Int, width: Int,
                           height: Int, channels: Int)

  /** Batched decoder contract — one call per `batchSize` rows, the
    * vectorized-UDF batch shape. Implementations must be Serializable
    * (shipped to executors). */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** STUB decode (no media libs in this container): pure deterministic
    * function of the payload bytes, so tests and the SQL oracle can
    * reproduce it. A real decoder swaps in behind the same trait. */
  object StubDecoder extends MediaDecoder {
    override def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { m =>
        val n = m.payload.length
        MediaFeatures(m.media_id, n,
          width = n % 640 + 1,
          height = (if (n > 0) m.payload(0) & 0xff else 0) + 1,
          channels = 3)
      }
  }

  /** Derive a media table from `documents`: payload = UTF-8 bytes of
    * the text (a stand-in for real image bytes with the same binary
    * schema). kind rotates to exercise per-modality partitioning. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"))

  /** The decode operator: typed Dataset -> mapPartitions with internal
    * batching -> typed features. Narrow (no shuffle); scales with
    * partition count. */
  def decode(spark: SparkSession, media: DataFrame,
             decoder: MediaDecoder, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(b => decoder.decodeBatch(b)))
  }

  /** Resized media row: payload transformed binary -> binary. */
  case class ResizedRow(media_id: Long, kind: String, payload: Array[Byte],
                        orig_bytes: Int)

  /** Resize: binary -> binary transform through the same batched
    * executor path as decode. STUB transform (no image libs): truncate
    * the payload to `maxBytes` — a real implementation decodes,
    * scales, re-encodes per batch behind the same signature. */
  def resize(spark: SparkSession, media: DataFrame,
             maxBytes: Int, batchSize: Int = 64): Dataset[ResizedRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { m =>
        ResizedRow(m.media_id, m.kind, m.payload.take(maxBytes),
          m.payload.length)
      }))
  }

  /** Feature extraction: payload -> fixed-dim Float embedding. STUB:
    * a deterministic byte-histogram projection (8 buckets of byte
    * values, L1-normalized) — the schema, batch shape, and typed
    * Array[Float] output column are exactly what a real CLIP/wav2vec
    * extractor produces. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { m =>
        val hist = new Array[Float](8)
        m.payload.foreach(b => hist((b & 0xff) / 32) += 1f)
        val n = math.max(m.payload.length, 1).toFloat
        (m.media_id, hist.map(_ / n))
      }))
      .toDF("media_id", "embedding")
  }

  /** Frame sampling: one row per sampled frame index — the video
    * analog of explode. Frame count is derived metadata (stub: one
    * frame per 100 bytes, every `stride`-th frame kept). */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame =
    media
      .withColumn("n_frames",
        greatest((length(col("payload")) / 100).cast("int"), lit(1)))
      .select(col("media_id"), col("kind"),
        explode(expr(s"sequence(0, n_frames - 1, $stride)")).as("frame_no"))
}
