package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode kernels are
  * DETERMINISTIC FAKES (clearly marked below) — the Spark-side contract is
  * real: schemas, batch shape (mapPartitions = one iterator per task, the
  * Scala analog of `mapInPandas` batches), partition sizing, and metadata
  * propagation are exactly what a real decoder would plug into.
  */
object MultimodalOps {

  /** Typed metadata carried alongside every blob. */
  case class MediaMeta(mediaType: String, byteLen: Long, width: Int, height: Int,
                       sampleRateHz: Int, durationMs: Long)

  case class MediaRow(mediaId: Long, content: Array[Byte], meta: MediaMeta)

  case class Feature(mediaId: Long, featNorm: Double, dims: Int)

  /** Wrap a text corpus as opaque binary blobs + typed metadata — stands in
    * for `spark.read.format("binaryFile")` in this container. The blob is
    * the UTF-8 text; metadata fields are derived deterministically.
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("mediaType"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("byteLen"),
        (pmod(col(idCol), lit(640)) + 32).cast("int").as("width"),
        (pmod(col(idCol), lit(480)) + 32).cast("int").as("height"),
        lit(16000).as("sampleRateHz"),
        (pmod(col(idCol), lit(30000)) + 1000).cast("long").as("durationMs")
      ).as("meta"))

  /** STUB DECODE: a real implementation would decode image bytes here
    * (e.g. via javax.imageio / ffmpeg on the executor). This fake derives a
    * deterministic "feature norm" from the bytes so the distributed
    * plumbing (mapPartitions over binary batches, typed output) is testable.
    */
  def decodeFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[Feature] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // One iterator per task — batch-shaped like mapInPandas; a real codec
      // would be initialized once per partition HERE, not per row.
      it.map { m =>
        val checksum = m.content.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
        Feature(m.mediaId, (checksum % 100000).toDouble / 100000.0, dims = 512)
      }
    }
  }

  /** STUB RESIZE: metadata-only transform of the typed struct (a real
    * kernel would also rewrite `content`). Demonstrates nested-struct
    * column surgery without exploding the blob.
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("meta.width"),
      lit(maxH.toDouble) / col("meta.height"),
      lit(1.0))
    media.withColumn("meta", struct(
      col("meta.mediaType").as("mediaType"),
      col("meta.byteLen").as("byteLen"),
      floor(col("meta.width") * scale).cast("int").as("width"),
      floor(col("meta.height") * scale).cast("int").as("height"),
      col("meta.sampleRateHz").as("sampleRateHz"),
      col("meta.durationMs").as("durationMs")))
  }

  /** STUB FRAME SAMPLE: one row per sampled frame timestamp (every
    * `everyMs`), capped at `maxFrames` — pure `explode`, the real decoder
    * would fetch the frame bytes per emitted timestamp.
    */
  def sampleFrames(media: DataFrame, everyMs: Long, maxFrames: Int = 32): DataFrame =
    media
      .where(col("meta.mediaType") === "video")
      .select(
        col("media_id"),
        explode(sequence(lit(0L),
          least(col("meta.durationMs"), lit(everyMs * (maxFrames - 1))),
          lit(everyMs))).as("frame_ts_ms"))
}
