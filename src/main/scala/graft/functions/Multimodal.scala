package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition in batches. The decode itself is STUBBED (no media libs
  * in this environment) behind a deterministic fake — the Spark-side
  * plumbing (schema, partitioning, batch shape) is real and tested.
  *
  * Scale design: payloads never shuffle — metadata extraction and
  * featurization are map-side (`mapPartitions`), and downstream analytics
  * select only the small feature/metadata columns so Parquet column
  * pruning keeps the 100 TB of blobs on disk.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 checksum: String, width: Int, height: Int,
                                 feature: Array[Float])

  /** Wrap a text table as fake media payloads (utf-8 bytes) — the
    * stand-in corpus for plumbing tests at any SF.
    */
  def documentsAsMedia(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/documents.parquet").select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
  }

  /** STUB decode: a real deployment calls the codec here (per-partition,
    * so codec init cost amortizes over the batch). The fake is
    * deterministic: "dimensions" and an 8-dim "feature" derived from the
    * bytes — enough to pin schema, nullability, and batch behavior.
    */
  def decodeAndFeaturize(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition "codec init" happens once here in a real pipeline
      rows.map { r =>
        val n = r.payload.length.toLong
        val sum = r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
        val feature = Array.tabulate(8)(i => ((sum + i * 31) % 997).toFloat / 997f)
        MediaFeatures(r.media_id, r.kind, n, f"$sum%08x",
          width = (n % 640).toInt, height = (sum % 480).toInt, feature)
      }
    }
  }

  /** Metadata-only pass (no decode): pure column expressions — the shape
    * every 100 TB pipeline should use before deciding what to decode.
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("checksum"))
}
