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

  final case class ResizedMedia(media_id: Long, kind: String,
                                width: Int, height: Int, payload: Array[Byte])

  /** STUB resize: a real deployment decodes, resamples to
    * (targetW, targetH), re-encodes — per partition so codec init
    * amortizes. The fake is deterministic (payload cyclically resampled
    * to the target pixel budget) and pins the real contracts: output
    * schema, one-row-in-one-row-out, size proportional to target dims,
    * map-side only (payloads never shuffle).
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition "codec init" happens once here in a real pipeline
      rows.map { r =>
        val srcLen = math.max(r.payload.length, 1)
        val outLen = math.max(targetW * targetH / 64, 1)
        val out = Array.tabulate(outLen)(i =>
          if (r.payload.isEmpty) 0.toByte else r.payload(i % srcLen))
        ResizedMedia(r.media_id, r.kind, targetW, targetH, out)
      }
    }
  }

  final case class MediaFrame(media_id: Long, frame_idx: Int, t_ms: Long,
                              frame: Array[Byte])

  /** STUB frame sampling: a real deployment demuxes the container and
    * decodes every `everyNth` frame up to `maxFrames` — the one-to-many
    * explode shape, frame indexing, timestamping, and output bound are
    * the real contracts pinned here. The fake treats the payload as
    * fixed-size 256-byte "frames".
    */
  def sampleFrames(media: DataFrame, everyNth: Int = 10, maxFrames: Int = 8,
                   fps: Double = 25.0): Dataset[MediaFrame] = {
    require(everyNth >= 1 && maxFrames >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val frameSize = 256
        val total = math.max(r.payload.length / frameSize, 1)
        (0 until total by everyNth).take(maxFrames).map { idx =>
          val from = math.min(idx * frameSize, math.max(r.payload.length - 1, 0))
          val until = math.min(from + frameSize, r.payload.length)
          MediaFrame(r.media_id, idx, math.round(idx / fps * 1000),
            java.util.Arrays.copyOfRange(r.payload, from, math.max(until, from)))
        }
      }
    }
  }
}
