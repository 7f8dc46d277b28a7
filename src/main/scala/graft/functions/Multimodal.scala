package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition in batches behind the pluggable [[MediaCodec]]
  * boundary. The sandbox ships only the deterministic [[StubMediaCodec]]
  * (no media libraries in this environment); a deployment drops in a
  * JavaCV/FFmpeg-backed codec without touching the operators.
  *
  * Scale design: payloads never shuffle — metadata extraction and
  * featurization are map-side (`mapPartitions`), and downstream analytics
  * select only the small feature/metadata columns so Parquet column
  * pruning keeps the 100 TB of blobs on disk.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class Decoded(width: Int, height: Int, checksum: String,
                           feature: Array[Float])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 checksum: String, width: Int, height: Int,
                                 feature: Array[Float])

  /** The codec boundary: everything a media operator needs from the
    * underlying decode library, per payload. Implementations MUST be
    * serializable (shipped to executors) and thread-agnostic; per-task
    * state (native decoder handles, scratch buffers) belongs in
    * [[MediaCodec.init]], which each partition calls exactly once before
    * its first payload.
    */
  trait MediaCodec extends Serializable {
    /** Per-partition initialization (load native libs, allocate decoder
      * state). Called once per partition before any decode.
      */
    def init(): Unit = ()
    /** Decode one payload → dimensions, checksum, feature vector. */
    def decode(kind: String, payload: Array[Byte]): Decoded
    /** Decode + resample to (targetW, targetH) + re-encode. */
    def resize(kind: String, payload: Array[Byte],
               targetW: Int, targetH: Int): Array[Byte]
    /** Number of decodable frames in a video payload (>= 1). */
    def frameCount(payload: Array[Byte]): Int
    /** Decoded bytes of frame `idx` (0-based, < frameCount). */
    def frameAt(payload: Array[Byte], idx: Int): Array[Byte]
  }

  /** Deterministic stand-in codec — the only implementation available in
    * this sandbox. Every output is pure integer arithmetic over the
    * payload bytes, which keeps the operators oracle-checkable end to
    * end (see `mm_features`' SQL mirror): n = byte count, s = unsigned
    * byte sum, width = n % 640, height = s % 480, checksum = %08x of s,
    * feature[i] = ((s + 31i) % 997) / 997. Frames are fixed 256-byte
    * slices.
    */
  object StubMediaCodec extends MediaCodec {
    private def byteSum(payload: Array[Byte]): Long =
      payload.foldLeft(0L)((a, b) => a + (b & 0xff))

    override def decode(kind: String, payload: Array[Byte]): Decoded = {
      val n = payload.length.toLong
      val sum = byteSum(payload)
      Decoded(width = (n % 640).toInt, height = (sum % 480).toInt,
        checksum = f"$sum%08x",
        feature = Array.tabulate(8)(i => ((sum + i * 31) % 997).toFloat / 997f))
    }

    override def resize(kind: String, payload: Array[Byte],
                        targetW: Int, targetH: Int): Array[Byte] = {
      val srcLen = math.max(payload.length, 1)
      val outLen = math.max(targetW * targetH / 64, 1)
      Array.tabulate(outLen)(i =>
        if (payload.isEmpty) 0.toByte else payload(i % srcLen))
    }

    private val FrameSize = 256

    override def frameCount(payload: Array[Byte]): Int =
      math.max(payload.length / FrameSize, 1)

    override def frameAt(payload: Array[Byte], idx: Int): Array[Byte] = {
      val from = math.min(idx * FrameSize, math.max(payload.length - 1, 0))
      val until = math.min(from + FrameSize, payload.length)
      java.util.Arrays.copyOfRange(payload, from, math.max(until, from))
    }
  }

  /** Real image codec over `javax.imageio` (JPEG/PNG/GIF/BMP — whatever
    * the JRE's registered readers decode): dimensions and features come
    * from actual pixel data, resize is an area-averaged rescale
    * re-encoded as PNG, frames degenerate to 1 (stills). Deterministic:
    * decode → `BufferedImage` pixel access → integer arithmetic, no
    * timestamps or platform color management in the outputs. The 8-dim
    * feature is [mean R, G, B, luma, normalized w, h, aspect, edge
    * energy] — enough signal for the near-dup/embedding operators to
    * compose against real images.
    *
    * This codec and [[StubMediaCodec]] implement the same [[MediaCodec]]
    * trait; the mm_* oracle queries keep the stub (byte-arithmetic is
    * SQL-mirrorable, real decoding is not), production wires this one.
    */
  /** ImageIO's stream wrappers default to DISK-backed caches: every
    * read/write through the InputStream/OutputStream entry points
    * creates (and deletes) a temp FILE per image. Every payload in this
    * engine is an in-memory byte array of a few KB — the memory-cached
    * stream is strictly faster and byte-identical. JVM-global and
    * idempotent; called at the top of every per-task decode/encode loop
    * so executor JVMs flip it too (measured: the mm_video generator +
    * decode paid ~60k temp-file create/deletes per sf0.1 run).
    */
  private[graft] def noDiskImageCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  object ImageIoCodec extends MediaCodec {
    private def read(payload: Array[Byte]): java.awt.image.BufferedImage = {
      noDiskImageCache()
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "undecodable image payload")
      img
    }

    override def decode(kind: String, payload: Array[Byte]): Decoded = {
      val img = read(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var edge = 0L
      var prevLuma = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          sr += r; sg += g; sb += b
          val luma = (299L * r + 587L * g + 114L * b) / 1000L
          if (x > 0) edge += math.abs(luma - prevLuma)
          prevLuma = luma
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val checksum = { // content hash of the DECODED pixels, not the container
        val md = java.security.MessageDigest.getInstance("MD5")
        val bb = java.nio.ByteBuffer.allocate(24)
          .putLong(sr).putLong(sg).putLong(sb)
        md.update(bb.array())
        md.digest().take(4).map(b => f"${b & 0xff}%02x").mkString
      }
      Decoded(width = w, height = h, checksum = checksum,
        feature = Array(
          sr.toFloat / n / 255f, sg.toFloat / n / 255f, sb.toFloat / n / 255f,
          ((299L * sr + 587L * sg + 114L * sb) / 1000L).toFloat / n / 255f,
          math.min(w / 4096f, 1f), math.min(h / 4096f, 1f),
          w.toFloat / math.max(h, 1),
          if (n > w) edge.toFloat / (n - w) / 255f else 0f))
    }

    override def resize(kind: String, payload: Array[Byte],
                        targetW: Int, targetH: Int): Array[Byte] = {
      val src = read(payload)
      val dst = new java.awt.image.BufferedImage(targetW, targetH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", out)
      out.toByteArray
    }

    /** Run `f` against the ImageIO reader registered for the payload's
      * container (GIF gets the JRE's multi-frame GIF reader).
      */
    private def withReader[T](payload: Array[Byte])
                             (f: javax.imageio.ImageReader => T): T = {
      noDiskImageCache()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "undecodable image payload")
        val r = readers.next()
        r.setInput(iis)
        try f(r) finally r.dispose()
      } finally iis.close()
    }

    /** Real frame count: multi-frame containers (animated GIF) report
      * their sequence length; stills report 1.
      */
    override def frameCount(payload: Array[Byte]): Int =
      withReader(payload)(_.getNumImages(true))

    /** Decode frame `idx` and re-encode it standalone as PNG, so each
      * emitted frame is independently decodable downstream (a raw GIF
      * sub-image may be a palette delta against the previous frame).
      */
    override def frameAt(payload: Array[Byte], idx: Int): Array[Byte] =
      withReader(payload) { r =>
        val n = r.getNumImages(true)
        require(idx >= 0 && idx < n, s"frame $idx out of ${n} frames")
        val img = r.read(idx)
        val rgb = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = rgb.createGraphics()
        try g.drawImage(img, 0, 0, null) finally g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(rgb, "png", out)
        out.toByteArray
      }
  }

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

  /** Decode + featurize each payload through the codec — per-partition,
    * so codec init cost amortizes over the batch.
    */
  def decodeAndFeaturize(media: DataFrame,
                         codec: MediaCodec = StubMediaCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      codec.init()
      rows.map { r =>
        val d = codec.decode(r.kind, r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          d.checksum, d.width, d.height, d.feature)
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

  final case class ContainerMeta(media_id: Long, format: String,
                                 duration_ms: Long, width: Int, height: Int,
                                 n_frames: Int, n_keyframes: Int,
                                 key_sum: Long, first_key_offset: Long)

  /** Container-level metadata of MP4/WebM payloads WITHOUT any codec:
    * [[MediaContainers.parse]] per payload, map-side (the payload bytes
    * never shuffle — only this small typed row moves on). `key_sum` is
    * the order-pinning checksum Σ keyframe indices; `first_key_offset`
    * the byte position of the first keyframe (−1 when the container
    * carries no derivable offsets).
    */
  def containerMetadata(media: DataFrame): Dataset[ContainerMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val ci = MediaContainers.parse(payload)
          ContainerMeta(id, ci.format, ci.durationMs, ci.width, ci.height,
            ci.frameCount, ci.keyframes.length,
            ci.keyframes.map(_.toLong).sum,
            ci.keyframeOffsets.headOption.getOrElse(-1L))
        }
      }
  }

  /** Content-hash dedup of binary payloads — the first pass of any
    * multimodal training-data pipeline (identical images/audio recur
    * massively in web-scale corpora). Only (media_id, checksum) enters
    * the shuffle: md5 is computed map-side and the payload bytes never
    * leave their scan partitions. Same group semantics and same
    * two-phase shape as [[graft.functions.Dedup.exact]]: canonical =
    * min media_id per checksum group via groupBy partial aggregation +
    * join-back (a web-scale corpus has mega-dup payloads — a
    * count-over-window on checksum would colocate each such group on
    * one task; the partial agg collapses it map-side).
    */
  def dedupByContent(media: DataFrame): DataFrame = {
    val hashed = media.select(col("media_id"), md5(col("payload")).as("checksum"))
    val stats = hashed.groupBy(col("checksum").as("__ck"))
      .agg(min(col("media_id")).as("canonical_id"), count(lit(1)).as("group_size"))
    hashed.join(stats, col("checksum") <=> col("__ck"))
      .drop("__ck")
      .withColumn("is_duplicate", col("media_id") =!= col("canonical_id"))
  }

  final case class ResizedMedia(media_id: Long, kind: String,
                                width: Int, height: Int, payload: Array[Byte])

  /** Resample every payload to (targetW, targetH) through the codec —
    * one row in, one row out, map-side only (payloads never shuffle).
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int,
             codec: MediaCodec = StubMediaCodec): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      codec.init()
      rows.map { r =>
        ResizedMedia(r.media_id, r.kind, targetW, targetH,
          codec.resize(r.kind, r.payload, targetW, targetH))
      }
    }
  }

  final case class PHashRow(media_id: Long, phash: Long)

  /** Perceptual difference-hash (dHash, Krawetz): resample the payload
    * to a 64+1-value row through the codec and take the 64 adjacent
    * unsigned greater-than bits — near-identical images differ in a few
    * bits where a cryptographic hash differs in all of them. Map-side
    * through the per-partition codec; only (id, 64-bit hash) moves on.
    */
  def perceptualHash(media: DataFrame,
                     codec: MediaCodec = StubMediaCodec): Dataset[PHashRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    // empty payloads carry no pixels to hash: they would all collide on
    // phash 0 and pair quadratically, and the oracle filters them too
    media.filter(length(col("payload")) > 0).as[MediaRow].mapPartitions { rows =>
      codec.init()
      rows.map { r =>
        val b = codec.resize(r.kind, r.payload, 64, 65) // 65 values
        var h = 0L
        var i = 0
        while (i < 64 && i + 1 < b.length) {
          if ((b(i) & 0xff) > (b(i + 1) & 0xff)) h |= 1L << i
          i += 1
        }
        PHashRow(r.media_id, h)
      }
    }
  }

  final case class VideoPhashRow(media_id: Long, frame_idx: Int,
                                 frame_w: Int, frame_h: Int, phash: Long)

  /** I-frame perceptual hash for intra-coded video (the MJPEG-style
    * shape: every sample a standalone JPEG/PNG image), MP4 AND WebM:
    * slice each keyframe's exact bytes out of the container
    * ([[MediaContainers.mp4KeyframeSpans]] — stss × stsz × stco — or
    * [[MediaContainers.webmKeyframeSpans]] — keyflagged SimpleBlocks),
    * decode it standalone with ImageIO, and dHash the 65 column-mean
    * lumas (integer 299/587/114 luma, integer means — adjacent
    * greater-than bits, same convention as [[perceptualHash]]). This
    * extends perceptual near-dup detection from images to video without
    * a codec dependency: intra frames decode through the same
    * `javax.imageio` path the image rows use. Map-side only — payloads
    * never shuffle; only (id, frame, dims, 64-bit hash) rows move on.
    *
    * ==Decode contract (explicit boundary, not an implementation
    * detail)==
    * Coverage is INTRA-ONLY keyframes: each keyframe's byte span must be
    * a standalone `javax.imageio`-decodable image (JPEG/PNG/BMP/GIF —
    * the MJPEG-in-MP4 / MJPEG-in-WebM family). Inter-frame codecs
    * (H.264, H.265, VP9, AV1) are OUT OF SCOPE BY DESIGN: their
    * keyframes need a codec library this engine deliberately does not
    * depend on. A keyframe that ImageIO cannot decode fails LOUDLY
    * (named media id + frame index + this contract), never silently
    * skips — silent skips would undercount scene cuts and phash dups
    * with no signal to the caller. Container parsing (MP4 stss/stsz/
    * stco, WebM SimpleBlocks) is codec-agnostic and stays in scope.
    */
  def videoKeyframePhash(media: DataFrame): Dataset[VideoPhashRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // Content-addressed decode memo, PER TASK (constructed here, dies
      // with the partition — never a cross-run or cross-query cache):
      // re-uploaded/re-muxed media repeat identical keyframe bytes, and
      // decoding identical bytes is the classic redundant work of a
      // video dedup pass. dHash is a pure function of the bytes, so a
      // byte-equal span short-circuits the ImageIO decode. Bounded: the
      // memo resets at 8192 entries (worst case all-distinct frames =
      // pre-memo behavior plus a hash probe).
      val memo = new java.util.HashMap[java.nio.ByteBuffer, VideoPhashRow]()
      noDiskImageCache()
      rows.flatMap { r =>
        val spans =
          if (MediaContainers.isMp4(r.payload))
            MediaContainers.mp4KeyframeSpans(r.payload)
          else if (MediaContainers.isWebm(r.payload))
            MediaContainers.webmKeyframeSpans(r.payload)
          else throw new IllegalArgumentException(
            s"media ${r.media_id}: neither MP4 nor WebM")
        spans.map { case (k, off, len) =>
          val key = java.nio.ByteBuffer.wrap(
            java.util.Arrays.copyOfRange(r.payload, off.toInt, off.toInt + len))
          val hit = memo.get(key)
          val dec = if (hit != null) hit else {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload, off.toInt, len))
            require(img != null,
              s"media ${r.media_id} keyframe $k: not a standalone " +
                "ImageIO-decodable image. videoKeyframePhash covers " +
                "INTRA-ONLY video (MJPEG-style JPEG/PNG samples); " +
                "inter-frame codecs (H.264/H.265/VP9/AV1) are out of " +
                "scope by design — transcode keyframes to MJPEG upstream " +
                "or extract stills with a codec-equipped tool first")
            val (w, h) = (img.getWidth, img.getHeight)
            // 65 sampled columns spread across the width (c*(w-1)/64 —
            // for a 65-px frame that is column c exactly), integer mean
            // luma down each column, 64 adjacent comparisons
            val colLuma = Array.tabulate(65) { c =>
              val x = c * (w - 1) / 64
              var sum = 0L
              var y = 0
              while (y < h) {
                val rgb = img.getRGB(x, y)
                sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff)
                  + 114L * (rgb & 0xff)) / 1000L
                y += 1
              }
              sum / h
            }
            var bits = 0L
            var i = 0
            while (i < 64) {
              if (colLuma(i) > colLuma(i + 1)) bits |= 1L << i
              i += 1
            }
            val row = VideoPhashRow(0L, 0, w, h, bits)
            if (memo.size >= 8192) memo.clear()
            memo.put(key, row)
            row
          }
          VideoPhashRow(r.media_id, k, dec.frame_w, dec.frame_h, dec.phash)
        }
      }
    }
  }

  /** Shot-boundary (scene-cut) detection over the keyframe stream: the
    * perceptual-hash flavor of the classic frame-difference detector —
    * successive keyframes whose dHashes differ by more than
    * `cutHamming` bits start a new scene. Returns one row per keyframe
    * with the Hamming distance to its predecessor (null for the first),
    * the cut flag, and a running scene index — the per-scene sampling
    * key a video-curation pipeline dedups/samples on (one frame per
    * scene instead of every-Nth-frame redundancy).
    *
    * Scale shape: hashing is [[videoKeyframePhash]]'s map-side pass;
    * only (id, frame, hash) rows shuffle into the per-video lag/cumsum
    * windows — keyframe counts per video are small by construction.
    */
  def videoSceneCuts(media: DataFrame, cutHamming: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ph = videoKeyframePhash(media).toDF()
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx").asc)
    val prev = lag(col("phash"), 1).over(w)
    ph.withColumn("hamming_prev",
        when(prev.isNotNull,
          bit_count(col("phash").bitwiseXOR(prev))).cast("int"))
      .withColumn("is_cut",
        coalesce(col("hamming_prev") > cutHamming, lit(false)))
      .withColumn("scene_idx",
        sum(col("is_cut").cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("int"))
      .select(col("media_id"), col("frame_idx"), col("phash"),
        col("hamming_prev"), col("is_cut"), col("scene_idx"))
  }

  /** Deterministic 65×`h` PNG intra frame whose column `x` is the flat
    * gray `(x * mult + add) % 256` — PNG is lossless, so decoding
    * replays the integer formula exactly (the fixture the video-phash
    * oracle recomputes algebraically).
    */
  def pngColumnFrame(mult: Int, add: Int, h: Int = 3): Array[Byte] = {
    noDiskImageCache()
    val img = new java.awt.image.BufferedImage(65, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < 65) {
      val l = ((x * mult + add) % 256 + 256) % 256
      val rgb = (l << 16) | (l << 8) | l
      var y = 0
      while (y < h) { img.setRGB(x, y, rgb); y += 1 }
      x += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Perceptual near-dup pairs: band the 64-bit dHash into 4×16-bit
    * keys (two hashes within Hamming distance 3 of each other share at
    * least one intact band — the SimHash pigeonhole), equi-join on the
    * bands, verify with bit_count(xor) ≤ `maxHamming`. Candidates are
    * band-bucket equi-joins, never all-pairs.
    */
  def phashPairs(media: DataFrame, maxHamming: Int = 2,
                 codec: MediaCodec = StubMediaCodec): DataFrame = {
    val h = perceptualHash(media, codec).toDF()
    val bands = h.select(col("media_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("band_idx"))
      .withColumn("band_key",
        expr("shiftright(phash, CAST(band_idx * 16 AS INT)) & 65535"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.phash").as("ha"), col("b.phash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming",
        expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  final case class MediaFrame(media_id: Long, frame_idx: Int, t_ms: Long,
                              frame: Array[Byte])

  /** Sample every `everyNth` frame up to `maxFrames` from each video —
    * the one-to-many explode shape, frame indexing, timestamping, and
    * output bound live in the operator; the demux/decode lives in the
    * codec.
    */
  def sampleFrames(media: DataFrame, everyNth: Int = 10, maxFrames: Int = 8,
                   fps: Double = 25.0,
                   codec: MediaCodec = StubMediaCodec): Dataset[MediaFrame] = {
    require(everyNth >= 1 && maxFrames >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow].mapPartitions { rows =>
      codec.init()
      rows.flatMap { r =>
        val total = codec.frameCount(r.payload)
        (0 until total by everyNth).take(maxFrames).map { idx =>
          MediaFrame(r.media_id, idx, math.round(idx / fps * 1000),
            codec.frameAt(r.payload, idx))
        }
      }
    }
  }
}
