package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.8): media as opaque `binary`
  * payloads + a typed metadata struct, processed by partition-
  * preserving `mapPartitions` stages shaped like real codec batches.
  *
  * IMAGE decode is REAL (round 9): [[decodeImageStats]] decodes
  * actual encoded bytes via the JDK's ImageIO (PNG/JPEG/BMP/GIF) and
  * extracts exact integer pixel statistics. Only the codecs the JDK
  * does not ship (audio, video) keep the clearly-marked deterministic
  * byte-histogram STUB in [[decodeAndFeaturize]]. Everything
  * Spark-side is identical between the two paths and load-bearing at
  * scale: the schema, the binary column lifecycle, the batch-at-a-time
  * iterator shape (a real decoder amortizes codec init per PARTITION,
  * not per row), and the fact that no stage shuffles (features ride
  * the same partitions as payloads; only the caller's final
  * aggregation may shuffle).
  */
object Multimodal {

  /** Typed media row: payload + metadata, the on-wire schema a media
    * lakehouse table would carry. */
  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      hist_digest: Long, // xxhash-style digest of the 16-bin byte histogram
      mean_byte_bp: Long, // mean byte value in basis points (0..2_550_000)
      frames_sampled: Int)

  /** Per-image exact pixel statistics from a REAL decode — the typed
    * output of [[decodeImageStats]]. All integer units: channel sums
    * are exact (8-bit values summed as longs), so the gate can compare
    * hash-exact against an arithmetic oracle with no float anywhere. */
  case class ImagePixelStats(
      media_id: Long,
      width: Long,
      height: Long,
      n_pixels: Long,
      r_sum: Long,
      g_sum: Long,
      b_sum: Long)

  /** Deterministic RGB test image: pixel (x,y) of image `mediaId` has
    * channels ((7·id+3x+5y) mod 256, (11·id+5x+7y) mod 256,
    * (13·id+7x+11y) mod 256) — pure integer arithmetic restatable in
    * any SQL engine, which is what lets a REAL codec roundtrip sit
    * under a hash-exact gate: the oracle enumerates the pixel grid
    * arithmetically while Spark actually encodes and decodes bytes. */
  def pixelChannels(mediaId: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((mediaId * 7 + 3L * x + 5L * y) % 256).toInt,
    ((mediaId * 11 + 5L * x + 7L * y) % 256).toInt,
    ((mediaId * 13 + 7L * x + 11L * y) % 256).toInt)

  /** Encode the deterministic test image as real PNG bytes via the
    * JDK's ImageIO. TYPE_INT_RGB + PNG is lossless, so a decode must
    * reproduce the pixel function bit-exactly. */
  def encodePng(mediaId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixelChannels(mediaId, x, y)
        px(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val out = new java.io.ByteArrayOutputStream(w * h / 2)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode + feature extraction (round 9 — this replaces
    * the "decode is a stub" caveat for every codec the JDK ships:
    * PNG, JPEG, BMP, GIF, WBMP). `ImageIO.read` sniffs the container
    * from the bytes, so the column needs no format tag. Exact integer
    * pixel stats per image: dimensions from the DECODED image and
    * per-channel sums over every pixel.
    *
    * Plumbing is the same partition-preserving mapPartitions contract
    * as [[decodeAndFeaturize]]: no shuffle, per-partition init (the
    * in-memory-cache switch) hoisted out of the row loop, and an
    * undecodable or NULL payload degrades to a zero-stats row instead
    * of killing the stage — at 100 TB some fraction of any crawl's
    * media bytes IS corrupt, and one bad file must not fail a task
    * that has decoded a million good ones. */
  def decodeImageStats(media: Dataset[(Long, Array[Byte])]): Dataset[ImagePixelStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-PARTITION init: ImageIO's default stream cache spools
      // through a TEMP FILE per image — a disk write/delete pair per
      // row. In-memory cache turns decode into pure CPU. (Global
      // JVM switch; idempotent, safe under concurrent tasks.)
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, payload) =>
        val img =
          if (payload == null || payload.length == 0) null
          else
            // NonFatal, not just IOException: ImageIO.read returns null
            // only for UNRECOGNIZED containers — bytes that sniff as a
            // known format but carry corrupt headers make the JDK
            // readers throw unchecked exceptions (AIOOBE/NegativeArray
            // from BMP/GIF, CMMException from broken JPEG ICC
            // profiles), which would kill the task despite this
            // stage's degrade-to-zero-stats contract
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) ImagePixelStats(id, 0L, 0L, 0L, 0L, 0L, 0L)
        else {
          val w = img.getWidth; val h = img.getHeight
          // one bulk getRGB: a per-pixel getRGB(x,y) call re-resolves
          // the color model per pixel; the bulk form converts the
          // raster in one pass regardless of the file's layout
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var r = 0L; var g = 0L; var b = 0L
          var i = 0
          while (i < px.length) {
            val p = px(i)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            i += 1
          }
          ImagePixelStats(id, w.toLong, h.toLong, w.toLong * h, r, g, b)
        }
      }
    }
  }

  /** REAL nearest-neighbor pixel resize on a decoded raster (round 9 —
    * makes the resize stage real pixel work, not just the metadata
    * plan of [[resizePlan]]): clamp the longer side to `maxSide`, exact
    * integer output dims `ceil(side·maxSide / longer)`, source pixel
    * for destination (dx,dy) = (dx·w div ow, dy·h div oh). All-integer
    * arithmetic so an arithmetic oracle can enumerate the same sample
    * grid — the same trick that puts the codec roundtrip under a hash
    * gate. Images already within `maxSide` pass through untouched. */
  def resizeNearest(img: java.awt.image.BufferedImage, maxSide: Int)
      : java.awt.image.BufferedImage = {
    val w = img.getWidth; val h = img.getHeight
    val m = math.max(w, h)
    if (m <= maxSide) return img
    val ow = (w * maxSide + m - 1) / m
    val oh = (h * maxSide + m - 1) / m
    val src = img.getRGB(0, 0, w, h, null, 0, w)
    val dst = new Array[Int](ow * oh)
    var dy = 0
    while (dy < oh) {
      val sy = dy * h / oh
      var dx = 0
      while (dx < ow) {
        dst(dy * ow + dx) = src(sy * w + dx * w / ow)
        dx += 1
      }
      dy += 1
    }
    val out = new java.awt.image.BufferedImage(
      ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    out.setRGB(0, 0, ow, oh, dst, 0, ow)
    out
  }

  /** Decode + REAL resize + feature extraction in one partition-
    * preserving stage: [[decodeImageStats]]'s contract (NonFatal-
    * tolerant decode, zero-stats degradation) with [[resizeNearest]]
    * applied to the decoded raster before the channel sums, so the
    * stats describe the RESIZED image a training pipeline would
    * actually store. */
  def decodeResizeStats(media: Dataset[(Long, Array[Byte])], maxSide: Int)
      : Dataset[ImagePixelStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, payload) =>
        val img =
          if (payload == null || payload.length == 0) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) ImagePixelStats(id, 0L, 0L, 0L, 0L, 0L, 0L)
        else {
          // sample the source raster directly on [[resizeNearest]]'s
          // exact grid instead of materializing the resized image —
          // the stats are the output here, so building a second
          // BufferedImage (+ setRGB/getRGB color-model passes) per
          // image is pure overhead; ResizeSampleSpec-pinned equal to
          // resizeNearest's pixels
          val w = img.getWidth; val h = img.getHeight
          val m = math.max(w, h)
          val (ow, oh) =
            if (m <= maxSide) (w, h)
            else ((w * maxSide + m - 1) / m, (h * maxSide + m - 1) / m)
          val src = img.getRGB(0, 0, w, h, null, 0, w)
          var r = 0L; var g = 0L; var b = 0L
          var dy = 0
          while (dy < oh) {
            val rowOff = (dy * h / oh) * w
            var dx = 0
            while (dx < ow) {
              val p = src(rowOff + dx * w / ow)
              r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
              dx += 1
            }
            dy += 1
          }
          ImagePixelStats(id, ow.toLong, oh.toLong, ow.toLong * oh, r, g, b)
        }
      }
    }
  }

  /** STUB decode for the codecs the JDK does NOT ship (audio, video):
    * byte-histogram + moments standing in for a codec + feature
    * extractor. Deterministic: same payload → same features. Image
    * payloads have the REAL path above ([[decodeImageStats]]); replace
    * this body with e.g. a JNI media lib without touching the Spark
    * plumbing. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // >>> per-PARTITION init would go here (codec contexts, models).
      rows.map { m =>
        // >>> STUB DECODE: a real implementation decodes m.payload via
        // >>> an image/audio codec. This deterministic fake computes a
        // >>> 16-bin byte histogram + mean as the "features".
        // A NULL payload (missing/corrupt media — inevitable in a
        // large corpus) must not kill the job mid-stage: featurize it
        // as zero-length media (n_bytes 0 is the downstream signal),
        // the same posture a real codec stage takes on undecodable
        // input.
        val payload = if (m.payload == null) Array.emptyByteArray else m.payload
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < payload.length) {
          val b = payload(i) & 0xff
          hist(b >> 4) += 1
          sum += b
          i += 1
        }
        var digest = 1125899906842597L
        var j = 0
        while (j < hist.length) { digest = digest * 31 + hist(j); j += 1 }
        val frames = frameSampleCount(m.n_frames)
        MediaFeatures(
          m.media_id, m.kind, payload.length.toLong, digest,
          if (payload.length == 0) 0L else sum * 10000L / payload.length,
          frames)
      }
    }
  }

  /** Sampling stride shared by the pipeline and the metadata gate
    * query (and restated in its SQL oracle). */
  val FrameStride = 10

  /** Deterministic frame-sampling plan: every `every`-th frame,
    * always including frame 0 for non-empty media. */
  def frameSampleCount(nFrames: Int, every: Int = FrameStride): Int =
    if (nFrames <= 0) 0 else (nFrames + every - 1) / every

  /** Resize metadata transform (pure column math — the pixel work
    * happens inside the stubbed decode at scale): clamp the longer
    * side to `maxSide` preserving aspect ratio. */
  def resizePlan(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    df.withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }
}
