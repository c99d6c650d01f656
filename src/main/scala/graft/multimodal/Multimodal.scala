package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.8): media as opaque `binary`
  * payloads + a typed metadata struct, processed by partition-
  * preserving `mapPartitions` stages shaped like real codec batches.
  *
  * The DECODE step is a clearly-marked deterministic STUB — image/
  * audio codec libraries are not in this container — but everything
  * Spark-side is real and load-bearing at scale: the schema, the
  * binary column lifecycle, the batch-at-a-time iterator shape (a real
  * decoder amortizes model/codec init per PARTITION, not per row), and
  * the fact that no stage shuffles (features ride the same partitions
  * as payloads; only the caller's final aggregation may shuffle).
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

  /** STUB decode: byte-histogram + moments standing in for a codec +
    * feature extractor. Deterministic: same payload → same features.
    * Replace the body marked below with a real decoder (e.g. JNI
    * image lib) without touching the Spark plumbing. */
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
