package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.similarity.Similarity

/** Image near-dup deduplication via perceptual hash (round 10) — the
  * multimodal member of the dedup family a 100 TB image-text pipeline
  * actually runs (CCNet-for-images): decode each image, fingerprint it
  * with a 64-bit dHash over the decoded raster, and find all pairs
  * within a small hamming radius WITHOUT any all-pairs comparison,
  * reusing the exact Manku block-combination blocking the simhash text
  * dedup runs ([[Similarity.simhashBlockCombos]] — the blocking is
  * generic over any 64-bit code).
  *
  * The gate corpus plants the two variant classes a crawl actually
  * contains: the SAME image re-encoded at a different size (2× upscale
  * — dHash is scale-invariant by construction, so these collide at
  * hamming 0) and a lightly retouched image (a corner overlay — a few
  * luma samples move, landing within a few bits). Both the dHash and
  * the pair set are pure integer arithmetic over a deterministic pixel
  * grid, so the DuckDB oracle restates the ENTIRE pipeline (hash bits
  * via the sample grid, pairs via all-pairs xor/bit_count — all-pairs
  * is the oracle's job, never Spark's) and the gate is hash-exact even
  * though Spark really encodes and decodes PNG bytes.
  */
object ImageDedupQueries {

  /** Pairs at or under this hamming distance are near-dups. C(5,2)
    * block-combination blocking is complete for <= 3 (Manku WWW'07). */
  val MaxHamming = 3

  /** Encoded phash gate corpus: (media_id, png bytes).
    *  - every doc: the base image (w = id%48+16, h = id%32+16) on the
    *    high-frequency [[Multimodal.phashPixelChannels]] grid;
    *  - every doc: a 2× nearest-neighbor UPSCALE re-encode (+1e6) —
    *    raster (x,y) = base(x div 2, y div 2), the cheap re-host
    *    variant an image crawl sees constantly;
    *  - docs % 5 == 0: a RETOUCHED copy (+2e6) — the base image with
    *    an inverted 4×4 top-left corner (a logo/watermark stand-in).
    */
  def encodedCorpus(spark: SparkSession, dir: String) = {
    import spark.implicits._
    val base = Tables.widened(Tables.documents(spark, dir))
      .select($"doc_id",
        (pmod($"doc_id", lit(48)) + 16).cast("int").as("w"),
        (pmod($"doc_id", lit(32)) + 16).cast("int").as("h"))
    val variants = base.select($"doc_id".as("media_id"), $"doc_id".as("base"),
        $"w", $"h", lit(1).as("sc"), lit(false).as("pert"))
      .unionAll(base.select(graft.Tables.synthId($"doc_id").as("media_id"), $"doc_id".as("base"),
        $"w", $"h", lit(2).as("sc"), lit(false).as("pert")))
      .unionAll(base.filter($"doc_id" % 5 === 0)
        .select(graft.Tables.synthId($"doc_id", 2).as("media_id"), $"doc_id".as("base"),
          $"w", $"h", lit(1).as("sc"), lit(true).as("pert")))
      .as[(Long, Long, Int, Int, Int, Boolean)]
    variants.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, b, w, h, sc, pert) =>
        val bytes = Multimodal.encodePngPixels(w * sc, h * sc, (x, y) => {
          val (r, g, bl) = Multimodal.phashPixelChannels(b, x / sc, y / sc)
          if (pert && x < 4 && y < 4) (255 - r, 255 - g, 255 - bl) else (r, g, bl)
        })
        (id, bytes)
      }
    }
  }

  /** Near-dup image pairs: REAL decode → dHash → banded candidate join
    * → exact hamming verify.
    *
    * Scale: the decode+hash stage is partition-preserving map work
    * (per-image cost independent of corpus size); after it the corpus
    * is 16 bytes/image (id, phash) — raster bytes never cross a
    * shuffle. Blocking emits C(5,2)=10 rows per image keyed on 25-26
    * bit combo hashes (near-singleton buckets to ~10^8 images, the
    * dedup_simhash sizing argument verbatim), bucket caps bound any
    * degenerate key, and only candidates pay the (codegen bit_count)
    * verify. Pairs are linear in the planted-dup rate, never
    * quadratic in the corpus. */
  def dedupImagePhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashes = Multimodal.decodeImagePhash(encodedCorpus(spark, dir))
      .toDF("media_id", "phash")
      // persisted: the bucket frame feeds both sides of the candidate
      // self-join (and the hot-bucket anti-join) — without the cache
      // the encode+decode+hash pipeline executes up to 4x
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = Similarity.boundBuckets(
      hashes.select($"media_id", $"phash",
          explode(Similarity.simhashBlockCombos($"phash", 5, MaxHamming)).as("bb"))
        .select($"media_id", $"phash", $"bb.band", $"bb.band_bits"),
      Seq("band", "band_bits"), 10000)
    // each qualifying pair is emitted from its FIRST truly-agreeing
    // combo only (derived from the phash XOR) instead of from all ~10
    // shared bands followed by a distinct: the corpus-sized distinct
    // exchange disappears and the candidate stream shrinks ~10x — the
    // first sf100 attempt filled the disk exactly there. Pigeonhole
    // still guarantees every hamming<=MaxHamming pair one agreeing
    // combo, so the pair set is unchanged (ImageDedupSpec pins it
    // equal to driver-side all-pairs).
    val pairs = buckets.as("a").join(buckets.as("b"),
        $"a.band" === $"b.band" && $"a.band_bits" === $"b.band_bits" &&
          $"a.media_id" < $"b.media_id")
      .filter($"a.band" === Similarity.firstAgreeingCombo(
        $"a.phash".bitwiseXOR($"b.phash"), 5, MaxHamming))
      .select($"a.media_id".as("id_a"), $"b.media_id".as("id_b"),
        Similarity.hamming64($"a.phash", $"b.phash").cast("long").as("hamming"))
      .filter($"hamming" <= MaxHamming)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // materialize so the hash frame can release eagerly
    hashes.unpersist()
    pairs.orderBy($"id_a", $"id_b")
  }
}
