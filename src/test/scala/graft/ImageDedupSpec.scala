package graft

import graft.multimodal.Multimodal
import graft.operators.ImageDedupQueries

/** Structural invariants of the perceptual-hash image dedup that the
  * hash gate can't state: planted-pair recall, blocking completeness
  * against a driver-side all-pairs recomputation, and the bucket-size
  * margin under the LSH cap. */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs =
    ImageDedupQueries.dedupImagePhash(spark, sf)
      .as[(Long, Long, Long)].collect()

  private lazy val hashes =
    Multimodal.decodeImagePhash(ImageDedupQueries.encodedCorpus(spark, sf))
      .collect()

  test("every planted 2x re-encode pair is found at hamming 0") {
    val docIds = Tables.documents(spark, sf).select($"doc_id")
      .as[Long].collect().toSet
    assert(docIds.nonEmpty)
    val upscale = pairs.filter { case (a, b, _) => b == a + 1000000000L && docIds(a) }
      .map { case (a, _, ham) => a -> ham }.toMap
    docIds.foreach { id =>
      assert(upscale.contains(id), s"missing upscale pair for image $id")
      assert(upscale(id) === 0L, s"upscale re-encode of $id not at hamming 0")
    }
  }

  test("banded pairs == driver-side all-pairs hamming<=3 over the real phashes") {
    // all-pairs is the SPEC's job (the oracle does the same in SQL);
    // the operator must reproduce it from banding alone
    val hs = hashes
    val expected = (for {
      i <- hs.indices.iterator
      j <- (i + 1) until hs.length
      ham = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if ham <= ImageDedupQueries.MaxHamming
    } yield {
      val (a, b) = if (hs(i)._1 < hs(j)._1) (hs(i)._1, hs(j)._1) else (hs(j)._1, hs(i)._1)
      (a, b, ham.toLong)
    }).toSet
    assert(pairs.toSet === expected)
    assert(expected.nonEmpty)
  }

  test("C(5,2) and C(6,3) CODE PATHS yield identical pair sets (adaptive switch is result-invariant)") {
    // blocksFor picks the width from a corpus-count probe; both widths
    // are complete for hamming<=3, so the switch may change candidate
    // volume but NEVER the answer — pinned on the full operator (real
    // decode, boundBuckets, comboAgrees emission), not just the data
    val p5 = ImageDedupQueries.dedupImagePhashBlocks(spark, sf, 5)
      .as[(Long, Long, Long)].collect().toSet
    val p6 = ImageDedupQueries.dedupImagePhashBlocks(spark, sf, 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(p5 === p6)
    assert(p5.nonEmpty)
    // the gate corpus sits far below the 10^7-code switch point
    assert(ImageDedupQueries.blocksFor(spark, sf) === 5)
    assert(graft.similarity.Similarity.blocksForCodes(20000000L) === 6)
  }

  test("retouched corner variants land within a few bits of their base") {
    val hm = hashes.toMap
    val retouched = hm.keys.filter(_ >= 2000000000L)
    assert(retouched.nonEmpty)
    retouched.foreach { rid =>
      val base = rid - 2000000000L
      val ham = java.lang.Long.bitCount(hm(rid) ^ hm(base))
      // a 4x4 corner overlay moves at most the few luma samples that
      // fall inside it: small but usually nonzero hamming
      assert(ham <= 8, s"retouch of $base moved $ham bits — overlay leaked")
    }
    // ...and at least one retouch actually flips a bit somewhere, or
    // the perturbation isn't exercising anything
    assert(retouched.exists(rid =>
      java.lang.Long.bitCount(hm(rid) ^ hm(rid - 2000000000L)) > 0))
  }

  test("phashes are near-uniform: the largest LSH bucket is nowhere near the cap") {
    // the gate is hash-exact ONLY while boundBuckets never drops a
    // bucket; this pins the margin so corpus growth that erodes it
    // fails a test instead of silently breaking gate parity
    val sizes = hashes.toSeq.toDF("media_id", "phash")
      .select($"media_id",
        org.apache.spark.sql.functions.explode(
          graft.similarity.Similarity.simhashBlockCombos(
            $"phash", 5, ImageDedupQueries.MaxHamming)).as("bb"))
      .groupBy($"bb.band", $"bb.band_bits")
      .count().select($"count").as[Long].collect()
    assert(sizes.max < 100, s"largest bucket ${sizes.max} — cap margin eroding")
  }
}
