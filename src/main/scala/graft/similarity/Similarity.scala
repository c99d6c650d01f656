package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity / sketching primitives for dedup and ANN, all as pure
  * Column expressions (no UDFs — everything stays inside whole-stage
  * codegen and scales map-side).
  *
  * Sketch designs are the standard public constructions: MinHash
  * (Broder '97), LSH banding (Leskovec/Rajaraman/Ullman, Mining of
  * Massive Datasets ch.3), SimHash (Charikar '02), random-hyperplane
  * signatures for cosine (Charikar '02), prefix filtering for exact
  * set-similarity joins (Chaudhuri et al. '06, Bayardo et al. '07).
  */
object Similarity {

  /** Bind `expr` to a lambda variable so the body evaluates it exactly
    * ONCE per row. A plain subexpression referenced inside a
    * higher-order-function lambda is re-evaluated on EVERY element
    * visit (interpreted HOFs substitute the whole subtree) — e.g. a
    * tokenizing split re-run once per n-gram turned shingle generation
    * quadratic (measured 7.9 s → 0.3 s on 5k docs). */
  def bound(expr: Column)(body: Column => Column): Column =
    element_at(transform(array(expr), body), 1)

  /** Distinct word n-grams ("shingles") of a token array, joined by a
    * single space. Documents with fewer than n tokens yield an empty
    * array. The token array is `bound` once; the per-element lambda
    * touches only the bound variable. */
  def wordNgrams(tokens: Column, n: Int): Column =
    bound(tokens) { ts =>
      val idx = when(size(ts) - lit(n - 1) < 1, array().cast("array<int>"))
        .otherwise(sequence(lit(1), size(ts) - lit(n - 1)))
      array_distinct(transform(idx, i =>
        concat_ws(" ", slice(ts, i, lit(n)))))
    }

  /** As [[wordNgrams]] but KEEPING duplicates — repetition statistics
    * need the multiset (how often the most common n-gram repeats). */
  def wordNgramsAll(tokens: Column, n: Int): Column =
    bound(tokens) { ts =>
      val idx = when(size(ts) - lit(n - 1) < 1, array().cast("array<int>"))
        .otherwise(sequence(lit(1), size(ts) - lit(n - 1)))
      transform(idx, i => concat_ws(" ", slice(ts, i, lit(n))))
    }

  /** Word n-grams paired with the doc's distinct-gram count:
    * array<struct<s, gram>>, built so ONE Generate(explode) evaluation
    * yields every (count, gram) row — callers otherwise re-evaluate the
    * gram expression once each for filter/size/explode. */
  def wordNgramStructs(tokens: Column, n: Int): Column =
    bound(wordNgrams(tokens, n)) { gs =>
      transform(gs, g => struct(size(gs).as("s"), g.as("gram")))
    }

  /** k-permutation MinHash signature: element i is
    * min over grams of xxhash64(i, gram) — one draw per "permutation"
    * seeded by the lane index. Empty gram set → null-free empty guard
    * must be applied by the caller (signature would be all-null). */
  def minhashSignature(grams: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(grams, g => xxhash64(i, g))))

  /** LSH banding of a MinHash signature: b bands of r rows each →
    * array of (band, bandHash) structs. Docs sharing any (band,
    * bandHash) are candidates — the ONLY shuffle key the dedup join
    * uses; nothing is ever compared all-pairs. */
  def lshBands(sig: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)), i =>
      struct(i.as("band"), xxhash64(i, slice(sig, i * r + 1, lit(r))).as("band_hash")))

  /** MinHash LSH bands computed DIRECTLY from the gram set, skipping
    * the materialized signature. `lshBands(minhashSignature(g))` looks
    * equivalent, but after Catalyst collapses projections each band's
    * slice re-evaluates the ENTIRE k-lane signature expression — a b×
    * blowup (measured 16× → ~50s at sf0.01). Here band i hashes only
    * its own r lanes, so every lane is computed exactly once. */
  def minhashLshBands(grams: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)), i =>
      struct(i.as("band"),
        xxhash64(i, transform(sequence(i * r, (i + 1) * r - 1), lane =>
          array_min(transform(grams, g => xxhash64(lane, g))))).as("band_hash")))

  /** Exact dot product of two numeric arrays (double accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2(a: Column): Column = sqrt(dot(a, a))

  /** Exact cosine similarity of two FLOAT arrays — the native Catalyst
    * expression graft.functions.CosineSimilarity (codegen'd primitive
    * loop; bit-identical to `cosineHof`, which runs ~200 interpreted
    * lambda calls per 64-dim pair). Resolved through the function
    * registry: sessions built with
    * `spark.sql.extensions=graft.functions.GraftExtensions` have it;
    * other sessions call `CosineSimilarity.ensureRegistered(spark)`
    * once (the graft operators do this themselves). */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Declarative (higher-order-function) cosine — kept as the
    * reference formulation the native expression is spec-checked
    * against, and for non-float numeric arrays. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** 64-bit SimHash of a token array: bit j of the signature is set
    * when the majority of token hashes have bit j set (ties → set,
    * matching the usual >= 0 convention on the ±1 sum). */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, j) => acc.bitwiseOR(when(
        size(filter(hashes, h => shrDyn(h, j).bitwiseAND(lit(1L)) === lit(1L))) * 2
          >= size(hashes),
        shlDyn(lit(1L), j)).otherwise(lit(0L))))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash band blocking: split a `bits`-wide signature into `bands`
    * equal bit-slices. Two signatures within hamming distance
    * `bands - 1` MUST agree on at least one slice (pigeonhole), so a
    * join on (band, slice-value) finds all such pairs with no
    * all-pairs comparison. */
  def simhashBands(sig: Column, bands: Int, bits: Int = 64): Column = {
    val width = bits / bands
    val mask = (1L << width) - 1
    transform(sequence(lit(0), lit(bands - 1)), i =>
      struct(i.as("band"),
        shrDyn(sig, i * lit(width)).bitwiseAND(lit(mask)).as("band_bits")))
  }

  /** Block-combination blocking for hamming <= `maxHamming` over a
    * `bits`-wide signature (Manku, Jain & Sarma, "Detecting
    * Near-Duplicates for Web Crawling", WWW'07 §3): split the
    * signature into `blocks` contiguous slices; a pair within hamming
    * k differs in at most k blocks, so it agrees EXACTLY on some
    * (blocks - k)-subset — one (combo, key) row per such combination
    * and an equi-join on the key finds every pair. Like
    * [[simhashBands]] with bands = k+1, but the key carries
    * (blocks-k)/blocks of the signature's bits instead of 1/(k+1), so
    * bucket entropy comes from key width, not corpus luck: 16-bit
    * band keys top out at 65536 buckets — a 10x-bigger corpus means
    * 10x-fuller buckets and ~100x the self-join pairs (the
    * superlinear term the sf100 decade measured) — where C(6,3)
    * ~32-bit triple keys keep buckets near-singleton until ~2^32
    * docs. Cost: C(blocks, blocks-k) rows per doc (20 at 6 choose 3)
    * vs k+1. The key is an xxhash64 of the slice triple — a hash
    * collision only ADDS a candidate pair (killed by the caller's
    * exact hamming verify), never loses one. */
  def simhashBlockCombos(
      sig: Column, blocks: Int, maxHamming: Int, bits: Int = 64): Column = {
    require(blocks > maxHamming, "need more blocks than flipped bits")
    val base = bits / blocks
    val extra = bits % blocks // first `extra` blocks are one bit wider
    val widths = (0 until blocks).map(i => base + (if (i < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val blockCols = (0 until blocks).map(i =>
      shiftright(sig, offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1)))
    val structs = (0 until blocks).combinations(blocks - maxHamming)
      .toSeq.zipWithIndex.map { case (combo, ci) =>
        struct(lit(ci).as("band"),
          xxhash64(lit(ci) +: combo.map(blockCols): _*).as("band_bits"))
      }
    array(structs: _*)
  }

  /** Number of signature blocks for block-combination blocking, sized
    * to the corpus: C(5,2) 25-26-bit combo keys stay near-singleton to
    * ~10^7 codes at half the per-doc row cost of C(6,3); past that the
    * random key-COINCIDENCE term (pairs sharing a combo key without
    * being near-dups) grows quadratically in corpus/2^keyBits — the
    * r10 sf100 decade measured dedup_image_phash at 21.2x for 10x data
    * exactly there — so bigger corpora switch to C(6,3) 31-33-bit
    * triple keys (near-singleton to ~2^32 codes, 20 rows/doc).
    * Completeness for hamming <= 3 is independent of the choice
    * (blocks > maxHamming either way), so the PAIR SET is identical —
    * only the candidate-join volume changes. Callers derive `estCodes`
    * from a parquet footer row-count probe (the pagerankKeyType
    * posture: metadata-only, zero jobs; an unreadable layout should
    * pass Long.MaxValue so the probe failure picks the scale-safe
    * width). */
  def blocksForCodes(estCodes: Long): Int =
    if (estCodes < 10000000L) 5 else 6

  /** Whether combo #`band` (in [[simhashBlockCombos]]'s combo order)
    * TRULY agrees between two signatures, from their XOR — the
    * candidate-join filter that drops band-key hash coincidences
    * map-side. Unlike keeping only `band === firstAgreeingCombo`,
    * keeping EVERY truly-agreeing row and aggregating per pair stays
    * correct when [[boundBuckets]] drops a hot bucket: a pair whose
    * first-agreeing combo landed in a dropped bucket still surfaces
    * from any surviving agreeing band (the r10 first-combo-only filter
    * silently lost such pairs — gate corpora were safe only because
    * ImageDedupSpec pins max bucket far below the cap). */
  def comboAgrees(
      xorCol: Column, band: Column, blocks: Int, maxHamming: Int,
      bits: Int = 64): Column = {
    require(blocks > maxHamming, "need more blocks than flipped bits")
    val base = bits / blocks
    val extra = bits % blocks
    val widths = (0 until blocks).map(i => base + (if (i < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val combos = (0 until blocks).combinations(blocks - maxHamming).toSeq.zipWithIndex
    combos.foldRight(lit(false)) { case ((combo, ci), acc) =>
      val agrees = combo.map(b =>
        shiftright(xorCol, offsets(b)).bitwiseAND(lit((1L << widths(b)) - 1)) === 0L)
        .reduce(_ && _)
      when(band === ci, agrees).otherwise(acc)
    }
  }

  /** Random-hyperplane signature for cosine LSH: bit i is the sign of
    * the dot product with a deterministic ±1 hyperplane derived from
    * xxhash64(plane, dim). Angle between vectors ∝ expected bit
    * disagreement (Charikar '02). */
  def hyperplaneSignature(vec: Column, planes: Int): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1), (x, d) =>
            x.cast("double") * when(xxhash64(p, d).bitwiseAND(lit(1L)) === 1L, lit(1.0))
              .otherwise(lit(-1.0))),
          lit(0.0), (a, x) => a + x)
        acc.bitwiseOR(when(proj >= 0, shlDyn(lit(1L), p)).otherwise(lit(0L)))
      })

  /** Hyperplane signature banded directly from the vector (see
    * minhashLshBands for why: banding a materialized signature
    * re-evaluates the whole signature expression per band after
    * projection collapse). Band i covers planes [i*w, (i+1)*w). */
  def hyperplaneBands(vec: Column, planes: Int, bands: Int): Column = {
    val width = planes / bands
    transform(sequence(lit(0), lit(bands - 1)), i =>
      struct(i.as("band"),
        aggregate(
          sequence(i * width, (i + 1) * width - 1),
          lit(0L),
          (acc, p) => {
            val proj = aggregate(
              zip_with(vec, sequence(lit(0), size(vec) - 1), (x, d) =>
                x.cast("double") * when(xxhash64(p, d).bitwiseAND(lit(1L)) === 1L, lit(1.0))
                  .otherwise(lit(-1.0))),
              lit(0.0), (a, x) => a + x)
            acc.bitwiseOR(when(proj >= 0, shlDyn(lit(1L), p - i * width)).otherwise(lit(0L)))
          }).as("band_bits")))
  }

  /** DataFrame-level hyperplane bucketing: one row per (id, band,
    * band_bits). Same construction as `hyperplaneBands` but computed
    * as CODEGEN'D SUM AGGREGATES over posexploded vector components —
    * higher-order lambdas are interpreted per element, which is the
    * difference between 8k interpreted ops and 32 codegen'd hashes
    * per row (see DedupQueries scale notes). */
  def hyperplaneBucketsDf(
      df: org.apache.spark.sql.DataFrame,
      idCol: String, vecCol: String,
      planes: Int, bands: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, posexplode}
    val ex = df.select(col(idCol), posexplode(col(vecCol)).as(Seq("d", "x")))
    val projAggs = (0 until planes).map { p =>
      sum(when(xxhash64(lit(p), col("d")).bitwiseAND(lit(1L)) === 1L, col("x").cast("double"))
        .otherwise(-col("x").cast("double"))).as(s"p$p")
    }
    val projs = ex.groupBy(col(idCol)).agg(projAggs.head, projAggs.tail: _*)
    val width = planes / bands
    val bandStructs = (0 until bands).map { b =>
      val bits = (0 until width).map(i =>
        when(col(s"p${b * width + i}") >= 0, lit(1L << i)).otherwise(lit(0L)))
      struct(lit(b).as("band"), bits.reduce(_.bitwiseOR(_)).as("band_bits"))
    }
    projs.select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.band_bits").as("band_bits"))
  }

  /** Cap LSH bucket sizes before a candidate self-join: a degenerate
    * bucket value shared by B rows contributes B² candidate pairs — one
    * hot bucket (boilerplate documents, empty-ish inputs hashing alike)
    * turns the join quadratic at scale. Buckets larger than `maxBucket`
    * are dropped entirely (the standard LSH-dedup guard: a bounded,
    * observable recall loss instead of an unbounded shuffle blowup —
    * pairs in a dropped bucket usually still meet in another band).
    * Cost: one partial-agg pass over the buckets + a broadcast
    * anti-join against the (tiny) hot-bucket list. */
  def boundBuckets(
      buckets: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String],
      maxBucket: Int): org.apache.spark.sql.DataFrame = {
    val keys = keyCols.map(col)
    val hot = buckets.groupBy(keys: _*).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxBucket).drop("__bn")
    buckets.join(broadcast(hot), keyCols, "left_anti")
  }

  /** Dynamic-count bit shifts: the SQL ShiftRight/ShiftLeft expressions
    * accept an expression count; only the Scala `functions` wrappers
    * restrict it to a literal Int. */
  private def shrDyn(c: Column, by: Column): Column =
    call_function("shiftright", c, by)

  private def shlDyn(c: Column, by: Column): Column =
    call_function("shiftleft", c, by)
}
