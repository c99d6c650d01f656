package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions
import graft.similarity.{ConnectedComponents, Similarity}

/** Deduplication family (SURVEY §2.4) over the `documents` table.
  *
  * Scale posture (the non-negotiables at 100 TB):
  *  - NOTHING is ever compared all-pairs. Candidates come from a join
  *    keyed on a blocking value — (band, band_hash) for MinHash LSH and
  *    SimHash, a frequency-ordered token prefix for the exact jaccard
  *    join — so the shuffle is uniform in the blocking key and each
  *    bucket is small.
  *  - Exact dedup shuffles a 32-byte digest + id, never full text.
  *  - Cluster assembly is iteration-bounded label propagation.
  */
object DedupQueries {

  /** documents ∪ an id-shifted copy: a corpus where every text has
    * exactly two exact copies — exercises keep-first semantics
    * deterministically (the raw table has no exact duplicates). */
  private def doubledCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    docs.union(docs.select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
  }

  /** Exact dedup: group by content digest, keep the smallest doc_id.
    * The shuffle key is sha2(text) — fixed 64-char digest, not the
    * document body — so shuffle volume is O(rows), not O(bytes).
    * (SQL oracle groups by full text: identical result barring a
    * sha256 collision.) */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    doubledCorpus(spark, dir)
      .groupBy(sha2($"text", 256).as("digest"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies")
      .orderBy($"keep_id")
  }

  /** Exact n-gram jaccard near-dup join via prefix filtering
    * (Chaudhuri '06 / Bayardo '07): under any global token order, two
    * sets with J >= tau must share a token within each one's first
    * |S| - ceil(tau*|S|) + 1 tokens. Ordering by ascending document
    * frequency makes those prefixes the RAREST tokens, so candidate
    * buckets stay tiny. Exact — same pairs as the all-pairs oracle —
    * but never quadratic. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tau = 0.7

    val docs = Tables.documents(spark, dir)
      .select($"doc_id",
        Similarity.wordNgrams(TextFunctions.wsTokens($"text"), 2).as("grams"))
      .filter(size($"grams") > 0)

    val exploded = docs.select($"doc_id", explode($"grams").as("gram"))
    val freq = exploded.groupBy($"gram").agg(count(lit(1)).as("df"))

    // per-doc grams sorted by (df, gram); prefix = rarest few
    val sorted = exploded.join(freq, "gram")
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"df", $"gram"))).as("sg"))
      .select($"doc_id",
        transform($"sg", x => x.getField("gram")).as("grams_sorted"))
      .withColumn("s", size($"grams_sorted"))
      .withColumn("prefix",
        slice($"grams_sorted", lit(1), ($"s" - ceil($"s" * tau) + 1).cast("int")))

    val pre = sorted.select($"doc_id", $"s", explode($"prefix").as("gram"))
    val candidates = pre.as("a").join(pre.as("b"),
        $"a.gram" === $"b.gram" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .distinct()

    val byId = docs.select($"doc_id", $"grams")
    candidates
      .join(byId.withColumnRenamed("doc_id", "id_a").withColumnRenamed("grams", "ga"), "id_a")
      .join(byId.withColumnRenamed("doc_id", "id_b").withColumnRenamed("grams", "gb"), "id_b")
      .withColumn("inter", size(array_intersect($"ga", $"gb")).cast("long"))
      .withColumn("uni", (size($"ga") + size($"gb")).cast("long") - $"inter")
      .filter($"inter" / $"uni" >= tau)
      // jaccard in exact integer basis points (see TextFunctions.qualityScoreBp)
      .select($"id_a", $"id_b",
        floor((lit(20000L) * $"inter" + $"uni") / (lit(2L) * $"uni")).cast("long").as("j_bp"))
      .orderBy($"id_a", $"id_b")
  }

  /** MinHash + LSH near-dup clustering: shingle → 64-lane minhash →
    * 16 bands × 4 rows → bucket join for candidates → exact jaccard
    * verify (>= tau) → bounded label-propagation components.
    * Output: every clustered doc with its cluster representative. */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tau = 0.7

    val docs = Tables.documents(spark, dir)
      .select($"doc_id",
        Similarity.wordNgrams(TextFunctions.wsTokens($"text"), 3).as("grams"))
      .filter(size($"grams") > 0)

    val buckets = docs.select($"doc_id",
        explode(Similarity.minhashLshBands($"grams", 16, 4)).as("bb"))
      .select($"doc_id", $"bb.band", $"bb.band_hash")

    val candidates = buckets.as("a").join(buckets.as("b"),
        $"a.band" === $"b.band" && $"a.band_hash" === $"b.band_hash" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .distinct()

    val byId = docs.select($"doc_id", $"grams")
    val edges = candidates
      .join(byId.withColumnRenamed("doc_id", "id_a").withColumnRenamed("grams", "ga"), "id_a")
      .join(byId.withColumnRenamed("doc_id", "id_b").withColumnRenamed("grams", "gb"), "id_b")
      .withColumn("inter", size(array_intersect($"ga", $"gb")).cast("double"))
      .filter($"inter" / (size($"ga") + size($"gb") - $"inter") >= tau)
      .select($"id_a".as("src"), $"id_b".as("dst"))

    ConnectedComponents.label(edges)
      .select($"id".as("doc_id"), $"component".as("cluster_rep"))
      .orderBy($"doc_id")
  }

  /** SimHash near-dup pairs: 64-bit token simhash, 4×16-bit band
    * blocking (pigeonhole-complete for hamming <= 3), exact hamming
    * verify. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxHamming = 3

    val sigs = Tables.documents(spark, dir)
      .select($"doc_id",
        Similarity.simhash64(TextFunctions.wsTokens($"text")).as("sig"))

    val buckets = sigs.select($"doc_id", $"sig",
        explode(Similarity.simhashBands($"sig", 4)).as("bb"))
      .select($"doc_id", $"sig", $"bb.band", $"bb.band_bits")

    buckets.as("a").join(buckets.as("b"),
        $"a.band" === $"b.band" && $"a.band_bits" === $"b.band_bits" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        Similarity.hamming64($"a.sig", $"b.sig").cast("long").as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
      .orderBy($"id_a", $"id_b")
  }

  /** Embedding cosine near-dup clustering. The corpus is embeddings ∪
    * deterministically perturbed copies (the raw table has no
    * near-dup vectors — max pairwise cosine 0.51), candidates come
    * from 16-bit random-hyperplane signatures matched on 4-bit bands,
    * verified with exact cosine >= 0.99. */
  def dedupEmbeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tau = 0.99

    val base = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    // perturb: flip alternate dims by ±2% — cosine vs source ≈ 0.9996
    val perturbed = base.select(
      ($"vec_id" + 1000000L).as("vec_id"),
      zip_with($"embedding", sequence(lit(0), size($"embedding") - 1),
        (x, d) => x * when(d % 2 === 0, lit(1.02f)).otherwise(lit(0.98f))).as("embedding"))
    val corpus = base.union(perturbed)

    val buckets = corpus.select($"vec_id", $"embedding",
        explode(Similarity.hyperplaneBands($"embedding", 16, 4)).as("bb"))
      .select($"vec_id", $"embedding", $"bb.band", $"bb.band_bits")

    val edges = buckets.as("a").join(buckets.as("b"),
        $"a.band" === $"b.band" && $"a.band_bits" === $"b.band_bits" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("src"), $"b.vec_id".as("dst"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("cos"))
      .distinct()
      .filter($"cos" >= tau)
      .select($"src", $"dst")

    ConnectedComponents.label(edges)
      .select($"id".as("vec_id"), $"component".as("cluster_rep"))
      .orderBy($"vec_id")
  }
}
