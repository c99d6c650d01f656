package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions._

/** Correctness-gate queries for the text-analysis family (SURVEY §2.6)
  * over the `documents` table. All four are shuffle-free map-side
  * expression pipelines (plus one tiny final agg/sort for a stable
  * result set).
  */
object TextQueries {

  /** Per-document whitespace + BPE-ish token counts (SQL oracle). */
  def textTokenCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.widened(Tables.documents(spark, dir))
      .select($"doc_id",
        tokenCountWs($"text").cast("long").as("n_ws"),
        tokenCountBpe($"text").cast("long").as("n_bpe"))
      .orderBy($"doc_id")
  }

  /** Per-document quality score + components, in exact integer basis
    * points so the cross-engine hash compare has no float-rounding
    * boundaries (SQL oracle). */
  def textQualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.widened(Tables.documents(spark, dir))
      .select($"doc_id",
        length($"text").cast("long").as("n_chars"),
        punctRatioBp($"text").as("punct_bp"),
        qualityScoreBp($"text").as("quality_bp"))
      .orderBy($"doc_id")
  }

  /** Stopword/CJK-ratio language ID; aggregated confusion counts vs the
    * labeled lang column (rows oracle — heuristic output isn't
    * SQL-expressible compactly). */
  def textLanguageId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.widened(Tables.documents(spark, dir))
      .select($"doc_id", $"lang", languageId($"text").as("pred_lang"))
      .groupBy($"lang", $"pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"pred_lang")
  }

  /** Text normalization — the canonicalization step ahead of exact
    * dedup/caching in a training pipeline: trim, collapse whitespace
    * runs to single spaces, casefold. Verified by an md5 digest of the
    * normalized text (byte-identical cross-engine). */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the canonical normalization (TextFunctions.normalized): one
    // definition shared by every digest-keyed operator and its oracle
    val stats = graft.similarity.Similarity.bound(
      normalized($"text")) { norm =>
      struct(length(norm).cast("long").as("norm_chars"),
        md5(norm.cast("binary")).as("norm_md5"))
    }
    Tables.widened(Tables.documents(spark, dir))
      .select($"doc_id", stats.as("x"))
      .select($"doc_id", $"x.norm_chars".as("norm_chars"), $"x.norm_md5".as("norm_md5"))
      .orderBy($"doc_id")
  }

  /** Repetition statistics (the Gopher-style boilerplate signal): how
    * much of each document its single most frequent word bigram covers.
    * Heavily templated/spammy text shows high coverage. One groupBy
    * per (doc, gram) then per doc — key cardinality scales with the
    * corpus, map-side partial aggregation does the heavy lifting.
    * Integer basis points, no float rounding in the gate. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigrams = Tables.widened(Tables.documents(spark, dir))
      .select($"doc_id",
        explode(graft.similarity.Similarity.wordNgramsAll(wsTokens($"text"), 2)).as("g"))
    bigrams
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top"), sum($"c").as("total"))
      .select($"doc_id",
        $"total".cast("long").as("n_bigrams"),
        floor((lit(20000L) * $"top" + $"total") / (lit(2L) * $"total"))
          .cast("long").as("top_bigram_bp"))
      .orderBy($"doc_id")
  }

  /** End-to-end curation pipeline — the composition story: quality
    * gate, language filter, then exact dedup on NORMALIZED text
    * keeping the smallest doc_id. One map-side scoring pass plus one
    * digest-keyed shuffle; at 100 TB every stage is the already-audited
    * plan of its standalone gate query. */
  def textCurate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // evalOnce: the filter below would otherwise be pushed into the
    // scan with the scoring trees COPIED into it, evaluating quality
    // and language twice per row (10.5 s vs 3.1 s at sf1)
    val scored = graft.plans.EvalBarrier.evalOnce(
        Tables.widened(Tables.documents(spark, dir)), Seq("doc_id"),
        "quality_bp" -> qualityScoreBp($"text"),
        "pred_lang" -> languageId($"text"),
        "norm_digest" -> normalizedDigest($"text"))
      .filter($"quality_bp" >= 4000 && $"pred_lang" === "en")
    scored
      .groupBy($"norm_digest")
      .agg(min($"doc_id").as("keep_id"), max($"quality_bp").as("quality_bp"))
      .groupBy()
      .agg(count(lit(1)).as("n_kept"),
        sum($"quality_bp").cast("long").as("sum_quality_bp"),
        min($"keep_id").as("min_id"),
        max($"keep_id").as("max_id"))
  }

  /** Hashed-feature linear classifier inference — the fastText-style
    * quality-classifier scoring step of a curation pipeline, reduced
    * to its Spark-shaped essence: tokens hash into 256 feature buckets
    * (md5 hex, engine-portable), each bucket carries a fixed integer
    * weight (a deterministic function of the bucket id — in production
    * this is the broadcast trained-weights array; the PLUMBING is what
    * scales, not the weights), and a document's score is the exact
    * integer sum of its token weights. Pure map-side explode +
    * per-doc aggregate on the doc key — no shuffle wider than the
    * (doc, partial-sum) combine; the model lookup is arithmetic, so
    * nothing is broadcast at all here and a real weight table would be
    * a ~KB broadcast. Exact integers end-to-end → hash gate. */
  def textClassifierScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // bucket = value of the first two md5 hex digits of the token;
    // weight = ((bucket * 2654435761) mod 2001) - 1000  (range ±1000)
    val bucket = (conv(substring(md5($"token"), 1, 2), 16, 10).cast("long"))
    val weight = (bucket * 2654435761L) % 2001L - 1000L
    Tables.widened(Tables.documents(spark, dir))
      .select($"doc_id", explode(wsTokens($"text")).as("token"))
      .select($"doc_id", weight.as("w"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum($"w").as("score"),
        (sum($"w") > 0).as("accepted"))
      .orderBy($"doc_id")
  }

  /** Winnowing fingerprints: per-doc fingerprint count plus a stable
    * digest of the selected hashes (rows oracle). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // bind the fingerprint array so projection collapse cannot
    // re-evaluate it for each of the two derived columns
    val fpStats = graft.similarity.Similarity.bound(fingerprint($"text")) { fp =>
      struct(size(fp).as("n_fp"), xxhash64(fp).as("fp_digest"))
    }
    Tables.widened(Tables.documents(spark, dir))
      .select($"doc_id", fpStats.as("x"))
      .select($"doc_id", $"x.n_fp".as("n_fp"), $"x.fp_digest".as("fp_digest"))
      .orderBy($"doc_id")
  }
}
