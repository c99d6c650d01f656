package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Null-injection robustness: real corpora carry NULL text, NULL
  * media payloads, and NULL embedding vectors, and a 100 TB job must
  * not die mid-stage on one of them. These tests drive the exact
  * paths a null-injected full-board sweep found crashing (typed
  * Dataset NPEs in the ANN/cluster family, a UDF NPE in the BPE
  * encoder, a mapPartitions NPE in the media decode stub, an ANSI
  * divide-by-zero in weighted sampling) through the fixed semantics:
  * null vectors dropped at the source, null text propagating as null,
  * null payloads featurized as zero-length media, zero-mass docs
  * excluded from the sampling domain. */
class NullInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_nulls").toString
    // documents: NULL text, empty text, whitespace-only text
    Tables.documents(spark, sf)
      .withColumn("text",
        when($"doc_id" % 5 === 0, lit(null: String))
          .when($"doc_id" % 10 === 1, lit(""))
          .when($"doc_id" % 17 === 2, lit("   "))
          .otherwise($"text"))
      .withColumn("lang", when($"doc_id" % 7 === 0, lit(null: String)).otherwise($"lang"))
      .write.parquet(s"$d/documents.parquet")
    // embeddings: NULL vectors interleaved with real ones
    spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("embedding",
        when($"vec_id" % 10 === 0, lit(null).cast("array<float>")).otherwise($"embedding"))
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("NULL embedding vectors are dropped at the source, not NPE'd in tasks") {
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
    val nNull = raw.filter($"embedding".isNull).count()
    assert(nNull > 0, "test setup: the injected table must contain null vectors")
    assert(Tables.embeddings(spark, dir).count() === raw.count() - nNull)
    // the family that crashed before the source filter: brute-force
    // top-k and MMR both pull vectors into typed rows
    assert(graft.operators.AnnQueries.annBruteforceTopk(spark, dir).count() > 0)
    assert(graft.operators.AnnQueries.annMmrRerank(spark, dir).count() > 0)
  }

  test("BPE encode propagates NULL text as null instead of a task NPE") {
    val out = graft.operators.CorpusQueries.textBpeEncode(spark, dir)
    val rows = out.count()
    assert(rows > 0)
    // null-text docs surface as null-valued rows, not dropped silently
    // and not a crash (size(null)=null under default conf)
    assert(out.filter(col("n_subwords").isNull).count() > 0)
  }

  test("media decode featurizes a NULL payload as zero-length media") {
    val r = graft.operators.MultimodalQueries.multimodalPipeline(spark, dir)
      .agg(sum("n")).first()
    assert(!r.isNullAt(0) && r.getLong(0) > 0)
  }

  test("weighted sampling excludes zero-mass (empty/NULL text) docs") {
    val out = graft.operators.SampleQueries.qSampleWeighted(spark, dir)
    assert(out.count() > 0)
    assert(out.filter(col("weight") <= 0 || col("weight").isNull).count() === 0)
  }

  private lazy val nanDir: String = {
    val d = Files.createTempDirectory("graft_nonfinite").toString
    Tables.events(spark, sf)
      .withColumn("value",
        when($"event_id" % 17 === 0, lit(Double.NaN))
          .when($"event_id" % 23 === 1, lit(Double.PositiveInfinity))
          .otherwise($"value"))
      .write.parquet(s"$d/events.parquet")
    spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("embedding",
        when($"vec_id" % 15 === 0,
          transform($"embedding", _ => lit(Float.NaN)))
          .otherwise($"embedding"))
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("round-9 operators survive the full nulls contract (text/source/n_chars)") {
    // the sweep generator's documents shape: NULL text AND NULL source
    // AND NULL n_chars — url_domain_stats crashed on the last one (the
    // pack-range guard's otherwise() raised on three-valued between)
    val d = Files.createTempDirectory("graft_nulls_r9").toString
    Tables.documents(spark, sf)
      .withColumn("text",
        when($"doc_id" % 5 === 0, lit(null: String)).otherwise($"text"))
      .withColumn("source",
        when($"doc_id" % 11 === 0, lit(null: String)).otherwise($"source"))
      .withColumn("n_chars",
        when($"doc_id" % 5 === 0, lit(null: java.lang.Long)).otherwise($"n_chars"))
      .write.parquet(s"$d/documents.parquet")
    assert(graft.operators.UrlQueries.urlDomainStats(spark, d).count() > 0)
    assert(graft.operators.CurationQueries.textLineDedup(spark, d).count() > 0)
    assert(graft.operators.MultimodalQueries.multimodalDecode(spark, d).count() > 0)
  }

  test("a vector with NULL ELEMENTS is dropped, not silently three-valued") {
    // exists(isnan||...) over a vector whose only bad entries are NULL
    // elements evaluates to NULL — without the explicit x.isNull clause
    // the row is dropped by accident of three-valued logic on the Spark
    // side while the oracle's list_filter KEEPS it; the clause makes
    // the drop an explicit contract on both engines
    import org.apache.spark.sql.types.FloatType
    val d = Files.createTempDirectory("graft_nullelem").toString
    spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("embedding",
        when($"vec_id" % 11 === 0,
          concat(slice($"embedding", 1, 3), array(lit(null).cast(FloatType))))
          .otherwise($"embedding"))
      .write.parquet(s"$d/embeddings.parquet")
    val raw = spark.read.parquet(s"$d/embeddings.parquet")
    val poisoned = raw.filter($"vec_id" % 11 === 0).count()
    assert(poisoned > 0)
    assert(Tables.embeddings(spark, d).count() === raw.count() - poisoned)
  }

  test("non-finite vectors are dropped at the source with the nulls") {
    val raw = spark.read.parquet(s"$nanDir/embeddings.parquet")
    val kept = Tables.embeddings(spark, nanDir).count()
    assert(kept > 0 && kept < raw.count())
    // the family that overflowed/indexed -1 before the source filter
    assert(graft.operators.AnnQueries.annMmrRerank(spark, nanDir).count() > 0)
  }

  test("NaN/Infinity event values drop from quantized aggregates, not kill the job") {
    val out = graft.operators.PipelineQueries.eventsAnomaly(spark, nanDir)
    assert(out.count() > 0)
    // Guards.finiteOrNull: corrupt values leave the sum but the rows
    // stay counted
    assert(out.agg(sum("n")).first().getLong(0) ===
      Tables.events(spark, nanDir).count())
  }

  test("mmrSelect returns partial picks instead of crashing when all scores are NaN") {
    val nanVec = Array.fill(4)(Float.NaN)
    val got = graft.operators.AnnQueries.mmrSelect(
      Seq((1L, Double.NaN, nanVec), (2L, Double.NaN, nanVec)), k = 2, lambda = 0.7)
    assert(got.isEmpty)
  }
}
