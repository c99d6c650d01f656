package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.Similarity

/** Similarity search over the `embeddings` table (SURVEY §2.5).
  *
  * Scale posture: the query set is small and BROADCAST; the corpus —
  * the 100 TB side — is scanned exactly once and never shuffled for
  * the scoring join. Top-k extraction is two-phase (partial top-k per
  * salt bucket, then merge) so no single per-query partition sees the
  * whole corpus.
  */
object AnnQueries {

  private val K = 5
  private val NQueries = 10
  private val Salts = 32

  /** Exact cosine top-k per query vector: broadcast queries × corpus,
    * codegen'd double-accumulated cosine, two-phase windowed top-k.
    * Similarity reported in exact-ranked order; the value column is
    * rounded to integer milli-points (cross-engine float noise ~1e-8
    * never moves a rank: adjacent ranked sims differ by >= 1.9e-5 in
    * this corpus). */
  def annBruteforceTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.CosineSimilarity.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" < NQueries)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))

    val scored = emb.join(broadcast(queries), $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("vid"),
        Similarity.cosine($"qvec", $"embedding").as("sim"))

    topKPerQuery(scored)
  }

  /** LSH-bucketed ANN: 16-bit random-hyperplane signatures, 4×4-bit
    * bands; a corpus vector is scored only when it shares a band value
    * with the query — the scale path where scoring the full corpus per
    * query is too expensive. Same two-phase top-k (rows oracle:
    * approximate recall is not SQL-expressible). */
  def annLshTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.CosineSimilarity.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val bucketed = Similarity.hyperplaneBucketsDf(emb, "vec_id", "embedding", 16, 4)
      .join(emb, "vec_id")

    val queries = bucketed.filter($"vec_id" < NQueries)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"), $"band", $"band_bits")

    val scored = bucketed.join(broadcast(queries),
        Seq("band", "band_bits"))
      .filter($"vec_id" =!= $"qid")
      // score BEFORE the multi-band dedup: cosine is a codegen'd scalar,
      // so the distinct shuffles (qid, vid, sim) scalars instead of two
      // full embedding arrays per row (re-scoring a duplicated pair is
      // cheaper than shuffling its vectors)
      .select($"qid", $"vec_id".as("vid"), Similarity.cosine($"qvec", $"embedding").as("sim"))
      .distinct() // a pair may share several bands

    topKPerQuery(scored)
  }

  /** Two-phase top-k: partial top-k inside (qid, salt) buckets — ~k
    * survivors per bucket — then a final tiny window over qid only.
    * The global window never sees more than Salts*K rows per query,
    * so a hot query key cannot skew a single task at 100× scale. */
  private[operators] def topKPerQuery(scored: DataFrame): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val partial = Window.partitionBy($"qid", pmod(xxhash64($"vid"), lit(Salts)))
      .orderBy($"sim".desc, $"vid")
    val fin = Window.partitionBy($"qid").orderBy($"sim".desc, $"vid")
    scored
      .withColumn("prk", row_number().over(partial)).filter($"prk" <= K)
      .withColumn("rk", row_number().over(fin)).filter($"rk" <= K)
      .select($"qid", $"rk".cast("long").as("rk"), $"vid",
        floor(lit(1000.0) * $"sim" + lit(0.5)).cast("long").as("sim_mbp"))
      .orderBy($"qid", $"rk")
  }
}
