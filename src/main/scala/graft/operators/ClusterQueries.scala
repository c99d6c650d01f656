package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.LocalKMeans

/** Topic-style clustering of the embedding corpus — the grouping
  * behind per-cluster curation decisions (domain balancing, cluster-
  * level sampling, CCNet-style "keep the clusters that look like the
  * target distribution").
  */
object ClusterQueries {

  val K = 8
  val TrainSample = 4096
  val LloydIters = 10
  val Seed = 7L

  /** K-means cluster assignment over the embeddings table with the
    * per-cluster report (size, inertia, id range) as output.
    *
    * Model posture (the LocalKMeans/FAISS convention shared with the
    * PQ and IVF paths): the model trains DRIVER-SIDE on a bounded
    * hash-ordered sample — clustering models are sublinear in the
    * corpus and production pipelines fit on samples regardless — and
    * broadcasts ~KBs of centroids. The corpus-side work, the part that
    * must scale, is one map pass: a JVM argmin loop per vector (the
    * same tight-loop justification as the PQ/IVF encoders — a Catalyst
    * HOF argmin over K literal arrays is interpreted per element), then
    * ONE partial-agg shuffle of per-cluster counters. Embeddings never
    * shuffle; inertia is quantized to integer micro-units so the
    * aggregate is order-insensitive (the FP sum of squared distances
    * would differ run to run under AQE re-partitioning).
    *
    * Rows-gated (k-means isn't SQL-expressible); ClusterSpec pins
    * assignment = driver-recomputed argmin, partition of the corpus,
    * and run-to-run determinism of the whole report. */
  def docClusterKmeans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.widened(Tables.embeddings(spark, dir))
      .select($"vec_id", $"embedding")

    val sample = LocalKMeans.sample(
      Tables.embeddings(spark, dir), "vec_id", "embedding", TrainSample)
    val centroids = LocalKMeans.train(sample, K, LloydIters, Seed)
    val bc = spark.sparkContext.broadcast(centroids)

    val assign = udf { (e: Seq[Float]) =>
      val (best, bestD) = LocalKMeans.assignWithD2(bc.value, e.toArray)
      // (cluster, squared distance in exact integer micro-units)
      (best, math.floor(bestD * 1e6).toLong)
    }

    val out = emb.select($"vec_id", assign($"embedding").as("a"))
      .select($"vec_id", $"a._1".as("cluster_id"), $"a._2".as("d2_e6"))
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_vecs"),
        sum($"d2_e6").as("inertia_e6"),
        min($"vec_id").as("min_vec"),
        max($"vec_id").as("max_vec"))
      .orderBy($"cluster_id")
    // the report is <= K rows: land it on the driver so the centroid
    // broadcast can be released instead of riding the returned plan
    val rows = out.collect()
    bc.destroy()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      .orderBy($"cluster_id")
  }
}
