package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.{LocalKMeans, Similarity}

/** IVF (inverted-file) ANN — the coarse-quantizer scale path
  * alongside the LSH variant (SURVEY §2.5 extension).
  *
  * Build: the `nlist`-cell coarse quantizer trains driver-side on a
  * hash-ordered bounded sample (LocalKMeans — the FAISS convention;
  * a distributed fit of a 16×64-float model is pure fixed job
  * latency), then the corpus is assigned to cells in one
  * broadcast-centroid map pass. Search: a query scores only the
  * vectors whose cell centroid is among its `nprobe` nearest — at
  * 100 TB, the corpus is written partitioned BY CELL, so a probe
  * reads nprobe/nlist of the data and nothing else shuffles. Locally
  * the cell assignment is a column and the probe is a broadcast
  * semi-join on (cell).
  */
object IvfQueries {

  private val NList = 16
  private val NProbe = 6
  private val K = 5
  private val NQueries = 10
  private val TrainSample = 4096

  def annIvfTopk(spark: SparkSession, dir: String): DataFrame =
    annIvfTopkWith(spark, dir, trainCentroids(spark, dir))

  /** The training half of the train/serve split: fit the coarse
    * quantizer alone, e.g. to persist via [[graft.io.ModelIO]] and
    * serve from in later runs. 5 Lloyd's iterations: cell assignments
    * stabilize well before centroid convergence, and IVF recall
    * depends only on assignments (probing covers NProbe cells
    * anyway). */
  def trainCentroids(spark: SparkSession, dir: String): Array[Array[Float]] = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val sample = LocalKMeans.sample(emb, "vec_id", "embedding", TrainSample)
    LocalKMeans.train(sample, NList, 5, 42L)
  }

  /** The serving half: run the IVF probe/score pipeline under a
    * PRE-TRAINED quantizer (typically [[graft.io.ModelIO.loadCentroids]]
    * output). Bit-identical centroids give bit-identical results, so a
    * persisted model makes serving reproducible across runs with no
    * training scan. */
  def annIvfTopkWith(
      spark: SparkSession, dir: String, centroids: Array[Array[Float]]): DataFrame = {
    import spark.implicits._
    graft.functions.CosineSimilarity.ensureRegistered(spark)

    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")

    // corpus annotated with its cell (at scale: the partitioning key)
    // in one map pass over the broadcast centroids
    val cb = spark.sparkContext.broadcast(centroids)
    val cellOf = udf { (e: Seq[Float]) => LocalKMeans.assign(cb.value, e.toArray) }
    val assigned = emb.select($"vec_id", $"embedding", cellOf($"embedding").as("cell"))

    // centroids as a tiny literal-backed frame (nlist × dim)
    val centers = centroids.zipWithIndex.map { case (c, i) =>
      (i, c.toSeq)
    }.toSeq.toDF("cell", "centroid")

    // each query probes its nprobe nearest cells — by EUCLIDEAN
    // distance, the metric k-means partitioned the space with (ranking
    // cells by cosine mismatches the cell geometry and costs recall):
    // ||q-c||² = ||q||² - 2q·c + ||c||², and ||q||² is constant per
    // query, so rank by ||c||² - 2q·c.
    val queries = assigned.filter($"vec_id" < NQueries)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val probes = queries.crossJoin(broadcast(centers))
      .withColumn("cdist",
        Similarity.dot($"centroid", $"centroid") - lit(2.0) * Similarity.dot($"qvec", $"centroid"))
      .withColumn("crk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"cdist".asc, $"cell")))
      .filter($"crk" <= NProbe)
      .select($"qid", $"qvec", $"cell")

    // probe join: only vectors in probed cells are scored
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("vid"),
        Similarity.cosine($"qvec", $"embedding").as("sim"))

    val fin = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"sim".desc, $"vid")
    scored
      .withColumn("rk", row_number().over(fin)).filter($"rk" <= K)
      .select($"qid", $"rk".cast("long").as("rk"), $"vid",
        floor(lit(1000.0) * $"sim" + lit(0.5)).cast("long").as("sim_mbp"))
      .orderBy($"qid", $"rk")
  }
}
