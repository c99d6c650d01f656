package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the TRAINED model artifacts the ANN/text operators
  * otherwise re-derive on every run — the train/serve split of a
  * production pipeline: one sampling/training job fits the model and
  * writes it next to the corpus; every subsequent ingest/serve run
  * loads it instead of retraining, so results are reproducible across
  * runs BY CONSTRUCTION (bit-identical model → bit-identical
  * assignments/scores) and the training scan cost is paid once.
  *
  * Artifact sizes are bounded by contract, not by corpus: coarse
  * quantizers are nlist×dim floats, PQ codebooks subspaces×Ks×subdim,
  * BPE merge tables are capped at training time — all KBs to low MBs,
  * so the driver-side array round-trip mirrors the existing
  * LocalKMeans convention. The one corpus-shaped artifact (the
  * thresholded bigram LM head) stays a DataFrame end to end: saved
  * and loaded distributed, broadcast by its consumer exactly as the
  * inline-trained frame is.
  *
  * Floats round-trip bit-exact through parquet; every loader restores
  * training order from an explicit rank/id column (parquet row order
  * is not a contract), so load(save(m)) == m element for element.
  */
object ModelIO {

  /** Coarse-quantizer centroids (e.g. [[graft.similarity.LocalKMeans]]
    * output) as (id, vec) rows; `load` restores training order. */
  def saveCentroids(spark: SparkSession, centroids: Array[Array[Float]], path: String): Unit = {
    import spark.implicits._
    require(centroids.nonEmpty, "empty centroid set")
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("id", "vec")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def loadCentroids(spark: SparkSession, path: String): Array[Array[Float]] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select($"id".cast("int"), $"vec".cast("array<float>"))
      .orderBy($"id").as[(Int, Seq[Float])]
      .collect().map(_._2.toArray)
  }

  /** Product-quantizer codebooks, one centroid table per subspace,
    * as (subspace, code, vec) rows. */
  def saveCodebooks(spark: SparkSession, books: Array[Array[Array[Float]]], path: String): Unit = {
    import spark.implicits._
    require(books.nonEmpty && books.forall(_.nonEmpty), "empty codebook")
    val rows = for {
      (book, s) <- books.zipWithIndex
      (code, c) <- book.zipWithIndex
    } yield (s, c, code.toSeq)
    rows.toSeq.toDF("subspace", "code", "vec")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def loadCodebooks(spark: SparkSession, path: String): Array[Array[Array[Float]]] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select($"subspace".cast("int"), $"code".cast("int"), $"vec".cast("array<float>"))
      .orderBy($"subspace", $"code").as[(Int, Int, Seq[Float])]
      .collect()
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3.toArray))
  }

  /** Ranked BPE merge table ([[graft.text.Bpe.train]] output) as
    * (rank, left, right) rows; `load` restores merge order, which is
    * the whole semantics of a BPE table. */
  def saveBpeMerges(spark: SparkSession, merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def loadBpeMerges(spark: SparkSession, path: String): Vector[(String, String)] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select($"rank".cast("int"), $"left", $"right")
      .orderBy($"rank").as[(Int, String, String)]
      .collect().map(t => (t._2, t._3)).toVector
  }

  /** Thresholded bigram LM head (the broadcast scoring model of
    * text_lm_score_head): a (g, bp) frame, saved and loaded
    * DISTRIBUTED — never collected — because its row count is
    * vocabulary-shaped, not constant. The loaded frame is schema-
    * checked so a wrong path fails loudly at load, not as a silent
    * all-null scoring join. */
  def saveLmHead(model: DataFrame, path: String): Unit = {
    val cols = model.columns.toSet
    require(Set("g", "bp").subsetOf(cols), s"expected (g, bp) columns, got ${cols.mkString(",")}")
    model.select(col("g"), col("bp")).write.mode(SaveMode.Overwrite).parquet(path)
  }

  def loadLmHead(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val cols = df.columns.toSet
    require(Set("g", "bp").subsetOf(cols), s"not an LM head model at $path: columns ${cols.mkString(",")}")
    df.select(col("g").cast("string"), col("bp").cast("long"))
  }
}
