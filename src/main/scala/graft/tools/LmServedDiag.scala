package graft.tools

import org.apache.spark.sql.functions._

import graft.Harness

/** Scratch diagnostic: isolate text_lm_score_head_served's SCORING
  * join term — string-keyed (r11) vs xxhash64-keyed (r12) — with the
  * shared inputs fixed: the per-doc gram counts are built and persisted
  * once, the model is trained/saved/loaded once, and the two scoring
  * formulations alternate inside one JVM (shared JIT, shared cache), so
  * the delta is the join-key representation and nothing else. The
  * full-cell A/B at sf10 swings ±60% on this box (BASELINE.md); this
  * is the tight attribution. Not part of the library surface. */
object LmServedDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Harness.buildSession(dir, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val path = s"/tmp/graft_io/lm_served_diag_${math.abs(dir.hashCode)}"
    val docGrams = graft.operators.CorpusQueries.bigramInstances(
        graft.Tables.widened(graft.Tables.documents(spark, dir)))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[diag] doc_gram_rows=${docGrams.count()}")
    graft.io.ModelIO.saveLmHead(
      graft.operators.CorpusQueries.lmBigramModelFromCounts(
        docGrams.groupBy($"g").agg(sum($"cnt").as("c2")), 2L), path)

    def scoreString() = {
      val model = graft.io.ModelIO.loadLmHead(spark, path)
      docGrams.join(broadcast(model.select($"g", $"bp")), Seq("g"), "left")
        .groupBy($"doc_id")
        .agg(sum($"cnt").as("n_bigrams"),
          sum($"cnt" * coalesce($"bp", lit(0L))).as("sum_bp"))
        .select($"doc_id", $"n_bigrams", $"sum_bp",
          floor($"sum_bp" / $"n_bigrams").cast("long").as("avg_bp"))
    }
    def scoreHashed() = {
      val model = graft.io.ModelIO.loadLmHead(spark, path)
        .select(xxhash64($"g").as("gh"), $"bp")
      docGrams.withColumn("gh", xxhash64($"g"))
        .join(broadcast(model), Seq("gh"), "left")
        .groupBy($"doc_id")
        .agg(sum($"cnt").as("n_bigrams"),
          sum($"cnt" * coalesce($"bp", lit(0L))).as("sum_bp"))
        .select($"doc_id", $"n_bigrams", $"sum_bp",
          floor($"sum_bp" / $"n_bigrams").cast("long").as("avg_bp"))
    }
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"[diag] $tag%s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmup once each, then alternate
    time("warmup_string")(scoreString()); time("warmup_hashed")(scoreHashed())
    (1 to reps).foreach { _ =>
      time("string")(scoreString()); time("hashed")(scoreHashed())
    }
    spark.stop()
  }
}
