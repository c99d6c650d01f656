package graft.tools

import org.apache.spark.sql.functions._

import graft.Harness
import graft.similarity.Similarity

/** Scratch diagnostic: candidate-pair volume of simhash blocking
  * schemes at a given scale. Not part of the library surface. */
object SimhashDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Harness.buildSession(dir, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val ex = graft.Tables.widened(graft.Tables.documents(spark, dir))
      .select($"doc_id", explode(graft.text.TextFunctions.wsTokens($"text")).as("tok"))
      .select($"doc_id", xxhash64($"tok").as("h"))
    val bitAggs = (0 until 64).map { i =>
      sum(when(shiftright($"h", i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    val sigExpr = (0 until 64).map(i =>
      when(col(s"b$i") >= 0, lit(1L << i)).otherwise(lit(0L))).reduce(_.bitwiseOR(_))
    val tS = System.nanoTime()
    val sigs = ex.groupBy($"doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select($"doc_id", sigExpr.as("sig"))
      .persist()
    val nDocs = sigs.count()
    println(f"[diag] docs=$nDocs sig_agg=${(System.nanoTime() - tS) / 1e9}%.1f s")

    def stats(name: String, bucketed: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val byBucket = bucketed.groupBy($"band", $"band_bits").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_buckets"),
          max($"n").as("max_occ"),
          sum(expr("n * (n - 1) div 2")).as("pairs"))
        .collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[diag] $name: buckets=${byBucket.getLong(0)} max_occ=${byBucket.getLong(1)} raw_pairs=${byBucket.getLong(2)} (${dt}%.1f s)")
    }

    stats("bands4x16", sigs.select($"doc_id",
      explode(Similarity.simhashBands($"sig", 4)).as("bb"))
      .select($"doc_id", $"bb.band", $"bb.band_bits"))
    stats("combos6c3", sigs.select($"doc_id",
      explode(Similarity.simhashBlockCombos($"sig", 6, 3)).as("bb"))
      .select($"doc_id", $"bb.band", $"bb.band_bits"))
    stats("combos5c2", sigs.select($"doc_id",
      explode(Similarity.simhashBlockCombos($"sig", 5, 3)).as("bb"))
      .select($"doc_id", $"bb.band", $"bb.band_bits"))

    // end-to-end band+join+verify timing per blocking, off the cached sigs
    def endToEnd(name: String, bandExpr: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      val buckets = Similarity.boundBuckets(
        sigs.select($"doc_id", $"sig", explode(bandExpr).as("bb"))
          .select($"doc_id", $"sig", $"bb.band", $"bb.band_bits"),
        Seq("band", "band_bits"), 10000)
      val n = buckets.as("a").join(buckets.as("b"),
          $"a.band" === $"b.band" && $"a.band_bits" === $"b.band_bits" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
          Similarity.hamming64($"a.sig", $"b.sig").cast("long").as("hamming"))
        .distinct()
        .filter($"hamming" <= 3)
        .count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[diag] e2e $name: verified_pairs=$n (${dt}%.1f s)")
    }
    endToEnd("bands4x16", Similarity.simhashBands($"sig", 4))
    endToEnd("combos6c3", Similarity.simhashBlockCombos($"sig", 6, 3))
    endToEnd("combos5c2", Similarity.simhashBlockCombos($"sig", 5, 3))

    sigs.unpersist()
    spark.catalog.clearCache()
    val tQ = System.nanoTime()
    val n = graft.operators.DedupQueries.dedupSimhash(spark, dir).count()
    println(f"[diag] real dedupSimhash: rows=$n (${(System.nanoTime() - tQ) / 1e9}%.1f s)")
    spark.stop()
  }
}
