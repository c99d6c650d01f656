package graft.tools

import org.apache.spark.sql.functions._

import graft.Harness

/** Scratch diagnostic: where does dedup_ngram_jaccard's cost go as the
  * corpus scales? Reproduces the PPJoin pipeline's stage row counts —
  * prefix rows, raw prefix-bucket join pairs (the quadratic-in-bucket
  * term), candidates after the two positional bounds, verified pairs —
  * so a scaling decade can be attributed to a specific stage. Not part
  * of the library surface.
  *
  * Shares DedupQueries' shingle builder and Tau so the input side
  * cannot drift from the production query; the prefix/candidate
  * stages below MIRROR DedupQueries.ngramJaccardPairs (they need
  * per-stage count taps the production pipeline deliberately fuses
  * away) — any change to that pipeline's prefix formula or positional
  * bounds must be reflected here or the attribution evidence in
  * BASELINE.md goes stale. */
object NgramDiag {
  private val Tau = graft.operators.DedupQueries.Tau
  private val SketchWords = graft.operators.DedupQueries.SketchWords
  private val SketchMaxS = graft.operators.DedupQueries.SketchMaxS

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Harness.buildSession(dir, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val ex = graft.operators.DedupQueries.explodedShingles(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[diag] shingle_rows=${ex.count()}")

    val freq2 = ex.groupBy($"gram").agg(count(lit(1)).as("df")).filter($"df" >= 2)
    // the SAME arrays builder production runs (r12: sort + linear
    // mapPartitions pass — a diag measuring a plan production no
    // longer runs adjudicates nothing)
    val arrays = graft.operators.DedupQueries.ngramDocArrays(ex, freq2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[diag] docs=${arrays.count()}")

    val preAB = arrays.select($"doc_id", $"s", posexplode($"prefix").as(Seq("p0", "gram")))
      .select($"doc_id", $"s", ($"p0" + 1).as("p"), $"gram")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[diag] prefix_rows=${preAB.count()}")
    val occ = preAB.groupBy($"gram").agg(count(lit(1)).as("n"))
      .agg(max($"n").as("max_occ"), sum(expr("n * (n - 1) div 2")).as("bucket_pairs"))
      .collect()(0)
    println(s"[diag] max_bucket=${occ.getLong(0)} bucket_pair_rows=${occ.getLong(1)}")

    var t0 = System.nanoTime()
    val joined = preAB.as("a").join(preAB.as("b"),
        $"a.gram" === $"b.gram" && $"a.doc_id" < $"b.doc_id" &&
          $"b.s" >= ceil($"a.s" * Tau) && $"a.s" >= ceil($"b.s" * Tau))
    val rawPairRows = joined.count()
    println(f"[diag] joined_rows_after_length=$rawPairRows (${(System.nanoTime() - t0) / 1e9}%.1f s)")

    t0 = System.nanoTime()
    val candidates = joined
      .groupBy($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        $"a.s".as("sa"), $"b.s".as("sb"))
      .agg(min($"a.p").as("pa"), min($"b.p").as("pb"),
        max($"a.p").as("qa"), max($"b.p").as("qb"), count(lit(1)).as("c"))
      .filter(lit(1) + least($"sa" - $"pa", $"sb" - $"pb") >=
        expr("(7 * (sa + sb) + 16) div 17") &&
        $"c" + least($"sa" - $"qa", $"sb" - $"qb") >=
        expr("(7 * (sa + sb) + 16) div 17"))
      .select($"id_a", $"id_b", $"sa", $"sb")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(f"[diag] candidates=${candidates.count()} (${(System.nanoTime() - t0) / 1e9}%.1f s)")

    // round-7 sketch prune tap: how many candidates survive the
    // 32-bucket count-sketch bound (these are the only pairs that
    // ever fetch full gram arrays in the production verify)
    t0 = System.nanoTime()
    val skA = arrays.select($"doc_id".as("id_a") +:
      (0 until SketchWords).map(w => col(s"sk$w").as(s"ska$w")): _*)
    val skB = arrays.select($"doc_id".as("id_b") +:
      (0 until SketchWords).map(w => col(s"sk$w").as(s"skb$w")): _*)
    val minSum = (for { w <- 0 until SketchWords; b <- 0 until 4 } yield
      least(shiftright(col(s"ska$w"), 16 * b).bitwiseAND(lit(0xFFFFL)),
        shiftright(col(s"skb$w"), 16 * b).bitwiseAND(lit(0xFFFFL))))
      .reduce(_ + _)
    val survivors = candidates.join(skA, "id_a").join(skB, "id_b")
      .filter($"sa" >= SketchMaxS || $"sb" >= SketchMaxS ||
        lit(17L) * minSum >= lit(7L) * ($"sa" + $"sb"))
      .count()
    println(f"[diag] sketch_survivors=$survivors (${(System.nanoTime() - t0) / 1e9}%.1f s)")

    // distinct pairs before positional bounds — how much do the bounds buy?
    t0 = System.nanoTime()
    val distinctPairs = joined.select($"a.doc_id", $"b.doc_id").distinct().count()
    println(f"[diag] distinct_pairs_no_positional=$distinctPairs (${(System.nanoTime() - t0) / 1e9}%.1f s)")

    preAB.unpersist()
    ex.unpersist()
    arrays.unpersist()
    candidates.unpersist()
    spark.stop()
  }
}
