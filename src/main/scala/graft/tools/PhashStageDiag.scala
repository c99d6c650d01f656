package graft.tools

/** Times ONLY the phash corpus encode -> decode -> dHash stage (no
  * banding join, no persist) — isolates the codec cost the r11 fast
  * PNG path targets from the pair-pipeline noise. Not library surface.
  *
  * Run: runMain graft.tools.PhashStageDiag <sfDir> [repeat]
  */
object PhashStageDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Harness.buildSession(dir, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val ts = (1 to repeat).map { _ =>
      val t0 = System.nanoTime()
      graft.multimodal.Multimodal
        .decodeImagePhash(graft.operators.ImageDedupQueries.encodedCorpus(spark, dir))
        .toDF("media_id", "phash")
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[phashstage] $s%.2f s")
      s
    }
    println(f"[phashstage] min=${ts.min}%.2f")
    spark.stop()
  }
}
