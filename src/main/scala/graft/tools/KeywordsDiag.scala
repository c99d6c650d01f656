package graft.tools

import graft.Harness

/** Scratch: where does text_keywords go superlinear at sf100 — the
  * df-join exchange or the rank window's per-partition sort? Times the
  * window plan, the graft_topk aggregate variant, and prints the
  * window plan so the join strategy (AQE broadcast or exchange) is
  * visible. */
object KeywordsDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Harness.buildSession(dir, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val w = graft.operators.PipelineQueries.textKeywords(spark, dir)
    w.explain("formatted")
    var t0 = System.nanoTime()
    println(s"[diag] window rows=${w.count()} (${(System.nanoTime() - t0) / 1e9} s)")
    spark.catalog.clearCache()
    t0 = System.nanoTime()
    val k = graft.operators.PipelineQueries.textKeywordsTopK(spark, dir)
    println(s"[diag] topk rows=${k.count()} (${(System.nanoTime() - t0) / 1e9} s)")
    spark.stop()
  }
}
