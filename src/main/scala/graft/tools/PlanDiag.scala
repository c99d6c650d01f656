package graft.tools

import org.apache.spark.sql.functions._

import graft.Harness

/** Scratch: is a left-semi join on doc_id pushed below the shingle
  * explode (Generate) and into the parquet scan? */
object PlanDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Harness.buildSession(dir, sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    import spark.implicits._

    val ex = graft.Tables.widened(graft.Tables.documents(spark, dir))
      .select($"doc_id",
        explode(graft.similarity.Similarity.wordNgramStructs(
          graft.text.TextFunctions.wsTokens($"text"), 3)).as("x"))
      .select($"doc_id", $"x.s".as("s"), xxhash64($"x.gram").as("gram"))
    val ids = Seq(1L, 5L, 9L).toDF("doc_id")
    val semi = ex.join(ids, Seq("doc_id"), "left_semi")
      .groupBy($"doc_id").agg(sort_array(collect_list($"gram")).as("g"))
    semi.explain("formatted")
    spark.stop()
  }
}
