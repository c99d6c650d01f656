package graft.tools

import java.nio.file.{Files, Paths}

/** Dev utility: write `.explain("formatted")` of named SparkEntry
  * queries (or all of them) to a directory, one file per query —
  * the plan evidence the optimization rounds commit under plans/.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> [query ...]
  * Env:   SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS (8),
  *        SPARK_GRAFT_SUFFIX (default "", e.g. "_before"/"_after").
  *
  * Queries that materialize internally (pagerank, k-means report)
  * return a driver-local/cached tail — the file still records it, with
  * a NOTE header, same caveat as tools.Explain.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error("usage: PlanDump <outDir> [query ...]"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_SUFFIX", "")
    val spark = graft.Harness.buildSession(dir, cpus)
    Files.createDirectories(Paths.get(outDir))
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.map(_._1)
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries.toMap.apply(n)(spark, dir)
        val qe = df.queryExecution
        val txt = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
        val note =
          if (txt.contains("LocalTableScan") || txt.contains("InMemoryTableScan"))
            "NOTE: internally-materialized result; this is the plan TAIL only\n\n"
          else ""
        Files.writeString(Paths.get(outDir, s"$n$suffix.txt"), note + txt)
        Console.err.println(s"[plandump] $n ok")
      } catch { case e: Throwable =>
        Console.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
