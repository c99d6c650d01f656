package graft.tools

/** Dev utility: print the executed-plan summary of named SparkEntry
  * queries (exchange count + scan/broadcast/ordered lines). Not part
  * of the library surface — a debugging main for plan audits.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Harness.buildSession(dir, "8")
    args.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      println(s"===== $n")
      val p = df.queryExecution.executedPlan.toString
      // queries that materialize internally (pagerank, k-means report)
      // return a driver-local / cached frame: the plan below is only
      // the tail — the real stages already ran eagerly inside the call
      // and must be audited from the Spark UI / event log, not here
      if (p.contains("LocalTableScan") || p.contains("InMemoryTableScan"))
        println("NOTE: internally-materialized result; this is the plan TAIL only")
      println("exchanges: " + p.linesIterator.count(_.contains("Exchange")))
      println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan parquet") ||
        l.contains("Broadcast") || l.contains("TakeOrdered")).map(_.trim.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
