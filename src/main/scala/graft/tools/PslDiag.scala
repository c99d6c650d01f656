package graft.tools

import org.apache.spark.sql.functions._

/** Isolated cost comparison of the three registrable-domain forms over
  * the gate corpus's host column (the VERDICT r10 #4 question: does
  * the full ~9.5k-rule table pay its way in each form?):
  *
  *  - `embedded`: the ~230-rule subset as the shipped alternation
  *    regex ([[graft.text.UrlFunctions.registrableDomain]]);
  *  - `full_lookup`: the complete publicsuffix.org table as per-width
  *    codegen'd InSet probes
  *    ([[graft.text.UrlFunctions.registrableDomainFull]]);
  *  - `full_regex`: the complete table forced into the embedded form's
  *    alternation regex — the naive "swap in the full generated list,
  *    same expression shape" reading, measured to document WHY the
  *    lookup form is the production swap (java.util.regex alternation
  *    is O(alternatives) per mismatch position).
  *
  * Each variant is forced through a sum(length(domain)) aggregate
  * (evaluates every row, keeps nothing), best-of-N wall seconds with
  * the first (codegen + regex compile) run reported separately.
  * Emits one JSON line per variant; run serialized like every bench
  * (BenchControlled discipline).
  */
object PslDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    val spark = graft.Harness.buildSession(sfDir, cpus)
    import graft.text.{Psl, UrlFunctions}

    val rules = Psl.load()
    // the full table in the embedded form's alternation shape — built
    // with the same precedence chain (exceptions, wildcards desc,
    // normal multi-label desc, default)
    def alt(xs: Seq[String]): String =
      xs.map(java.util.regex.Pattern.quote).mkString("|")
    def fullRegexDomain(host: org.apache.spark.sql.Column) = {
      def lastK(k: Int) = substring_index(host, ".", -k)
      val excBranches = rules.exceptions.toSeq.sortBy(-_._1).map { case (w, hs) =>
        (host.rlike(s"(^|\\.)(${alt(hs)})$$"), lastK(w))
      }
      val ruleBranches = (rules.maxWidth to 2 by -1).flatMap { w =>
        val conds = Seq(
          rules.normal.get(w).map(ns => host.rlike(s"(^|\\.)(${alt(ns)})$$")),
          rules.wildcardBases.get(w - 1).map(bs => host.rlike(s"\\.(${alt(bs)})$$"))
        ).flatten
        conds.reduceOption(_ || _).map(c => (c, lastK(w + 1)))
      }
      (excBranches ++ ruleBranches)
        .foldLeft(when(UrlFunctions.isIpv4(host), host)) {
          case (acc, (c, v)) => acc.when(c, v)
        }
        .otherwise(lastK(2))
    }

    val hosts = UrlFunctions.urlHost(graft.operators.UrlQueries.urlCol(
      coalesce(col("source"), lit("")), col("doc_id")))
    val variants: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "embedded" -> UrlFunctions.registrableDomain(hosts),
      "full_lookup" -> UrlFunctions.registrableDomainFull(hosts, rules),
      "full_regex" -> fullRegexDomain(hosts))

    val jq = graft.logging.JsonLogger.quote _
    variants.foreach { case (name, domain) =>
      val times = (1 to repeat).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        graft.Tables.documents(spark, sfDir)
          .select(domain.as("d"))
          .agg(sum(length(col("d"))), count(lit(1))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"metric":"psl_diag","variant":${jq(name)},"sf":${jq(sfDir)},""" +
        f""""first_sec":${times.head}%.3f,"best_sec":${times.min}%.3f,""" +
        f""""rules":${if (name == "embedded") 230 else rules.ruleCount}}""")
    }
    spark.stop()
  }
}
