package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Controlled benchmark protocol: the driver-visible sf0.1 board
  * drifted 1.14x -> 1.19x -> 1.33x across rounds 7-9 while controlled
  * captures of the same trees read ~1.08x — the per-round board was
  * measuring ambient machine state (post-sf100 page-cache/THP wash,
  * concurrent JVMs), not plans. This main runs the SAME queries under
  * the conditions BASELINE.md's anchor was captured in, and records
  * the evidence of those conditions in the artifact itself:
  *
  *  - fully serialized: one child JVM at a time, nothing else running
  *    (the 1-min loadavg is recorded before every family so a
  *    contaminated run is visible, not arguable);
  *  - fresh JVM per query FAMILY: no cross-family heap/JIT/page-cache
  *    state, and a family is small enough (2-24 queries) that shuffle
  *    dirs and code-cache stay cold-start-shaped;
  *  - best-of-2 inside the child (SPARK_GRAFT_REPEAT): steady-state
  *    plan cost, not first-run codegen compilation.
  *
  * Forks `java -cp <this JVM's classpath> graft.Bench` per family —
  * build.sbt forks `runMain`, so java.class.path here is the real
  * application classpath, not the sbt launcher.
  *
  * Output: SPARK_GRAFT_CONTROLLED_OUT (default BENCH_CONTROLLED.json,
  * repo-tracked, driver-ingestible): a totals line, a per-family line,
  * then the full per-query map chunked 25 queries per JSON line (the
  * format the driver's tail capture keeps — see Bench.scala).
  *
  * Env knobs: SPARK_GRAFT_FAMILIES=csv runs a subset (used to append
  * cells for queries added later in a round); with
  * SPARK_GRAFT_CONTROLLED_MERGE=1 the existing artifact's cells are
  * carried over for families not re-run, so the artifact stays a
  * complete board. SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS /
  * SPARK_DRIVER_MEM flow through to the children.
  */
object BenchControlled {

  /** Family = the unit of JVM isolation. Prefix-derived with explicit
    * overrides for keys whose prefix lies (split_train_test is a text
    * curation op; doc_cluster/embed_* are the ANN/embedding family).
    */
  def family(q: String): String = q match {
    case s if s.startsWith("io_")         => "io"
    case s if s.startsWith("filter_")     => "filter"
    case s if s.startsWith("dedup_")      => "dedup"
    case s if s.startsWith("graph_")      => "graph"
    case s if s.startsWith("ann_") || s.startsWith("embed_") ||
               s.startsWith("doc_cluster") => "ann"
    case s if s.startsWith("text_") || s == "split_train_test" => "text"
    case s if s.startsWith("events_")     => "events"
    case s if s.startsWith("multimodal_") => "multimodal"
    case s if s.startsWith("url_")        => "url"
    case s if s.startsWith("docs_")       => "docs"
    case s if s.startsWith("q") => "analytics" // q1/q3/q5/q6/q_*
    case _ => "misc"
  }

  private def load1m(): Double =
    try Files.readString(Paths.get("/proc/loadavg")).split(" ")(0).toDouble
    catch { case _: Exception => -1.0 }

  private val CellRe = """"([a-z0-9_]+)":(-?[0-9][0-9.]*)""".r

  /** Pull the (name -> seconds) cells out of one of our own JSON lines
    * (the canonical Bench line or a controlled_chunk line). Names are
    * [a-z0-9_]+ and values plain decimals by construction, so a
    * full JSON parser buys nothing here.
    */
  def parseCells(line: String): Seq[(String, Double)] = {
    val i = line.indexOf("\"queries\":{")
    if (i < 0) return Seq.empty
    val body = line.substring(i + 11, line.indexOf('}', i))
    CellRe.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_CONTROLLED_OUT", "BENCH_CONTROLLED.json")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2")
    val onlyFams = sys.env.get("SPARK_GRAFT_FAMILIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val merge = sys.env.get("SPARK_GRAFT_CONTROLLED_MERGE").contains("1")
    // grouping=suite (default): N child JVMs each running the FULL
    // board best-of-2, per-cell min across children — the EXACT
    // methodology of BASELINE.md's anchor ("best per query over two
    // coherent suite runs, each itself best-of-2"). grouping=family:
    // one fresh JVM per query family — maximum isolation, but the
    // cells are NOT anchor-comparable: the HotSpot JIT warms across
    // QUERIES, not repeats, so a 4-query family JVM never reaches the
    // steady state a 100-query suite JVM reaches by its tenth query
    // (measured: multimodal_pipeline 6.19 s best-of-2 in a 4-query
    // JVM vs 0.42 s in the anchor's suite JVM — pure cold-JIT, the
    // plan is identical). Family mode is for adjudicating ONE cell's
    // isolated cost, not for board comparisons.
    val grouping = sys.env.getOrElse("SPARK_GRAFT_GROUPING", "suite")
    val suiteRuns = sys.env.getOrElse("SPARK_GRAFT_SUITE_RUNS", "2").toInt

    val startLoad = load1m()
    if (startLoad > 1.5)
      Console.err.println(f"[controlled] WARNING: starting 1-min load $startLoad%.2f > 1.5 — " +
        "the box is not idle; cells captured now are not controlled evidence")

    val allKeys = graft.SparkEntry.queries.keys.toSeq.sorted
    // units of JVM isolation: (label, queries-to-run). Suite mode runs
    // the whole (family-filtered) board per child; family mode runs
    // one family per child.
    val filteredKeys = allKeys.filter(k => onlyFams.forall(_.contains(family(k))))
    val selected: Seq[(String, Seq[String])] =
      if (grouping == "suite")
        (1 to suiteRuns).map(i => (s"suite$i", filteredKeys))
      else
        filteredKeys.groupBy(family).toSeq.sortBy(_._1)

    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")

    val cells = scala.collection.mutable.LinkedHashMap[String, Double]()
    val famMeta = scala.collection.mutable.LinkedHashMap[String, (Double, Double, Int)]()
    var anyError = false

    selected.foreach { case (fam, names) =>
      val lb = load1m()
      val outFile = s"/tmp/bench_controlled_$fam.json"
      val logFile = s"/tmp/bench_controlled_$fam.log"
      Files.deleteIfExists(Paths.get(outFile))
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        s"-Xmx$mem", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.environment().put("SPARK_GRAFT_CPUS", cpus)
      pb.environment().put("SPARK_GRAFT_REPEAT", repeat)
      pb.environment().put("SPARK_GRAFT_ONLY", names.mkString(","))
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", outFile)
      // children must NOT clobber the repo-tracked per-round artifact
      pb.environment().put("SPARK_GRAFT_BENCH_REPO", s"/tmp/bench_controlled_${fam}_repo.json")
      pb.redirectErrorStream(true)
      pb.redirectOutput(new java.io.File(logFile))
      val t0 = System.nanoTime()
      val proc = pb.start()
      // a wedged query must not wedge the whole protocol
      val finished = proc.waitFor(45, java.util.concurrent.TimeUnit.MINUTES)
      // destroyForcibly is ASYNCHRONOUS: exitValue() on a
      // not-yet-reaped child throws IllegalThreadStateException and
      // would kill the whole controlled run over one wedged family —
      // wait for the kill to complete before reading the exit status
      if (!finished) { proc.destroyForcibly(); proc.waitFor(); anyError = true }
      val famSec = (System.nanoTime() - t0) / 1e9
      val got =
        if (Files.exists(Paths.get(outFile))) parseCells(Files.readString(Paths.get(outFile)))
        else Seq.empty
      if (got.isEmpty || proc.exitValue() != 0) anyError = true
      got.foreach { case (k, v) =>
        if (v < 0) anyError = true
        // per-cell MIN across units — in suite mode this is exactly the
        // anchor's "best per query over N coherent suite runs"
        cells(k) = cells.get(k).filter(old => old >= 0 && (v < 0 || old <= v))
          .getOrElse(v)
      }
      famMeta(fam) = (lb, famSec, got.size)
      Console.err.println(f"[controlled] $fam%-10s load=$lb%.2f jvm=$famSec%.1fs " +
        f"cells=${got.size}/${names.size} sum=${got.map(_._2).filter(_ >= 0).sum}%.1fs")
    }

    // carry forward cells for queries not re-run this invocation
    if (merge && Files.exists(Paths.get(outPath))) {
      val ran = filteredKeys.toSet
      Files.readAllLines(Paths.get(outPath)).asScala
        .filter(_.contains("\"controlled_chunk\""))
        .flatMap(parseCells)
        .foreach { case (k, v) =>
          if (!ran.contains(k) && !cells.contains(k)) cells(k) = v }
    }

    val jq = graft.logging.JsonLogger.quote _
    def fmt(v: Double) =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val commit =
      try new String(Runtime.getRuntime.exec(Array("git", "rev-parse", "--short", "HEAD"))
        .getInputStream.readAllBytes()).trim
      catch { case _: Exception => "unknown" }
    val ordered = cells.toSeq.sortBy(_._1)
    val total = ordered.map(_._2).filter(_ >= 0).sum
    val loads = famMeta.values.map(_._1).filter(_ >= 0)
    val sb = new StringBuilder
    sb.append(s"""{"metric":"controlled_total","value":${fmt(total)},"unit":"sec",""" +
      s""""nqueries":${ordered.size},"sf":${jq(sfDir)},"commit":${jq(commit)},""" +
      s""""repeat":$repeat,"mode":${jq(s"serialized-$grouping")},""" +
      s""""load_1m_start":${fmt(startLoad)},"load_1m_max":${fmt(if (loads.isEmpty) -1 else loads.max)},""" +
      s""""errors":$anyError}""").append('\n')
    val fams = famMeta.map { case (f, (lb, sec, n)) =>
      jq(f) + ":{\"load_1m\":" + fmt(lb) + ",\"jvm_sec\":" + fmt(sec) + ",\"cells\":" + n + "}"
    }.mkString("{", ",", "}")
    sb.append(s"""{"metric":"controlled_families","families":$fams}""").append('\n')
    val chunks = ordered.grouped(25).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      val obj = c.map { case (k, v) => s"${jq(k)}:${fmt(v)}" }.mkString("{", ",", "}")
      sb.append(s"""{"metric":"controlled_chunk","part":${i + 1},"of":${chunks.size},"queries":$obj}""").append('\n')
    }
    Files.writeString(Paths.get(outPath), sb.toString)
    print(sb.toString)
    if (anyError) sys.exit(1)
  }
}
