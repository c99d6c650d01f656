package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // data-sized reduce parallelism (see Bench): one initial partition
    // per 64 MB of corpus, floored at the core count, capped at 16x —
    // identical to the old fixed value on small corpora
    val corpusBytes = Option(new java.io.File(sfDir).listFiles())
      .map(_.filter(_.getName.endsWith(".parquet")).map(_.length).sum).getOrElse(0L)
    val initParts =
      math.min(cpus.toInt * 16L, math.max(cpus.toInt.toLong, corpusBytes / (64L << 20)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initParts.toString)
      // scan splits via Spark's own adaptive formula (see Bench for
      // the full rationale): a fixed tiny target keeps small local
      // files parallel but turns one 13 GB sf100 file into thousands
      // of footer-re-reading tasks — superlinear in file size
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.sql.files.openCostInBytes", "2m")
      .config("spark.sql.files.minPartitionNum", s"${cpus.toInt * 4}")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as epoch-nanos long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated subset for local iteration; the driver
    // leaves it unset and gets every query
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release frames the operators persisted (dedup pipelines cache
      // intermediates); keeps one query's cache from outliving its dump
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    val q = graft.logging.JsonLogger.quote _
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
