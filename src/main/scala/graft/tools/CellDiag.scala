package graft.tools

import org.apache.spark.sql.functions._

import graft.{Harness, Tables}

/** Phase-level diagnostic for the two round-9 heavy cells that
  * reproduced super-linear decades in matched isolated runs
  * (io_dsv_roundtrip 14.6x, text_lm_score 13.2x): splits each query
  * into its phases and taps per-phase shuffle/spill bytes via a stage
  * listener (GraphDiag's drain pattern), so the decade residual gets
  * attributed to a PHASE and a RESOURCE instead of argued about.
  * Not part of the library surface.
  *
  * Run: `runMain graft.tools.CellDiag <dsv|lm> <sfDir>`
  */
object CellDiag {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val spark = Harness.buildSession(dir, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    import java.util.concurrent.atomic.AtomicLong
    val shufWrite = new AtomicLong; val shufRead = new AtomicLong
    val memSpill = new AtomicLong; val diskSpill = new AtomicLong
    val inputB = new AtomicLong; val outputB = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        inputB.addAndGet(m.inputMetrics.bytesRead)
        outputB.addAndGet(m.outputMetrics.bytesWritten)
      }
    })
    def drain(tag: String, t0: Long): Unit = {
      val wall = (System.nanoTime() - t0) / 1e9
      var prev = -1L
      var cur = 0L
      var waited = 0
      while ({ cur = shufWrite.get + shufRead.get + memSpill.get + diskSpill.get +
          inputB.get + outputB.get; cur != prev && waited < 20 }) {
        Thread.sleep(150); prev = cur; waited += 1
      }
      println(f"[diag] $tag%-12s wall=$wall%8.2f s " +
        f"in=${inputB.getAndSet(0) / 1e9}%6.2f GB out=${outputB.getAndSet(0) / 1e9}%6.2f GB " +
        f"shufW=${shufWrite.getAndSet(0) / 1e9}%6.2f GB shufR=${shufRead.getAndSet(0) / 1e9}%6.2f GB " +
        f"memSpill=${memSpill.getAndSet(0) / 1e9}%6.2f GB diskSpill=${diskSpill.getAndSet(0) / 1e9}%6.2f GB")
    }

    mode match {
      case "dsv" =>
        val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag")
        val li = Tables.lineitem(spark, dir).select(cols.map(col): _*)
        val out = s"/tmp/graft_celldiag_dsv_${math.abs(dir.hashCode)}"
        var t0 = System.nanoTime()
        graft.io.GraftIO.write(li, out, graft.io.GraftIO.Dsv, gzip = true, sep = "|",
          chunks = spark.sparkContext.defaultParallelism)
        drain("write", t0)
        t0 = System.nanoTime()
        val agg = graft.io.GraftIO.read(spark, out, graft.io.GraftIO.Dsv,
            sep = "|", schema = Some(li.schema))
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("long").as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_price"),
            sum($"l_orderkey").as("sum_okey"), sum($"l_partkey").as("sum_pkey"))
        agg.collect()
        drain("read_agg", t0)
      case "lm" =>
        // phase split mirrors textLmScore exactly
        val docGrams = graft.operators.CorpusQueries
          .bigramInstances(Tables.widened(Tables.documents(spark, dir)))
          .groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        var t0 = System.nanoTime()
        docGrams.count()
        drain("doc_grams", t0)
        t0 = System.nanoTime()
        val model = graft.operators.CorpusQueries
          .lmBigramModelFromCounts(docGrams.groupBy($"g").agg(sum($"cnt").as("c2")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        model.count()
        drain("model", t0)
        t0 = System.nanoTime()
        docGrams.join(model, "g")
          .groupBy($"doc_id")
          .agg(sum($"cnt").as("n_bigrams"), sum($"cnt" * $"bp").as("sum_bp"))
          .select($"doc_id", $"n_bigrams", $"sum_bp",
            floor($"sum_bp" / $"n_bigrams").cast("long").as("avg_bp"))
          .write.format("noop").mode("overwrite").save()
        drain("score_join", t0)
        docGrams.unpersist(); model.unpersist()
    }
    spark.stop()
  }
}
