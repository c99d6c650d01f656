package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shared stage-metrics tap for the diagnostic mains (GraphDiag,
  * CellDiag): accumulates per-stage shuffle/spill/input/output bytes
  * via a listener and drains them per measured phase. ONE definition —
  * two drifting copies of the settle heuristic or the metric set would
  * silently measure different things (the round-9 review caught the
  * copy-paste). Not part of the library surface.
  */
final class MetricsDrain(spark: SparkSession) {
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

  private def total: Long =
    shufWrite.get + shufRead.get + memSpill.get + diskSpill.get +
      inputB.get + outputB.get

  /** Wall-clock for the phase stops at the CALL, then the async
    * listener bus is polled until the counters stop moving (a fixed
    * sleep under-drained after multi-GB-shuffle phases, crediting tail
    * bytes to the NEXT phase; the private waitUntilEmpty is
    * off-limits). Returns the phase wall in seconds. */
  def settle(t0: Long): Double = {
    val wall = (System.nanoTime() - t0) / 1e9
    var prev = -1L
    var waited = 0
    while (total != prev && waited < 20) {
      prev = total
      Thread.sleep(150)
      waited += 1
    }
    wall
  }

  /** settle + print one line with all six counters, resetting them. */
  def drain(tag: String, t0: Long): Unit = {
    val wall = settle(t0)
    println(f"[diag] $tag%-12s wall=$wall%8.2f s " +
      f"in=${inputB.getAndSet(0) / 1e9}%6.2f GB out=${outputB.getAndSet(0) / 1e9}%6.2f GB " +
      f"shufW=${shufWrite.getAndSet(0) / 1e9}%6.2f GB shufR=${shufRead.getAndSet(0) / 1e9}%6.2f GB " +
      f"memSpill=${memSpill.getAndSet(0) / 1e9}%6.2f GB diskSpill=${diskSpill.getAndSet(0) / 1e9}%6.2f GB")
  }
}
