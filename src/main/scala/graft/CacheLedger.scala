package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** Session-wide registry of persisted frames that operators RETURN.
  *
  * Several operators (textNgramNovelty, assignSplits, dedupNgramJaccard)
  * hand back a frame that is persisted and pre-materialized — that is
  * what lets them release their much larger persisted intermediates
  * (exploded shingle/digest frames) before returning. The returned
  * cache entry itself, however, outlives the call: a library caller who
  * never unpersists it strands one entry per invocation for the life of
  * the session. The gate harnesses drain it (Verify calls
  * `releaseAll()` + `catalog.clearCache()` after every query; Bench
  * before every timed run — clearCache alone frees the cached data but
  * would leave ledger entries, and their retained plan trees,
  * accumulating); library callers release the frames they were
  * returned in one call:
  *
  * {{{
  *   val novelty = CurationQueries.textNgramNovelty(spark, dir)
  *   novelty.write.parquet(out)
  *   CacheLedger.releaseAll()   // or novelty.unpersist() directly
  * }}}
  *
  * Unpersisting a frame twice (caller AND ledger) is a Spark no-op, so
  * double-release is safe. Leak checks can inspect [[registered]].
  */
object CacheLedger {
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, DataFrame)]()

  /** Record a frame the operator returns in persisted state; returns it
    * unchanged so call sites stay expression-shaped. */
  def register[T](tag: String, ds: Dataset[T]): Dataset[T] = {
    frames.add(tag -> ds.toDF())
    ds
  }

  /** Tags + frames registered and not yet released. */
  def registered: Seq[String] = {
    import scala.jdk.CollectionConverters._
    frames.asScala.map(_._1).toSeq
  }

  /** Unpersist every registered frame (non-blocking) and clear the
    * ledger. Safe against frames already released by their caller. */
  def releaseAll(): Unit = {
    var e = frames.poll()
    while (e != null) {
      e._2.unpersist(blocking = false)
      e = frames.poll()
    }
  }
}
