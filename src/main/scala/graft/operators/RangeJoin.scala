package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval range join.
  *
  * Spark plans a bare `p BETWEEN lo AND hi` join as
  * BroadcastNestedLoopJoin — O(points × intervals) work and a
  * full-broadcast memory cliff, the classic 100 TB trap for non-equi
  * joins. Re-keyed on a bucket id the join becomes an EQUI-join:
  * quantize the range axis into `bucketWidth`-wide buckets, replicate
  * each interval to every bucket it overlaps, key each point by the one
  * bucket containing it, hash-join on the bucket id, and keep exact
  * `[lo, hi]` containment with a map-side filter. Each (point,
  * interval) match meets in exactly one bucket — the point's — so no
  * dedup pass is needed.
  *
  * Scale: shuffle is O(points + intervals × avgSpan/bucketWidth), both
  * sides uniformly keyed; no broadcast of a scaling table. Pick
  * `bucketWidth` near the typical interval length: much smaller
  * replicates intervals, much larger admits false candidates that the
  * exact filter then discards.
  */
object RangeJoin {

  /** Inner-join `points` to every interval containing them.
    * Column names must not collide across the two frames. Intervals
    * with `lo > hi` or a NULL bound match nothing (SQL BETWEEN
    * semantics); NULL points match nothing. */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = col(pointCol); val lo = col(loCol); val hi = col(hiCol)
    val pb = points
      .filter(p.isNotNull)
      .withColumn("__bucket", floor(p / bucketWidth).cast("long"))
    val ib = intervals
      .filter(lo.isNotNull && hi.isNotNull && lo <= hi)
      .withColumn("__bucket", explode(sequence(
        floor(lo / bucketWidth).cast("long"), floor(hi / bucketWidth).cast("long"))))
    pb.join(ib, Seq("__bucket"))
      .filter(p >= lo && p <= hi)
      .drop("__bucket")
  }
}
