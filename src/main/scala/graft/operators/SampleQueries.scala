package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.BottomK

/** Deterministic group-wise sampling (SURVEY §2 item 37): the k rows
  * per group with the smallest cryptographic-hash key — a consistent
  * sample that is stable across runs, partitionings, and incremental
  * merges (bottom-k sketch). Runs as the custom `graft_bottomk`
  * TypedImperativeAggregate: partial map-side combine keeps at most k
  * rows per (task, group) in flight, where the equivalent rank-window
  * would shuffle the entire corpus before ranking.
  */
object SampleQueries {

  /** 5-per-event_type deterministic sample of events, keyed by
    * sha256(event_id) — sha256 is identical in DuckDB, so this is a
    * full SQL hash gate despite the custom aggregate. */
  def qSampleDeterministic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    BottomK.ensureRegistered(spark)
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(call_function("graft_bottomk",
        sha2($"event_id".cast("string"), 256), $"event_id", lit(5)).as("sample"))
      .select($"event_type", posexplode($"sample").as(Seq("pos", "s")))
      .select($"event_type", ($"pos" + 1).cast("long").as("rk"), $"s.value".as("event_id"))
      .orderBy($"event_type", $"rk")
  }
}
