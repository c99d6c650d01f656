package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time operators over the `events` table (SURVEY §2.7): batch
  * twins of the streaming pipelines in graft.streaming.EventStreams.
  *
  * `ts` is read as epoch NANOS (long) under the session's
  * `parquet.nanosAsLong`. Bucket arithmetic uses integer `div` — a
  * double division of a ~1.7e18 numerator has ~512ns of representation
  * error, enough to misround a bucket boundary.
  */
object EventQueries {

  private val HourNs = 3600L * 1000 * 1000 * 1000
  private val GapNs = 1800L * 1000 * 1000 * 1000 // 30 min session gap

  /** Tumbling 1-hour event-time window: count/sum/users per
    * (window, event_type). Single partial-agg shuffle on a key whose
    * cardinality grows with the time span — no skew funnel. */
  def eventsWindowedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("bucket_start_s",
        (expr(s"ts div $HourNs") * 3600).cast("long"))
      .groupBy($"bucket_start_s", $"event_type")
      .agg(count(lit(1)).as("n"),
        round(sum($"value"), 2).as("sum_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"bucket_start_s", $"event_type")
  }

  /** Sliding-window aggregate: 2-hour windows advancing every 30
    * minutes, so each event contributes to 4 overlapping windows. The
    * window memberships are generated map-side (each event explodes to
    * its covering window starts — exact integer arithmetic on epoch
    * nanos, identical in the oracle), then ONE (window, type) aggregate
    * shuffle; the 4× row fan-out never carries more than (start, type,
    * value, user_id). This is the batch twin of the streaming
    * `window(ts, len, slide)` aggregation (EventStreams.windowedCounts
    * covers the tumbling case; the spec drives the sliding case). */
  def eventsSlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val SlideNs = 1800000000000L // 30 min
    val Windows = 4 // len / slide
    Tables.events(spark, dir)
      // event at t covers window starts k*slide with t-len < k*slide
      // <= t, i.e. k in [t div slide - 3, t div slide] (epoch nanos are
      // far above len, so plain integer div is floor here)
      .select($"event_type", $"value", $"user_id",
        explode(sequence(
          expr(s"ts div $SlideNs") - (Windows - 1),
          expr(s"ts div $SlideNs"))).as("k"))
      .select(($"k" * (SlideNs / 1000000000L)).as("window_start_s"),
        $"event_type", $"value", $"user_id")
      .groupBy($"window_start_s", $"event_type")
      .agg(count(lit(1)).as("n"),
        round(sum($"value"), 2).as("sum_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"window_start_s", $"event_type")
  }

  /** Gap-based sessionization (30-min inactivity closes a session):
    * lag + cumulative-sum of session-start flags per user, then one
    * row per session. Partitioning key is user_id, whose cardinality
    * scales WITH the data (unlike a fixed-enum window key), so the
    * shuffle stays uniform at 100×. Total ordering within a user is
    * (ts, event_id) — deterministic under timestamp ties. */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeEvents(Tables.events(spark, dir))

  /** As-of join gate: attach each event's user's most recent order at
    * or before the event time (backward inclusive), then aggregate by
    * the matched order's priority. The right side is deduped to one row
    * per (custkey, orderdate) first — same-date order ties would make
    * "the most recent order" ambiguous across engines — keeping the max
    * orderkey (deterministic). Times meet as epoch nanos. */
  def eventsAsofOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"event_id", $"user_id", $"ts", $"value")
    val ord = Tables.orders(spark, dir)
      // orderdate is TIMESTAMP_NTZ; in this UTC session the cast is the
      // identity wall-clock, matching DuckDB's naive epoch_ns exactly
      .select($"o_custkey", (unix_micros($"o_orderdate".cast("timestamp")) * 1000L).as("otn"),
        $"o_orderkey", $"o_orderpriority")
    val perDay = Window.partitionBy($"o_custkey", $"otn").orderBy($"o_orderkey".desc)
    val dedup = ord.withColumn("rn", row_number().over(perDay)).filter($"rn" === 1).drop("rn")

    AsofJoin.backward(ev, dedup, "user_id", "ts", "o_custkey", "otn", rightAlias = "o")
      .groupBy(coalesce($"o.o_orderpriority", lit("NONE")).as("priority"))
      .agg(count(lit(1)).as("n"),
        round(sum($"value"), 2).as("sum_value"),
        sum(expr("(ts - o.otn) div 1000000000")).cast("long").as("sum_age_s"))
      .orderBy($"priority")
  }

  /** Attribution: each purchase matched to the user's most recent
    * click at most 1 hour earlier — the as-of join's TOLERANCE path
    * (batch twin of the stream-stream interval join in
    * streaming.EventStreams.attributionJoin). Right side deduped per
    * (user, ts) as in eventsAsofOrders. */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val perInstant = Window.partitionBy($"c_user", $"c_ts").orderBy($"c_id".desc)
    val dedupClicks = clicks.withColumn("rn", row_number().over(perInstant))
      .filter($"rn" === 1).drop("rn")

    AsofJoin.backward(purchases, dedupClicks, "user_id", "ts", "c_user", "c_ts",
        rightAlias = "c", tolerance = Some(HourNs))
      .groupBy(($"c".isNotNull).as("attributed"))
      .agg(count(lit(1)).as("n"),
        round(sum($"value"), 2).as("sum_value"),
        sum(expr("(ts - c.c_ts) div 1000000000")).cast("long").as("sum_lag_s"))
      .orderBy($"attributed")
  }

  /** Time-series gap fill + forward fill: each user's daily spend is
    * densified onto a contiguous day grid from their first to their
    * last active day, missing days forward-filled with the most recent
    * observed value, then summarized per day. The grid is generated
    * MAP-SIDE (`sequence` explode off each user's span — no join
    * against a calendar table), and both the span aggregate and the
    * fill window key on user_id, which scales with the data. Values
    * are exact cents end-to-end, so the gate is bit-exact.
    *
    * Scale note: grid size is users × span-days. At 100 TB the span is
    * bounded (a retention window), so the fan-out is a constant factor
    * on the user dimension — same shape as the sliding-window 4×. */
  def eventsGapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val DayNs = 86400L * 1000 * 1000 * 1000
    val daily = Tables.events(spark, dir)
      .select($"user_id", expr(s"ts div $DayNs").as("day_no"),
        round(graft.functions.Guards.finiteOrNull($"value") * 100).cast("long").as("cents"))
      .groupBy($"user_id", $"day_no")
      .agg(sum($"cents").as("cents"))

    val grid = daily.groupBy($"user_id")
      .agg(min($"day_no").as("lo"), max($"day_no").as("hi"))
      .select($"user_id", explode(sequence($"lo", $"hi")).as("day_no"))

    val byUserDay = Window.partitionBy($"user_id").orderBy($"day_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day_no"), "left")
      // the first grid day per user is observed by construction (the
      // span starts at an observed day), so the fill never sees a
      // leading null
      .withColumn("filled", last($"cents", ignoreNulls = true).over(byUserDay))
      .groupBy($"day_no")
      .agg(count(lit(1)).as("n_users"),
        sum(when($"cents".isNotNull, 1L).otherwise(0L)).as("n_observed"),
        sum($"filled").as("sum_filled_cents"))
      .orderBy($"day_no")
  }

  /** Windowed dedup — the BATCH twin of streaming
    * `dropDuplicatesWithinWatermark` (EventStreams.dedupeWithinWatermark):
    * occurrences of an id are duplicates of the KEPT occurrence if they
    * arrive within 1 hour of it; a later occurrence past the horizon
    * starts a fresh retention window (matching the streaming semantics,
    * where state for an id is evicted 1 h after it was admitted). One
    * id-key window; the horizon chain is a running comparison against
    * the last KEPT timestamp, computed as a per-id sorted-array pass.
    * NOTE the gate models duplicate arrivals by re-keying event_id mod
    * 1000, which makes each group's array O(corpus/1000) — fine for
    * the gate, but NOT the production shape: real duplicate ids repeat
    * a handful of times, and at scale the streaming twin
    * (dedupeWithinWatermark) or a lag-window formulation is the right
    * tool when a single id's occurrence count can grow with the
    * corpus. */
  def eventsDedupWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(($"event_id" % 1000).as("dup_id"), $"ts", $"event_id")
    // per dup_id: order occurrences by (ts, event_id); keep one, then
    // drop everything within the horizon of the kept one; next outside
    // occurrence is kept again. aggregate() walks the sorted occurrence
    // array carrying (lastKeptTs, keptCount, keptIdSum).
    val HorizonNs = 3600L * 1000 * 1000 * 1000
    ev.groupBy($"dup_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_id"))).as("occ"))
      .select($"dup_id", aggregate(
        $"occ",
        // initial "last kept" sits 2 horizons before epoch 0, so the
        // first occurrence is always outside the horizon (and the
        // subtraction cannot overflow, unlike a Long.MinValue sentinel)
        struct(lit(-2L * HorizonNs).as("last"), lit(0L).as("n"),
          lit(0L).as("id_sum")),
        (acc, x) =>
          when(x.getField("ts") - acc.getField("last") > HorizonNs,
            struct(x.getField("ts").as("last"), (acc.getField("n") + 1L).as("n"),
              (acc.getField("id_sum") + x.getField("event_id")).as("id_sum")))
            .otherwise(acc)).as("r"))
      .select($"dup_id", $"r.n".as("n_kept"), $"r.id_sum".as("kept_id_sum"))
      .orderBy($"dup_id")
  }

  /** Assign gap-based session ids: adds a `session_id` column to any
    * (user_id, ts:nanos, event_id, ...) frame, preserving the other
    * columns. THE definition of a session (gap, tie-break order) lives
    * here — sessionizeEvents and the path-mining query both build on
    * it, so they cannot diverge. */
  def withSessionIds(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("is_new",
        when($"prev_ts".isNull || $"ts" - $"prev_ts" > GapNs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"is_new").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "is_new")
  }

  /** Core batch sessionizer over any (user_id, ts:nanos, event_id)
    * frame — the batch twin of streaming.EventStreams.sessionize
    * (equivalence spec-tested on shared input). */
  def sessionizeEvents(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    withSessionIds(events)
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n"),
        expr(s"CAST((max(ts) - min(ts)) div 1000000000 AS BIGINT)").as("duration_s"))
      .orderBy($"user_id", $"session_id")
  }
}
