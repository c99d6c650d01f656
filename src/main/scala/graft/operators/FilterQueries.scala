package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.filtering.EventFilter

/** Correctness-gate queries for the event-filtering module (SURVEY
  * §2.3). Each compiles an AWS-syntax filter document to a Column over
  * the `events` table and aggregates the surviving rows; the DuckDB
  * oracle states the same predicate in plain SQL.
  */
object FilterQueries {

  /** OR of two filters: purchases, or clicks with value >= 50.
    * All criteria hit NATIVE columns, so the compiled predicate sits in
    * the scan's PushedFilters. */
  def filterEventsBasic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val filters =
      """[
        |  {"event_type": ["purchase"]},
        |  {"event_type": ["click"], "value": [{"numeric": [">=", 50]}]}
        |]""".stripMargin
    val ev = Tables.events(spark, dir)
    ev.filter(EventFilter.compile(filters, ev))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"event_type")
  }

  /** Nested path into the JSON `props` document: 20 < props.k <= 60,
    * AND a native range on user_id — exercises the variant resolver and
    * AND-across-fields composition. */
  def filterEventsNested(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val filters =
      """[
        |  {"props": {"k": [{"numeric": [">", 20, "<=", 60]}]},
        |   "user_id": [{"numeric": ["<", 100]}]}
        |]""".stripMargin
    val ev = Tables.events(spark, dir)
    ev.filter(EventFilter.compile(filters, ev, jsonCols = Set("props")))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(get_json_object($"props", "$.k").cast("long")).as("sum_k"))
      .orderBy($"event_type")
  }

  /** `prefix` + `anything-but` + `exists` criteria: event types starting
    * with "s", or non-click/view/error events under value 10 that carry
    * a props document. */
  def filterEventsPrefixAnybut(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val filters =
      """[
        |  {"event_type": [{"prefix": "s"}]},
        |  {"event_type": [{"anything-but": ["click", "view", "error"]}],
        |   "value": [{"numeric": ["<", 10]}],
        |   "props": [{"exists": true}]}
        |]""".stripMargin
    val ev = Tables.events(spark, dir)
    ev.filter(EventFilter.compile(filters, ev))
      .groupBy($"event_type")
      // exact-integer average (see Analytics.q1PricingSummary): values
      // quantize to 4 decimals per row, sum as longs (associative),
      // round half-up once — round(avg(..), 4) of a bounded-magnitude
      // average is the cross-engine boundary-flake class the sf0.1
      // gate caught in q_antijoin_parts
      .agg(count(lit(1)).as("n"),
        sum(floor(graft.functions.Guards.finiteOrNull($"value") * 10000 + lit(0.5))
          .cast("long")).as("v_u"))
      .select($"event_type", $"n",
        // pure long round-half-up (see Analytics.q1PricingSummary);
        // double-typed division — a decimal literal inside `expr`
        // would make the column DECIMAL vs the oracle's DOUBLE
        (expr("(2 * v_u + n) div (2 * n)")
          .cast("double") / lit(10000.0d)).as("avg_value"))
      .orderBy($"event_type")
  }
}
