package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** AsofJoin semantics: backward/forward, inclusivity, tolerance, nulls,
  * and agreement with a brute-force per-row definition on real data. */
class AsofSpec extends AnyFunSuite with SparkSpec {

  import org.apache.spark.sql.functions._

  private def trades = {
    import spark.implicits._
    Seq(
      (1L, 100L, "t1"), // before any quote for key 1
      (1L, 205L, "t2"), // between quotes at 200 and 300
      (1L, 300L, "t3"), // exactly at a quote: inclusive match
      (2L, 500L, "t4"), // key with no quotes at all
      (1L, 990L, "t5")  // far after the last quote
    ).toDF("k", "t", "tag")
  }

  private def quotes = {
    import spark.implicits._
    Seq(
      (1L, 200L, 10.0),
      (1L, 300L, 11.0),
      (1L, 400L, 12.0),
      (3L, 100L, 99.0) // key never queried
    ).toDF("k", "t", "px")
  }

  test("backward: latest right at-or-before, null when none") {
    val got = AsofJoin.backward(trades, quotes, "k", "t", "k", "t", "q")
      .select(col("tag"), col("q.px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      "t1" -> None,          // 100 < first quote 200
      "t2" -> Some(10.0),    // 205 -> quote@200
      "t3" -> Some(11.0),    // 300 -> quote@300 (inclusive)
      "t4" -> None,          // no quotes for key 2
      "t5" -> Some(12.0)))   // 990 -> quote@400
  }

  test("forward: earliest right at-or-after") {
    val got = AsofJoin.forward(trades, quotes, "k", "t", "k", "t", "q")
      .select(col("tag"), col("q.px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got === Map(
      "t1" -> Some(10.0),    // 100 -> quote@200
      "t2" -> Some(11.0),    // 205 -> quote@300
      "t3" -> Some(11.0),    // 300 -> quote@300 (inclusive)
      "t4" -> None,
      "t5" -> None))         // nothing after 990
  }

  test("tolerance bounds the match age in both directions") {
    val back = AsofJoin.backward(trades, quotes, "k", "t", "k", "t", "q",
        tolerance = Some(50L))
      .select(col("tag"), col("q.px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(back("t2") === Some(10.0)) // age 5 <= 50
    assert(back("t5") === None)       // age 590 > 50
    val fwd = AsofJoin.forward(trades, quotes, "k", "t", "k", "t", "q",
        tolerance = Some(50L))
      .select(col("tag"), col("q.px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(fwd("t1") === None)        // 100 -> 200 is 100 > 50
    assert(fwd("t2") === None)        // 205 -> 300 is 95 > 50
    assert(fwd("t3") === Some(11.0))  // age 0
  }

  test("null right keys/times never match; null left key comes back unmatched") {
    import spark.implicits._
    val l = Seq((Some(1L), 100L, "a"), (None: Option[Long], 100L, "b"))
      .toDF("k", "t", "tag")
    val r = Seq((Some(1L), Some(50L), 1.0), (None: Option[Long], Some(60L), 2.0),
      (Some(1L), None: Option[Long], 3.0)).toDF("k", "t", "px")
    val got = AsofJoin.backward(l, r, "k", "t", "k", "t", "q")
      .select($"tag", $"q.px").collect()
      .map(row => row.getString(0) -> Option(row.get(1))).toMap
    assert(got === Map("a" -> Some(1.0), "b" -> None))
    // forward direction: same null contract (a NULL-time left row must
    // come back unmatched, not grab the min-time right row)
    val lNullT = Seq((Some(1L), Some(40L), "c"), (Some(1L), None: Option[Long], "d"))
      .toDF("k", "t", "tag")
    val fwd = AsofJoin.forward(lNullT, r, "k", "t", "k", "t", "q")
      .select($"tag", $"q.px").collect()
      .map(row => row.getString(0) -> Option(row.get(1))).toMap
    assert(fwd === Map("c" -> Some(1.0), "d" -> None))
  }

  test("agrees with brute-force definition on real events/orders (sf0.001)") {
    import spark.implicits._
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts")
    val ord = Tables.orders(spark, sf)
      .select($"o_custkey",
        (unix_micros($"o_orderdate".cast("timestamp")) * 1000L).as("otn"), $"o_orderkey")
    // brute force: max right time <= left time via inequality join
    val brute = ev.join(ord, $"user_id" === $"o_custkey" && $"otn" <= $"ts", "left")
      .groupBy($"event_id").agg(max($"otn").as("otn"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val perDay = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey", $"otn").orderBy($"o_orderkey".desc)
    val dedup = ord.withColumn("rn", row_number().over(perDay)).filter($"rn" === 1).drop("rn")
    val got = AsofJoin.backward(ev, dedup, "user_id", "ts", "o_custkey", "otn", "o")
      .select($"event_id", $"o.otn")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === brute)
    assert(got.values.exists(_.nonEmpty), "expected at least one match")
  }
}
