package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** RangeJoin: bucketed equi-join equals the naive BETWEEN join, with
  * SQL boundary/null semantics, regardless of bucket width. */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {

  import org.apache.spark.sql.functions._

  test("matches brute-force BETWEEN join; boundaries inclusive; spans many buckets") {
    import spark.implicits._
    val points = Seq(0.0, 3.99, 4.0, 10.0, 17.5, 100.0).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val intervals = Seq(
      (1L, 4.0, 10.0),    // both boundaries hit exactly
      (2L, -5.0, 0.0),    // negative lo, point at hi
      (3L, 0.5, 99.0),    // spans ~25 buckets at width 4
      (4L, 50.0, 50.0)    // degenerate single-point interval, no hits
    ).toDF("iid", "lo", "hi")
    for (width <- Seq(0.5, 4.0, 1000.0)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", width)
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = points.crossJoin(intervals)
        .filter($"p" >= $"lo" && $"p" <= $"hi")
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === brute, s"width=$width")
      assert(got.contains((2L, 1L)) && got.contains((3L, 1L)), s"width=$width boundaries")
    }
  }

  test("null points, null bounds, and inverted intervals match nothing") {
    import spark.implicits._
    val points = Seq(Some(5.0), None).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val intervals = Seq(
      (1L, Some(0.0), Some(10.0)),
      (2L, None: Option[Double], Some(10.0)),
      (3L, Some(0.0), None: Option[Double]),
      (4L, Some(10.0), Some(0.0)) // lo > hi
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 4.0)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L)))
  }

  test("agrees with brute force on real lineitem/part prices (sf0.001)") {
    import spark.implicits._
    val unit = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" / $"l_quantity").as("p"))
    val bands = Tables.part(spark, sf)
      .select($"p_partkey", ($"p_retailprice" - 2.0).as("lo"), ($"p_retailprice" + 2.0).as("hi"))
    // order-insensitive digest: xor of row hashes (a plain sum of
    // xxhash64 longs overflows under ANSI arithmetic)
    val digest = expr("bit_xor(xxhash64(l_orderkey, l_linenumber, p_partkey))")
    val got = RangeJoin.pointInInterval(unit, "p", bands, "lo", "hi", 4.0)
      .agg(count(lit(1)), digest).collect()(0)
    val brute = unit.crossJoin(bands).filter($"p" >= $"lo" && $"p" <= $"hi")
      .agg(count(lit(1)), digest).collect()(0)
    assert(got === brute)
    assert(got.getLong(0) > 0, "expected some in-band unit prices")
  }
}
