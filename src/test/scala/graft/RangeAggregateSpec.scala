package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeAggregate

/** RangeAggregate: the sweep's band sums equal the brute-force BETWEEN
  * join + groupBy, with SQL boundary/null semantics. */
class RangeAggregateSpec extends AnyFunSuite with SparkSpec {

  import org.apache.spark.sql.functions._

  test("band sums equal brute force; boundaries inclusive; long and double measures") {
    import spark.implicits._
    val points = Seq(
      (0.0, 1L, 0.5), (3.99, 2L, 1.5), (4.0, 4L, 2.5), (4.0, 8L, 3.5),
      (10.0, 16L, 4.5), (17.5, 32L, 5.5), (100.0, 64L, 6.5), (-7.25, 128L, 7.5),
    ).toDF("p", "n", "x")
    val intervals = Seq(
      (1L, 4.0, 10.0),     // both boundaries exact, duplicate point value at lo
      (2L, -10.0, 0.0),    // negative lo, point at hi
      (3L, 0.5, 99.0),     // wide band
      (4L, 50.0, 50.0),    // degenerate, empty
      (5L, 4.0, 4.0),      // degenerate, two tied points
    ).toDF("iid", "lo", "hi")
    val got = RangeAggregate.bandSums(points, "p", Seq("n", "x"), intervals, "iid", "lo", "hi")
      .select($"iid", $"n_sum", $"x_sum")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val brute = points.crossJoin(intervals)
      .filter($"p" >= $"lo" && $"p" <= $"hi")
      .groupBy($"iid").agg(sum($"n").as("n"), sum($"x").as("x"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) === brute(1L))
    assert(got(2L) === brute(2L))
    assert(got(3L) === brute(3L))
    assert(got(5L) === brute(5L))
    assert(got(4L) === ((0L, 0.0)), "empty band must be zero, not missing")
    assert(got.size === 5, "every interval row must come back")
  }

  test("null points, null bounds, inverted intervals, null measures") {
    import spark.implicits._
    val points = Seq(
      (Some(5.0), Some(3L)), (None, Some(100L)), (Some(6.0), None),
    ).toDF("p", "n")
    val intervals = Seq(
      (1L, Some(0.0), Some(10.0)),
      (2L, None: Option[Double], Some(10.0)),
      (3L, Some(0.0), None: Option[Double]),
      (4L, Some(10.0), Some(0.0)), // lo > hi
    ).toDF("iid", "lo", "hi")
    val got = RangeAggregate.bandSums(points, "p", Seq("n"), intervals, "iid", "lo", "hi")
      .select($"iid", $"n_sum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // null point skipped, null measure counts 0, null/inverted bounds zero
    assert(got === Map(1L -> 3L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("randomized: sweep equals brute force across many overlapping bands") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = Seq.tabulate(500) { i =>
      (math.floor(rnd.nextDouble() * 400) / 4.0, rnd.nextInt(9).toLong)
    }.toDF("p", "n")
    val intervals = Seq.tabulate(120) { i =>
      val lo = math.floor(rnd.nextDouble() * 400) / 4.0
      (i.toLong, lo, lo + math.floor(rnd.nextDouble() * 80) / 4.0)
    }.toDF("iid", "lo", "hi")
    val got = RangeAggregate.bandSums(points, "p", Seq("n"), intervals, "iid", "lo", "hi")
      .select($"iid", $"n_sum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val brute = points.crossJoin(intervals)
      .filter($"p" >= $"lo" && $"p" <= $"hi")
      .groupBy($"iid").agg(sum($"n").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    intervals.select($"iid").collect().map(_.getLong(0)).foreach { iid =>
      assert(got(iid) === brute.getOrElse(iid, 0L), s"iid=$iid")
    }
  }

  test("agrees with the pair join on real lineitem/part prices (sf0.001)") {
    import spark.implicits._
    val got = graft.operators.Analytics.qRangeJoin(spark, sf).collect()
    val pts = Tables.lineitem(spark, sf)
      .select(($"l_extendedprice" / $"l_quantity").as("p"))
    val bands = Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand",
        ($"p_retailprice" - 2.0).as("lo"), ($"p_retailprice" + 2.0).as("hi"))
    val brute = graft.operators.RangeJoin
      .pointInInterval(pts, "p", bands, "lo", "hi", 4.0)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"),
        sum(floor($"p")).cast("long").as("sum_unit_floor"),
        countDistinct($"p_partkey").as("n_parts"))
      .orderBy($"p_brand").collect()
    assert(got.map(_.toSeq).toSeq === brute.map(_.toSeq).toSeq)
    assert(got.nonEmpty)
  }
}
