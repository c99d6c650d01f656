package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, RangeJoin}

/** Property-based parity for the custom join operators: random keyed
  * time-series / interval sets, compared row-for-row against direct
  * in-memory reference implementations of the declared semantics. */
class JoinPropertySpec extends AnyFunSuite with SparkSpec {

  private val Rounds = 12

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- as-of ----------------------------------------------------------

  private val asofGen = for {
    nl <- Gen.choose(0, 40)
    nr <- Gen.choose(0, 40)
    lefts <- Gen.listOfN(nl, for {
      k <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 50L)
    } yield (k, t))
    rights <- Gen.listOfN(nr, for {
      k <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 50L); v <- Gen.choose(0L, 999L)
    } yield (k, t, v))
  } yield (lefts, rights)

  test("asof backward/forward equals in-memory reference on random data") {
    import spark.implicits._
    for (round <- 1 to Rounds) {
      val (lefts0, rights0) = sample(asofGen, 1000 + round)
      // unique (key,time) per side: as-of is only well-defined up to
      // same-instant ties, which callers dedupe (see eventsAsofOrders)
      val lefts = lefts0.distinct.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rights = rights0.map { case (k, t, v) => ((k, t), v) }.toMap.toSeq
        .map { case ((k, t), v) => (k, t, v) }
      val l = lefts.toDF("lid", "k", "t")
      val r = rights.toDF("k", "t", "v")

      def reference(forward: Boolean): Map[Long, Option[Long]] =
        lefts.map { case (lid, k, t) =>
          val c = rights.filter(rr => rr._1 == k && (if (forward) rr._2 >= t else rr._2 <= t))
          val best = if (c.isEmpty) None
            else Some(if (forward) c.minBy(_._2) else c.maxBy(_._2))
          lid -> best.map(_._3)
        }.toMap

      if (lefts.nonEmpty) {
        val back = AsofJoin.backward(l, r, "k", "t", "k", "t", "m")
          .select($"lid", $"m.v").collect()
          .map(row => row.getLong(0) -> Option(row.get(1)).map(_.asInstanceOf[Long])).toMap
        assert(back === reference(forward = false), s"backward round $round")
        val fwd = AsofJoin.forward(l, r, "k", "t", "k", "t", "m")
          .select($"lid", $"m.v").collect()
          .map(row => row.getLong(0) -> Option(row.get(1)).map(_.asInstanceOf[Long])).toMap
        assert(fwd === reference(forward = true), s"forward round $round")
      }
    }
  }

  // ---- range ----------------------------------------------------------

  private val rangeGen = for {
    np <- Gen.choose(0, 50)
    ni <- Gen.choose(0, 30)
    points <- Gen.listOfN(np, Gen.choose(-100.0, 100.0))
    intervals <- Gen.listOfN(ni, for {
      lo <- Gen.choose(-110.0, 110.0); len <- Gen.choose(0.0, 40.0)
    } yield (lo, lo + len))
    width <- Gen.oneOf(0.7, 5.0, 64.0)
  } yield (points, intervals, width)

  test("range join equals in-memory reference on random data") {
    import spark.implicits._
    for (round <- 1 to Rounds) {
      val (points, intervals, width) = sample(rangeGen, 2000 + round)
      val p = points.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "p")
      val iv = intervals.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val expected = (for {
        (x, pi) <- points.zipWithIndex
        ((lo, hi), ii) <- intervals.zipWithIndex
        if x >= lo && x <= hi
      } yield (pi.toLong, ii.toLong)).toSet
      if (points.nonEmpty) {
        val got = RangeJoin.pointInInterval(p, "p", iv, "lo", "hi", width)
          .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === expected, s"round $round width $width")
      }
    }
  }
}
