package graft

import graft.operators.AnnQueries

/** MMR diversity re-rank contracts: greedy-trace agreement with a
  * hand computation, near-duplicate suppression on the gate query. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("mmrSelect matches a hand-traced greedy selection") {
    val e1 = Array(1f, 0f)
    val e1b = Array(0.999f, 0.04f) // near-duplicate of e1
    val e2 = Array(0f, 1f)        // orthogonal
    // rank order: (10, sim .99, e1), (11, .98, e1b), (12, .90, e2)
    val cands = Seq((10L, 0.99, e1), (11L, 0.98, e1b), (12L, 0.90, e2))
    val got = AnnQueries.mmrSelect(cands, k = 3, lambda = 0.7)
    // step 1: highest relevance → 10. step 2: 11 scores
    // .7*.98 - .3*cos(e1b,e1) ≈ .686 - .3*0.9992 ≈ .386; 12 scores
    // .7*.90 - .3*0 = .63 → 12 beats the near-dup. step 3: remaining 11.
    assert(got == Seq(10L, 12L, 11L), s"got $got")
  }

  test("mmrSelect first pick is always the most relevant candidate") {
    val cands = Seq((1L, 0.5, Array(1f, 0f)), (2L, 0.9, Array(0f, 1f)),
      (3L, 0.7, Array(1f, 1f)))
    assert(AnnQueries.mmrSelect(cands, 1, 0.7) == Seq(2L))
  }

  test("mmrSelect invariants: subset of candidates, no repeats, size min(k, n)") {
    val r = new scala.util.Random(5)
    for (trial <- 1 to 20) {
      val n = 2 + r.nextInt(15)
      val cands = (0 until n).map { i =>
        (100L + i, r.nextDouble(), Array.fill(4)(r.nextFloat() * 2 - 1)) }
      val k = 1 + r.nextInt(8)
      val got = AnnQueries.mmrSelect(cands, k, 0.7)
      assert(got.size == math.min(k, n), s"trial $trial size")
      assert(got.distinct.size == got.size, s"trial $trial repeats")
      assert(got.forall(cands.map(_._1).contains), s"trial $trial unknown vid")
      assert(got.head == cands.maxBy(c => (c._2, -c._1))._1 ||
        got.head == cands.maxBy(_._2)._1, s"trial $trial first pick relevance")
    }
  }

  test("negative similarity to selected REWARDS a candidate (no zero clamp)") {
    val e1 = Array(1f, 0f)
    val anti = Array(-1f, 0.01f) // cos to e1 ≈ -1
    val ortho = Array(0f, 1f)    // cos to e1 = 0
    // anti has lower relevance but its diversity term is -1 vs 0:
    // score(anti) = .7*.5 - .3*(-1) = .65 > score(ortho) = .7*.6 = .42
    val cands = Seq((1L, 0.9, e1), (2L, 0.6, ortho), (3L, 0.5, anti))
    val got = AnnQueries.mmrSelect(cands, 2, 0.7)
    assert(got == Seq(1L, 3L), s"got $got")
  }

  test("gate query: planted perturbation twins never rank adjacent to their source") {
    val out = AnnQueries.annMmrRerank(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (qid, rows) =>
      val vids = rows.sortBy(_._2).map(_._3).toSeq
      assert(vids.size == vids.distinct.size, s"query $qid repeated a result")
      // the corpus doubles every vector with a cos≈0.9996 twin; MMR must
      // not select both members of any (v, v+1e9) pair
      val bases = vids.map(v => if (v >= 1000000000L) v - 1000000000L else v)
      assert(bases.size == bases.distinct.size,
        s"query $qid selected a near-duplicate pair: $vids")
    }
  }
}
