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

  test("gate query: planted perturbation twins never rank adjacent to their source") {
    val out = AnnQueries.annMmrRerank(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (qid, rows) =>
      val vids = rows.sortBy(_._2).map(_._3).toSeq
      assert(vids.size == vids.distinct.size, s"query $qid repeated a result")
      // the corpus doubles every vector with a cos≈0.9996 twin; MMR must
      // not select both members of any (v, v+1000000) pair
      val bases = vids.map(v => if (v >= 1000000L) v - 1000000L else v)
      assert(bases.size == bases.distinct.size,
        s"query $qid selected a near-duplicate pair: $vids")
    }
  }
}
