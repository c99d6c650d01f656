package graft

import org.apache.spark.sql.functions._

import graft.operators.AnnQueries

/** Hard-negative mining: the label-filtered exact top-k must agree
  * with a local brute force (same float→double accumulation order as
  * the codegen cosine, so sims are bit-identical), and no result may
  * share its query's label. */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("hard negatives == label-filtered brute force; labels always differ (sf0.001)") {
    val got = AnnQueries.embedHardNegatives(spark, sf)
      .as[(Long, Long, Long, Long)].collect() // (qid, rk, vid, sim_mbp)

    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    val labelOf = emb.map(e => e._1 -> e._3).toMap

    val expected = emb.filter(_._1 < 10).flatMap { case (q, qv, ql) =>
      emb.filter(e => e._1 != q && e._3 != ql)
        .map(e => (e._1, cos(qv, e._2)))
        .sortBy { case (vid, s) => (-s, vid) }
        .take(5).zipWithIndex
        .map { case ((vid, s), i) =>
          (q, (i + 1).toLong, vid, math.floor(1000 * s + 0.5).toLong)
        }
    }.toSet

    assert(got.toSet === expected)
    assert(got.forall { case (q, _, v, _) => labelOf(v) != labelOf(q) })
    // per-query result count = min(k, candidates with a DIFFERENT
    // label) computed from the data — a flat `== 5` would silently
    // depend on the generator giving every query >= 5 cross-label
    // candidates, and a label-distribution change would fail it with a
    // misleading message instead of pointing at the data assumption
    val gotByQ = got.groupBy(_._1).view.mapValues(_.length).toMap
    emb.filter(_._1 < 10).foreach { case (q, _, ql) =>
      val avail = emb.count(e => e._1 != q && e._3 != ql)
      assert(gotByQ.getOrElse(q, 0) == math.min(5, avail),
        s"query $q: expected min(5, $avail available cross-label " +
          s"candidates), got ${gotByQ.getOrElse(q, 0)}")
    }
  }
}
