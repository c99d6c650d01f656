package graft

import org.apache.spark.sql.functions._

import graft.operators.ClusterQueries
import graft.similarity.LocalKMeans
import graft.Tables

/** doc_cluster_kmeans invariants (rows-only gate — k-means isn't
  * SQL-expressible): the report partitions the corpus, the assignment
  * agrees with a driver-side recomputation of the same deterministic
  * model, and the whole report is stable across runs. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val report =
    ClusterQueries.docClusterKmeans(spark, sf).collect()

  test("cluster report partitions the corpus: sizes sum to |embeddings|") {
    val total = Tables.embeddings(spark, sf).count()
    assert(report.map(_.getAs[Long]("n_vecs")).sum == total)
    val ids = report.map(_.getAs[Int]("cluster_id"))
    assert(ids.distinct.length == ids.length)
    assert(ids.forall(c => c >= 0 && c < ClusterQueries.K))
  }

  test("assignment agrees with a driver-side argmin over the same model") {
    // retrain the identical deterministic model and recompute the
    // report entirely in the driver. The argmin here is INTENTIONALLY
    // written out rather than calling LocalKMeans.assignWithD2 (which
    // the production UDF delegates to) — an independent replay of the
    // ties-to-lowest-index contract, not a test of the call plumbing.
    val sample = LocalKMeans.sample(
      Tables.embeddings(spark, sf), "vec_id", "embedding", ClusterQueries.TrainSample)
    val cents = LocalKMeans.train(
      sample, ClusterQueries.K, ClusterQueries.LloydIters, ClusterQueries.Seed)
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val assigned = vecs.map { case (id, e) =>
      val arr = e.toArray
      val ds = cents.map { c =>
        var d = 0.0; var i = 0
        while (i < arr.length) { val t = arr(i) - c(i); d += t * t; i += 1 }
        d
      }
      val best = ds.indexOf(ds.min)
      (id, best, math.floor(ds(best) * 1e6).toLong)
    }
    val expected = assigned.groupBy(_._2).map { case (c, xs) =>
      c -> ((xs.length.toLong, xs.map(_._3).sum, xs.map(_._1).min, xs.map(_._1).max))
    }
    val got = report.map { r =>
      r.getAs[Int]("cluster_id") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("inertia_e6"),
          r.getAs[Long]("min_vec"), r.getAs[Long]("max_vec")))
    }.toMap
    assert(got == expected)
  }

  test("the report is deterministic across runs") {
    val again = ClusterQueries.docClusterKmeans(spark, sf).collect()
    assert(again.map(_.toString).toSeq == report.map(_.toString).toSeq)
  }
}
