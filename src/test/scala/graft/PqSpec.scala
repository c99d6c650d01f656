package graft

import org.apache.spark.sql.functions._

import graft.operators.PqQueries

/** Contracts of the product-quantization ANN: code range, compression,
  * ADC score sanity, and recall against exact brute force (the gate can
  * only rows-check it — k-means codebooks aren't SQL-expressible).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  test("every vector encodes to 8 codes in [0, 16)") {
    val (corpus, centroids) = PqQueries.encode(spark, sf)
    val stats = corpus.agg(
      count(lit(1)).as("rows"),
      countDistinct($"vec_id").as("vecs"),
      min($"code").as("lo"), max($"code").as("hi"),
      countDistinct($"sub").as("subs")).head
    assert(stats.getAs[Long]("rows") === stats.getAs[Long]("vecs") * 8)
    assert(stats.getAs[Long]("subs") === 8L)
    assert(stats.getAs[Int]("lo") >= 0 && stats.getAs[Int]("hi") < 16)
    // codebooks: 8 subspaces x 16 centroids x 8 dims
    assert(centroids.count() === 128L)
    assert(centroids.select(size($"centroid")).distinct().as[Int].collect().toSeq === Seq(8))
  }

  test("PQ recall@5 vs exact cosine top-5 clears the floor") {
    val got = PqQueries.annPqTopk(spark, sf)
      .select($"qid", $"vid").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (a, b).zipped.foreach { (x, y) => d += x * y; na += x * x; nb += y * y }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = vecs.toMap
    val recalls = got.map { case (q, approx) =>
      val exact = vecs.filter(_._1 != q)
        .map { case (v, e) => (v, cos(byId(q), e)) }
        .sortBy { case (v, s) => (-s, v) }.take(5).map(_._1).toSet
      approx.intersect(exact).size / 5.0
    }
    assert(recalls.nonEmpty)
    val mean = recalls.sum / recalls.size
    // 8x16 PQ over 64 dims is coarse; mean recall must still beat a
    // random-5-of-500 draw (~0.01) by orders of magnitude
    assert(mean >= 0.3, s"mean recall@5 $mean below floor")
  }

  test("int8 quantization: codes match a local recomputation and bound the error") {
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val expected = emb.map { case (id, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
      val codes = v.map { x =>
        if (scale == 0) 0L
        else math.max(math.min(math.floor(x.toDouble / scale + 0.5), 127d), -127d).toLong
      }
      // half-up rounding ⇒ per-dim reconstruction error <= scale/2 + fp noise
      codes.zip(v).foreach { case (c, x) =>
        assert(math.abs(x.toDouble - c * scale) <= scale / 2 + 1e-12,
          s"vec $id: reconstruction error exceeds scale/2")
      }
      id -> ((codes.count(c => math.abs(c) == 127).toLong, codes.count(_ == 0L).toLong,
        codes.sum, codes.mkString(",")))
    }.toMap
    val got = PqQueries.embedInt8Quantize(spark, sf)
      .select($"vec_id", $"n_sat", $"n_zero", $"code_sum", $"code_md5")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.length === emb.length)
    got.foreach { case (id, sat, zero, sum, md5got) =>
      val (esat, ezero, esum, ecodes) = expected(id)
      assert((sat, zero, sum) === ((esat, ezero, esum)), s"vec $id stats")
      val md5loc = java.security.MessageDigest.getInstance("MD5")
        .digest(ecodes.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5got === md5loc, s"vec $id code stream")
    }
  }

  test("re-ranked scores are EXACT cosines (quantization never reaches the output)") {
    val got = PqQueries.annPqTopk(spark, sf)
      .select($"qid", $"vid", $"sim_mbp").as[(Long, Long, Long)].collect()
    val byId = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (a, b).zipped.foreach { (x, y) => d += x * y; na += x * x; nb += y * y }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    got.foreach { case (q, v, mbp) =>
      val exact = math.floor(1000.0 * cos(byId(q), byId(v)) + 0.5).toLong
      assert(mbp === exact, s"($q,$v): reported $mbp != exact $exact")
    }
  }
}
