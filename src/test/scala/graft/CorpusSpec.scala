package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusQueries

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("docs_source_stats excludes every blocklisted source and keeps the rest") {
    val got = CorpusQueries.docsSourceStats(spark, sf)
    val sources = got.select($"source").as[String].collect().toSet
    assert(sources.intersect(CorpusQueries.BlockedSources.toSet).isEmpty)
    val all = Tables.documents(spark, sf).select($"source").distinct()
      .as[String].collect().toSet
    assert(sources == all -- CorpusQueries.BlockedSources)
    // stats cover exactly the unblocked docs
    val nDocs = got.agg(sum($"n_docs")).as[Long].head()
    val expected = Tables.documents(spark, sf)
      .filter(!$"source".isin(CorpusQueries.BlockedSources: _*)).count()
    assert(nDocs == expected)
  }

  test("text_lm_score matches a brute-force bigram LM computed in memory") {
    // tokens come from the SAME wsTokens expression the query uses, so
    // this pins the model math (c2/c1 counts, floor'd basis points,
    // per-doc sums), not the tokenizer
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", graft.text.TextFunctions.wsTokens($"text").as("t"))
      .as[(Long, Seq[String])].collect()
    val bigrams = toks.flatMap { case (id, t) =>
      t.sliding(2).filter(_.length == 2).map(p => (id, p.head + " " + p(1)))
    }
    val c2 = bigrams.groupBy(_._2).map { case (g, xs) => g -> xs.length.toLong }
    val c1 = c2.groupBy { case (g, _) => g.split(" ", 2).head }
      .map { case (w1, gs) => w1 -> gs.values.sum }
    val bp = c2.map { case (g, n2) =>
      g -> math.floor(10000L * n2 / c1(g.split(" ", 2).head).toDouble).toLong
    }
    val expected = bigrams.groupBy(_._1).map { case (id, xs) =>
      val bps = xs.map(x => bp(x._2))
      id -> (bps.length.toLong, bps.sum,
        math.floor(bps.sum / bps.length.toDouble).toLong)
    }
    val got = CorpusQueries.textLmScore(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, sum, avg) => id -> (n, sum, avg) }.toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("quality buckets: per-lang quartile split matches a local recomputation") {
    val got = CorpusQueries.docsQualityBuckets(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()

    // rebuild from the (already spec-pinned) per-doc LM scores: local
    // quartiles with Spark percentile's index formula, local bucketing,
    // local rollup
    val lm = CorpusQueries.textLmScore(spark, sf)
      .select($"doc_id", $"avg_bp").as[(Long, Long)].collect().toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", length($"text").cast("long"))
      .as[(Long, String, Long)].collect()
    def quantile(v: Seq[Long], p: Double): Double = {
      val s = v.sorted
      val idx = p * (s.length - 1)
      val lo = s(idx.toInt).toDouble
      val hi = s(math.ceil(idx).toInt).toDouble
      lo + (idx - math.floor(idx)) * (hi - lo)
    }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val scores = ds.map(d => lm.getOrElse(d._1, 0L)).toSeq
      val t1 = quantile(scores, 0.25)
      val t2 = quantile(scores, 0.75)
      ds.toSeq.map { d =>
        val sc = lm.getOrElse(d._1, 0L)
        val b = if (sc > t2) "head" else if (sc > t1) "middle" else "tail"
        (lang, b, d._3, sc)
      }
    }.groupBy(x => (x._1, x._2)).map { case ((l, b), xs) =>
      (l, b, xs.size.toLong, xs.map(_._3).sum, xs.map(_._4).sum)
    }.toSet
    assert(got.toSet === expected)
    // the buckets PARTITION each language (nothing dropped or doubled)
    val gotTotals = got.groupBy(_._1).map { case (l, rs) => l -> rs.map(_._3).sum }
    val langTotals = docs.groupBy(_._2).map { case (l, ds) => l -> ds.length.toLong }
    assert(gotTotals === langTotals)
  }

  test("text_bm25 matches a brute-force BM25 computed in memory") {
    val got = CorpusQueries.textBm25(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq

    // brute force with the same tokenizer and the same float dag
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val toks = if (t.trim.isEmpty) Array.empty[String] else t.trim.split("\\s+")
        (id, toks)
      }
      .filter(_._2.nonEmpty)
    val n = docs.length.toLong
    val sumDl = docs.map(_._2.length.toLong).sum
    val avgdl = sumDl.toDouble / n
    val terms = CorpusQueries.Bm25QueryTerms.toSet
    val tf = docs.flatMap { case (id, toks) =>
      toks.filter(terms).groupBy(identity).map { case (t, xs) =>
        ((id, t), (xs.length.toLong, toks.length.toLong))
      }
    }.toMap
    val dfc = tf.keys.groupBy(_._2).map { case (t, ks) => (t, ks.size.toLong) }
    val perDoc = tf.toSeq.map { case ((id, t), (f, dl)) =>
      val s = (((n - dfc(t)) + 0.5) / (dfc(t) + 0.5)) *
        ((f * (CorpusQueries.Bm25K1 + 1.0)) /
          (f + CorpusQueries.Bm25K1 * ((1.0 - CorpusQueries.Bm25B) +
            (CorpusQueries.Bm25B * dl) / avgdl)))
      (id, (math.floor(s * 1e6 + 0.5).toLong, f))
    }.groupBy(_._1).map { case (id, xs) =>
      (id, xs.map(_._2._1).sum, xs.size.toLong, xs.map(_._2._2).sum)
    }
    val expected = perDoc.toSeq
      .sortBy { case (id, s, _, _) => (-s, id) }
      .take(CorpusQueries.Bm25TopK)
    assert(got == expected)
  }

  test("text_bm25 output is dense-ranked and every hit doc contains a query term") {
    val rows = CorpusQueries.textBm25(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= CorpusQueries.Bm25TopK)
    // descending score with doc_id tie-break
    assert(rows == rows.sortBy { case (id, s, _, _) => (-s, id) })
    assert(rows.forall { case (_, s, h, t) => s > 0 && h >= 1 && t >= h })
  }
}
