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
