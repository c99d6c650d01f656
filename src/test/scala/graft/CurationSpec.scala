package graft

import org.apache.spark.sql.functions._

import graft.operators.CurationQueries
import graft.text.TextFunctions

/** Structural invariants of the curation operators — properties the
  * hash gate can't state (it only pins equality with the oracle).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("chunking conserves tokens: sum over chunks = n + overlap * (chunks - 1)") {
    val chunks = CurationQueries.textChunkRag(spark, sf)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum($"n_tok").as("sum_tok"),
        max($"n_tok").as("max_tok"))
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", TextFunctions.wsTokens($"text").as("t"))
      .filter(size($"t") > 0)
      .select($"doc_id", size($"t").cast("long").as("n"))
    val joined = chunks.join(docs, "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, nChunks, sumTok, maxTok, n) =>
      assert(maxTok <= 64, s"doc $id: chunk over budget")
      // every kept chunk's predecessor fully covers the 16-token
      // overlap region, so each token is counted once plus exactly 16
      // double-counted tokens per chunk boundary
      assert(sumTok === n + 16L * (nChunks - 1), s"doc $id: token conservation")
      // start grid {0, 48, ...} with degenerate tails dropped:
      // ceil(max(n - 16, 1) / 48) chunks
      val expected = math.max(1L, (n - 16 + 47) / 48)
      assert(nChunks === expected, s"doc $id: $nChunks chunks for $n tokens")
    }
  }

  test("line dedup matches a driver-side recomputation of all three rules") {
    val got = CurationQueries.textLineDedup(spark, sf)
      .select($"doc_id", $"n_lines", $"n_kept", $"clean_md5", $"clean_chars")
      .as[(Long, Long, Long, String, Long)].collect().map(r => r._1 -> r).toMap
    // independent reimplementation: plain Scala over the collected
    // corpus, no Spark expressions shared with the operator
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect()
    val allLines = docs.flatMap { case (id, text, source) =>
      val sub = s"subscribe to ${Option(source).getOrElse("")} newsletter today"
      val body = Option(text).getOrElse("")
      val b = new StringBuilder(body)
      if (id % 6 == 0) b.append('\n').append(body)
      b.append('\n').append(sub)
      if (id % 4 == 0) b.append('\n').append(sub)
      b.append('\n').append(s"rare banner for pair ${id / 2}")
      b.append("\nok bye\nall rights reserved worldwide")
      b.toString.split("\n", -1).zipWithIndex.map { case (l, i) => (id, i, l) }
    }
    val docFreq = allLines.groupBy(_._3).map { case (l, g) =>
      l -> g.map(_._1).distinct.size
    }
    val expected = allLines.groupBy(_._1).map { case (id, g) =>
      val sorted = g.sortBy(_._2)
      val seen = scala.collection.mutable.Set[String]()
      val kept = sorted.filter { case (_, _, l) =>
        val first = seen.add(l)
        first && docFreq(l) < 3 &&
          l.trim.nonEmpty && l.trim.split("\\s+").length >= 3
      }.map(_._3)
      val clean = kept.mkString("\n")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(clean.getBytes("UTF-8")).map("%02x".format(_)).mkString
      id -> (sorted.size.toLong, kept.size.toLong, md5, clean.length.toLong)
    }
    assert(got.size === expected.size)
    expected.foreach { case (id, (nl, nk, md5, chars)) =>
      assert(got(id) === ((id, nl, nk, md5, chars)), s"doc $id")
    }
    // the planted structure actually exercises every rule: some doc
    // keeps its rare-pair banner (df=2 boundary), some doc drops an
    // intra-doc body repeat, and nobody keeps planted boilerplate
    assert(expected.values.exists(_._2 >= 2), "df=2 line never kept")
    assert(expected.exists { case (id, (nl, _, _, _)) => id % 6 == 0 && nl >= 5 })
  }

  test("line dedup shuffles digests for the verdict; text only crosses at the rewrite regroup") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning, RoundRobinPartitioning}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = CurationQueries.textLineDedup(spark, sf)
    // inspect the pre-execution adaptive tree: raw ShuffleExchangeExec
    // nodes are still visible (post-execution they wrap into query
    // stages) — same approach as the substring-dedup pin
    val phys = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val hashShuffles = phys.collect {
      case e: ShuffleExchangeExec
        if !e.outputPartitioning.isInstanceOf[RoundRobinPartitioning] &&
          !e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }
    assert(hashShuffles.nonEmpty)
    hashShuffles.foreach { e =>
      val carriesText = e.output.exists(a =>
        a.name == "line" || a.name == "text" || a.name == "arr" ||
          a.dataType.typeName.startsWith("array"))
      if (carriesText) {
        // the one legitimate text move: the per-doc rewrite regroup
        val keys = e.outputPartitioning.asInstanceOf[HashPartitioning]
          .expressions.flatMap(_.references.map(_.name))
        assert(keys == Seq("doc_id"),
          s"text crossed a non-rewrite exchange keyed on $keys: ${e.output.map(_.name)}")
      }
    }
  }

  test("substring dedup: every tail-truncated twin's shared spans are flagged") {
    val res = CurationQueries.dedupSubstring(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(res.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", size(TextFunctions.wsTokens($"text")).as("n"))
      .as[(Long, Int)].collect().toMap
    res.foreach { case (id, nSpans, nDup, bp) =>
      val n = docs(id)
      assert(nSpans === n - 19, s"doc $id span count")
      assert(nDup <= nSpans)
      assert(bp === math.floor((20000.0 * nDup + nSpans) / (2.0 * nSpans)).toLong)
      if (id % 5 == 0 && n >= 29) {
        // copy holds tokens 10..n => shared windows start at 10..n-19
        assert(nDup >= n - 28, s"doc $id: twin overlap not flagged ($nDup < ${n - 28})")
      }
    }
  }

  test("train/test split never separates duplicate twins and stratifies ~90/10") {
    // leakage, checked on the OPERATOR's own per-document assignments:
    // every content digest — and every known duplicate pair (doc and
    // its +1M twin) — must land in exactly one split
    val assigned = CurationQueries.assignSplits(spark, sf)
    val leakyDigests = assigned.groupBy($"dg")
      .agg(countDistinct($"split").as("nsplits"))
      .filter($"nsplits" > 1).count()
    assert(leakyDigests === 0L, "a content cluster straddles train/test")

    val pairs = assigned.filter($"doc_id" < 1000000L).as("a")
      .join(assigned.filter($"doc_id" >= 1000000L).as("b"),
        $"a.doc_id" === $"b.doc_id" - 1000000L)
      .select($"a.split", $"b.split")
      .as[(String, String)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(p => p._1 == p._2), "a duplicate twin straddles train/test")

    // both splits must be populated, in ~90/10 proportion
    val counts = assigned.groupBy($"split").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val total = counts.values.sum
    val trainFrac = counts.getOrElse("train", 0L).toDouble / total
    assert(counts.getOrElse("test", 0L) > 0L)
    assert(trainFrac > 0.75 && trainFrac < 0.99,
      s"train fraction $trainFrac implausible for a 90% draw")

    // the aggregate view is exactly the assignment view rolled up
    val agg = CurationQueries.splitTrainTest(spark, sf)
      .as[(String, String, Long, Long)].collect().toSet
    val rolled = assigned.groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"), countDistinct($"rep").as("n_clusters"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(agg === rolled)
  }

  test("per-source cap equals the rank-window formulation") {
    val got = CurationQueries.docsSourceCap(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"q_bp".desc, $"doc_id")
    val window = Tables.documents(spark, sf)
      .select($"source", $"doc_id", TextFunctions.qualityScoreBp($"text").as("q_bp"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"source", $"rk", $"doc_id", $"q_bp")
      .orderBy($"source", $"rk")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === window)
  }

  test("schema evolution: steady-state read with an explicit union schema, no mergeSchema") {
    import org.apache.spark.sql.types._
    val out = s"/tmp/graft_io/evolve_spec_${math.abs(sf.hashCode)}"
    val docs = Tables.documents(spark, sf)
    graft.io.GraftIO.write(docs.filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"lang", $"n_chars"), out + "/gen=1")
    graft.io.GraftIO.write(docs.filter($"doc_id" % 2 === 1)
      .select($"doc_id", $"lang", $"n_chars", $"source"), out + "/gen=2")
    val union = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType), StructField("source", StringType)))
    // the production shape: schema known up front, no footer sweep
    val read = graft.io.GraftIO.read(spark, out, schema = Some(union),
      restorePartitions = false)
    assert(read.schema.fieldNames.toSeq === union.fieldNames.toSeq)
    assert(read.count() === docs.count())
    assert(read.filter($"source".isNull).count() ===
      docs.filter($"doc_id" % 2 === 0).count())
  }

  test("length-outlier bands match a brute-force per-language trim") {
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"n_chars").as[(String, Long)].collect()
    val expected = docs.groupBy(_._1).map { case (lang, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      val k = n / 100
      val lo = sorted(k)          // (k+1)-th smallest
      val hi = sorted(n - k - 1)  // (n-k)-th smallest
      val kept = sorted.filter(v => v >= lo && v <= hi)
      lang -> ((lo, hi, n.toLong, kept.length.toLong, kept.sum))
    }
    val got = operators.CurationQueries.filterLengthOutliers(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == expected)
  }

  test("ngram novelty matches a local first-occurrence walk; totals conserve") {
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", graft.text.TextFunctions.wsTokens($"text"))
      .as[(Long, Seq[String])].collect()
    val docGrams = toks
      .map { case (id, t) => id -> t.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet }
      .filter(_._2.nonEmpty)
    val firstOf = docGrams.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val expected = docGrams.map { case (id, gs) =>
      val n = gs.size.toLong
      val novel = gs.count(g => firstOf(g) == id).toLong
      id -> ((n, novel, math.floor((20000L * novel + n) / (2.0 * n)).toLong))
    }.toMap
    val got = operators.CurationQueries.textNgramNovelty(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === expected)
    // every distinct corpus gram is novel in exactly one doc
    assert(got.values.map(_._2).sum === firstOf.size.toLong)
    // the earliest doc restates nothing: full novelty
    assert(got(docGrams.map(_._1).min)._3 === 10000L)
  }
}
