package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** BPE trainer/encoder invariants: hand-computed merge sequences,
  * character conservation, the deterministic tie-break, and the
  * vocabulary-table/replay equivalence textBpeEncode relies on. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainer reproduces the hand-computed merge sequence") {
    // corpus: low 5, lower 2, newest 6, widest 3  (the classic
    // Sennrich walkthrough shape). Pair counts, round 1:
    //   (e,s): newest 6 + widest 3 = 9  <- max
    //   (s,t): 9, but (e,s) < (s,t) lexicographically — freq ties
    //   resolve to the lex-smallest pair
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(words, 4)
    assert(merges.head === (("e", "s")), s"first merge: ${merges.head}")
    assert(merges(1) === (("es", "t")), s"second merge: ${merges(1)}")
    // round 3: (l,o) appears in low 5 + lower 2 = 7; (w,est) appears
    // in newest 6 — wait: newest = n,e,w,est; (w,est) 6 + widest has
    // (d,est) 3; (l,o) = 7 is the max
    assert(merges(2) === (("l", "o")), s"third merge: ${merges(2)}")
  }

  test("merges apply left-to-right, non-overlapping") {
    assert(Bpe.mergePair(Vector("a", "a", "a"), ("a", "a")) === Vector("aa", "a"))
    assert(Bpe.mergePair(Vector("a", "a", "a", "a"), ("a", "a")) === Vector("aa", "aa"))
  }

  test("encode conserves characters on every corpus word and handles astral symbols") {
    val vocab = Tables.documents(spark, sf)
      .select(explode(graft.text.TextFunctions.wsTokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect().toSeq
    val merges = Bpe.train(vocab, 200)
    vocab.foreach { case (w, _) =>
      val enc = Bpe.encode(w, merges)
      assert(enc.mkString === w, s"character conservation broke for: $w")
    }
    // astral plane: one code point = one initial symbol
    assert(Bpe.encode("a🙂b", Nil) === Vector("a", "🙂", "b"))
    assert(Bpe.encode("", merges) === Vector.empty)
  }

  test("early stop: no pair with frequency >= 2 ends training") {
    val merges = Bpe.train(Seq(("abc", 1L)), 10)
    assert(merges.isEmpty, s"singleton pairs must not merge: $merges")
  }

  test("string-replace merge replay == Bpe.encode on every corpus word (the oracle's algorithm)") {
    // the DuckDB oracle for the fixture gate replays each merge as ONE
    // string replace over a chr(31)-wrapped symbol string; Java's
    // String.replace is the same left-to-right non-overlapping scan
    // SQL replace performs, so this pins the equivalence the oracle
    // relies on — over the REAL corpus vocabulary plus the adversarial
    // shapes (repeated symbols, chained merges, astral code points)
    val S = "\u001f"
    def wrap(w: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        sb.append(S).append(w.substring(i, i + n)).append(S)
        i += n
      }
      sb.toString
    }
    def encodeByReplace(w: String, merges: Seq[Bpe.Merge]): Vector[String] = {
      var s = wrap(w)
      merges.foreach { case (a, b) =>
        s = s.replace(S + a + S + S + b + S, S + a + b + S)
      }
      if (s.isEmpty) Vector.empty
      else s.stripPrefix(S).stripSuffix(S).split(S + S, -1).toVector
    }
    val merges = graft.operators.CorpusQueries.FixtureMerges
    val words = Tables.documents(spark, sf)
      .select(explode(graft.text.TextFunctions.wsTokens($"text")).as("w"))
      .distinct().as[String].collect().toSeq ++
      Seq("aaa", "thee", "another", "ther", "anand", "a\uD83D\uDE42b", "x")
    words.foreach { w =>
      assert(encodeByReplace(w, merges) === Bpe.encode(w, merges),
        s"replace-replay diverged from Bpe.encode on: $w")
    }
  }

  test("textBpeEncode output: counts consistent, digest pins the segmentation") {
    val got = graft.operators.CorpusQueries.textBpeEncode(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", graft.text.TextFunctions.wsTokens($"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    // recompute driver-side with the same trainer — counts and the
    // subword stream must agree exactly
    val vocab = docs.values.flatten.groupBy(identity)
      .map { case (w, xs) => (w, xs.size.toLong) }.toSeq
    val merges = Bpe.train(vocab, 200)
    got.foreach { case (id, nWords, nSub, _) =>
      val toks = docs(id)
      assert(nWords === toks.length.toLong, s"doc $id word count")
      val sub = toks.flatMap(w => Bpe.encode(w, merges))
      assert(nSub === sub.length.toLong, s"doc $id subword count")
      // merging can only shrink: nonempty words each stay >= 1 token
      assert(nSub <= toks.map(_.length.toLong).sum)
      assert(nSub >= toks.count(_.nonEmpty).toLong)
    }
  }
}
