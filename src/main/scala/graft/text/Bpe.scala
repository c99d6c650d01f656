package graft.text

/** Byte-pair-encoding tokenizer: the train/apply pair of a
  * subword-vocabulary pipeline (Sennrich '16 shape — word-level BPE
  * over a frequency-weighted vocabulary).
  *
  * Scale posture, mirroring similarity/LocalKMeans: the TRAINER is
  * deliberately driver-side over the corpus's word-frequency table —
  * tokenizer training is a bounded-model problem (the vocabulary is
  * sublinear in the corpus, and production pipelines train on a
  * sample anyway), and a distributed formulation would pay a global
  * aggregation per merge round for a table that fits in memory. The
  * APPLY side is the part that must scale: merge ranks broadcast
  * (~KBs), encoding is a per-token loop with no shuffle — see
  * CorpusQueries.textBpeEncode.
  *
  * Determinism, pinned so the gate and spec can rely on it: each
  * round merges the pair with (highest total frequency, then
  * lexicographically smallest pair); within a word, merges apply
  * left-to-right, non-overlapping; encoding replays merges in rank
  * order (lowest rank first), matching the trainer's construction
  * exactly — training then encoding the training vocabulary
  * reproduces the trainer's final symbol sequences.
  */
object Bpe {

  /** One trained merge: the adjacent symbol pair, in order. */
  type Merge = (String, String)

  /** Train `numMerges` merges from (word, frequency) rows. Words
    * start as code-point symbol sequences; each round merges the
    * globally most frequent adjacent pair. Stops early when no pair
    * occurs twice (merging singletons would memorize the corpus). */
  def train(words: Seq[(String, Long)], numMerges: Int): Vector[Merge] = {
    // aggregate duplicate words; drop empties
    var seqs: Map[Vector[String], Long] = words
      .filter(_._1.nonEmpty)
      .groupBy(_._1)
      .map { case (w, xs) => splitCodePoints(w) -> xs.map(_._2).sum }
    val merges = Vector.newBuilder[Merge]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[Merge, Long]
      seqs.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      // (freq desc, pair lex asc) — the deterministic tie-break the
      // docstring promises
      val best = counts.toSeq.sortBy { case ((a, b), f) => (-f, a, b) }.headOption
      best match {
        case Some((pair, f)) if f >= 2 =>
          merges += pair
          seqs = seqs.groupBy { case (syms, _) => mergePair(syms, pair) }
            .map { case (m, xs) => m -> xs.values.sum }
          round += 1
        case _ => done = true
      }
    }
    merges.result()
  }

  /** Apply one merge to a symbol sequence, left-to-right,
    * non-overlapping ("aaa" under ("a","a") -> ["aa", "a"]). */
  private[graft] def mergePair(syms: Vector[String], p: Merge): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (p._1 + p._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode a word under trained merges: replay every merge in rank
    * order. Rank order (not greedy-lowest-pair-in-word order) is what
    * reproduces the trainer's construction exactly. */
  def encode(word: String, merges: Seq[Merge]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms = splitCodePoints(word)
    merges.foreach { p =>
      if (syms.length > 1) syms = mergePair(syms, p)
    }
    syms
  }

  /** Code-point symbols (an astral emoji is ONE initial symbol, not a
    * surrogate pair split). */
  private[graft] def splitCodePoints(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }
}
