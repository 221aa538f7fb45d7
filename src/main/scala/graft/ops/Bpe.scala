package graft.ops

/** Byte-pair-encoding tokenizer: merge-table TRAINING from a word
  * frequency table and greedy lowest-rank APPLICATION — the standard
  * public algorithm (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"): symbols start as
  * characters plus an end-of-word marker; each training step merges
  * the globally most frequent adjacent symbol pair.
  *
  * Scale shape (the reason this lives here and not in a UDF): real
  * trainers operate on the WORD FREQUENCY TABLE, not the raw corpus —
  * one corpus-scale `groupBy(word)` produces it, and Heaps' law keeps
  * it orders of magnitude smaller than the corpus (the caller
  * additionally caps it at the top-K words, the standard trainer
  * bound). Training then loops driver-side over that bounded table;
  * the learned ranks broadcast, and application is a narrow
  * per-partition map with a per-word memo (words repeat heavily, so
  * each distinct word encodes once per partition).
  *
  * Determinism: ties in pair frequency break lexicographically on the
  * pair, so the merge table is a pure function of the frequency table.
  */
object Bpe {

  val EndOfWord = "</w>"

  private def toSymbols(w: String): Vector[String] =
    w.map(_.toString).toVector :+ EndOfWord

  /** Train `nMerges` merges from (word, freq). Stops early when no
    * adjacent pair occurs at least twice. */
  def train(wordFreq: Seq[(String, Long)],
      nMerges: Int): Vector[(String, String)] = {
    var words: Vector[(Vector[String], Long)] =
      wordFreq.toVector.map { case (w, f) => toSymbols(w) -> f }
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, f) <- words; j <- 0 until syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      val candidates = counts.filter(_._2 >= 2)
      if (candidates.isEmpty) done = true
      else {
        // max frequency; ties lexicographic smallest pair (determinism)
        val best = candidates.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) =>
          mergePair(syms, best) -> f
        }
        i += 1
      }
    }
    merges.result()
  }

  private def mergePair(syms: Vector[String],
      p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += (p._1 + p._2)
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.result()
  }

  /** Encode one word under a rank table (merge -> training order):
    * repeatedly apply the LOWEST-RANK merge present — the standard
    * greedy application, which reproduces training segmentation. */
  def encode(w: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = toSymbols(w)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (bestPair == null) continue = false
      else syms = mergePair(syms, bestPair)
    }
    syms
  }
}
