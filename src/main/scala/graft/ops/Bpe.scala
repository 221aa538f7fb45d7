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

  // Symbol boundary: UTF-16 code units (Java chars). For BMP text —
  // every fixture tier and any [a-z0-9] vocabulary — this equals
  // codepoint splitting, which is what q_text_bpe's DuckDB oracle
  // uses; astral-plane input would split surrogate pairs here and
  // diverge from a codepoint tokenizer. Honest boundary, stated.
  private def toSymbols(w: String): Vector[String] =
    w.map(_.toString).toVector :+ EndOfWord

  /** Train `nMerges` merges from (word, freq). Stops early when no
    * adjacent pair occurs at least twice.
    *
    * INCREMENTAL trainer (the standard optimization, as in the
    * subword-nmt reference implementation): global pair counts and a
    * pair → containing-word index are maintained across merge steps,
    * and a merge re-segments ONLY the words that contain the merged
    * pair — per-step work is proportional to the affected words, not
    * the whole table. The r11 trainer recounted EVERY pair of EVERY
    * word each step: O(merges × Σ|word|), fine for its 128-merge demo
    * point but the bottleneck at the 8k–32k merges real vocabularies
    * use. Measured on a 58k-word open-vocab table (SCALE.md): the
    * marginal merge costs ~0.14 ms here vs ~42 ms naive (~300×);
    * 8192 merges complete in ~13 s total, where the naive recount
    * extrapolates to ~340 s. Early broad merges (pairs present in
    * most words) still dominate the wall — both trainers pay them —
    * so the win shows at the tool-scale merge counts, not at 128.
    *
    * Best-pair selection is a LAZY MAX-HEAP: every count update
    * pushes a (count, pair) entry; pops discard entries whose count
    * no longer matches the live table. Ordering (count desc, pair
    * lexicographic asc) reproduces the naive trainer's deterministic
    * tie-break exactly, so the learned merge sequence is IDENTICAL —
    * BpeSpec pins replay equality against a naive reference recount.
    *
    * Counting convention (inherited, pinned by the replay test):
    * every adjacent POSITION counts, so "aaa" contributes 2 to (a,a);
    * merges apply left-to-right, also position-wise. */
  def train(wordFreq: Seq[(String, Long)],
      nMerges: Int): Vector[(String, String)] = {
    import scala.collection.mutable
    val words: Array[Array[String]] =
      wordFreq.iterator.map { case (w, _) => toSymbols(w).toArray }.toArray
    val freqs: Array[Long] = wordFreq.iterator.map(_._2).toArray

    val stats = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // max count first; ties lexicographic SMALLEST pair dequeues first
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String),
            y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c
          else {
            val a = y._2.compareTo(x._2)
            if (a != 0) a else y._3.compareTo(x._3)
          }
        }
      })
    def bump(p: (String, String), delta: Long): Unit = {
      val n = stats.getOrElse(p, 0L) + delta
      if (n == 0L) stats.remove(p) else stats(p) = n
      if (n >= 2L) heap.enqueue((n, p._1, p._2))
    }
    var i = 0
    while (i < words.length) {
      val syms = words(i)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        bump(p, freqs(i))
        where.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
      i += 1
    }

    val merges = Vector.newBuilder[(String, String)]
    var nDone = 0
    var exhausted = false
    while (nDone < nMerges && !exhausted) {
      // pop to the first LIVE entry (count matches the current table)
      var best: (String, String) = null
      while (best == null && heap.nonEmpty) {
        val (c, a, b) = heap.dequeue()
        if (c >= 2L && stats.getOrElse((a, b), 0L) == c) best = (a, b)
      }
      if (best == null) exhausted = true
      else {
        merges += best
        for (wi <- where(best).toArray) {
          val old = words(wi)
          val nw = mergePair(old, best)
          if (nw.length != old.length) {
            val f = freqs(wi)
            var j = 0
            while (j < old.length - 1) {
              bump((old(j), old(j + 1)), -f); j += 1
            }
            j = 0
            while (j < nw.length - 1) {
              val p = (nw(j), nw(j + 1))
              bump(p, f)
              where.getOrElseUpdate(p, mutable.Set.empty) += wi
              j += 1
            }
            // index hygiene: drop this word from pairs it no longer has
            val newSet = new java.util.HashSet[(String, String)]()
            j = 0
            while (j < nw.length - 1) { newSet.add((nw(j), nw(j + 1))); j += 1 }
            j = 0
            while (j < old.length - 1) {
              val p = (old(j), old(j + 1))
              if (!newSet.contains(p))
                where.get(p).foreach(_ -= wi)
              j += 1
            }
            words(wi) = nw
          }
        }
        nDone += 1
      }
    }
    merges.result()
  }

  /** The r11 full-recount trainer, kept as the REFERENCE for the
    * replay-equality pin (BpeSpec): recounts every pair of every word
    * per step — O(merges × Σ|word|), correct by construction. */
  private[graft] def trainNaive(wordFreq: Seq[(String, Long)],
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

  private def mergePair(syms: Array[String],
      p: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
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
