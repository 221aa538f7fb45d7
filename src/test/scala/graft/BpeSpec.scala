package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bpe

/** BPE trainer + greedy application pins. The trainer is verified
  * against a hand-computed merge sequence on the classic
  * low/lower/newest-style example; application is pinned by the
  * round-trip identity (symbols concatenate back to the word) and the
  * structural property that greedy lowest-rank application reproduces
  * training segmentation on the training words themselves.
  */
class BpeSpec extends AnyFunSuite {

  test("trainer reproduces the hand-computed merge sequence") {
    // freqs: "aaab" x4, "aab" x3. Symbol streams: a a a b</w> and
    // a a b</w>.
    //   step 1: pairs (a,a): 4*2+3 = 11, (a,b): 7, (b,</w>): 7
    //     -> merge (a,a); ties impossible here.
    //     words: [aa a b</w>] wait: merging left-to-right in
    //     "a a a b" gives [aa, a, b]; "a a b" -> [aa, b].
    //   step 2: pairs (aa,a): 4, (a,b): 4, (aa,b): 3, (b,</w>): 7
    //     -> merge (b,</w>).
    //   step 3: pairs (aa,a): 4, (a,b</w>): 4, (aa,b</w>): 3
    //     -> tie 4 vs 4; lexicographic: ("a","b</w>") < ("aa","a")
    //     -> merge (a, b</w>).
    val merges = Bpe.train(Seq("aaab" -> 4L, "aab" -> 3L), 3)
    assert(merges === Vector(("a", "a"), ("b", Bpe.EndOfWord),
      ("a", "b" + Bpe.EndOfWord)))
  }

  test("training stops when no pair repeats") {
    val merges = Bpe.train(Seq("ab" -> 1L), 10)
    assert(merges.isEmpty) // every pair occurs once
  }

  test("encode round-trips and respects rank order") {
    val words = Seq("lower" -> 5L, "low" -> 7L, "newest" -> 6L,
      "widest" -> 3L, "lowest" -> 2L)
    val merges = Bpe.train(words, 20)
    val ranks = merges.zipWithIndex.toMap
    for ((w, _) <- words ++ Seq("slow" -> 0L, "west" -> 0L)) {
      val syms = Bpe.encode(w, ranks)
      // round trip: symbols concatenate to word + end marker
      assert(syms.mkString === w + Bpe.EndOfWord, w)
      // no adjacent pair with a known rank may remain un-merged
      syms.sliding(2).foreach {
        case Seq(a, b) =>
          assert(!ranks.contains((a, b)), s"$w left mergeable ($a,$b)")
        case _ => ()
      }
    }
  }

  test("more merges never increase a word's token count") {
    val words = Seq("banana" -> 5L, "bandana" -> 3L, "ban" -> 8L)
    val merges = Bpe.train(words, 12)
    for ((w, _) <- words) {
      val counts = (0 to merges.length).map { k =>
        Bpe.encode(w, merges.take(k).zipWithIndex.toMap).length
      }
      counts.sliding(2).foreach {
        case Seq(a, b) => assert(b <= a, s"$w: $counts")
        case _ => ()
      }
    }
  }

  test("incremental trainer replays the naive recount EXACTLY (fixture corpus)") {
    // The r12 trainer maintains pair counts + a pair→word index
    // incrementally with a lazy max-heap; the r11 full-recount
    // spelling is kept as the reference. Identical merge SEQUENCES on
    // the real fixture word-frequency table — not just same token
    // counts — pin that the index maintenance and the heap's
    // (count desc, pair asc) tie-break reproduce the naive argmax.
    import TestSpark._
    import org.apache.spark.sql.functions._
    val wf = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(2048)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val inc = Bpe.train(wf, 300)
    val ref = Bpe.trainNaive(wf, 300)
    assert(inc === ref)
    // and on an adversarial overlap-heavy synthetic table
    val tricky = Seq("aaaa" -> 9L, "aaab" -> 5L, "abab" -> 7L,
      "bbbb" -> 4L, "abba" -> 6L, "aa" -> 11L, "ab" -> 3L)
    assert(Bpe.train(tricky, 40) === Bpe.trainNaive(tricky, 40))
  }

  test("tool-scale training: >=1k merges on an open-vocabulary corpus") {
    // The r11 trainer was demo-scale (128 merges on a 31-word closed
    // vocabulary). Real vocabularies need thousands of merges over an
    // open vocabulary — the ScaleGen open-vocab regime (Zipf-ish
    // variant suffixes) supplies one. The incremental trainer must
    // sustain >=1k merges and the learned table must satisfy the
    // tokenizer contract on every training word.
    import TestSpark._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_bpe_ov")
    try {
      val dir = ScaleGen.generate(spark, sf, root.toString + "/x1", 1,
        openVocab = 512)
      val wf = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("w")).limit(65536)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(wf.size > 1500, s"open-vocab table too small: ${wf.size}")
      val nMerges = 1500
      val t0 = System.nanoTime
      val merges = Bpe.train(wf, nMerges)
      val wallS = (System.nanoTime - t0) / 1e9
      info(f"trained ${merges.length} merges over ${wf.size} words " +
        f"in $wallS%.2f s")
      assert(merges.length === nMerges,
        s"vocabulary exhausted at ${merges.length} merges")
      assert(merges.distinct.length === merges.length, "duplicate merge")
      val ranks = merges.zipWithIndex.toMap
      for ((w, _) <- wf.take(50) ++ wf.takeRight(50)) {
        val syms = Bpe.encode(w, ranks)
        assert(syms.mkString === w + Bpe.EndOfWord, w)
        syms.sliding(2).foreach {
          case Seq(a, b) =>
            assert(!ranks.contains((a, b)), s"$w left mergeable ($a,$b)")
          case _ => ()
        }
      }
    } finally Local.rmTree(root.toFile)
  }

  test("q_text_bpe: learned tokens <= whitespace-token chars, ratio sane") {
    import TestSpark._
    val rows = q("q_text_bpe").collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val ws = r.getLong(1)
      val bpe = r.getLong(2)
      // every word becomes >= 1 and <= len(word)+1 symbols; with the
      // corpus-trained vocab the total must compress well below the
      // character count and be >= the word count
      assert(bpe >= ws, s"doc ${r.getLong(0)}")
      assert(r.getDouble(3) >= 1.0)
    }
    // 128 merges over the 31-word fixture vocabulary fully merge the
    // FREQUENT words and leave rare ones partial: the corpus-wide
    // (frequency-weighted) compression must approach whole-word
    // tokens, while any single rare-word-heavy doc may sit higher.
    val totBpe = rows.map(_.getLong(2)).sum.toDouble
    val totWs = rows.map(_.getLong(1)).sum.toDouble
    assert(totBpe / totWs < 2.0, s"corpus ratio ${totBpe / totWs}")
    assert(rows.map(_.getDouble(3)).max < 4.5)
  }
}
