package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{SeaSegment, TextSim}

/** Dictionary (maximal-matching) segmentation over SEA scripts — the
  * capability layer beside the contract tokenizer's pinned
  * run-tokenization fallback (TokenizeSpec). Anchors:
  *  1. non-SEA text tokenizes EXACTLY like the contract kernel;
  *  2. SEA runs keep their combining marks, so real mark-bearing
  *     dictionary words match (the thing the fallback cannot do);
  *  3. greedy longest-match semantics, including the prefix trap;
  *  4. unknown spans merge into chunks, never per-char confetti;
  *  5. the output composes with downstream counting unchanged.
  */
class SeaSegmentSpec extends AnyFunSuite {
  import TestSpark._

  // Real Thai words WITH their marks (tone marks, dependent vowels).
  private val Sawasdee = "สวัสดี"
  private val Khrap = "ครับ"
  private val Thai = "ไทย" // mark-free

  private def tokensOf(text: String, lexicon: Seq[String]): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(SeaSegment.seaDictTokens(spark, lexicon)(col("text")).as("ws"))
      .collect().head.getSeq[String](0).toList
  }

  private def fallbackOf(text: String): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(TextSim.normTokens(col("text")).as("ws"))
      .collect().head.getSeq[String](0).toList
  }

  test("non-SEA text tokenizes exactly like the contract kernel") {
    val texts = Seq(
      "Hello, World! 42 times",
      "naïve café — résumé",
      "中文mixed漢字and123",
      "ひらがな カタカナ kanji 漢",
      "punct...only!!!   ",
      "ΚΑΛΗΜΈΡΑ ΕΛΛΆΔΑ") // non-ASCII case folding
    texts.foreach { t =>
      assert(tokensOf(t, Seq(Sawasdee)) === fallbackOf(t), s"drift on: $t")
    }
  }

  test("SEA runs keep their marks; the lexicon's real spellings match") {
    val run = Sawasdee + Khrap // spaceless, both words mark-bearing
    // The fallback strips marks and shatters the run — it can never
    // reproduce the dictionary words.
    assert(!fallbackOf(run).contains(Sawasdee))
    val got = tokensOf(run, Seq(Sawasdee, Khrap))
    assert(got === Seq(Sawasdee, Khrap))
    // Empty lexicon: the run stays ONE mark-inclusive chunk.
    assert(tokensOf(run, Nil) === Seq(run))
  }

  test("greedy longest-match wins the prefix trap") {
    val run = Sawasdee + Khrap
    val prefix = Sawasdee.substring(0, 3) // proper prefix of a longer entry
    val got = tokensOf(run, Seq(prefix, Sawasdee, Khrap))
    assert(got === Seq(Sawasdee, Khrap), "longest-first violated")
  }

  test("unknown spans merge into chunks between matches") {
    val run = Sawasdee + Thai + Khrap // middle word absent from lexicon
    val got = tokensOf(run, Seq(Sawasdee, Khrap))
    assert(got === Seq(Sawasdee, Thai, Khrap))
    // Entirely-unknown run stays ONE chunk (the fallback degradation).
    assert(tokensOf(run, Seq("กข")) === Seq(run))
  }

  test("CJK inside SEA context still splits per ideograph") {
    val got = tokensOf(s"${Thai}中文${Thai}", Seq(Thai))
    assert(got === Seq(Thai, "中", "文", Thai))
    // Spaces and punctuation still bound runs before matching.
    assert(tokensOf(s"$Sawasdee $Khrap!", Seq(Sawasdee, Khrap)) ===
      Seq(Sawasdee, Khrap))
  }

  test("segmentation composes with downstream counting unchanged") {
    import spark.implicits._
    val docs = Seq(Sawasdee + Khrap, Sawasdee + Thai).toDF("text")
    val counts = docs
      .select(explode(SeaSegment.seaDictTokens(spark,
        Seq(Sawasdee, Khrap, Thai))(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map(Sawasdee -> 2L, Khrap -> 1L, Thai -> 1L))
  }

  // ---- pluggable lexicons + the shipped Thai starter (r18) ------------

  test("builtin Thai lexicon: loads, NFC, SEA-only, no comments or dups") {
    val lex = SeaSegment.builtinLexicon("thai")
    assert(lex.size >= 150, s"starter lexicon too small: ${lex.size}")
    assert(lex.distinct.size === lex.size)
    lex.foreach { w =>
      assert(!w.startsWith("#") && w.trim == w && w.nonEmpty)
      assert(java.text.Normalizer.isNormalized(w,
        java.text.Normalizer.Form.NFC), s"not NFC: $w")
      assert(SeaSegment.isSeaRun(w), s"non-SEA entry: $w")
    }
    // The demo's four words are all in the starter.
    SeaSegment.DemoLexicon.foreach(w => assert(lex.contains(w), w))
    assert(intercept[IllegalArgumentException] {
      SeaSegment.builtinLexicon("klingon")
    }.getMessage.contains("no builtin lexicon"))
  }

  test("Thai starter segments real spaceless sentences into real words") {
    val lex = SeaSegment.builtinLexicon("thai")
    // "hello (polite), I like to eat rice" — spaceless, as Thai is
    // written; every word is a lexicon entry, so the segmentation is
    // the exact word sequence, marks intact.
    val s1 = "สวัสดีครับผมชอบกินข้าว"
    assert(tokensOf(s1, lex) ===
      Seq("สวัสดี", "ครับ", "ผม", "ชอบ", "กิน", "ข้าว"))
    // Mixed known/unknown: unknown spans chunk, neighbors still match.
    val s2 = "ขอบคุณมากๆครับ" // ๆ (repetition mark) is not an entry
    val got = tokensOf(s2, lex)
    assert(got.head === "ขอบคุณ" && got.contains("ครับ"), got.toString)
    // The fallback tokenizer cannot produce these words (mark loss).
    assert(!fallbackOf(s1).contains("สวัสดี"))
  }

  test("builtin Lao lexicon: loads, NFC, SEA-only, no comments or dups") {
    val lex = SeaSegment.builtinLexicon("lao")
    assert(lex.size >= 150, s"starter lexicon too small: ${lex.size}")
    assert(lex.distinct.size === lex.size)
    lex.foreach { w =>
      assert(!w.startsWith("#") && w.trim == w && w.nonEmpty)
      assert(java.text.Normalizer.isNormalized(w,
        java.text.Normalizer.Form.NFC), s"not NFC: $w")
      assert(SeaSegment.isSeaRun(w), s"non-SEA entry: $w")
      // Lao entries sit in the LAO block specifically (U+0E80-0EFF),
      // not merely somewhere in the SEA superset — a Thai word pasted
      // into lao.txt fails here.
      w.codePoints().forEach(cp =>
        assert(cp >= 0x0E80 && cp <= 0x0EFF, f"non-Lao cp U+$cp%04X in $w"))
    }
  }

  test("Lao starter segments real spaceless sentences into real words") {
    val lex = SeaSegment.builtinLexicon("lao")
    // "hello, I like to eat rice" — spaceless, as Lao is written; the
    // SAME sentence whose hand-pinned segmentation backs the
    // q_text_sea_segment_lao oracle, so this pin and the driver's
    // hash check witness each other.
    val s1 = "ສະບາຍດີຂ້ອຍມັກກິນເຂົ້າ"
    assert(tokensOf(s1, lex) ===
      Seq("ສະບາຍດີ", "ຂ້ອຍ", "ມັກ", "ກິນ", "ເຂົ້າ"))
    // Mixed known/unknown: the repetition mark U+0EC6 is a letter
    // (Lm) inside the SEA run but no lexicon entry — it chunks.
    val s2 = "ຂອບໃຈຫຼາຍໆ"
    val got = tokensOf(s2, lex)
    assert(got.head === "ຂອບໃຈ" && got.contains("ຫຼາຍ"), got.toString)
    // The fallback tokenizer cannot produce the tone-marked words.
    assert(!fallbackOf(s1).contains("ສະບາຍດີ"))
    assert(!fallbackOf(s1).contains("ເຂົ້າ"))
  }

  test("builtin Khmer lexicon: loads, NFC, Khmer-block-only, Mc vowels intact") {
    val lex = SeaSegment.builtinLexicon("khmer")
    assert(lex.size >= 120, s"starter lexicon too small: ${lex.size}")
    assert(lex.distinct.size === lex.size)
    lex.foreach { w =>
      assert(!w.startsWith("#") && w.trim == w && w.nonEmpty)
      assert(java.text.Normalizer.isNormalized(w,
        java.text.Normalizer.Form.NFC), s"not NFC: $w")
      w.codePoints().forEach(cp =>
        assert(cp >= 0x1780 && cp <= 0x17FF, f"non-Khmer cp U+$cp%04X in $w"))
    }
    // The starter genuinely contains SPACING combining marks (Mc) —
    // the category the r20 isTokenChar widening admits; if a future
    // cleanup reverts it, this assertion plus the segmentation test
    // below fail together.
    assert(lex.exists(_.codePoints().anyMatch(cp =>
      Character.getType(cp) == Character.COMBINING_SPACING_MARK)))
  }

  test("Khmer starter segments real spaceless sentences into real words") {
    val lex = SeaSegment.builtinLexicon("khmer")
    // "hello, I like to eat rice" — the same sentence whose hand-pinned
    // segmentation backs the q_text_sea_segment_khmer oracle. បាយ and
    // ញ៉ាំ carry the Mc vowel ា (U+17B6): under the pre-r20 Mn-only
    // rule the run split at every ា and none of these words could match.
    val s1 = "សួស្តីខ្ញុំចូលចិត្តញ៉ាំបាយ"
    assert(tokensOf(s1, lex) ===
      Seq("សួស្តី", "ខ្ញុំ", "ចូលចិត្ត", "ញ៉ាំ", "បាយ"))
    // Mixed known/unknown: ៗ (U+17D7 repetition) is Lm, joins the run,
    // matches nothing — chunks between hits.
    val got = tokensOf("អរគុណច្រើនៗ", lex)
    assert(got.head === "អរគុណ" && got.contains("ច្រើន"), got.toString)
    // The fallback cannot produce the vowel-bearing words: ា is a
    // token boundary under the contract kernel in BOTH engines.
    assert(!fallbackOf(s1).contains("បាយ"))
    assert(!fallbackOf(s1).contains("ខ្ញុំ"))
  }

  test("builtin Myanmar lexicon: loads, NFC, Myanmar-block-only, no kinzi") {
    val lex = SeaSegment.builtinLexicon("myanmar")
    assert(lex.size >= 100, s"starter lexicon too small: ${lex.size}")
    assert(lex.distinct.size === lex.size)
    lex.foreach { w =>
      assert(!w.startsWith("#") && w.trim == w && w.nonEmpty)
      assert(java.text.Normalizer.isNormalized(w,
        java.text.Normalizer.Form.NFC), s"not NFC: $w")
      w.codePoints().forEach(cp =>
        assert(cp >= 0x1000 && cp <= 0x109F, f"non-Myanmar cp U+$cp%04X in $w"))
      // The starter's documented boundary: kinzi/stacking spellings
      // (U+1039) are excluded, deliberately — entries must not sneak
      // one in, or the lexicon header's claim goes stale.
      assert(!w.contains('္'), s"kinzi/stack spelling slipped in: $w")
    }
    // Mc marks present here too (U+1031 E, U+102C AA, U+1038 visarga).
    assert(lex.exists(_.codePoints().anyMatch(cp =>
      Character.getType(cp) == Character.COMBINING_SPACING_MARK)))
  }

  test("Myanmar starter segments real spaceless sentences into real words") {
    val lex = SeaSegment.builtinLexicon("myanmar")
    // "I eat rice" — the sentence whose hand-pinned segmentation backs
    // the q_text_sea_segment_myanmar oracle; logical-order U+1031.
    val s1 = "ကျွန်တော်ထမင်းစားသည်"
    assert(tokensOf(s1, lex) ===
      Seq("ကျွန်တော်", "ထမင်း", "စား", "သည်"))
    // Prefix trap, the Burmese instance: the lexicon holds both စား
    // (eat) and longer စ-initial entries; at this position only စား
    // matches and the boundary before သည် holds.
    val got = tokensOf("ရေသောက်သည်", lex) // "(I) drink water"
    assert(got === Seq("ရေ", "သောက်", "သည်"), got.toString)
    // The fallback cannot produce the vowel/asat-bearing words.
    assert(!fallbackOf(s1).contains("ကျွန်တော်"))
    assert(!fallbackOf(s1).contains("ထမင်း"))
  }

  test("lexiconFor: session knob routes demo | builtin | file") {
    val s2 = spark.newSession()
    assert(SeaSegment.lexiconFor(s2) === SeaSegment.DemoLexicon)
    s2.conf.set("spark.graft.sea.lexicon", "builtin:thai")
    assert(SeaSegment.lexiconFor(s2).size >= 150)
    val f = java.nio.file.Files.createTempFile("graft_lex", ".txt")
    java.nio.file.Files.writeString(f,
      s"# user lexicon\n$Sawasdee\n\n$Khrap\n$Sawasdee\n")
    s2.conf.set("spark.graft.sea.lexicon", s"file:$f")
    assert(SeaSegment.lexiconFor(s2) === Seq(Sawasdee, Khrap))
    s2.conf.set("spark.graft.sea.lexicon", "bogus")
    intercept[IllegalArgumentException] { SeaSegment.lexiconFor(s2) }
    // And the registry query runs under the builtin without drift on
    // non-SEA scripts: latin/digit rows must equal the demo run's
    // (the lexicon only changes SEA segmentation).
    s2.conf.set("spark.graft.sea.lexicon", "builtin:thai")
    def rows(s: org.apache.spark.sql.SparkSession) =
      Registry.byName("q_text_sea_segment").df(s, sf).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val demo = rows(spark)
    val thai = rows(s2)
    assert(demo.contains("latin") && demo.keySet === thai.keySet)
    for (script <- demo.keySet if script != "sea")
      assert(demo(script) === thai(script), script)
    // SEA dict tokenization must differ from the fallback on both.
    assert(thai("sea")._1 != thai("sea")._2)
  }
}
