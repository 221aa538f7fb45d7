package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CAP-TOKENIZE-UNICODE: the shared corpus tokenizer
  * (TextSim.normTokens = NFC → lower → split on non-letter/non-digit
  * runs → drop empties) on text the fixtures never exercise — mixed
  * scripts, combining marks, punctuation — plus the ORACLE-VALIDITY
  * GUARD that the fixture alphabet keeps the tokenizer identical to
  * the single-space split every DuckDB-side computation used to spell
  * (the property that lets 100+ oracle texts swap tokenizers without
  * a single hash moving).
  */
class TokenizeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def toks(texts: String*): Seq[Seq[String]] =
    texts.toDF("text")
      .select(graft.ops.TextSim.normTokens(col("text")).as("ws"))
      .collect().map(_.getSeq[String](0).toList).toList

  test("NFC: decomposed and precomposed spellings tokenize identically") {
    // "café" precomposed (U+00E9) vs "cafe" + COMBINING ACUTE (U+0301):
    // byte-different, canonically equal — NFC folds them to one token.
    val pre = "café"
    val dec = "café"
    assert(pre != dec && toks(pre) === toks(dec))
    assert(toks(pre) === Seq(Seq("café")))
  }

  test("case folds, punctuation splits, digits survive, CJK splits per ideograph") {
    assert(toks("Hello, World! x9 日本語") ===
      Seq(Seq("hello", "world", "x9", "日", "本", "語")))
    // Uppercase precomposed accent: lower() after NFC.
    assert(toks("CAFÉ!!") === Seq(Seq("café")))
    // Punctuation-only and empty strings yield EMPTY arrays, not [""].
    assert(toks("?!... --", "") === Seq(Seq(), Seq()))
  }

  test("unsegmented scripts tokenize per ideograph; segmented scripts keep runs") {
    // Han/Hiragana/Katakana write without spaces — a run rule yields
    // one mega-token per sentence and every downstream quality/dedup
    // signal degenerates on CJK crawl data. Per-ideograph is the
    // standard pipeline choice, spelled identically in the kernel
    // (Character.UnicodeScript), the composed Java regex (\p{IsHan}…)
    // and the DuckDB oracle (\p{Han}…, probed by hand this round).
    assert(toks("これはテストです") ===
      Seq(Seq("こ", "れ", "は", "テ", "ス", "ト", "で", "す")))
    assert(toks("中文文本 mixed with English") ===
      Seq(Seq("中", "文", "文", "本", "mixed", "with", "english")))
    // Halfwidth katakana is script Katakana (script lookup, not a
    // block-range check).
    assert(toks("ｶﾀｶﾅ") === Seq(Seq("ｶ", "ﾀ", "ｶ", "ﾅ")))
    // U+30FC PROLONGED SOUND MARK is script Common (both engines): it
    // stays a run character between the per-ideograph kana.
    assert(toks("サーバー") === Seq(Seq("サ", "ー", "バ", "ー")))
    // Hangul spaces its words — the run rule already segments Korean,
    // so it does NOT split per syllable block.
    assert(toks("한국어 단어 분리") === Seq(Seq("한국어", "단어", "분리")))
    // Kana + combining voiced mark: NFC composes か+゙ into が FIRST,
    // so the composed syllable is one token, not kana + stray mark.
    assert(toks("がき") === Seq(Seq("が", "き")))
  }

  test("unsegmented SEA scripts (Thai/Khmer/Lao/Myanmar): fallback run-tokenization pinned in all three spellings") {
    // These scripts write without spaces and keep the RUN rule (the
    // documented fallback — no dictionary segmentation; CJK got the
    // per-ideograph rule because single ideographs are meaningful
    // units, SEA syllables are not). Consequence worth pinning before
    // a fixture or engine change surprises us (the r8 lesson): their
    // combining marks (Thai tone marks, Khmer coeng, Myanmar asat) are
    // category Mn — NOT \p{L} — so marks SPLIT runs mid-word. That is
    // the current cross-engine behavior (Java regex and RE2 agree on
    // \p{L}); this test locks kernel ≡ composed ≡ a plain-JVM
    // reference of the semantic definition on exactly these scripts,
    // so any engine drift or future segmentation change must come
    // through here.
    val texts = Seq(
      "ภาษาไทยไม่มีช่องว่าง",           // Thai, spaceless, tone marks
      "สวัสดีครับ ผมชื่อสมชาย",          // Thai with a space
      "ภาษาเขียนด้วยกัน 123 mixed",     // Thai + digits + latin
      "ភាសាខ្មែរសរសេរដោយគ្មានspace",    // Khmer coeng stacks + latin run
      "ພາສາລາວບໍ່ມີຊ່ອງຫວ່າງ",          // Lao
      "မြန်မာဘာသာ စကား",               // Myanmar asat/virama
      "ไทย中文ไทย")                     // Thai runs + per-ideograph Han
    // Plain-JVM reference of the semantic definition: NFC → lower →
    // CJK ideographs split per character, everything else splits on
    // non-letter/non-digit runs (mirrors normTokensComposed's regex).
    def ref(t: String): Seq[String] = {
      val nfc = java.text.Normalizer
        .normalize(t, java.text.Normalizer.Form.NFC)
        .toLowerCase(java.util.Locale.ROOT)
      val spaced = nfc.replaceAll(
        "([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}])", " $1 ")
      spaced.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
    }
    val got = toks(texts: _*)
    val composed = texts.toDF("text")
      .select(graft.ops.TextSim.normTokensComposed(col("text")).as("ws"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got === composed, "fused kernel diverges from composed on SEA scripts")
    assert(got === texts.map(ref), "engines diverge from the plain-JVM reference")
    // The load-bearing consequences, spelled out:
    //  - a spaceless Thai phrase does NOT collapse to one mega-token
    //    (marks split it), so downstream stats stay non-degenerate;
    assert(got.head.length > 1)
    //  - Han inside a Thai run still splits per ideograph.
    assert(got.last === Seq("ไทย", "中", "文", "ไทย"))
  }

  test("null text stays null through the tokenizer") {
    val r = Seq[Option[String]](None, Some("a b")).toDF("text")
      .select(graft.ops.TextSim.normTokens(col("text")).as("ws"))
      .collect()
    assert(r(0).isNullAt(0) && r(1).getSeq[String](0) === Seq("a", "b"))
  }

  test("graft_nfc is SQL-registered and ASCII short-circuits to identity") {
    val got = spark.sql(
      "SELECT graft_nfc('abc') = 'abc', graft_nfc('café')")
      .collect().head
    assert(got.getBoolean(0) && got.getString(1) === "café")
  }

  test("fused kernel == composed NFC+lower+regex spelling, mixed + corpus") {
    // The registry runs the one-pass native kernel; the composed
    // spelling is the readable semantic definition (and the shape the
    // DuckDB oracles spell). Pin them row-equal on adversarial mixed
    // fixtures AND the whole fixture corpus.
    val mixed = Seq("Hello, World! x9 日本語", "café café", "CAFÉ!!",
      "?!... --", "", "a1b2 c3", "Ⅻ xiii 12", "tab\tsep\nline",
      "これはテストです", "中文文本 mixed with English", "ｶﾀｶﾅ",
      "サーバー", "한국어 단어 분리", "がき",
      "日本語とEnglishの混在123テキスト")
    val viaKernel = mixed.toDF("text")
      .select(graft.ops.TextSim.normTokens(col("text")).as("ws"))
      .collect().map(_.getSeq[String](0).toList).toList
    val viaComposed = mixed.toDF("text")
      .select(graft.ops.TextSim.normTokensComposed(col("text")).as("ws"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(viaKernel === viaComposed)
    val docs = Tables.documents(spark, sf)
    val diverged = docs.select(
        graft.ops.TextSim.normTokens(col("text")).as("a"),
        graft.ops.TextSim.normTokensComposed(col("text")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diverged === 0L, s"$diverged docs diverge fused vs composed")
  }

  test("zero-token docs score NULL quality, never DIVIDE_BY_ZERO") {
    // The unicode tokenizer returns an EMPTY token array for
    // punctuation-only docs (the old space-split never did); the
    // type-token-ratio division must degrade to NULL — matching
    // DuckDB's native x/0 = NULL — not raise under Spark 4's default
    // ANSI mode and fail a whole corpus scan for one junk doc.
    val r = Seq("?!... --", "", "real words here").toDF("text")
      .select(graft.ops.TextSim.qualityScore.as("q"))
      .collect()
    assert(r(0).isNullAt(0) && r(1).isNullAt(0) && !r(2).isNullAt(0))
  }

  test("ORACLE-VALIDITY GUARD: fixture tokens == single-space split") {
    // Every DuckDB oracle now spells the unicode tokenizer, and every
    // golden was pinned under the space-split era; both stay valid
    // only while the fixture text is clean [a-z0-9 ] (probed across
    // all three tiers when this landed). If a fixture regeneration
    // ever ships punctuation, uppercase, or multi-spaces, fail HERE,
    // loudly, not as 40 silent hash mismatches in the driver gate.
    val docs = Tables.documents(spark, sf)
    val diverged = docs.select(
        graft.ops.TextSim.normTokens(col("text")).as("a"),
        split(col("text"), " ").as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diverged === 0L,
      s"$diverged fixture docs tokenize differently than space-split")
  }
}
