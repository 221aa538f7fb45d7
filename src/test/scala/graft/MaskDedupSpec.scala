package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The de-blocked char-set Jaccard: the quadratic stage must run over
  * DISTINCT (lang, block, charset) triples — bounded by the alphabet's
  * power set forever — while producing exactly the pairs a direct
  * all-pairs-within-block EXACT set computation produces. The ground
  * truth here is alphabet-independent (array set ops on the distinct
  * chars of the raw text), so these tests also pin that the mask fast
  * path and the out-of-alphabet exact path agree with true char-set
  * Jaccard — on the fixtures AND on a mixed-alphabet corpus with
  * digits, uppercase, and Unicode.
  */
class MaskDedupSpec extends AnyFunSuite {
  import TestSpark._
  import graft.ops.TextSim

  /** Direct all-pairs-within-block char-set Jaccard, computed from the
    * raw text with exact set ops — no mask, no alphabet assumption. */
  private def directPairs(dir: String): Set[(Long, Long, Double)] = {
    val docs = Tables.documents(spark, dir)
      .withColumn("blk", expr("n_chars div 100"))
      .withColumn("chars", array_distinct(split(col("text"), "")))
      .select("doc_id", "lang", "blk", "chars")
    val a = docs.select(col("doc_id").as("ida"), col("lang").as("lang_a"),
      col("blk").as("blk_a"), col("chars").as("ch_a"))
    val b = docs.select(col("doc_id").as("idb"), col("lang").as("lang_b"),
      col("blk").as("blk_b"), col("chars").as("ch_b"))
    a.join(b, col("lang_a") === col("lang_b")
      && col("blk_a") === col("blk_b") && col("ida") < col("idb"))
      .withColumn("jac", round(
        size(array_intersect(col("ch_a"), col("ch_b"))).cast("double") /
          size(array_union(col("ch_a"), col("ch_b"))), 6))
      .filter(col("jac") >= 0.9)
      .select("ida", "idb", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def queryPairs(dir: String): Set[(Long, Long, Double)] =
    Registry.byName("q_dedup_jaccard").df(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("mask-pair formulation equals the direct all-pairs exact formulation") {
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val got = queryPairs(dir)
      val want = directPairs(dir)
      assert(want.nonEmpty, s"vacuous equality at $dir")
      assert(got === want, s"pair sets differ at $dir")
    }
  }

  test("out-of-alphabet documents (digits/uppercase/Unicode) dedup exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mask_alpha")
    dir.toFile.deleteOnExit()
    // The old 27-bit-mask-only formulation silently dropped every char
    // outside {space, a-z}: docs 1/2 ("abc1" vs "abc2") would compare
    // EQUAL on the surviving {a,b,c} even though their true char-set
    // Jaccard is 3/5. Docs 3-8 are genuinely identical char sets that
    // only an alphabet-faithful path can flag (digit, uppercase,
    // Cyrillic); docs 9/10 keep a clean-path pair in the same corpus so
    // both branches run side by side.
    Seq(
      (1L, "abc1", "en", "srcT", 4L),
      (2L, "abc2", "en", "srcT", 4L),
      (3L, "xyz 9", "en", "srcT", 5L),
      (4L, "zyx 9", "en", "srcT", 5L),
      (5L, "HELLO WORLD", "en", "srcT", 11L),
      (6L, "DLROW OLLEH", "en", "srcT", 11L),
      (7L, "привет мир", "ru", "srcT", 10L),
      (8L, "мир привет", "ru", "srcT", 10L),
      (9L, "plain lowercase text", "en", "srcT", 20L),
      (10L, "lowercase plain text", "en", "srcT", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = queryPairs(dir.toString)
    val want = directPairs(dir.toString)
    assert(got === want, "mixed-alphabet pair sets differ")
    // The identical-set pairs across digit/upper/Unicode alphabets and
    // the clean lowercase pair are all found …
    Seq((3L, 4L), (5L, 6L), (7L, 8L), (9L, 10L)).foreach { case (x, y) =>
      assert(got.contains((x, y, 1.0)), s"missing exact-dup pair ($x,$y)")
    }
    // … and the pair the mask-only code would have INVENTED (equal
    // after dropping digits) is correctly rejected.
    assert(!got.exists(p => p._1 == 1L && p._2 == 2L),
      "digits were dropped: (1,2) flagged as duplicates")
  }

  test("the quadratic stage's key space is distinct charsets, not documents") {
    val docs = TextSim.charMaskDocs(spark, "/root/testdata/sf0.01")
    val nDocs = docs.count()
    val nKeys = docs.select("lang", "blk", "cs").distinct().count()
    // The compression is what de-blocks the join: pairs grow with
    // keys^2 (capped by the alphabet's power set), never with docs^2.
    assert(nKeys < nDocs,
      s"charset dedup buys nothing: $nKeys keys vs $nDocs docs")
    // On the all-lowercase fixtures every doc is mask-clean (the fast
    // path is actually exercised by the oracle queries).
    assert(docs.filter(!col("clean")).count() === 0L)
  }
}
