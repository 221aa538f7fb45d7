package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The de-blocked char-set Jaccard: the quadratic stage must run over
  * DISTINCT (lang, block, mask) triples — bounded by 2^27 forever —
  * while producing exactly the pairs the direct all-pairs-within-block
  * formulation produces.
  */
class MaskDedupSpec extends AnyFunSuite {
  import TestSpark._
  import graft.ops.TextSim

  private def directPairs(dir: String): Set[(Long, Long, Double)] = {
    val docs = TextSim.charMaskDocs(spark, dir)
    val a = docs.select(col("doc_id").as("ida"), col("lang").as("lang_a"),
      col("blk").as("blk_a"), col("cm").as("cm_a"))
    val b = docs.select(col("doc_id").as("idb"), col("lang").as("lang_b"),
      col("blk").as("blk_b"), col("cm").as("cm_b"))
    a.join(b, col("lang_a") === col("lang_b")
      && col("blk_a") === col("blk_b") && col("ida") < col("idb"))
      .withColumn("jac", round(
        bit_count(col("cm_a").bitwiseAND(col("cm_b"))).cast("double") /
          bit_count(col("cm_a").bitwiseOR(col("cm_b"))), 6))
      .filter(col("jac") >= 0.9)
      .select("ida", "idb", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("mask-pair formulation equals the direct all-pairs formulation") {
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val got = Registry.byName("q_dedup_jaccard").df(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = directPairs(dir)
      assert(want.nonEmpty, s"vacuous equality at $dir")
      assert(got === want, s"pair sets differ at $dir")
    }
  }

  test("the quadratic stage's key space is distinct masks, not documents") {
    val docs = TextSim.charMaskDocs(spark, "/root/testdata/sf0.01")
    val nDocs = docs.count()
    val nMasks = docs.select("lang", "blk", "cm").distinct().count()
    // The compression is what de-blocks the join: pairs grow with
    // masks^2 (capped at 2^27 triples), never with docs^2.
    assert(nMasks < nDocs,
      s"mask dedup buys nothing: $nMasks masks vs $nDocs docs")
  }
}
