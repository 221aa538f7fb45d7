package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CAP-SKETCH-HLL: the per-lang HLL sketch table
  * ([[ops.Sketches.hllSketchTable]]) is a faithful MERGEABLE summary.
  * DataSketches' union is set-semantic (replayed data never
  * double-counts) but measurably NOT bit-exact across merge orders —
  * coupon/gadget promotion lets the estimate wobble by ±1 with
  * arrival order — so the contract pinned here is tolerance-based:
  * merge orders agree within 0.5% of each other, merge vs rebuild
  * within 2%, and everything within HLL's error envelope of the true
  * distinct counts.
  */
class SketchTableSpec extends AnyFunSuite {
  import TestSpark._

  private def est(df: DataFrame): Long = df
    .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
    .head().getLong(0)

  private def sketchOf(df: DataFrame): DataFrame = df
    .agg(hll_sketch_agg(xxhash64(col("text")), 12).as("sketch"))

  test("merged per-lang sketches agree with a monolithic rebuild within 2%") {
    val merged = est(ops.Sketches.hllSketchTable(spark, sf))
    val direct = sketchOf(Tables.documents(spark, sf))
      .select(hll_sketch_estimate(col("sketch"))).head().getLong(0)
    assert(math.abs(merged - direct) <= math.max(1L, (0.02 * direct).toLong),
      s"merged=$merged direct=$direct")
  }

  test("estimates within 5% of exact distinct counts, per lang and overall") {
    val exact = Tables.documents(spark, sf)
      .groupBy("lang").agg(countDistinct(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.documents(spark, sf)
      .agg(countDistinct(col("text")).as("n")).head().getLong(0)
    val got = q("q_sketch_hll")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === exact.keySet + "*all*")
    (exact + ("*all*" -> exactAll)).foreach { case (lang, n) =>
      val e = got(lang)
      assert(math.abs(e - n) <= math.max(1L, (0.05 * n).toLong),
        s"lang=$lang exact=$n est=$e")
    }
  }

  test("incremental maintenance: merge orders agree within 0.5%; replay never double-counts") {
    // Three 'ingest batches' (doc_id mod 3), each sketched
    // INDEPENDENTLY as separate jobs would at 100 TB, then merged in
    // three different orders/groupings. DataSketches unions are not
    // bit-exact across orders (observed ±1 on this fixture), so pin a
    // tight spread rather than equality.
    val docs = Tables.documents(spark, sf)
    val batches = (0 until 3)
      .map(p => sketchOf(docs.filter(col("doc_id") % 3 === p)))
    val fwd = est(batches.reduce(_ unionAll _))
    val rev = est(batches.reverse.reduce(_ unionAll _))
    val nested = est(batches(2).unionAll(batches(0)).unionAll(batches(1)))
    val spread = Seq(fwd, rev, nested)
    assert(spread.max - spread.min <= math.max(1L, (0.005 * fwd).toLong),
      s"orders disagree: $spread")
    // Replay safety: merging a batch AGAIN (duplicate delivery) must
    // not inflate the estimate beyond the same hair-width wobble —
    // set semantics, not additive ones.
    val replay = est((batches :+ batches(1)).reduce(_ unionAll _))
    assert(math.abs(replay - fwd) <= math.max(1L, (0.005 * fwd).toLong),
      s"replayed batch moved the estimate: $replay vs $fwd")
    // And the merged batches track the full rebuild within 2%.
    val rebuild = sketchOf(docs)
      .select(hll_sketch_estimate(col("sketch"))).head().getLong(0)
    assert(math.abs(fwd - rebuild) <= math.max(1L, (0.02 * rebuild).toLong),
      s"merged=$fwd rebuild=$rebuild")
  }

  // ---- CMS frequency-sketch table (q_sketch_cms) ------------------------

  private def words = Tables.documents(spark, sf)
    .select(col("lang"), explode(split(col("text"), " ")).as("word"))

  test("CMS estimates are >= exact counts and overcount <= eps * tokens") {
    import ops.Sketches.{CmsEps, CmsProbes}
    val exact = words
      .filter(col("word").isin(CmsProbes: _*))
      .groupBy("lang", "word").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap.withDefaultValue(0L)
    val exactAll = CmsProbes.map(w =>
      ("*all*", w) -> exact.collect {
        case ((_, `w`), n) => n }.sum).toMap
    val tokens = words.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tokensAll = tokens.values.sum
    val got = q("q_sketch_cms")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got.keySet.map(_._1) === tokens.keySet + "*all*")
    (exact ++ exactAll).foreach { case ((lang, w), n) =>
      val e = got((lang, w))
      val budget = CmsEps * (if (lang == "*all*") tokensAll else tokens(lang))
      assert(e >= n, s"CMS under-counted $lang/$w: est=$e exact=$n")
      assert(e - n <= math.max(1L, budget.toLong),
        s"$lang/$w overcount ${e - n} > eps budget $budget")
    }
    // The never-present probe's estimate is pure collision overcount,
    // bounded by the same envelope.
    assert(got(("*all*", "zzz_absent")) <= math.max(1L, (CmsEps * tokensAll).toLong))
  }

  test("CMS merge is EXACT: any merge order is byte-identical to a rebuild") {
    import ops.Sketches.{CmsEps, CmsConf, CmsSeed}
    import graft.functions.SketchFunctions.cmsMerge
    def sk(df: DataFrame): Array[Byte] = df.head().getAs[Array[Byte]](0)
    // Three 'ingest batch' sketches (doc_id mod 3), merged in two
    // different orders, vs one sketch built over everything at once.
    // CMS counters ADD, so all three byte arrays must be identical —
    // the property that makes the sketch table incrementally
    // maintainable with no drift (contrast the HLL wobble above).
    val batches = (0 until 3).map { p =>
      Tables.documents(spark, sf).filter(col("doc_id") % 3 === p)
        .select(explode(split(col("text"), " ")).as("word"))
        .agg(count_min_sketch(col("word"),
          lit(CmsEps), lit(CmsConf), lit(CmsSeed)).as("cms"))
    }
    val fwd = sk(batches.reduce(_ unionAll _)
      .agg(cmsMerge(col("cms"), CmsEps, CmsConf, CmsSeed).as("cms")))
    val rev = sk(batches.reverse.reduce(_ unionAll _)
      .agg(cmsMerge(col("cms"), CmsEps, CmsConf, CmsSeed).as("cms")))
    val rebuild = sk(words
      .agg(count_min_sketch(col("word"),
        lit(CmsEps), lit(CmsConf), lit(CmsSeed)).as("cms")))
    assert(java.util.Arrays.equals(fwd, rev), "merge order changed the sketch")
    assert(java.util.Arrays.equals(fwd, rebuild),
      "merged batches differ from a monolithic rebuild")
  }

  test("maintained sketch table: upserts roll up; HLL absorbs replays; CMS == rebuild") {
    import graft.ops.Sketches
    val name = "sktups"
    val corpus = Tables.documents(spark, sf).select("lang", "text")
    // Batch 1: novel docs (every corpus text gets a distinct twin).
    val novel = corpus.select(col("lang"),
      concat(col("text"), lit(" zz_novel_suffix")).as("text"))
    Sketches.upsertIntoSketchTable(spark, sf, novel, name)
    // Batch 2: VERBATIM replay of the whole corpus.
    Sketches.upsertIntoSketchTable(spark, sf, corpus, name)
    val rolled = Sketches.sketchTableRollup(spark, sf, name)
    // HLL read path: distinct estimate per lang within 5% of the exact
    // distinct of corpus ∪ novel — the replay batch must add NOTHING
    // (set semantics), the novel batch must be fully visible.
    val est = rolled
      .select(col("lang"), hll_sketch_estimate(col("hll")).as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = corpus.unionByName(novel)
      .groupBy("lang").agg(countDistinct(col("text")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (lang, n) =>
      val e = est(lang)
      assert(math.abs(e - n).toDouble / n <= 0.05,
        s"$lang: estimate $e vs exact $n after replay+novel upserts")
    }
    // CMS read path: the maintained table's merged sketch is
    // BYTE-IDENTICAL to a monolithic rebuild over the full ingest
    // MULTISET (corpus + novel + replayed corpus — CMS counts the
    // replay, by design).
    val got = rolled.select("lang", "cms").collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1))).toMap
    val want = Sketches.sketchRowsOf(
        corpus.unionByName(novel).unionByName(corpus))
      .select("lang", "cms").collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (lang, bytes) =>
      assert(java.util.Arrays.equals(got(lang), bytes),
        s"$lang: maintained CMS differs from the multiset rebuild")
    }
  }
}
