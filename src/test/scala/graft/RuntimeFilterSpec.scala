package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning (the shuffle-join sibling of
  * broadcast pruning): when a shuffle join's small side carries a
  * selective filter, Catalyst builds a Bloom filter over that side's
  * join keys at runtime and applies `might_contain` to the big side
  * BEFORE its shuffle — at 100 TB the difference between shuffling
  * the whole fact table and shuffling roughly the matching fraction.
  * The engagement thresholds are byte-based (a toy fixture never
  * crosses them), so the test dials the application-side threshold to
  * zero to watch the rule engage, and pins result equality against
  * the un-filtered plan.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  import TestSpark._

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // Fact ⋈ selectively-filtered dim, forced to a shuffle join
  // (broadcast disabled) — the shape InjectRuntimeFilter targets.
  private def joined = Tables.lineitem(spark, sf)
    .join(
      Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT"),
      col("l_orderkey") === col("o_orderkey"))
    .groupBy("o_orderkey").agg(count(lit(1)).as("n"))

  test("a selective dim filter injects a runtime bloom filter on the fact side") {
    val plain = joined.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain.nonEmpty)

    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = joined
      val plan = q.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("bloom_filter_agg"),
        s"no bloom filter built over the dim keys:\n$plan")
      assert(plan.contains("might_contain"),
        s"fact side not filtered through the bloom filter:\n$plan")
      // Pruning is advisory, never semantic: identical rows out.
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === plain)
    }
  }

  test("vocab-prune bloom variant: hand-planted filter, identical rows") {
    // q_text_vocab_prune's scoring join shuffles tokens on the word
    // key by design (real vocabularies outgrow broadcast), and its
    // creation side sits behind an aggregation — a shape
    // InjectRuntimeFilter's filter-over-scan eligibility check skips.
    // The hand-planted variant builds the SAME bloom from Spark's own
    // expressions and probes before the exchange; false positives are
    // dropped by the join itself, so the result set must be EXACTLY
    // the reference query's.
    val ref = q("q_text_vocab_prune").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val variant = graft.ops.TextSim.vocabPruneBloom(spark, sf)
    val got = variant.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === ref.toSeq)
    // The probe must sit in the plan (on the token side, before the
    // join), proving rows are dropped pre-shuffle, not post-join.
    val plan = variant.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"no bloom probe in the variant plan:\n$plan")
    // And the bloom genuinely prunes pre-shuffle rows: rebuild the
    // same bloom over the kept vocab and count the token stream
    // through the probe — strictly fewer rows than the raw stream
    // (the fixture corpus has hapax words, which df >= 2 excludes).
    import org.apache.spark.sql.functions._
    val tok = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(expr("graft_tokens(text)")).as("word"))
    val nDocs = tok.agg(countDistinct(col("doc_id")).as("n_docs"))
    val kept = tok.groupBy("word")
      .agg(countDistinct(col("doc_id")).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= 2 && col("df") <= col("n_docs") * 0.5)
      .select("word")
    val bf = kept.agg(expr("graft_bloom_agg(xxhash64(word))").as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val total = tok.count()
    val surviving = tok.filter(
      org.apache.spark.sql.graftnative.VectorNative.mightContain(
        lit(bf), xxhash64(col("word")))).count()
    assert(surviving < total,
      s"bloom pruned nothing: $surviving of $total tokens survive")
  }
}
