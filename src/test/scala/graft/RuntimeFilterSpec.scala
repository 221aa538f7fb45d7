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
}
