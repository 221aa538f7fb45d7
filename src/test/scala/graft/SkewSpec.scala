package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join: identical rows to the plain join, with the salt
  * actually present in the shuffle key (the skew-spreading mechanism).
  */
class SkewSpec extends AnyFunSuite {
  import TestSpark._
  import graft.ops.Skew

  // lineitem.l_returnflag has 3 values (~2000 rows each at sf0.001) —
  // a deliberately hot join key.
  private lazy val probe = Tables.lineitem(spark, sf)
    .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
  private lazy val build = spark.createDataFrame(Seq(
    ("A", "returned"), ("N", "normal"), ("R", "refused"))).toDF("l_returnflag", "label")

  test("salted join returns exactly the plain join's rows") {
    val plain = probe.join(build, "l_returnflag")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "label")
    val salted = Skew.saltedJoin(probe, build, "l_returnflag", buckets = 8)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "label")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0L)
    assert(plain.except(salted).count() === 0L)
  }

  test("the shuffle key includes the salt, spreading the hot key") {
    val salted = Skew.saltedJoin(probe, build, "l_returnflag", buckets = 8)
    val plan = salted.queryExecution.executedPlan.toString
    // Either a shuffle join keyed on (key, salt), or — for this small
    // build side — a broadcast join whose join key still carries the
    // salt; both show __salt in the plan's join keys.
    assert(plan.contains("__salt"), s"salt not in the physical plan:\n$plan")
    // And the salt values actually spread the hot key across buckets.
    val perKey = probe.withColumn("__salt",
      pmod(xxhash64(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
        lit(8L)))
      .groupBy("l_returnflag").agg(countDistinct(col("__salt")).as("nsalts"))
      .collect().map(_.getLong(1))
    assert(perKey.forall(_ === 8L), "hot keys did not spread over all buckets")
  }

  test("identical hot-key rows spread when a unique salt column is supplied") {
    import spark.implicits._
    // The degenerate shape from log data: one hot key whose payload rows
    // are byte-identical. The default content-hash salt cannot spread
    // them (documented); an explicit near-unique column can.
    val hot = (1L to 1000L).map(i => (i, "hot", "same-payload"))
      .toDF("event_id", "k", "payload")
    val dim = Seq(("hot", "label")).toDF("k", "v")
    val spreadDefault = hot.drop("event_id")
      .withColumn("__s", pmod(xxhash64(col("payload")), lit(8L)))
      .agg(countDistinct(col("__s"))).head.getLong(0)
    assert(spreadDefault === 1L, "identical rows should hash to one bucket")
    val salted = Skew.saltedJoin(hot, dim, "k", buckets = 8,
      saltCols = Seq("event_id"))
    assert(salted.count() === 1000L)
    val spread = hot
      .withColumn("__s", pmod(xxhash64(col("event_id")), lit(8L)))
      .agg(countDistinct(col("__s"))).head.getLong(0)
    assert(spread === 8L, s"unique salt column spread only $spread/8 buckets")
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    import spark.implicits._
    // The Skew scaladoc claims AQE's OptimizeSkewedJoin handles the
    // shuffle-join case without salting — demonstrate it: one hot key
    // floods a partition; with broadcast disabled (to force the
    // sort-merge shape a big build side would take at scale) and
    // test-sized skew thresholds, the final plan must mark the join
    // skew=true (the partition was split into parallel sub-joins).
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // 90% of probe rows share key 0 (computed, so Catalyst cannot
      // constant-fold the join condition away); the build side has one
      // row per key.
      val probe = spark.range(200000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
          col("id"), lpad(col("id").cast("string"), 32, "x").as("pad"))
      val build = spark.range(200000)
        .select(col("id").as("k"), col("id").as("bid"))
      val joined = probe.join(build, "k")
      // Execute THIS frame (count() would run a different plan and
      // leave this one's AQE un-finalized).
      assert(joined.collect().length === 200000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("decision demo: when AQE skew-splitting suffices and when to salt") {
    import spark.implicits._
    // The decision tree this pins, with measured partition sizes:
    //  1. A free-standing skewed shuffle join: AQE's OptimizeSkewedJoin
    //     splits the flooded partition — salting buys nothing. Use AQE.
    //  2. The SAME join feeding a same-key aggregation: AQE declines to
    //     split (splitting would break the hash partitioning the agg
    //     reuses, and adding a shuffle back is not free), so the hot
    //     partition survives. Either opt into
    //     spark.sql.adaptive.forceOptimizeSkewedJoin (extra shuffle for
    //     the agg) or salt — the salt spreads the JOIN while the agg
    //     still absorbs its own skew via map-side partial aggregation.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val hotRows = 180000
      val probe = spark.range(200000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
          col("id"), lpad(col("id").cast("string"), 32, "x").as("pad"))
      val build = spark.range(200000)
        .select(col("id").as("k"), col("id").as("bid"))
      def maxPartRows(df: org.apache.spark.sql.DataFrame): Int =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().max

      // Case 1: free-standing join — AQE splits, measured: no partition
      // anywhere near the hot key's row count.
      val plain = probe.join(build, "k")
      plain.collect()
      assert(plain.queryExecution.executedPlan.toString.contains("skew=true"))
      val mpPlain = maxPartRows(probe.join(build, "k"))
      assert(mpPlain < hotRows / 3,
        s"AQE split ineffective: max partition $mpPlain of $hotRows hot rows")

      // Case 2: join feeding a same-key agg — AQE declines the split
      // (no skew=true), because it would break the agg's partitioning.
      val agged = probe.join(build, "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      agged.collect()
      assert(!agged.queryExecution.executedPlan.toString.contains("skew=true"),
        "expected AQE to decline the skew split under a same-key agg")

      // Case 2, option A: forceOptimizeSkewedJoin opts into the split
      // at the cost of an extra shuffle before the agg.
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val forced = probe.join(build, "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      forced.collect()
      assert(forced.queryExecution.executedPlan.toString.contains("skew=true"),
        "forceOptimizeSkewedJoin did not re-enable the split")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")

      // Case 2, option B: salting — the join spreads over (k, salt)
      // regardless of what consumes it; the same-key agg's own skew is
      // absorbed by partial aggregation. Measured against the flooded
      // baseline (skew split off): the hot partition at least halves.
      // (With only 4 test shuffle partitions several of the 8 salt
      // buckets co-hash into one partition, capping the local spread;
      // at scale partitions >> buckets and the spread approaches
      // hotRows/buckets.)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val mpFlooded = maxPartRows(probe.join(build, "k"))
      spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
      assert(mpFlooded >= hotRows,
        s"baseline not flooded: max partition $mpFlooded")
      val salted = Skew.saltedJoin(probe, build, "k", buckets = 8,
        saltCols = Seq("id"))
      val mpSalted = maxPartRows(salted)
      assert(mpSalted < mpFlooded / 2,
        s"salting ineffective: max partition $mpSalted vs flooded $mpFlooded")
      val saltedAgg = salted.groupBy("k").agg(count(lit(1)).as("n"))
      assert(saltedAgg.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        === probe.join(build, "k").groupBy("k").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap,
        "salted join + agg changed the aggregate result")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("saltedJoin rejects inputs that already carry a __salt column") {
    import spark.implicits._
    val bad = Seq((1L, "a", 0L)).toDF("id", "k", "__salt")
    val dim = Seq(("a", "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(bad, dim, "k", buckets = 2)
    }
  }
}
