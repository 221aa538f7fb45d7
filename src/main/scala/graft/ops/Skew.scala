package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffles whose key distribution is
  * pathological (one hot key = one dead executor at 100 TB).
  *
  * Spark already handles two of the three classic skew cases without
  * help: skewed AGGREGATION keys are absorbed by map-side partial
  * aggregation, and AQE's OptimizeSkewedJoin splits oversized
  * shuffle-join partitions at runtime. The remaining case — a shuffle
  * join where one probe-side key floods a partition and AQE cannot
  * split it further, or a deliberately AQE-less environment — is what
  * salting solves: spread the probe side over `buckets` sub-keys and
  * replicate the build side once per bucket. Output rows are identical
  * to the plain join (asserted in SkewSpec).
  */
object Skew {

  /** Equi-join `probe` (large, possibly skewed on `key`) with `build`
    * (small) on `key`, salted over `buckets` sub-keys.
    *
    * The salt is a deterministic hash of `saltCols` (never random —
    * results must be reproducible), so a hot key's rows spread
    * uniformly over `buckets` shuffle partitions; the build side is
    * replicated `buckets`×, which is the explicit cost knob: pick
    * buckets ≈ (hot-key rows / target partition rows).
    *
    * Pass a near-unique `saltCols` (an event_id, a file offset) when
    * one exists. The default — all non-key columns — DEGENERATES when a
    * hot key's rows are byte-identical (common in log data): identical
    * rows hash to one bucket and nothing spreads. There is no
    * deterministic spread for truly identical rows (any pure function
    * of the row is constant over them), so callers in that situation
    * must supply a distinguishing column.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      buckets: Int, saltCols: Seq[String] = Nil): DataFrame = {
    require(buckets > 0)
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename it first")
    saltCols.foreach(c => require(probe.columns.contains(c),
      s"salt column $c not in probe columns ${probe.columns.mkString(",")}"))
    // Default salt source: the non-key columns; a key-only probe has
    // nothing to hash, so it degenerates to a single bucket (correct,
    // no spread).
    val saltSrc = (if (saltCols.nonEmpty) saltCols
      else probe.columns.filter(_ != key).toSeq).map(col)
    val saltExpr =
      if (saltSrc.isEmpty) lit(0L)
      else pmod(xxhash64(saltSrc: _*), lit(buckets.toLong))
    val salted = probe.withColumn("__salt", saltExpr)
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
