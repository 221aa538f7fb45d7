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
    * The salt is a deterministic hash of the probe row's other columns
    * (never random — results must be reproducible), so a hot key's rows
    * spread uniformly over `buckets` shuffle partitions; the build side
    * is replicated `buckets`×, which is the explicit cost knob: pick
    * buckets ≈ (hot-key rows / target partition rows).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    // Salt from the non-key columns; a key-only probe has nothing to
    // hash, so it degenerates to a single bucket (correct, no spread).
    val saltSrc = probe.columns.filter(_ != key).map(col).toSeq
    val saltExpr =
      if (saltSrc.isEmpty) lit(0L)
      else pmod(xxhash64(saltSrc: _*), lit(buckets.toLong))
    val salted = probe.withColumn("__salt", saltExpr)
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
