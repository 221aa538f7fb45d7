package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftnative.CmsKernels

/** Public Column-API entry points for the sketch-table kernels (the
  * expressions live in org.apache.spark.sql.graftnative for the same
  * `private[sql]` packaging reason as the vector kernels).
  */
object SketchFunctions {
  /** Aggregate: merge serialized Count-Min sketch rows (as produced by
    * `functions.count_min_sketch`) built with the same
    * (eps, confidence, seed) into one sketch. Counter addition — exact
    * and merge-order-independent, unlike the HLL union. */
  def cmsMerge(sketch: Column, eps: Double, confidence: Double,
      seed: Int): Column = CmsKernels.cmsMerge(sketch, eps, confidence, seed)

  /** Estimated counts for `probes` (array<string>) in a serialized CMS
    * column — array<long> aligned with the probes; one sketch
    * deserialize per row. */
  def cmsEstimates(sketch: Column, probes: Column): Column =
    CmsKernels.cmsEstimates(sketch, probes)

  /** Aggregate: Catalyst's own Bloom filter over a long key column
    * (`items` expected keys, `bits` bits). */
  def bloomAgg(key: Column, items: Long, bits: Long): Column =
    org.apache.spark.sql.graftnative.BloomKernels.bloomAgg(key, items, bits)

  /** Bloom membership probe: false is definite absence. */
  def bloomMightContain(bloom: Column, key: Column): Column =
    org.apache.spark.sql.graftnative.BloomKernels.mightContain(bloom, key)
}
