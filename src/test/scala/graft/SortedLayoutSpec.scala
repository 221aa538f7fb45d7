package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-layout lesson for the 100 TB ingest path: a parquet file's
  * row-group min/max statistics only prune when the write ORDER puts
  * correlated values in the same row groups. Same data, same query,
  * same pushed filter — the sorted layout's scan emits a small
  * fraction of the rows the scrambled layout's scan emits, measured
  * from the scan operator's own metrics. This is why the derivation
  * pipelines sort-on-write their hot filter columns.
  */
class SortedLayoutSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(p: String): String = {
    val d = Files.createTempDirectory(p)
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Rows the parquet SCAN emitted (post row-group pruning, pre any
    * residual filter) for `df` after executing it. */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f.metrics("numOutputRows").value
    }.get
  }

  test("sort-on-write layout prunes parquet row groups; scrambled layout cannot") {
    val n = 400000L
    // v is a scrambled function of id: written in id order the v
    // values are spread over every row group; written in v order each
    // row group covers a narrow v range.
    val base = spark.range(n).select(col("id"),
      pmod(xxhash64(col("id")), lit(n)).as("v"))
    val scrambled = tmp("graft_layout_scrambled")
    val sorted = tmp("graft_layout_sorted")
    // Small row groups so the 400k-row file holds many of them (the
    // default 128 MB block would make this a one-row-group file).
    base.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024).parquet(scrambled)
    base.orderBy("v").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024).parquet(sorted)

    def probe(dir: String): (Long, Long) = {
      val q = spark.read.parquet(dir).filter(col("v") < 1000)
      val matched = q.count()
      (scanRows(spark.read.parquet(dir).filter(col("v") < 1000)), matched)
    }
    val (scannedScrambled, m1) = probe(scrambled)
    val (scannedSorted, m2) = probe(sorted)
    assert(m1 === m2, "layouts disagree on the query result")
    assert(m1 > 0, "vacuous probe — no matching rows")
    // The pushed filter reaches both scans identically …
    val plan = spark.read.parquet(sorted).filter(col("v") < 1000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(v), LessThan(v,1000)]"),
      s"filter not pushed:\n$plan")
    // … but only the sorted layout's row-group stats can act on it:
    // the scrambled scan emits (nearly) every row, the sorted scan a
    // small fraction.
    assert(scannedScrambled > n / 2,
      s"scrambled layout unexpectedly pruned: $scannedScrambled of $n")
    assert(scannedSorted < n / 10,
      s"sorted layout did not prune: $scannedSorted of $n")
  }

  /** Bit-interleave two `bits`-bit columns into their Morton (Z-order)
    * code — plain codegen'd shifts/ors, no UDF. */
  private def morton(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column =
    (0 until bits).map(i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)))
      .reduce(_ bitwiseOR _)

  test("Z-order layout prunes row groups on BOTH columns; single-column sort only on its own") {
    // The multi-dimensional version of the lesson above: when two
    // columns are both hot filters, sorting on one leaves the other
    // unprunable, while sorting on the MORTON INTERLEAVE of the two
    // clusters row groups in (a, b) space — each dimension keeps
    // enough locality that selective filters on EITHER column skip
    // most row groups. This is the layout decision for a 100 TB table
    // with two independent access paths (no second copy of the data).
    val n = 400000L
    val base = spark.range(n).select(col("id"),
      pmod(xxhash64(col("id")), lit(256L)).as("a"),
      pmod(xxhash64(col("id"), lit(7L)), lit(256L)).as("b"))
    val byA = tmp("graft_layout_bya")
    val byZ = tmp("graft_layout_byz")
    base.orderBy("a").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024).parquet(byA)
    base.withColumn("z", morton(col("a"), col("b"), 8))
      .orderBy("z").drop("z").coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024).parquet(byZ)

    // Selective range probe on each column (8/256 of the value space).
    def probe(dir: String, c: String): Long =
      scanRows(spark.read.parquet(dir).filter(col(c) < 8))
    val matched = base.filter(col("b") < 8).count()
    assert(matched > 0 && matched < n / 16,
      s"probe not selective: $matched of $n")

    // Sorted-by-a: prunes a, cannot prune b.
    assert(probe(byA, "a") < n / 10,
      "a-sorted layout did not prune its own column")
    assert(probe(byA, "b") > n / 2,
      "a-sorted layout unexpectedly pruned the other column")
    // Z-order: prunes BOTH (coarser than a dedicated sort on one
    // column, but available to each dimension simultaneously).
    assert(probe(byZ, "a") < n / 4,
      s"z-order layout did not prune on a: ${probe(byZ, "a")} of $n")
    assert(probe(byZ, "b") < n / 4,
      s"z-order layout did not prune on b: ${probe(byZ, "b")} of $n")
  }
}
