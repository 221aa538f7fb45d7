package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning (SURVEY §4.2): a fact table partitioned on
  * the join key is pruned at RUNTIME by the dim side's selective filter
  * — the scan never reads partitions the join cannot match. This is the
  * payoff of the partitioned sink layout at 100 TB: the dim filter, not
  * the fact scan, bounds the I/O.
  */
class PruningSpec extends AnyFunSuite {
  import TestSpark._

  test("dim filter dynamically prunes the partitioned fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp")
    dir.toFile.deleteOnExit()
    val fact = dir.toString + "/events_by_type"
    graft.sources.Ingest.writePartitioned(
      Tables.events(spark, sf), fact, "event_type")
    // The dim must be a file source with a real Filter node — a local
    // relation gets its predicate constant-folded away, and DPP's
    // selective-predicate check then finds nothing to reuse.
    val dimPath = dir.toString + "/types"
    spark.createDataFrame(Seq(
      ("click", 1), ("view", 2), ("purchase", 3), ("signup", 4),
      ("error", 5))).toDF("event_type", "type_id")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.read.parquet(fact)
      .join(dim.filter(col("type_id") === 3), "event_type")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    val rows = joined.collect()
    assert(rows.length === 1 && rows.head.getString(0) === "purchase")
    assert(rows.head.getLong(1) ===
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
  }
}
