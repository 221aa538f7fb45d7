package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Centralized table loaders.
  *
  * Every query obtains its inputs through here so that the two fixture
  * hazards (SURVEY.md §7.4) are handled in exactly one place:
  *
  *  - `events.ts` is parquet TIMESTAMP(NANOS): Spark 4.x refuses to read
  *    it unless `spark.sql.legacy.parquet.nanosAsLong=true`, after which
  *    it arrives as BIGINT nanoseconds. We convert with integer division
  *    (`ts div 1000`), which is exact for the positive fixture epochs and
  *    matches DuckDB's automatic ns->us truncation value-for-value.
  *    (Double division would lose precision: epoch-ns ~1.7e18 exceeds the
  *    53-bit double mantissa.)
  *  - `embeddings.embedding` is `list<float32>`: all similarity math must
  *    happen in double precision on BOTH engines, so the cast to
  *    `array<double>` happens here, once.
  *
  * At 100 TB these loaders are also the single choke-point for scan
  * tuning: the datasets stay path-glob parquet scans, so Catalyst's
  * column pruning / predicate pushdown / partition pruning all apply
  * downstream with no extra work.
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Generic loader; dispatches to the recipe loaders for hazard tables. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events"     => events(spark, dir)
      case "embeddings" => embeddings(spark, dir)
      case other        => spark.read.parquet(path(dir, other))
    }

  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")

  /** events with the ns-timestamp recipe applied (SURVEY §2.13 rule 5).
    * The nanosAsLong flag is session-wide and normally set at build
    * time (harness + TestSpark do); the defensive set below exists for
    * foreign sessions only and is guarded so the common path performs
    * NO conf mutation at plan time (the r2 review's hygiene note —
    * ConcurrencySpec proves the mixed batch stable either way). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(path(dir, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** embeddings with the float->double recipe applied (§2.13 rule 6). */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .parquet(path(dir, "embeddings"))
      .withColumn("embedding", col("embedding").cast("array<double>"))
}
