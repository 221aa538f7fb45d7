package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Centralized table loaders.
  *
  * Every query obtains its inputs through here so that the two fixture
  * hazards (SURVEY.md §7.4) are handled in exactly one place:
  *
  *  - `events.ts` has shipped in TWO physical encodings across fixture
  *    generations, so the reader dispatches on the parquet footer type
  *    instead of assuming one (schema-on-read; the r8 fixture regeneration
  *    that swapped int64-ns for native timestamp[us] is exactly the hazard):
  *      - int64 nanoseconds (TIMESTAMP(NANOS) read under
  *        `spark.sql.legacy.parquet.nanosAsLong=true`, or a plain int64
  *        column): converted with integer division (`ts div 1000`), which
  *        is exact for the positive fixture epochs and matches DuckDB's
  *        automatic ns->us truncation value-for-value. (Double division
  *        would lose precision: epoch-ns ~1.7e18 exceeds the 53-bit double
  *        mantissa.)
  *      - native timestamp[us]/[ms]: pyarrow writes isAdjustedToUTC=false,
  *        which Spark reads as TIMESTAMP_NTZ; cast to the session-TZ
  *        timestamp (sessions here run UTC), yielding the identical
  *        instants the ns recipe produced. Already-adjusted TIMESTAMP
  *        columns pass through unchanged.
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

  /** Normalize one timestamp column to session-TZ TIMESTAMP regardless of
    * the physical parquet encoding it arrived in (SURVEY §2.13 rule 5).
    * Dispatching on the ALREADY-RESOLVED reader schema means a fixture
    * regeneration that changes the physical type can never silently break
    * a consumer again — the recipe follows the footer.
    *
    *  - LongType: int64 epoch-nanoseconds (TIMESTAMP(NANOS) under
    *    nanosAsLong, or a raw int64 column) → exact integer `div 1000`.
    *  - TIMESTAMP_NTZ: native timestamp[us]/[ms] with isAdjustedToUTC=false
    *    → cast to session-TZ timestamp (UTC sessions ⇒ identical instants).
    *  - TIMESTAMP: already adjusted; pass through.
    */
  private[graft] def normalizeTsColumn(dt: DataType, name: String): Column = dt match {
    case LongType         => expr(s"timestamp_micros(`$name` div 1000)")
    case TimestampNTZType => col(name).cast(TimestampType)
    case TimestampType    => col(name)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported physical type for timestamp column `$name`: $other")
  }

  /** events with the timestamp recipe dispatched on the footer type.
    * The nanosAsLong flag is session-wide and normally set at build
    * time (harness + TestSpark do); the defensive set below exists for
    * foreign sessions only and is guarded so the common path performs
    * NO conf mutation at plan time (the r2 review's hygiene note —
    * ConcurrencySpec proves the mixed batch stable either way). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    raw.withColumn("ts", normalizeTsColumn(raw.schema("ts").dataType, "ts"))
  }

  /** embeddings with the float->double recipe applied (§2.13 rule 6). */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .parquet(path(dir, "embeddings"))
      .withColumn("embedding", col("embedding").cast("array<double>"))
}
