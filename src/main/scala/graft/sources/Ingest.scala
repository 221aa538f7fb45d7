package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Non-parquet ingestion surface (SURVEY §2.1 CAP-SRC-TEXT/CSV/JSON/
  * BINARY, CAP-SINK-PART). FileMap is line-of-text native: a dataset is
  * a directory tree of files and a record is a line (or a whole file
  * for binary operators). These helpers are the schema-on-read
  * normalization layer in front of the relational engine; SourcesSpec
  * round-trips each one through tmp directories.
  */
object Ingest {

  /** Line-oriented text (FileMap's native record model): one row per
    * line, tagged with the file it came from — the lineage needed for
    * per-file map semantics and incremental re-runs. */
  def lines(spark: SparkSession, glob: String): DataFrame =
    spark.read.text(glob)
      .select(input_file_name().as("path"), col("value").as("line"))

  /** Delimited files with header + schema inference (the `awk -F,`
    * idiom). */
  def csv(spark: SparkSession, glob: String, delimiter: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("delimiter", delimiter)
      .csv(glob)

  /** Newline-delimited JSON with schema inference (the `jq` idiom). */
  def jsonLines(spark: SparkSession, glob: String): DataFrame =
    spark.read.json(glob)

  /** Newline-delimited JSON with QUARANTINE semantics for a dirty
    * feed: PERMISSIVE mode parses what it can and routes every
    * unparseable line, VERBATIM, into the `_corrupt` column (good rows
    * carry NULL there) — so one pass splits a crawl batch into clean
    * rows and a quarantine stream for reprocessing, instead of either
    * crashing the job (FAILFAST) or silently dropping data
    * (DROPMALFORMED). At 100 TB bad lines are a certainty, not an
    * edge case; a narrow per-line operation, no shuffle.
    *
    * The returned frame is cache()d before returning, and that is
    * LOAD-BEARING, not an optimization: Spark refuses (by
    * AnalysisException) any query that selects/filters ONLY the
    * corrupt-record column of a raw PERMISSIVE json read — the
    * quarantine split (`df.filter(col("_corrupt").isNotNull)
    * .select("_corrupt")`) is exactly that shape. Caching first lifts
    * the restriction, so the split usage shown in SourcesSpec is safe
    * by default. Callers that never touch `_corrupt` (one-pass clean
    * reads) can pass `cached = false` and skip pinning the parsed
    * input in executor storage — the restriction above only bites
    * corrupt-column-only queries. */
  def jsonLinesQuarantine(spark: SparkSession, glob: String,
      schemaDdl: String, cached: Boolean = true): DataFrame = {
    val df = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        schemaDdl + ", _corrupt STRING"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(glob)
    if (cached) df.cache() else df
  }

  /** Delimited files with QUARANTINE semantics —
    * [[jsonLinesQuarantine]]'s CSV twin (r17 verdict #4): PERMISSIVE
    * mode parses what it can and routes every malformed line,
    * VERBATIM, into `_corrupt` (good rows carry NULL there), so one
    * pass splits a dirty feed into clean rows and a quarantine stream.
    * Fields that DID parse on a corrupt row are kept (a wrong-typed
    * n_chars nulls that field only), which is what lets the
    * quarantine stream still group by its parsed keys. Same
    * cache()-before-return contract as the JSON twin: Spark refuses a
    * corrupt-column-only query on a raw PERMISSIVE read. */
  def csvQuarantine(spark: SparkSession, glob: String, schemaDdl: String,
      delimiter: String = ",", cached: Boolean = true): DataFrame = {
    val df = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        schemaDdl + ", _corrupt STRING"))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("delimiter", delimiter)
      .csv(glob)
    if (cached) df.cache() else df
  }

  /** Whole-file records for binary/multimodal data: (path, length,
    * modificationTime, content). Pair with ops.Multimodal for the
    * decode/feature pipelines. */
  def binaryFiles(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)

  /** Hive-style partitioned parquet sink (output tree mirrors the
    * partition columns — FileMap's output-tree model, and the
    * prerequisite for static + dynamic partition pruning on re-read). */
  def writePartitioned(df: DataFrame, dir: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(dir)

  /** ORC source — the second columnar format Spark ships natively;
    * same pushdown/pruning surface as parquet (predicate pushdown via
    * ORC's SearchArguments). */
  def orc(spark: SparkSession, glob: String): DataFrame =
    spark.read.orc(glob)

  /** ORC sink. */
  def writeOrc(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").orc(dir)
}
