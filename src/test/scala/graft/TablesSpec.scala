package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Schema-on-read defense for the table loaders (VERDICT r8 #1/#2).
  *
  * The r8 fixture regeneration silently swapped `events.ts` from int64
  * epoch-nanoseconds to native parquet timestamp[us], and the reader's
  * hardcoded ns recipe took out 23 queries. This spec writes the SAME
  * logical events rows in every physical encoding a fixture generator
  * has produced (or plausibly could) and asserts `Tables.events` yields
  * identical values from each — so a future regeneration can change the
  * physical type without changing a single query result.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // One logical fixture: (event_id, epoch_micros, user_id, event_type, value)
  private val logical: Seq[(Long, Long, Long, String, Double)] = Seq(
    (1L, 1700000000000000L, 10L, "view", 1.5),
    (2L, 1700000000123456L, 10L, "click", 2.5),
    (3L, 1700003600999999L, 11L, "view", 3.5),
    (4L, 1700007200000001L, 12L, "purchase", 4.5)
  )

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_tables_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Write an events.parquet whose ts column is int64 epoch-NANOSECONDS
    * (the pre-r8 physical shape as seen under nanosAsLong). */
  private def writeNsLong(dir: String): Unit =
    logical.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_us") * 1000L)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  /** Write an events.parquet whose ts column is native timestamp[us] with
    * isAdjustedToUTC=false (pyarrow's default — reads back TIMESTAMP_NTZ,
    * the r8 regenerated shape). */
  private def writeUsNtz(dir: String): Unit =
    logical.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  /** Write an events.parquet whose ts column is an adjusted-to-UTC
    * TIMESTAMP (isAdjustedToUTC=true — reads back TimestampType). */
  private def writeUsAdjusted(dir: String): Unit =
    logical.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def readNormalized(dir: String): (Seq[Row], DataType) = {
    val df = Tables.events(spark, dir).orderBy("event_id")
    (df.collect().toSeq, df.schema("ts").dataType)
  }

  test("Tables.events yields identical values across int64-ns, timestamp[us]-NTZ, and adjusted-timestamp encodings") {
    val dirs = Seq("ns" -> writeNsLong _, "usntz" -> writeUsNtz _, "usadj" -> writeUsAdjusted _)
      .map { case (tag, write) =>
        val d = tmpDir(tag); write(d); tag -> d
      }
    val results = dirs.map { case (tag, d) => tag -> readNormalized(d) }
    for ((tag, (_, dt)) <- results)
      assert(dt === TimestampType, s"encoding $tag must normalize to session-TZ TIMESTAMP")
    val canonical = results.head._2._1
    for ((tag, (rows, _)) <- results.tail)
      assert(rows === canonical, s"encoding $tag rows differ from ${results.head._1}")
    // The normalized instants must equal the logical epoch-micros exactly.
    val micros = results.head._2._1.map(_.getTimestamp(1).toInstant)
      .map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L)
    assert(micros === logical.map(_._2))
  }

  test("Tables.events on the real fixture reads native timestamp[us] and matches row count") {
    val df = Tables.events(spark, TestSpark.sf)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
  }

  test("normalizeTsColumn rejects unsupported physical types") {
    intercept[IllegalArgumentException] {
      Tables.normalizeTsColumn(StringType, "ts")
    }
  }
}
