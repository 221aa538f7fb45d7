package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fm-shaped CLI: map-cmd over lines, hash-bucket shuffle,
  * reduce-cmd per bucket — end results equal the declarative engine's.
  */
class CliSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(p: String): String = {
    val d = Files.createTempDirectory(p)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("map + bucket-shuffle + reduce equals the declarative word count") {
    val in = tmp("graft_cli_in")
    val out = tmp("graft_cli_out")
    // A small text tree: one doc per line.
    Tables.documents(spark, sf).select("text").limit(100)
      .coalesce(2).write.mode("overwrite").text(in)
    // fm-style pipeline: tokenize in the mapper (one word per line),
    // count in the reducer (sort | uniq -c inside the bucket).
    Cli.run(spark, in + "/*.txt", out,
      mapCmd = "tr ' ' '\\n'",
      reduceCmd = Some("sort | uniq -c"), buckets = 4)
    val got = spark.read.text(out)
      .collect().map { r =>
        val parts = r.getString(0).trim.split("\\s+", 2)
        (if (parts.length > 1) parts(1) else "", parts(0).toLong)
      }.toMap
    val want = spark.read.text(in)
      .select(explode(split(col("value"), " ")).as("w"))
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // The hash shuffle must have made each word's count COMPLETE in
    // exactly one bucket — no partials to merge, unlike a map-only run.
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("chained map stages compose like a shell pipeline") {
    val in = tmp("graft_cli_in3")
    val out = tmp("graft_cli_out3")
    Tables.documents(spark, sf).select("text").limit(50)
      .write.mode("overwrite").text(in)
    // Stage 1 tokenizes, stage 2 uppercases, reduce counts — the
    // fm-style multi-stage chain, fused per partition.
    Cli.runStages(spark, in + "/*.txt", out,
      mapCmds = Seq("tr ' ' '\\n'", "tr 'a-z' 'A-Z'"),
      reduceCmd = Some("sort | uniq -c"), buckets = 4)
    val got = spark.read.text(out)
      .collect().map { r =>
        val parts = r.getString(0).trim.split("\\s+", 2)
        (if (parts.length > 1) parts(1) else "", parts(0).toLong)
      }.toMap
    val want = spark.read.text(in)
      .select(explode(split(upper(col("value")), " ")).as("w"))
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("map-only run streams every line through the command") {
    val in = tmp("graft_cli_in2")
    val out = tmp("graft_cli_out2")
    Tables.documents(spark, sf).select("text").limit(50)
      .write.mode("overwrite").text(in)
    Cli.run(spark, in + "/*.txt", out, mapCmd = "tr 'a-z' 'A-Z'")
    val got = spark.read.text(out).collect().map(_.getString(0)).sorted
    val want = spark.read.text(in)
      .select(upper(col("value"))).collect().map(_.getString(0)).sorted
    assert(got.toSeq === want.toSeq)
  }
}
