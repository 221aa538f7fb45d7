package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ShellPipe

/** The shell-pipeline operator (CAP-PIPE-SHELL) agrees with the
  * equivalent declarative plan — FileMap's `fm <input> 'cmd'` model
  * reproduced on Spark partitions.
  */
class ShellPipeSpec extends AnyFunSuite {
  import TestSpark._

  test("tr through the pipe == upper() in the engine") {
    val texts = Tables.documents(spark, sf).select("text")
    val piped = ShellPipe.pipe(texts, "tr 'a-z' 'A-Z'")
      .collect().sorted
    val native = texts.select(upper(col("text"))).collect()
      .map(_.getString(0)).sorted
    assert(piped.toSeq === native.toSeq)
  }

  test("grep through the pipe == filter(contains) in the engine") {
    val texts = Tables.documents(spark, sf).select("text")
    val piped = ShellPipe.pipe(texts, "grep window || true").count()
    val native = texts.filter(col("text").contains("window")).count()
    assert(piped === native)
    assert(piped > 0)
  }

  test("a unix reduce: sort | uniq -c shape via pipe + engine merge") {
    // Per-partition `uniq -c`-style partial counts from the shell,
    // merged by the engine — FileMap's mapper/reducer split.
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
    val merged = ShellPipe.pipe(words, "sort | uniq -c")
      .collect()
      .map { l =>
        // uniq -c prints "  <count> <word>"; a blank word (possible if
        // texts ever gain doubled spaces) yields only the count field.
        val parts = l.trim.split("\\s+", 2)
        (if (parts.length > 1) parts(1) else "", parts(0).toLong)
      }
      .groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }
    val native = words.groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(merged === native)
  }
}
