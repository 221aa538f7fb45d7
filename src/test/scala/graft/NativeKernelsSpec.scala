package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions

/** Unit-level contracts of the native text kernels: the hashed-gram
  * kernel must count exactly like the string formulation (the property
  * every oracle relies on), and the pair expansion must emit each
  * unordered pair once, ordered (lo, hi).
  */
class NativeKernelsSpec extends AnyFunSuite {
  import TestSpark._

  test("WordGramHashes counts grams exactly like the string formulation") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    // Per-document distinct-gram counts must agree between the hashed
    // kernel and the string HOF — collisions would show as a lower
    // hashed count; windowing bugs as any difference at all.
    val hashed = docs
      .select(col("doc_id"),
        explode(VectorFunctions.wordGramHashes(col("ws"))).as("g"))
      .groupBy("doc_id").agg(countDistinct(col("g")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val strings = docs
      .select(col("doc_id"),
        explode(graft.ops.TextSim.wordGrams3("ws")).as("g"))
      .groupBy("doc_id").agg(countDistinct(col("g")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hashed === strings)
    assert(hashed.nonEmpty)
    // Short docs: < 3 words → zero grams, not an error.
    import spark.implicits._
    val tiny = Seq(Seq("one", "two")).toDF("ws")
      .select(size(VectorFunctions.wordGramHashes(col("ws"))).as("n"))
      .head().getInt(0)
    assert(tiny === 0)
  }

  test("SortedIdPairs emits each unordered pair once, as (lo, hi)") {
    import spark.implicits._
    val got = Seq(Seq(3L, 1L, 2L)).toDF("ids")
      .select(explode(VectorFunctions.sortedIdPairs(col("ids"))).as("p"))
      .select("p.ida", "p.idb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val empty = Seq(Seq(7L)).toDF("ids")
      .select(size(VectorFunctions.sortedIdPairs(col("ids"))).as("n"))
      .head().getInt(0)
    assert(empty === 0)
  }
}
