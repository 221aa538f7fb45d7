package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.StringDistanceKernels
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions

/** Contracts of the string-distance kernels (Q-DEDUP-STRDIST).
  *
  * Every pinned constant below is the EXACT value DuckDB 1.0.0
  * returned for the same call this round (probed, not derived), so
  * these tests are the cross-engine contract in miniature: the
  * Jaro-Winkler doubles are asserted bit-equal — the q_dedup_strdist
  * oracle filters on the RAW score, which is only safe because the
  * two engines agree to the last ulp.
  */
class StringDistanceSpec extends AnyFunSuite {
  import TestSpark._

  private def jw(a: String, b: String): Double =
    StringDistanceKernels.jaroWinkler(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))
  private def dl(a: String, b: String): Int =
    StringDistanceKernels.damerauLevenshtein(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))
  private def ham(a: String, b: String): Int =
    StringDistanceKernels.hamming(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("Jaro-Winkler is bit-identical to the DuckDB probes") {
    // The three canonical record-linkage pairs.
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    // Boost threshold is STRICT jaro > 0.7: common prefix 'aa' but
    // jaro = 5/9 ≤ 0.7 → no Winkler boost applied.
    assert(jw("aaxxxx", "aayyyy") === 0.5555555555555555)
    assert(StringDistanceKernels.jaro(
      "aaxxxx".getBytes("UTF-8"), "aayyyy".getBytes("UTF-8"))
      === 0.5555555555555555)
    // Identity and empties. DuckDB scores ''-vs-'' as 0, NOT the
    // textbook 1 — pinned because the oracle would diverge otherwise.
    assert(jw("abc", "abc") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("", "") === 0.0)
    // Byte orientation: 'é' is two UTF-8 bytes, so café/cafe scores
    // as a 5-vs-4-byte pair (0.8483…), not the code-point 0.875.
    assert(jw("café", "cafe") === 0.8483333333333334)
  }

  test("Damerau-Levenshtein is the FULL variant and matches DuckDB") {
    // The case separating full DL from restricted OSA: ca -> abc is 2
    // (transpose with one intervening insert), OSA says 3.
    assert(dl("ca", "abc") === 2)
    assert(dl("kitten", "sitting") === 3)
    assert(dl("ab", "ba") === 1)
    assert(dl("ab", "bca") === 2)
    assert(dl("", "abc") === 3)
    assert(dl("abc", "") === 3)
    assert(dl("", "") === 0)
    assert(dl("same", "same") === 0)
    // Byte orientation again: é -> e is one substitute + one delete.
    assert(dl("café", "cafe") === 2)
  }

  test("Hamming counts differing bytes; unequal lengths are NULL in SQL") {
    assert(ham("karolin", "kathrin") === 3)
    assert(ham("", "") === 0)
    assert(ham("ab", "abc") === -1) // kernel sentinel
    import spark.implicits._
    val r = Seq(("ab", "abc"), ("abc", "abd")).toDF("a", "b")
      .select(VectorFunctions.hammingDist(col("a"), col("b")).as("h"))
      .collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getInt(0) === 1)
  }

  test("codegen column path equals the kernel, and SQL registration works") {
    import spark.implicits._
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("", ""), ("café", "cafe"), ("ca", "abc"))
    val df = pairs.toDF("a", "b")
    val viaColumns = df.select(
      VectorFunctions.jaroWinkler(col("a"), col("b")).as("jw"),
      VectorFunctions.damerauLevenshtein(col("a"), col("b")).as("dl"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val expected = pairs.map { case (a, b) => (jw(a, b), dl(a, b)) }
    assert(viaColumns.toSeq === expected)
    // SQL-text users reach the same expressions via GraftExtensions.
    df.createOrReplaceTempView("sd_pairs")
    try {
      val viaSql = spark.sql(
        """SELECT graft_jaro_winkler(a, b), graft_damerau_lev(a, b),
          |       graft_hamming(a, a)
          |FROM sd_pairs""".stripMargin)
        .collect().map(r => (r.getDouble(0), r.getInt(1), r.getInt(2)))
      assert(viaSql.map(t => (t._1, t._2)).toSeq === expected)
      assert(viaSql.forall(_._3 === 0)) // self-hamming is 0
    } finally spark.catalog.dropTempView("sd_pairs")
  }

  test("null inputs flow as null through all three expressions") {
    import spark.implicits._
    val df = Seq((Option("abc"), Option.empty[String])).toDF("a", "b")
    val r = df.select(
      VectorFunctions.jaroWinkler(col("a"), col("b")),
      VectorFunctions.damerauLevenshtein(col("a"), col("b")),
      VectorFunctions.hammingDist(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
