package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit contracts for relational operators whose fixture-query evidence
  * alone is weak. q_agg_outliers's z-score arithmetic is pinned here on
  * CONSTRUCTED outliers with hand-computed z — the fixture data is
  * near-uniform (max |z| = sqrt(3)), so the registry run exercises the
  * threshold but cannot by itself catch a wrong formula.
  */
class RelationalSpec extends AnyFunSuite {
  import TestSpark._
  import graft.ops.Relational

  // Two groups: "spike" = {0,0,0,0,8} — mean 1.6, stddev_samp
  // sqrt(12.8), so z(8) = 6.4/sqrt(12.8) = 1.7888543..., z(0) =
  // -1.6/sqrt(12.8) = -0.4472135...; "calm" = {10,11,12} — mean 11,
  // stddev_samp exactly 1, so z = -1, 0, +1 with no rounding at all.
  private lazy val fixture = {
    import spark.implicits._
    (Seq.fill(4)(0.0) :+ 8.0).map(("spike", _))
      .++(Seq(10.0, 11.0, 12.0).map(("calm", _)))
      .toDF("grp", "v")
  }

  private def zs(threshold: Double): Set[(String, Double)] =
    Relational.zScoreOutliers(fixture, "grp", "v", threshold)
      .select("grp", "z").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet

  test("z-score outliers: hand-computed z on constructed outliers") {
    // Only the spike clears 1.5 (the q_agg_outliers threshold).
    assert(zs(1.5) === Set(("spike", 1.788854)))
    // At 0.3 every non-central row appears, with the exact hand values.
    assert(zs(0.3) === Set(
      ("spike", 1.788854), ("spike", -0.447214),
      ("calm", 1.0), ("calm", -1.0)))
    // Nothing clears 2 — including the spike (max single-spike z for
    // n=5 is 6.4/sqrt(12.8) < 2).
    assert(zs(2.0) === Set.empty)
  }

  test("z-score outliers: constant group yields no rows, no error") {
    import spark.implicits._
    val const = Seq.fill(5)(("c", 42.0)).toDF("grp", "v")
    // stddev_samp = 0 => z is NaN/null; the filter must drop, not throw.
    assert(Relational.zScoreOutliers(const, "grp", "v", 1.5).count() === 0)
  }

  test("broadcast-join spelling ≡ window spelling, fixture + registry data") {
    // The scale-safe spelling the registry runs must be row-equal to
    // the window spelling (which is also the oracle's SQL shape) —
    // on the constructed fixture and on the real lineitem table.
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(String, Double)] =
      df.select("grp", "z").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(pairs(Relational.zScoreOutliers(fixture, "grp", "v", 0.3)) ===
      pairs(Relational.zScoreOutliersWindow(fixture, "grp", "v", 0.3)))
    val li = Tables.lineitem(spark, sf)
    val a = Relational.zScoreOutliers(li, "l_returnflag", "l_extendedprice", 1.5)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "z").collect()
      .map(_.toSeq).toSet
    val b = Relational.zScoreOutliersWindow(li, "l_returnflag", "l_extendedprice", 1.5)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "z").collect()
      .map(_.toSeq).toSet
    assert(a === b)
  }

  test("q_agg_outliers is non-vacuous on the fixture at sf0.001") {
    val rows = q("q_agg_outliers").collect()
    assert(rows.nonEmpty, "outlier query returned 0 rows — vacuous again")
    // Every reported |z| respects the threshold, and none reaches 2 —
    // the near-uniform data tops out just above sqrt(3) (measured
    // 1.7722 at sf0.001; finite samples overshoot the asymptotic bound).
    rows.foreach { r =>
      val z = math.abs(r.getDouble(3))
      assert(z > 1.5 && z < 2.0, s"z=$z outside (1.5, 2)")
    }
  }
}
