package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the in-engine fixed-point GD quality scorer
  * (ops/Learn.scala): the module's claim is that training is integer
  * arithmetic, so weights must be BIT-identical under any partitioning;
  * plus the fast-sigmoid range bound, a did-it-actually-learn accuracy
  * floor, and the empty-corpus guard. Mirrors ClusteringSpec.
  */
class LearnSpec extends AnyFunSuite {
  import TestSpark._

  test("training is partitioning-invariant (bit-exact, not approximate)") {
    val f = ops.Learn.features(spark, sf)
    val w3 = ops.Learn.train(f.repartition(3))
    val w7 = ops.Learn.train(f.repartition(7))
    assert(java.util.Arrays.equals(w3, w7),
      s"weights differ across partitionings: ${w3.toSeq} vs ${w7.toSeq}")
  }

  test("fast-sigmoid scores stay in the fixed-point range [0, S]") {
    val S = 1000000L
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val mm = ops.Learn.scored(spark, dir)
        .agg(min("score"), max("score")).head()
      assert(mm.getLong(0) >= 0L, s"score below 0 at $dir")
      assert(mm.getLong(1) <= S, s"score above S at $dir")
    }
  }

  test("the scorer actually learns the en/non-en separation (acc > 0.5)") {
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val rows = Registry.byName("q_quality_logreg").df(spark, dir).collect()
      val n = rows.map(_.getAs[Long]("n_docs")).sum
      val hits = rows.map(r =>
        r.getAs[Double]("acc") * r.getAs[Long]("n_docs")).sum
      assert(hits / n > 0.5,
        s"corpus-weighted accuracy ${hits / n} not better than chance at $dir")
    }
  }

  test("holdout split: weights never saw the holdout yet beat chance on it") {
    Seq(sf, "/root/testdata/sf0.01").foreach { dir =>
      val rows = Registry.byName("q_quality_holdout").df(spark, dir).collect()
      val bySplit = rows.map(r =>
        r.getAs[String]("split") -> r.getAs[Double]("acc")).toMap
      assert(bySplit.keySet === Set("train", "holdout"))
      assert(bySplit("holdout") > 0.5,
        s"holdout accuracy ${bySplit("holdout")} is a label echo at $dir")
    }
  }

  test("empty corpus is refused with a clear error, not a crash") {
    val ex = intercept[IllegalArgumentException] {
      ops.Learn.train(ops.Learn.features(spark, sf).limit(0))
    }
    assert(ex.getMessage.contains("empty"))
  }
}
