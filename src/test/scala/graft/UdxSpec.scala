package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent checks of the UDF/UDAF/UDTF queries (SURVEY §2.11): the
  * custom code paths are re-derived with built-ins or plain Scala.
  */
class UdxSpec extends AnyFunSuite {
  import TestSpark._

  test("scalar UDF: distinct char-3-gram count matches plain Scala") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val got = q("q_udf_scalar").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got.keySet === docs.keySet)
    docs.foreach { case (id, t) =>
      val expected = if (t.length < 3) 0 else t.sliding(3).toSet.size
      assert(got(id) === expected, s"doc $id")
    }
  }

  test("UDAF geometric mean equals the exp(avg(ln)) identity via built-ins") {
    val expected = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(round(exp(avg(log(col("l_quantity")))), 6).as("geo"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val got = q("q_udaf_agg").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got === expected)
  }

  test("UDAF plans partial+final aggregation like a built-in") {
    val p = q("q_udaf_agg").queryExecution.executedPlan.toString
    assert("Aggregate".r.findAllIn(p).length >= 2,
      s"typed Aggregator did not get two-phase aggregation:\n$p")
  }

  test("Misra-Gries sketch keeps every true heavy hitter (the guarantee)") {
    val tok = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
    val total = tok.count()
    val exactHH = tok.groupBy("w").count()
      .filter(col("count") > total / (graft.ops.Udx.HeavyHitterK + 1).toDouble)
      .collect().map(_.getString(0)).toSet
    assert(exactHH.nonEmpty, "vacuous: no heavy hitters in fixtures")
    val cand = graft.ops.Udx.heavyHitterCandidates(spark, sf)
      .select("w").collect().map(_.getString(0)).toSet
    assert(exactHH.subsetOf(cand),
      s"sketch lost heavy hitters: ${exactHH.diff(cand)}")
    // And the verified query output equals the exact heavy-hitter set.
    val got = q("q_text_topterms_sketch").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._1).toSet === exactHH)
  }

  test("weighted Misra-Gries (TF-table pass, r22) keeps every heavy hitter at any order/batching") {
    // The r22 rewrite feeds the sketch one (word, tf) row per
    // (doc, word) instead of one row per token; the survival guarantee
    // must be arrival-order- and batching-independent. Seeded skewed
    // stream: two planted heavy hitters over a long noise tail.
    val rnd = new scala.util.Random(7)
    val noise = (0 until 2000).map(i => (s"w$i", 1L + rnd.nextInt(3).toLong))
    val planted = Seq(("hot1", 900L), ("hot2", 400L))
    // split planted mass into irregular weighted chunks
    def chunks(w: String, total: Long): Seq[(String, Long)] = {
      var left = total
      val out = Seq.newBuilder[(String, Long)]
      while (left > 0) {
        val c = math.min(left, 1L + rnd.nextInt(50).toLong)
        out += ((w, c)); left -= c
      }
      out.result()
    }
    val rows = rnd.shuffle(noise ++ planted.flatMap { case (w, t) => chunks(w, t) })
    val total = rows.map(_._2).sum
    val k = graft.ops.Udx.HeavyHitterK
    val exactHH = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 > total / (k + 1).toDouble).keySet.toSet
    assert(exactHH === Set("hot1", "hot2"))
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    val mg = udaf(new graft.ops.Udx.MisraGriesW(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong))
    Seq(1, 13).foreach { parts =>
      val cand = rows.toDF("w", "tf").repartition(parts)
        .agg(mg(col("w"), col("tf")).as("sk"))
        .select(explode(col("sk")).as(Seq("w", "lb")))
        .collect().map(_.getString(0)).toSet
      assert(exactHH.subsetOf(cand),
        s"parts=$parts lost: ${exactHH.diff(cand)}")
      assert(cand.size <= k)
    }
  }

  test("UDTF generator fans out one row per char-3-gram position") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expectedRows = docs.map { case (_, t) => math.max(t.length - 2, 0) }.sum
    val got = q("q_udtf_gen").collect()
    assert(got.length === expectedRows)
    // Spot-check the first document's first and last grams.
    val (id0, t0) = docs.minBy(_._1)
    val mine = got.filter(_.getLong(0) == id0)
    assert(mine.head.getString(2) === t0.substring(0, 3))
    assert(mine.last.getString(2) === t0.substring(t0.length - 3))
  }
}
