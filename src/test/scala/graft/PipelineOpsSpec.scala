package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** First-principles contracts for the round-8 pipeline additions
  * (q_ev_transitions, q_ev_interp, q_dedup_priority, q_agg_corr,
  * q_embed_centroid): each query's defining property is recomputed in
  * plain Scala on collected sf0.001 fixtures — driver-free, so a shared
  * misreading of the semantics between the Spark and DuckDB spellings
  * would still be caught here.
  */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q_ev_transitions matches a per-user replay; rows normalize per prev") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._3).toSeq.flatMap { case (_, es) =>
      val types = es.sortBy(e => (e._2, e._1)).map(_._4).toSeq
      types.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
    }.groupBy(p => p).map { case (k, v) => k -> v.size.toLong }
    val got = q("q_ev_transitions").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    assert(got.map { case (k, (n, _)) => k -> n }.toMap === expected)
    got.groupBy(_._1._1).foreach { case (prev, rs) =>
      val s = rs.map(_._2._2).sum
      // each term is rounded to 6 decimals; |types| terms of slack
      assert(math.abs(s - 1.0) < 1e-4, s"P(next|$prev) sums to $s")
    }
  }

  test("q_ev_interp blends the surrounding observations by exact time weight") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val hourUs = 3_600_000_000L
    val lo = ev.map(_._2).min / hourUs * hourUs
    val hi = ev.map(_._2).max / hourUs * hourUs
    val byUser = ev.groupBy(_._3).map { case (u, es) =>
      u -> es.sortBy(e => (e._2, e._1)).map(e => (e._2, e._4)).toIndexedSeq
    }
    val got = q("q_ev_interp").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(got.length === byUser.size * ((hi - lo) / hourUs + 1).toInt)
    got.foreach { case ((u, gus), v) =>
      val obs = byUser(u)
      // window order (us, src, event_id) puts an observation AT the grid
      // instant before the grid row, so prev is <=, next strictly >
      val prev = obs.filter(_._1 <= gus).lastOption
      val next = obs.find(_._1 > gus)
      val expected = (prev, next) match {
        case (None, None)            => -1.0
        case (None, Some((_, nv)))   => nv
        case (Some((_, pv)), None)   => pv
        case (Some((pu, pv)), Some((nu, nv))) =>
          if (nu == pu) pv
          else pv + (nv - pv) * (gus - pu).toDouble / (nu - pu).toDouble
      }
      assert(math.abs(v - expected) < 1e-6, s"user=$u grid_us=$gus")
    }
  }

  test("q_dedup_priority keeps the best-source member of each bag-of-words group") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val groups = docs.groupBy(d => d._3.split(" ").distinct.sorted.mkString(" "))
    val expectedKeep = groups.map { case (_, ds) =>
      ds.minBy(d => (d._2.drop(3).toInt, d._1))._1
    }.toSet
    val got = q("q_dedup_priority").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.map(_._1).toSet === expectedKeep)
    // every document lands in exactly one group
    assert(got.map(_._2).sum === docs.length.toLong)
    assert(got.length === groups.size)
  }

  test("q_agg_corr matches closed-form two-pass OLS per group") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val got = q("q_agg_corr").collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))).toMap
    assert(got.keySet === li.map(_._1).toSet)
    li.groupBy(_._1).foreach { case (flag, rows) =>
      val n = rows.length
      val xs = rows.map(_._2); val ys = rows.map(_._3)
      val mx = xs.sum / n; val my = ys.sum / n
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val syy = ys.map(y => (y - my) * (y - my)).sum
      val slope = sxy / sxx
      val (gn, gs, gi, gr2, gax, gay) = got(flag)
      assert(gn === n.toLong, s"flag=$flag n")
      assert(math.abs(gs - slope) < 1e-4, s"flag=$flag slope")
      assert(math.abs(gi - (my - slope * mx)) < 1e-2, s"flag=$flag icept")
      assert(math.abs(gr2 - sxy * sxy / (sxx * syy)) < 1e-5, s"flag=$flag r2")
      assert(math.abs(gax - mx) < 1e-5, s"flag=$flag avg_x")
      assert(math.abs(gay - my) < 1e-3, s"flag=$flag avg_y")
    }
  }

  test("q_embed_centroid summarizes member-to-centroid cosines exactly") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val byLabel = emb.groupBy(_._2)
    val got = q("q_embed_centroid").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet === byLabel.keySet)
    byLabel.foreach { case (label, vs) =>
      val dim = vs.head._3.length
      val c = Array.tabulate(dim)(i => vs.map(_._3(i)).sum / vs.length)
      val nc = math.sqrt(c.map(x => x * x).sum)
      val cosines = vs.map { case (_, _, v) =>
        val dot = v.zip(c).map { case (a, b) => a * b }.sum
        dot / (math.sqrt(v.map(x => x * x).sum) * nc)
      }
      val (gn, gAvg, gMin) = got(label)
      assert(gn === vs.length.toLong, s"label=$label n")
      assert(math.abs(gAvg - cosines.sum / cosines.length) < 1e-6,
        s"label=$label avg_cos")
      assert(math.abs(gMin - cosines.min) < 1e-6, s"label=$label min_cos")
      assert(gMin <= gAvg + 1e-9, s"label=$label min<=avg")
    }
  }


  test("q_embed_pca: first-principles replay + variance maximization") {
    // Independent replay of the DECLARED integer recurrence (r18: the
    // query moved from float power iteration to the oracle-checked
    // fixed-point spelling): quantize the sf0.001 vectors the kmeans
    // way, build the centered integer covariance, run the 100-round
    // fixed-point iteration, and compare the query's rounded output
    // EXACTLY. The variance-maximization property is then asserted
    // against the FLOAT covariance, so the integer recurrence is held
    // to the real PCA contract, not to itself.
    val vecs = Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Double](0).toArray)
    val n = vecs.length
    val dim = vecs.head.length
    val X = vecs.map(_.map(x => ((x + 4.0) * 1000000.0).toLong))
    val mu = Array.tabulate(dim)(i => X.map(_(i)).sum / n)
    val acc = Array.ofDim[Long](dim, dim)
    X.foreach { r =>
      val dx = Array.tabulate(dim)(i => r(i) - mu(i))
      for (i <- 0 until dim; j <- 0 until dim) acc(i)(j) += dx(i) * dx(j)
    }
    val cq = acc.map(_.map(_ / (10L * n)))
    var v = Array.fill(dim)(1000000L / Math.round(Math.sqrt(dim.toDouble)))
    (0 until 100).foreach { _ =>
      val wd = Array.tabulate(dim)(i =>
        (0 until dim).map(j => cq(i)(j) * v(j)).sum / 1000000000L)
      val nrm = Math.round(Math.sqrt(wd.map(x => x * x).sum.toDouble))
      v = if (nrm == 0) new Array[Long](dim)
          else wd.map(_ * 1000000L / nrm)
    }
    val wq = Array.tabulate(dim)(i =>
      (0 until dim).map(j => cq(i)(j) * v(j)).sum / 1000000L)
    val lamq = (0 until dim).map(i => v(i) * wq(i)).sum / 1000000L
    val traceq = (0 until dim).map(i => cq(i)(i)).sum
    val piv = v.indices.maxBy(i => (math.abs(v(i)), -i))
    if (v(piv) < 0) v = v.map(-_)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = q("q_embed_pca").collect()
    assert(got.length === dim)
    got.foreach { row =>
      val i = row.getLong(0).toInt
      assert(row.getDouble(1) === r6((mu(i) - 4000000L) / 1000000.0),
        s"mean_d idx=$i")
      assert(row.getDouble(2) === r6(v(i) / 1000000.0), s"pc1 idx=$i")
      assert(row.getDouble(3) === r6(lamq / 100000000000.0))
      assert(row.getDouble(4) === r6(lamq.toDouble / traceq))
    }
    // The defining property, against the FLOAT covariance: the pc1
    // direction's variance is at least every coordinate axis's
    // variance (pc1 maximizes variance over all directions, so in
    // particular over the basis) and at least the variance along 20
    // seeded random unit directions. Tolerance covers the declared
    // quantization + truncation error of the fixed-point spelling.
    val mean = Array.tabulate(dim)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      vecs.map(r => r(i) * r(j)).sum / n - mean(i) * mean(j))
    val lam = lamq / 100000000000.0
    val vf = v.map(_ / 1000000.0)
    val vfVar = (0 until dim).map(i =>
      vf(i) * (0 until dim).map(j => cov(i)(j) * vf(j)).sum).sum
    assert(math.abs(lam - vfVar) < 1e-4,
      "integer eigenvalue must track the float Rayleigh quotient")
    val axisMax = (0 until dim).map(i => cov(i)(i)).max
    assert(lam >= axisMax - 1e-4)
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { _ =>
      val u0 = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(u0.map(x => x * x).sum)
      val u = u0.map(_ / nrm)
      val varU = (0 until dim).map(i =>
        u(i) * (0 until dim).map(j => cov(i)(j) * u(j)).sum).sum
      assert(lam >= varU - 1e-4)
    }
  }

  test("q_mix_source_cap: exactly min(K, |source|) kept, winsor brackets bracket") {
    import TestSpark._
    // Cap contract: every source keeps exactly min(20, its size) docs,
    // deterministically (two runs identical) — the heap-aggregate
    // spelling must reproduce the naive window's cap semantics, which
    // the DuckDB oracle pins value-for-value at two tiers; this is the
    // structural half at golden scale.
    val rows = q("q_mix_source_cap").collect()
    val bySrc = rows.groupBy(_.getString(1))
    bySrc.foreach { case (src, rs) =>
      val kept = rs.count(_.getBoolean(2))
      assert(kept === math.min(20, rs.length), s"$src kept $kept of ${rs.length}")
    }
    assert(q("q_mix_source_cap").collect().toSeq === rows.toSeq)
    // Winsor contract: lo <= hi, and the winsorized mean sits between
    // them and differs from the raw mean only inside [lo, hi].
    q("q_agg_winsor").collect().foreach { r =>
      val (lo, hi, wm) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(lo <= hi && wm >= lo && wm <= hi, r.toString)
    }
  }

  test("q_mix_curriculum: stage bands match quality; NULL quality stays unstaged") {
    import TestSpark._
    // Curriculum contract: stage = the quality quartile band (fixed
    // thresholds — growth-stable, window-free), pr = the 13-char md5
    // sampling priority, NULL quality (zero-token docs) ⇒ NULL stage.
    val rows = q("q_mix_curriculum").collect()
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2), s"junk doc staged: $r")
      else {
        val want = math.min(math.floor(r.getDouble(1) * 4).toInt, 3)
        assert(r.getInt(2) === want, s"stage off its quality band: $r")
      }
      assert(r.getString(3).length === 13, s"priority key drift: $r")
    }
    // non-vacuous: the fixture corpus spans several quality bands
    assert(rows.filterNot(_.isNullAt(2)).map(_.getInt(2)).distinct.length >= 2,
      "curriculum collapsed to one stage")
    // The NULL branch, NON-vacuously (r16 review: the fixture has no
    // zero-token docs, and least() SKIPS nulls in both engines — an
    // unguarded spelling staged junk at 3, the TOP band): a synthetic
    // corpus with a punctuation-only doc must leave it unstaged.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_curr_junk").toString
    val s = TestSpark.spark
    import s.implicits._
    Seq((1L, "A plain document with several words in it."),
        (2L, "!!! ... ???"))
      .toDF("doc_id", "text")
      .write.parquet(Tables.path(dir, "documents"))
    val syn = Registry.byName("q_mix_curriculum").df(s, dir).collect()
    val junk = syn.find(_.getLong(0) == 2L).get
    assert(junk.isNullAt(1) && junk.isNullAt(2),
      s"zero-token doc was staged: $junk")
    assert(!syn.find(_.getLong(0) == 1L).get.isNullAt(2))
  }

  test("q_mix_split_neardup: replays from collected edges + splits; non-vacuous") {
    // First-principles replay at sf0.001: leaked docs recomputed in
    // plain Scala from the near-dup edge list and the dedup-keyed
    // split map must equal the query's per-split counts — and the
    // audit must be non-vacuous (near-dups DO leak across the
    // exact-dedup-keyed split; that finding is the query's reason to
    // exist).
    val splits = Registry.byName("q_mix_split_dedup").df(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val edges = ops.TextSim.nearDupEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val leaked = edges.filter { case (a, b) => splits(a) != splits(b) }
      .flatMap { case (a, b) => Seq(a, b) }.toSet
    assert(leaked.nonEmpty, "no cross-split near-dups at sf0.001 — " +
      "the audit is vacuous; fixture drift?")
    val expected = splits.groupBy(_._2).map { case (sp, m) =>
      sp -> (m.size.toLong, m.keys.count(leaked).toLong)
    }
    val got = Registry.byName("q_mix_split_neardup").df(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
  }

  test("q_mix_decontam_split: covers every near-dup into test; train/val only") {
    // The fix-side contract: any non-test doc with a jac >= 0.5
    // near-dup edge INTO the test split shares at least one gram with
    // it by edge construction, so it MUST SURFACE in the decontam
    // output. Surfacing, not flagging: the >= 3-gram flag bar and the
    // 0.5-jaccard audit bar are different thresholds by design (a
    // 2-gram doc can be a jaccard twin yet sit below the flag bar),
    // so the pin asserts presence plus the flag/threshold identity —
    // never that every audit hit is auto-flagged. Plus shape sanity
    // and non-vacuity at sf0.001.
    val splits = Registry.byName("q_mix_split_dedup").df(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Registry.byName("q_mix_decontam_split").df(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3)))
    assert(out.nonEmpty)
    out.foreach { case (id, sp, nsh, c) =>
      assert(sp === splits(id), s"split mismatch for $id")
      assert(sp !== "test", "test docs must never appear")
      assert(nsh >= 1L)
      assert((c == 1) === (nsh >= 3L), s"flag/threshold mismatch for $id")
    }
    assert(out.exists(_._4 == 1), "no contaminated docs at sf0.001 — vacuous")
    val inOut = out.map(_._1).toSet
    val edges = ops.TextSim.nearDupEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mustCover = edges.flatMap { case (a, b) =>
      (splits(a), splits(b)) match {
        case ("test", s2) if s2 != "test" => Seq(b)
        case (s1, "test") if s1 != "test" => Seq(a)
        case _ => Seq.empty
      }
    }.toSet
    assert(mustCover.nonEmpty, "no near-dups into test at sf0.001")
    assert(mustCover.subsetOf(inOut),
      s"missed near-dups into test: ${mustCover.diff(inOut)}")
  }

  test("q_mix_split_dedup: zero cross-split leakage on its own output, non-vacuously") {
    // The defining property of dedup-before-split (r14 verdict #4):
    // every exact-dup group (same md5(text)) lands wholly in ONE
    // split — the leakage q_mix_split_leakage measures is structurally
    // zero on this assignment. Checked at all three fixture tiers
    // (sf0.1 is the only one whose planted dups straddle naive splits,
    // so it carries the non-vacuity half).
    Seq(sf, "/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val out = Registry.byName("q_mix_split_dedup").df(spark, dir)
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), md5(col("text")).as("h"))
      val joined = docs.join(out, "doc_id")
      val nDocs = docs.count()
      assert(out.count() === nDocs, s"one row per document at $dir")
      val leaky = joined.groupBy("h")
        .agg(countDistinct("split").as("nsp"))
        .filter(col("nsp") > 1).count()
      assert(leaky === 0L, s"$leaky text groups span splits at $dir")
      // Non-vacuous exactly where it should be: a document moves
      // relative to the NAIVE id-hash split iff its text group spans
      // naive splits — so moved > 0 ⟺ the naive assignment leaks.
      // (sf0.001's dup groups happen to land wholly inside one naive
      // split, so nothing moves there; sf0.01 leaks and must move.)
      val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
      val naive = when(nib <= "b", "train").when(nib <= "d", "val")
        .otherwise("test")
      val naiveLeakyGroups = docs.withColumn("naive", naive)
        .groupBy("h").agg(countDistinct("naive").as("nsp"))
        .filter(col("nsp") > 1).count()
      val moved = out.withColumn("naive", naive)
        .filter(col("split") =!= col("naive")).count()
      assert((moved > 0L) === (naiveLeakyGroups > 0L),
        s"moved=$moved but naive-leaky groups=$naiveLeakyGroups at $dir")
      if (dir.endsWith("sf0.1"))
        assert(moved > 0L, "sf0.1 plants cross-split dups " +
          "(q_mix_split_leakage is non-vacuous there) — the fix must move docs")
      // and non-dup docs (keep_id == doc_id) keep their id-hash split
      val keepersMoved = out.filter(col("keep_id") === col("doc_id"))
        .withColumn("naive",
          when(nib <= "b", "train").when(nib <= "d", "val")
            .otherwise("test"))
        .filter(col("split") =!= col("naive")).count()
      assert(keepersMoved === 0L,
        "a group representative moved away from its own id-hash split")
    }
  }
}
