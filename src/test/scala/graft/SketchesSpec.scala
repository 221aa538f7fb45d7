package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the no-oracle sketch operators (SURVEY §5.2 layer
  * 3): each approximate/sketch path is measured against its exact
  * counterpart on sf0.001, so "deterministic" also means "actually
  * close to the exact answer".
  */
class SketchesSpec extends AnyFunSuite {
  import TestSpark._

  /** Recall properties run at TWO fixture tiers — sf0.001 and sf0.01 —
    * so a sketch that only works on a 50-doc corpus cannot pass. */
  private val tiers = Seq(sf, "/root/testdata/sf0.01")

  private def qAt(name: String, dir: String) = Registry.byName(name).df(spark, dir)

  private def pairSet(name: String, minJac: Double = -1,
      dir: String = sf): Set[(Long, Long)] = {
    val df0 = qAt(name, dir)
    val df = if (minJac >= 0) df0.filter(col("jac") >= minJac) else df0
    df.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("MinHash-LSH candidates recall >= 0.9 of exact Jaccard >= 0.8 pairs") {
    tiers.foreach { dir =>
      val exact = pairSet("q_dedup_ngram", 0.8, dir)
      assert(exact.nonEmpty, s"vacuous recall test at $dir — no exact pairs")
      val cand = pairSet("q_dedup_minhash", dir = dir)
      val recall = exact.intersect(cand).size.toDouble / exact.size
      assert(recall >= 0.9, s"recall $recall over ${exact.size} pairs at $dir")
    }
  }

  test("SimHash candidates recall >= 0.8 of exact Jaccard >= 0.9 pairs") {
    tiers.foreach { dir =>
      val exact = pairSet("q_dedup_ngram", 0.9, dir)
      assert(exact.nonEmpty, s"vacuous recall test at $dir — no exact pairs")
      val cand = pairSet("q_dedup_simhash", dir = dir)
      val recall = exact.intersect(cand).size.toDouble / exact.size
      assert(recall >= 0.8, s"recall $recall over ${exact.size} pairs at $dir")
    }
  }

  /** Brute-force exact top-3 cosine neighbors for the % 97 query set. */
  private def exactTop3(dir: String): Set[(Long, Long)] = {
    val base = Tables.embeddings(spark, dir).select(
      col("vec_id"), col("embedding"),
      graft.functions.VectorFunctions.l2norm(col("embedding")).as("norm"))
    val qs = base.filter(col("vec_id") % 97 === 0).toDF("qid", "qv", "qn")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    qs.join(base, col("qid") =!= col("vec_id"))
      .withColumn("cos",
        graft.functions.VectorFunctions.dot(col("qv"), col("embedding"))
          / (col("qn") * col("norm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("IVF ANN recall >= 0.8 of brute-force top-3 neighbors, both tiers") {
    tiers.foreach { dir =>
      val exact = exactTop3(dir)
      val got = qAt("q_sim_ann_ivf", dir).select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact.nonEmpty)
      val recall = exact.intersect(got).size.toDouble / exact.size
      // sqrt(N) hash-seeded codebook + 3 Lloyd rounds + multi-probe:
      // the honest ANN bar for semantic dedup, at both corpus sizes.
      assert(recall >= 0.8, s"IVF recall $recall over ${exact.size} at $dir")
    }
  }

  test("LSH ANN recall >= 0.8 at a sub-scan candidate fraction, both tiers") {
    tiers.foreach { dir =>
      val exact = exactTop3(dir)
      val got = qAt("q_sim_ann_lsh", dir).select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact.nonEmpty)
      val recall = exact.intersect(got).size.toDouble / exact.size
      assert(recall >= 0.8, s"LSH recall $recall over ${exact.size} at $dir")
      // The approximation must BUY something: candidate pairs well
      // below the brute-force pair count (isotropic worst case).
      val n = Tables.embeddings(spark, dir).count()
      val nq = Tables.embeddings(spark, dir)
        .filter(col("vec_id") % 97 === 0).count()
      val cand = graft.ops.Sketches.lshCandidates(spark, dir).count()
      val frac = cand.toDouble / (nq * (n - 1))
      assert(frac < 0.6, s"LSH candidate fraction $frac not sub-scan at $dir")
    }
  }

  test("PQ ANN recall >= 0.8 of brute-force top-3 neighbors, both tiers") {
    tiers.foreach { dir =>
      val exact = exactTop3(dir)
      val got = qAt("q_sim_ann_pq", dir).select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact.nonEmpty)
      val recall = exact.intersect(got).size.toDouble / exact.size
      // ADC over 8x32 codebooks + exact rerank of a ~17% pool: the
      // compressed-domain scan must preserve the ANN bar.
      assert(recall >= 0.8, s"PQ recall $recall over ${exact.size} at $dir")
      // And the compression is real: the scanned index is exactly
      // PqM ints per vector, codes within the 5-bit codebook range.
      val n = Tables.embeddings(spark, dir).count()
      val codes = graft.ops.Sketches.pqCodes(spark, dir)
      assert(codes.count() === n * graft.ops.Sketches.PqM)
      assert(codes.filter(col("cid") < 0
        || col("cid") >= graft.ops.Sketches.PqK).count() === 0L)
    }
  }

  // ---- held-out queries: the external-query ANN contract --------------
  // The (qid, qv) entry points exist so a user can bring query vectors
  // that are NOT in the corpus; these tests hold the same recall bar
  // for exactly that case.

  /** HELD-OUT query frame: fixture vectors deterministically perturbed
    * per coordinate (so no query vector exists in the corpus), qids
    * offset far above every corpus vec_id (so no accidental
    * self-exclusion can inflate recall). */
  private def heldOutQueries(dir: String) =
    Tables.embeddings(spark, dir).filter(col("vec_id") % 97 === 0)
      .select((col("vec_id") + 10000000L).as("qid"),
        expr("transform(embedding, (x, i) ->" +
          " x + 0.02 * sin(CAST(i AS DOUBLE) + CAST(vec_id % 7 AS DOUBLE)))")
          .as("qv"))

  /** Brute-force exact top-3 corpus neighbors for an arbitrary
    * (qid, qv) query frame. */
  private def exactTop3For(queries: org.apache.spark.sql.DataFrame,
      dir: String): Set[(Long, Long)] = {
    val base = Tables.embeddings(spark, dir).select(
      col("vec_id"), col("embedding"),
      graft.functions.VectorFunctions.l2norm(col("embedding")).as("norm"))
    val qs = queries.select(col("qid"), col("qv"),
      graft.functions.VectorFunctions.l2norm(col("qv")).as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    qs.crossJoin(base)
      .withColumn("cos",
        graft.functions.VectorFunctions.dot(col("qv"), col("embedding"))
          / (col("qn") * col("norm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("IVF ANN serves HELD-OUT queries (vectors not in the corpus) at recall >= 0.8") {
    tiers.foreach { dir =>
      val hq = heldOutQueries(dir)
      val exact = exactTop3For(hq, dir)
      assert(exact.nonEmpty)
      val got = graft.ops.Sketches.ivfSearch(spark, dir, hq,
        nprobe = c => math.ceil(0.7 * c).toInt.max(2))
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // The qids must round-trip verbatim (they are foreign keys the
      // caller owns — never remapped to corpus ids).
      assert(got.forall(_._1 >= 10000000L))
      val recall = exact.intersect(got).size.toDouble / exact.size
      assert(recall >= 0.8,
        s"held-out IVF recall $recall over ${exact.size} at $dir")
    }
  }

  test("LSH ANN serves HELD-OUT queries at recall >= 0.8") {
    tiers.foreach { dir =>
      val hq = heldOutQueries(dir)
      val exact = exactTop3For(hq, dir)
      assert(exact.nonEmpty)
      val base = Tables.embeddings(spark, dir).select(
        col("vec_id"), col("embedding"),
        graft.functions.VectorFunctions.l2norm(col("embedding")).as("norm"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
      val got = graft.ops.Sketches.lshCandidates(spark, dir, hq)
        .join(hq, "qid")
        .join(base, "vec_id")
        .withColumn("cos",
          graft.functions.VectorFunctions.dot(col("qv"), col("embedding"))
            / (graft.functions.VectorFunctions.l2norm(col("qv")) * col("norm")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.forall(_._1 >= 10000000L))
      val recall = exact.intersect(got).size.toDouble / exact.size
      assert(recall >= 0.8,
        s"held-out LSH recall $recall over ${exact.size} at $dir")
    }
  }

  test("PQ ANN serves HELD-OUT queries at recall >= 0.8") {
    tiers.foreach { dir =>
      val hq = heldOutQueries(dir)
      val exact = exactTop3For(hq, dir)
      assert(exact.nonEmpty)
      val got = graft.ops.Sketches.pqSearch(spark, dir, hq,
        rerank = n => math.max(32, (n / 6).toInt))
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.forall(_._1 >= 10000000L))
      val recall = exact.intersect(got).size.toDouble / exact.size
      assert(recall >= 0.8,
        s"held-out PQ recall $recall over ${exact.size} at $dir")
    }
  }

  test("IVF+PQ composed ANN recall >= 0.8 of brute-force top-3, both tiers") {
    tiers.foreach { dir =>
      val exact = exactTop3(dir)
      val got = qAt("q_sim_ann_ivfpq", dir).select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact.nonEmpty)
      val recall = exact.intersect(got).size.toDouble / exact.size
      // The two pruning stages' misses compound, so the composed
      // operator must hold the family bar with BOTH stages active.
      assert(recall >= 0.8, s"IVF+PQ recall $recall over ${exact.size} at $dir")
    }
  }

  test("IVF+PQ serves HELD-OUT queries at recall >= 0.8") {
    tiers.foreach { dir =>
      val hq = heldOutQueries(dir)
      val exact = exactTop3For(hq, dir)
      assert(exact.nonEmpty)
      val got = graft.ops.Sketches.ivfpqSearch(spark, dir, hq,
        nprobe = c => math.ceil(0.8 * c).toInt.max(2),
        rerank = n => math.max(32, (n / 3).toInt))
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.forall(_._1 >= 10000000L))
      val recall = exact.intersect(got).size.toDouble / exact.size
      assert(recall >= 0.8,
        s"held-out IVF+PQ recall $recall over ${exact.size} at $dir")
    }
  }

  test("a qid colliding with a corpus vec_id self-excludes, per the API contract") {
    // Documented semantics: a query whose qid equals a corpus vec_id is
    // that vector querying the REST — the corpus row with the same id
    // never appears among its own results, in either entry point.
    val colliding = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val ivf = graft.ops.Sketches.ivfSearch(spark, sf, colliding,
      nprobe = c => c) // full probe: every corpus vector is a candidate
    assert(ivf.count() > 0)
    assert(ivf.filter(col("qid") === col("nid")).count() === 0L)
    val lsh = graft.ops.Sketches.lshCandidates(spark, sf, colliding)
    assert(lsh.count() > 0)
    assert(lsh.filter(col("qid") === col("vec_id")).count() === 0L)
  }

  test("approx_count_distinct is within 10% of the exact distinct count") {
    val approx = q("q_agg_approx").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= 0.1 * n, s"flag $k: approx $a vs exact $n")
    }
  }

  test("approx_percentile is within 5% of the exact percentile") {
    val approx = q("q_agg_approx_pctl").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) <= 0.05 * e, s"flag $k: ${approx(k)} vs $e")
    }
  }

  test("hash-based stratified sample hits its per-stratum rates") {
    val sampled = q("q_sample_stratified").groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val totals = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    totals.foreach { case (lang, n) =>
      val target = if (lang == "en") 64.0 / 256 else 26.0 / 256
      val got = sampled.getOrElse(lang, 0L).toDouble / n
      // 3-sigma binomial tolerance for the ~100-doc strata.
      val tol = 3 * math.sqrt(target * (1 - target) / n)
      assert(math.abs(got - target) <= tol,
        s"$lang: sampled $got, target $target +- $tol over $n docs")
    }
    // Reproducibility: membership is a pure function of doc_id, so a
    // rerun returns the identical id set.
    val a = q("q_sample_stratified").collect().map(_.getLong(0)).toSeq
    val b = q("q_sample_stratified").collect().map(_.getLong(0)).toSeq
    assert(a === b)
  }

  test("top-k via TakeOrderedAndProject is identical to global sort + limit") {
    val topk = q("q_topk").collect().map(_.toSeq)
    val sorted = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(100).collect().map(_.toSeq)
    assert(topk.toSeq === sorted.toSeq)
  }

  test("cluster assignment reached its fixpoint on the fixture graph") {
    // Every near-dup edge must connect two docs in the SAME cluster —
    // i.e. the two unrolled propagation rounds were enough to close all
    // fixture chains (if this ever fails, the fixture grew longer
    // chains and the query needs another round).
    val cluster = q("q_dedup_cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = pairSet("q_dedup_ngram", 0.5)
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) =>
      assert(cluster(a) === cluster(b), s"edge ($a,$b) spans clusters")
    }
    // And each cluster's label is its smallest member id.
    cluster.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min === label)
    }
  }

  test("IntPlaneSigs agrees bit-for-bit with the declarative md5-plane spelling") {
    // The codegen kernel's plane matrix (first md5 byte of
    // 'seedBase|t|j|i' mapped to 2*b0-255) and sign-of-integer-dot
    // bits MUST equal the explode-join formulation the DuckDB oracles
    // unroll — this pins the kernel to the oracle's exact semantics
    // inside Spark itself, for 64 vectors per operating point.
    import graft.functions.VectorFunctions.intPlaneSigs
    val S = graft.ops.Clustering.ShiftQ
    for ((bits, tables, base) <- Seq((10, 8, 0), (13, 6, 7000))) {
      val vq = graft.ops.Sketches.quantized(
        Tables.embeddings(spark, sf).limit(64)
          .select(col("vec_id"), col("embedding")), "vec_id", "embedding")
      val fast = vq.select(col("vec_id"),
        posexplode(intPlaneSigs(col("xq"), bits, tables, base, S))
          .as(Seq("t", "sig")))
      // declarative twin: planes from md5 via conv(hex, 16, 10), dot
      // via explode + join, bit assembly via sum of shifted flags
      val planes = spark.range(tables).select(col("id").as("t"))
        .crossJoin(spark.range(bits).select(col("id").as("b")))
        .crossJoin(spark.range(64).select((col("id") + 1).as("idx")))
        .withColumn("h", md5(concat_ws("|",
          lit(base.toString), col("t"), col("b"), col("idx"))))
        .withColumn("p",
          (conv(substring(col("h"), 1, 2), 16, 10).cast("long") * 2 - 255)
            .cast("long"))
      val slow = vq.select(col("vec_id"),
          posexplode(col("xq")).as(Seq("pos", "x")))
        .withColumn("idx", col("pos") + 1)
        .join(planes, "idx")
        .groupBy("vec_id", "t", "b")
        .agg(sum((col("x") - S) * col("p")).as("dot"))
        .groupBy("vec_id", "t")
        .agg(sum(when(col("dot") > 0,
          expr("shiftleft(1L, cast(b as int))")).otherwise(0L)).as("sig"))
      val mism = fast.join(slow.toDF("vec_id", "t", "sig2"), Seq("vec_id", "t"))
        .filter(col("sig") =!= col("sig2")).count()
      assert(mism === 0, s"kernel/declarative sig mismatch at ${bits}x$tables+$base")
      assert(fast.count() === 64L * tables)
    }
  }

  test("LSH cosine dedup agrees with the exact brute-force dedup") {
    tiers.foreach { dir =>
      val exact = qAt("q_dedup_cosine", dir).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val lsh = qAt("q_dedup_cosine_lsh", dir).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(lsh.keySet === exact.keySet, s"vector set differs at $dir")
      val dups = exact.filter { case (v, (keep, _)) => keep != v }
      assert(dups.nonEmpty, s"vacuous dedup comparison at $dir")
      // Flagged-duplicate recall: the LSH path must flag (and agree on
      // the canonical keeper for) >= 90% of the true duplicates.
      val agree = dups.count { case (v, (keep, _)) => lsh(v)._1 == keep }
      val recall = agree.toDouble / dups.size
      assert(recall >= 0.9,
        s"LSH dedup keep-id agreement $recall over ${dups.size} at $dir")
      // And it never invents a duplicate the exact kernel rejects
      // (candidates are verified by exact cosine before flagging).
      lsh.foreach { case (v, (keep, _)) =>
        if (keep != v)
          assert(exact(v)._1 != v, s"LSH flagged non-duplicate $v at $dir")
      }
    }
  }

  test("fixpoint propagation closes chains deeper than the 2-round unroll") {
    import spark.implicits._
    import graft.ops.TextSim
    // A 13-node path graph 0-1-2-...-12: the min label needs 12 rounds
    // to reach the far end, so the fixed 2-round unroll provably cannot
    // converge it — exactly the shape the driver-loop form exists for.
    val docs = (0L to 12L).toDF("doc_id")
    val edges = (0L until 12L).map(i => (i, i + 1)).toDF("ida", "idb")
    val twoRounds = TextSim.propagateRounds(docs, edges, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(twoRounds.values.toSet.size > 1,
      "chain fixture too shallow — 2 rounds already converged it")
    val fixed = TextSim.clusterLabelsFixpoint(docs, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fixed.values.forall(_ === 0L),
      s"fixpoint did not collapse the chain to one cluster: $fixed")
  }

  test("fixpoint clustering agrees with the 2-round oracle on the fixtures") {
    // The fixture near-dup graph converges within 2 rounds (previous
    // test family), so the driver-loop form must produce the identical
    // labeling — the production path and the oracle path agree.
    import graft.ops.TextSim
    val docs = Tables.documents(spark, sf).select("doc_id")
    val edges = q("q_dedup_ngram").filter(col("jac") >= 0.5)
      .select("ida", "idb")
    val fixed = TextSim.clusterLabelsFixpoint(docs, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val oracle = q("q_dedup_cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fixed === oracle)
  }

  test("dedup is idempotent: re-deduping the survivors changes nothing") {
    val survivors = q("q_dedup_exact").select("keep_id")
    val docs = Tables.documents(spark, sf)
    val kept = docs.join(survivors, docs("doc_id") === survivors("keep_id"))
    val rededup = kept.groupBy("text").agg(min("doc_id").as("keep_id"))
    assert(rededup.count() === kept.count())
  }

  test("incremental dedup flags every verbatim copy, admits most reversed docs, both tiers") {
    tiers.foreach { dir =>
      val out = ops.Sketches.dedupAgainstIndex(spark, dir,
          ops.Sketches.defaultBatch(spark, dir))
        .select(col("doc_id"), col("is_dup")).collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).toMap
      assert(out.nonEmpty, s"empty fixture batch at $dir")
      // Even original ids were re-submitted verbatim: identical text =>
      // identical gram set => identical signature => every band
      // matches. Deterministic, not probabilistic.
      val copies = out.filter { case (id, _) => (id - 1000000L) % 2 == 0 }
      assert(copies.nonEmpty && copies.values.forall(identity),
        s"a verbatim copy escaped the index at $dir")
      // Word-reversed docs share almost no 3-gram with their source;
      // admission is probabilistic (band collisions), so a rate bound.
      val novel = out.filter { case (id, _) => (id - 1000000L) % 2 != 0 }
      val admitted = novel.values.count(!_).toDouble / novel.size.max(1)
      assert(admitted >= 0.7,
        s"only $admitted of reversed docs admitted at $dir")
    }
  }

  test("incremental index probe == full recompute over the grown corpus, both tiers") {
    // THE P6 property of the dedup index: probing the maintained band
    // table with a new batch yields exactly the cross-side collision
    // pairs a from-scratch signature build over corpus+batch yields —
    // signatures are pure per-doc functions, so incremental and full
    // agree EXACTLY, not approximately.
    tiers.foreach { dir =>
      val batch = ops.Sketches.defaultBatch(spark, dir)
      val inc = ops.Sketches.indexHitPairs(spark, dir, batch)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val union = Tables.documents(spark, dir).select("doc_id", "text")
        .unionByName(batch)
      val full = ops.Sketches.bandsOf(union)
      val cross = full.toDF("ida", "band", "bh")
        .join(full.toDF("idb", "band", "bh"), Seq("band", "bh"))
        .filter(col("ida") >= 1000000L && col("idb") < 1000000L)
        .select(col("ida").as("doc_id"), col("idb").as("corpus_id"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(inc === cross, s"incremental != full recompute at $dir")
    }
  }

  test("upserted index: two-batch sequence == one rebuilt index; day-2 sees day-1, both tiers") {
    // THE maintained-index loop, now closed: day-1's ADMITTED docs are
    // upserted into a named index instance, and day-2's probe of that
    // instance must agree EXACTLY with a from-scratch rebuild over
    // corpus + day-1 admissions (signatures are pure per-doc
    // functions). Without the upsert, day-2 copies of day-1 admissions
    // would sail through — the final assertion catches exactly that.
    tiers.foreach { dir =>
      val name = s"ups${dir.replaceAll("[^0-9]", "")}"
      val corpus = Tables.documents(spark, dir).select("doc_id", "text")
      val b1 = ops.Sketches.defaultBatch(spark, dir)
      val v1 = ops.Sketches.ingestBatch(spark, dir, b1, name)
      val admitted1 = b1.join(
        v1.filter(!col("is_dup")).select("doc_id"), Seq("doc_id"))
      // Day 2: every day-1 doc re-submitted verbatim under a fresh id.
      val b2 = b1.select((col("doc_id") + 1000000L).as("doc_id"),
        col("text"))
      val seq = ops.Sketches.indexHitPairs(spark, dir, b2, name)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // Reference: from-scratch signatures over the grown corpus.
      val full = ops.Sketches.bandsOf(corpus.unionByName(admitted1))
      val ref = ops.Sketches.bandsOf(b2).toDF("ida", "band", "bh")
        .join(full.toDF("idb", "band", "bh"), Seq("band", "bh"))
        .select(col("ida").as("doc_id"), col("idb").as("corpus_id"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(seq === ref, s"sequence != rebuilt index at $dir")
      // Day-2 visibility: every verbatim copy of a day-1 admission is
      // caught VIA ITS DAY-1 ID (identical text => identical signature
      // => deterministic catch) — impossible without the upsert.
      val admittedIds = admitted1.select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(admittedIds.nonEmpty, s"day-1 admitted nothing at $dir")
      admittedIds.foreach { id =>
        assert(seq.contains((id + 1000000L, id)),
          s"day-1 admission $id invisible to day-2 at $dir")
      }
    }
  }

  test("ANN index upsert: artifacts == frozen-codebook rebuild; new vectors searchable, both tiers") {
    // The embedding-side maintained-index loop: a batch of new vectors
    // is admitted into a NAMED index instance (store + IVF assignments
    // + PQ codes appended in lockstep; codebooks frozen). Assignment
    // and encoding are pure per-vector functions of the frozen
    // codebooks, so the upserted artifacts must equal a from-scratch
    // rebuild over the grown corpus EXACTLY — and a search must
    // surface the new vectors as first-class targets.
    tiers.foreach { dir =>
      val name = s"annups${dir.replaceAll("[^0-9]", "")}"
      val base = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      // Ingest: every 83rd vector re-submitted VERBATIM under a fresh
      // id — a known-duplicate embedding batch.
      val batch = base.filter(col("vec_id") % 83 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      ops.Sketches.upsertIntoAnnIndex(spark, dir, batch, name)
      val grown = base.unionByName(batch)
      val gotAssign = ops.Sketches.ivfAssignments(spark, dir, name)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val wantAssign = ops.Sketches.assignOf(spark, dir, grown)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotAssign === wantAssign,
        s"upserted IVF assignments != rebuild at $dir")
      val gotCodes = ops.Sketches.pqCodes(spark, dir, name)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val wantCodes = ops.Sketches.codesOf(spark, dir, grown)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(gotCodes === wantCodes, s"upserted PQ codes != rebuild at $dir")
      // Search the named instance FOR the batch's source vectors: each
      // source's verbatim copy is an exact d2 = 0 top hit — impossible
      // unless the upserted vectors entered every search stage (cell
      // probe, code scan, exact rerank from the store).
      val queries = base.filter(col("vec_id") % 83 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val top = ops.Sketches.ivfpqSearch(spark, dir, queries,
          nprobe = c => math.ceil(0.8 * c).toInt.max(2),
          rerank = n => math.max(32, (n / 3).toInt), k = 1, name = name)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(top.nonEmpty, s"empty ANN result at $dir")
      top.foreach { case (qid, nid, d2) =>
        assert(nid === qid + 1000000L && d2 === 0L,
          s"query $qid: expected its upserted copy at d2 0, got ($nid, $d2) at $dir")
      }
      assert(top.length.toLong === queries.count(),
        s"some batch sources returned no hit at $dir")
      // Replay idempotence (r7): re-submitting the SAME batch — the shape
      // of a deleted streaming checkpoint or a retried job — must be a
      // no-op. Already-present vec_ids are anti-joined out before the
      // append; without that, store/assignments/codes would grow duplicate
      // rows in lockstep and double-count search candidates silently.
      val assignN = ops.Sketches.ivfAssignments(spark, dir, name).count()
      val codesN = ops.Sketches.pqCodes(spark, dir, name).count()
      ops.Sketches.upsertIntoAnnIndex(spark, dir, batch, name)
      assert(ops.Sketches.ivfAssignments(spark, dir, name).count() === assignN,
        s"replayed batch appended duplicate assignments at $dir")
      assert(ops.Sketches.pqCodes(spark, dir, name).count() === codesN,
        s"replayed batch appended duplicate codes at $dir")
    }
  }
}
