package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY §5.2 layer 2 / §4.2): the contract
  * queries must not merely return correct rows — they must carry the
  * plan shapes that survive a 100 TB scale-up. Covers Q-AGG-PARTIAL
  * (partial+final aggregation is observable only via the plan).
  */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("q_scan_prune pushes predicate and projection into the parquet scan") {
    val p = plan("q_scan_prune")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      s"predicate not pushed to scan:\n$p")
    // Column pruning: the scan schema must carry only the 4 referenced
    // columns, not all 11 lineitem columns.
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_shipdate") && !readSchema.contains("l_tax"),
      s"scan not pruned: $readSchema")
  }

  test("q_unpivot prunes the scan to the 2 id + 3 measure columns") {
    // The melt is a narrow per-row explode; the lineitem scan must
    // read exactly the referenced 5 columns, not all 11 — Expand must
    // not defeat column pruning.
    val p = plan("q_unpivot")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_discount"),
      s"measures missing from scan: $readSchema")
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_tax"),
      s"scan not pruned: $readSchema")
    // And no shuffle before the sort: Expand is the only row-growing op.
    assert(p.contains("Expand"), s"no Expand (unpivot not planned as melt):\n$p")
  }

  test("q_profile reads lineitem ONCE and prunes to the 4 profiled columns") {
    // The whole point of the one-pass profile: one scan, melted to
    // narrow (col, v) pairs by a single Expand, then one two-level
    // distinct aggregate — never a scan per column (and never the
    // multi-distinct N+1-fanout Expand, which measured 4.5× slower).
    val p = plan("q_profile")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1, s"expected exactly 1 scan, got $scans:\n$p")
    assert(p.contains("Expand"), s"melt lost its Expand:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_quantity") && !readSchema.contains("l_shipdate"),
      s"scan not pruned to profiled columns: $readSchema")
  }

  test("q_join_bcast plans a broadcast hash join, not a shuffle join") {
    val p = plan("q_join_bcast")
    assert(p.contains("BroadcastHashJoin"), s"no BroadcastHashJoin:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SortMergeJoin:\n$p")
  }

  test("q_ev_transitions: one user_id shuffle, zero joins") {
    // The fact table is collapsed to |types|^2 rows by ONE window pass
    // over the natural user_id partitioning; the per-prev normalization
    // then runs on that tiny frame. A self-join formulation (prev row
    // joined to next row) or a second user_id shuffle would both break
    // the 100 TB shape.
    val p = plan("q_ev_transitions")
    val userShuffles = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userShuffles === 1, s"expected 1 user_id shuffle, got $userShuffles:\n$p")
    assert(!p.contains("Join"), s"transitions must not join:\n$p")
  }

  test("q_ev_ewma: one user_id shuffle, zero joins") {
    // The fold runs inside the per-user aggregate: one exchange on the
    // natural key, then a narrow expression pass. A second user_id
    // shuffle or any join would break the backfill shape.
    val p = plan("q_ev_ewma")
    val userShuffles = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userShuffles === 1, s"expected 1 user_id shuffle, got $userShuffles:\n$p")
    assert(!p.contains("Join"), s"ewma must not join:\n$p")
  }

  test("q_ev_ohlc: both row_number passes and the candle agg share one shuffle") {
    // The two open/close marker windows sort the SAME (event_type,
    // hour_us) partition twice in place; the candle aggregation then
    // reuses that partitioning. A second exchange (one per window
    // direction) or any join would break the shape.
    val p = plan("q_ev_ohlc")
    val keyShuffles = "hashpartitioning\\(event_type".r.findAllIn(p).size
    assert(keyShuffles === 1,
      s"expected 1 (event_type, hour_us) shuffle, got $keyShuffles:\n$p")
    assert(!p.contains("Join"), s"ohlc must not join:\n$p")
  }

  test("q_ev_gap: lag window and per-user aggregate share one user_id shuffle") {
    val p = plan("q_ev_gap")
    val userShuffles = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userShuffles === 1,
      s"expected 1 user_id shuffle, got $userShuffles:\n$p")
    assert(!p.contains("Join"), s"gap stats must not join:\n$p")
  }

  test("q_ev_attrib: join-free last-touch — one user_id shuffle, zero joins") {
    // The naive formulation is a purchases x clicks range join of two
    // fact-scale frames; the contract spelling carries the latest click
    // through ONE running window. Any join appearing here is the scale
    // regression this pin exists to catch.
    val p = plan("q_ev_attrib")
    val userShuffles = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userShuffles === 1,
      s"expected 1 user_id shuffle, got $userShuffles:\n$p")
    assert(!p.contains("Join"), s"attribution must not join:\n$p")
  }

  test("q_ev_cohort: presence collapse rides one user_id shuffle, no joins") {
    // collect_set + array_min + explode all inside the single per-user
    // aggregate; the only other exchange is the final (cohort, offset)
    // cell aggregation, whose key count is |weeks|^2 — never fact-sized.
    val p = plan("q_ev_cohort")
    val userShuffles = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userShuffles === 1,
      s"expected 1 user_id shuffle, got $userShuffles:\n$p")
    assert(!p.contains("Join"), s"cohort must not join:\n$p")
  }

  test("q_agg_skewkurt: one partial+final hash aggregate, no window funnel") {
    // The four power sums are plain map-side-combinable aggregates — a
    // window/moment formulation would funnel the fact table into 3
    // partitions. Scan prunes to the 2 referenced columns.
    val p = plan("q_agg_skewkurt")
    assert(p.contains("HashAggregate") && !p.contains("Window"),
      s"moments must be hash aggregates:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_quantity") && !readSchema.contains("l_tax"),
      s"scan not pruned: $readSchema")
  }

  test("q_embed_outlier joins only by broadcast (centroids + label stats)") {
    // Both join inputs are labels-sized frames; the fact-scale explode
    // must never shuffle-join. Same contract as q_embed_centroid.
    val p = plan("q_embed_outlier")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"fact-side shuffle join in outlier screen:\n$p")
  }

  test("q_join_latest: fact collapses to rn=1 before the join, no product") {
    // The window reduction runs on the orders side BEFORE the join, so
    // the join input is |customers|-sized; the join itself may be SMJ
    // (both sides key-partitioned) but never a product.
    val p = plan("q_join_latest")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"latest-row join must stay product-free:\n$p")
    val custShuffles = "hashpartitioning\\(o_custkey".r.findAllIn(p).size
    assert(custShuffles >= 1, s"window reduction lost its o_custkey shuffle:\n$p")
  }

  test("q_text_heaps: token stages are hash aggregates; cumsum window on lang only") {
    // The fact-scale work (tokenize, per-doc counts, first-occurrence
    // per type) must stay in parallel hash aggregates; only the
    // |docs|-sized checkpoint frame may funnel into the per-lang
    // cumulative window (and at 100 TB that frame comes from a sample —
    // see the query's scale note).
    val p = plan("q_text_heaps")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"heaps fit must stay product-free:\n$p")
    val langWindows = "windowspecdefinition\\(lang".r.findAllIn(p).size
    assert(langWindows >= 2, s"cumsum windows lost lang partitioning:\n$p")
    assert(p.contains("HashAggregate"), s"token stages not hash aggs:\n$p")
  }

  test("q_dedup_substring: one wh exchange + window count, no join at all") {
    // The window instances exchange ONCE on the 64-bit window hash;
    // a count-over-partition window attaches each instance's corpus
    // occurrence count; then one doc_id agg. The r10 shape joined the
    // instance table to an aggregate of itself — double explode
    // compute, and a join that degraded from broadcast to a second
    // sort-merge once distinct windows outgrew the threshold
    // (measured, SCALE.md). Any join here is a regression.
    val p = plan("q_dedup_substring")
    assert(!p.contains("Join"), s"substring dedup must be join-free:\n$p")
    val whShuffles = "hashpartitioning\\(wh".r.findAllIn(p).size
    assert(whShuffles == 1,
      s"expected exactly one wh-keyed exchange, got $whShuffles:\n$p")
    // r21: the window hashes come from the one-pass codegen kernel
    // (graft_word8gram_hashes) instead of the interpreted
    // transform+slice+array_join+xxhash64 HOF — still 64-bit longs,
    // never strings, on the exchange.
    assert(p.contains("graft_word8gram_hashes"),
      s"shuffle keys must be the 64-bit window hashes, not strings:\n$p")
  }

  test("q_ev_interp: windows share one user_id shuffle; no fact self-join") {
    // The grid/observation union flows through ONE user_id exchange
    // that feeds ALL window passes (prev + next neighbor lookups ride
    // the same sorted partition run); joining observations to grid
    // points instead would be a per-grid-point self-join of the fact
    // table. The only join is the declared broadcast of the one-row
    // bounds frame (see the cartesian sweep's allowlist); the distinct
    // user list adds the second, unavoidable user_id shuffle.
    val p = plan("q_ev_interp")
    val userShuffles = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userShuffles === 2,
      s"expected 2 user_id shuffles (union + distinct users), got $userShuffles:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"unexpected shuffle join in interp:\n$p")
    // All window passes sit between the union shuffle and the result:
    // each is partitioned by user_id (no repartition-per-window).
    val winSpecs = "windowspecdefinition\\(user_id".r.findAllIn(p).size
    assert(winSpecs >= 4, s"window passes lost user_id partitioning:\n$p")
  }

  test("q_topk fuses into TakeOrderedAndProject (no global sort)") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject:\n$p")
  }

  test("q_agg_group aggregates partial (map-side) then final — Q-AGG-PARTIAL") {
    val p = plan("q_agg_group")
    val nAggs = "HashAggregate".r.findAllIn(p).length
    assert(nAggs >= 2, s"expected partial+final HashAggregate, got $nAggs:\n$p")
  }

  test("q_topk_grp_agg aggregates with the bounded heap — no per-group window sort") {
    val p = plan("q_topk_grp_agg")
    // The whole point of the kernel: the group's rows are never
    // window-sorted; the heap aggregate runs partial (map side) then
    // final, like any other aggregate.
    assert(!p.contains("Window"), s"unexpected window operator:\n$p")
    assert(p.contains("graft_topk_by_score"), s"kernel not in plan:\n$p")
    val nAggs = "Aggregate\\(".r.findAllIn(p).length +
      "ObjectHashAggregate".r.findAllIn(p).length +
      "SortAggregate".r.findAllIn(p).length
    assert(nAggs >= 2, s"expected partial+final aggregate, got $nAggs:\n$p")
  }

  test("q_sim_hybrid_rrf: both global rank windows run over a top-100, not the corpus") {
    // Both retriever lists are ranked with a GLOBAL row_number window
    // (no partition key) and cut at rn <= 100. What keeps that from
    // funnelling the whole corpus through one partition's sort is
    // Spark's LimitPushDownThroughWindow: the rn <= 100 filter becomes
    // a TakeOrderedAndProject(limit=100) BELOW each window — a
    // distributed per-partition top-k + 100-row final merge — so the
    // single-partition window only ever ranks 100 rows. That rescue is
    // an optimizer behavior, not a property of the query text — pin it
    // so an optimizer change (or an edit that pushes the filter out of
    // eligible shape) can't silently reintroduce a corpus-sized
    // single-partition sort.
    val p = plan("q_sim_hybrid_rrf")
    val tops = "TakeOrderedAndProject\\(limit=100".r.findAllIn(p).length
    assert(tops === 2,
      s"expected a limit=100 TakeOrderedAndProject under each rank window, " +
        s"got $tops:\n$p")
  }

  test("q_text_boilerplate broadcasts the hot-gram set back onto the grams") {
    // The inverted-index contract: the df >= 5 gram table is the small
    // side by construction (cross-doc 8-gram repeats are rare) and must
    // come back as a broadcast join, never a gram-keyed shuffle join of
    // two corpus-scale frames.
    val p = plan("q_text_boilerplate")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("q_text_vocab_prune: word join degrades to a shuffle join, never a loop") {
    // The scoring join is DECLARED a shuffle join at scale (a real
    // vocabulary outgrows broadcast). At fixture scale Catalyst may
    // broadcast the tiny vocab — fine — but the query must not DEPEND
    // on that: with broadcast off, the word join has to become a
    // sort-merge/shuffled-hash join keyed on word, not a nested loop
    // (the shape that actually ships at 100 TB). Pinned so a refactor
    // cannot silently introduce a non-equi condition or a loop join.
    val old = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q_text_vocab_prune")
      val wordJoin = p.linesIterator
        .filter(l => l.contains("Join") && l.contains("[word"))
        .toSeq
      assert(wordJoin.nonEmpty, s"no word-keyed join found:\n$p")
      assert(wordJoin.forall(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")),
        s"word join is not a shuffle join under no-broadcast:\n$wordJoin")
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q_dedup_norm: one canonical-text exchange, no join") {
    // Normalized dedup is exactly q_dedup_exact's shape: narrow
    // canonicalization into ONE hash aggregation on the canonical key.
    val p = plan("q_dedup_norm")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    val nEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(nEx <= 1, s"expected <= 1 hash exchange, got $nEx:\n$p")
  }

  test("q_agg_gini: closed-form rank sum over counts — window input is an aggregate") {
    // r12 respell (caught by the widened low-card-window sweep): the
    // per-doc rank window over the fact is gone; the cumulative window
    // runs over the (lang, n_chars) counts aggregate, whose size is
    // bounded by the length domain. Two hash exchanges — the counts
    // pre-agg and the lang window — and still no join.
    val p = plan("q_agg_gini")
    val nEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(nEx <= 2, s"expected counts + lang exchanges only, got $nEx:\n$p")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    // the fact-scan side must aggregate BEFORE any window
    val lp = q("q_agg_gini").queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    lp.collect { case w: LW => w }.foreach { w =>
      assert(w.child.exists(_.isInstanceOf[Aggregate]),
        s"window no longer sits above the counts aggregate:\n$lp")
    }
  }

  test("q_agg_outliers broadcasts the stats table — no Window over the fact") {
    // The scale-safe spelling: a 3-row per-group stats aggregate is
    // broadcast back onto the fact scan. A Window here would funnel
    // the whole fact table into 3 partitions at 100 TB.
    val p = plan("q_agg_outliers")
    assert(!p.contains("Window"), s"window funnel is back:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$p")
  }

  test("q_sim_cosine_knn uses the native dot-product expression") {
    val p = plan("q_sim_cosine_knn")
    assert(p.contains("graft_dot"), s"native kernel missing from plan:\n$p")
    // The expression implements doGenCode (not CodegenFallback), so its
    // presence in a Project is a codegen'd tight loop; cross-check that
    // the generated code computes exactly what the interpreted
    // higher-order-function formulation does (same summation order).
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).limit(50)
    val both = emb.select(
      graft.functions.VectorFunctions.dot(col("embedding"), col("embedding"))
        .as("native"),
      expr("aggregate(zip_with(embedding, embedding, (x, y) -> x * y), 0D," +
        " (acc, x) -> acc + x)").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0L)
    // And the SessionExtensions registration makes it SQL-callable.
    assert(spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0) === 11.0)
  }

  test("hot-path plans run inside whole-stage codegen") {
    // The flagship aggregation and the native-kernel cosine query must
    // both execute in generated code, not interpreted operators — the
    // native expressions implement doGenCode precisely so they stay
    // inside the codegen stages.
    Seq("q_agg_group", "q_sim_cosine_knn", "q_filter_pred").foreach { n =>
      // AQE prints codegen stages only in the FINAL plan — execute
      // THIS frame (count() would execute a different plan), then
      // inspect.
      val df = q(n)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // Codegen stages print as "*(n) Operator" in the final plan.
      assert("\\*\\(\\d+\\)".r.findFirstIn(p).isDefined,
        s"$n has no codegen span:\n$p")
    }
  }

  test("seedFrame: distributed rank, no global limit or partition-less window") {
    // r16 verdict #2's plan-shape half: the k-seed rank must not pass
    // through a TakeOrdered/GlobalLimit (ONE task holding all k rows)
    // and its row_number window must be PARTITIONED by the md5-prefix
    // bucket, not a global order.
    val df = ops.Clustering.seedFrame(
      ops.Clustering.base(spark, TestSpark.sf), 100)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("TakeOrderedAndProject") && !p.contains("GlobalLimit"),
      s"seed plan funnels through a global limit:\n$p")
    assert("Window \\[.*\\], \\[_bk".r.findFirstIn(p).isDefined,
      s"rank window not partitioned by the bucket column:\n$p")
  }

  test("no registry query gains an undeclared cartesian or nested-loop join") {
    // The scale contract: product-shaped joins appear ONLY where they
    // are the declared design —
    //  * brute-force exactness baselines (the LSH/IVF paths are the
    //    scale formulations): q_dedup_cosine, q_sim_cosine_knn,
    //    q_sim_threshold;
    //  * inherently non-equi / product demos: q_join_cross,
    //    q_join_selfpair, q_join_theta;
    //  * broadcast singletons or the sqrt(N) codebook (a 1-to-few-row
    //    build side broadcast to every partition — scale-safe):
    //    q_ev_resample + q_ev_interp (the one-row grid-bounds frame
    //    broadcast to every user), q_mix_weights, q_text_bm25,
    //    q_text_tfidf,
    //    q_text_unigram_nll (grand-total token count singleton),
    //    q_text_pmi (grand-total bigram count singleton),
    //    q_sim_ann_ivf, q_sim_ann_ivfpq (the IVF+PQ composition ranks
    //    the same broadcast codebook to pick probe cells).
    // Any OTHER query acquiring one is a scale regression.
    val declared = Set(
      "q_dedup_cosine", "q_sim_cosine_knn", "q_sim_threshold",
      "q_join_cross", "q_join_selfpair", "q_join_theta",
      "q_ev_resample", "q_ev_interp", "q_ev_rolling_dau",
      "q_mix_weights", "q_text_bm25",
      "q_text_tfidf",
      "q_text_unigram_nll", "q_text_pmi",
      "q_sim_ann_ivf", "q_sim_ann_ivfpq",
      // per-lang token-share + normalizer singletons (|langs| rows)
      "q_mix_temperature",
      // grand-total token count singleton, q_text_unigram_nll's shape
      "q_text_ppl_bucket",
      // one-row query-embedding broadcast + the bm25 stats singleton
      "q_sim_hybrid_rrf",
      // grand-total token count singleton (corpus distribution side)
      "q_text_jsd",
      // |sources|-row total/normalizer singletons, q_mix_weights' shape
      "q_mix_epochs",
      // one-row corpus doc-count singleton gating the df band
      "q_text_vocab_prune",
      // one-row sample-count singleton joined onto the 3-row report
      "q_sim_lsh_points",
      // |langs|-row x 42-row (probe x depth) literal product feeding
      // the narrow counter left join — the md5-CMS probe plan (r20)
      "q_sketch_cms",
      // MI/H(C)/H(L)/total are each ONE-row aggregates of the
      // K x |labels| contingency table, composed by singleton
      // cross joins — q_mix_weights' shape on k-means output
      "q_embed_nmi",
      // half-counts singleton x shift singleton (both 1-row aggregates)
      "q_embed_drift")
    val offenders = Registry.all.map(_.name).filterNot(declared).filter { n =>
      val p = plan(n)
      p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
    }
    assert(offenders.isEmpty,
      s"undeclared product joins in: ${offenders.mkString(", ")}")
  }

  test("no ordered window partitioned by a low-cardinality key runs over a raw fact scan") {
    // An ordered window PARTITIONED ONLY by a handful-of-values key
    // (returnflag/linestatus/orderstatus and their aliases) ceilings at
    // |keys|-way parallelism no matter the cluster size — the whole
    // fact table sorts on ≤3 tasks (q_agg_wmedian's old spelling was
    // already 0.8 s at sf0.1 — VERDICT r11 Wrong #2). The scale-safe
    // pattern is a domain-bounded AGGREGATE below the window
    // (q_agg_mode, q_agg_wmedian): the window then orders an
    // aggregate's output, whose size is bounded by the value domain,
    // not the corpus. Registry-wide sweep, like the cartesian pin.
    import org.apache.spark.sql.catalyst.expressions.Attribute
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lowCard = Set("l_returnflag", "l_linestatus", "o_orderstatus",
      "flag", "status", "source", "lang")
    def hasBadWindow(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall {
              case a: Attribute => lowCard(a.name)
              case _ => false
            } && !w.child.exists(_.isInstanceOf[Aggregate]) => w
      }.nonEmpty
    // Detector self-check: the r11 q_agg_wmedian spelling (row-level
    // cumulative window straight over the fact scan) MUST trip it.
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{col, sum}
    val oldShape = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"),
        sum("l_extendedprice")
          .over(W.partitionBy("l_returnflag").orderBy("l_quantity")
            .rowsBetween(W.unboundedPreceding, W.currentRow)).as("cw"))
    assert(hasBadWindow(oldShape), "detector missed the known-bad shape")
    val offenders = Registry.all.map(_.name).filter(n => hasBadWindow(q(n)))
    assert(offenders.isEmpty,
      s"low-cardinality-partitioned windows over raw scans in: ${offenders.mkString(", ")}")
  }

  test("no global ordered window runs over an unbounded input") {
    // The single-partition twin of the low-cardinality sweep: a
    // Window with NO partition key and an ordering sorts its whole
    // input on one task. Admitted shapes: an Aggregate below (the
    // input is a bounded/grouped table — e.g. q_ev_latearrival's
    // bucket offsets, q_text_heaps' per-lang curve) or a Limit below
    // (LimitPushDownThroughWindow turned the rank-then-filter into a
    // distributed top-k — q_sim_hybrid_rrf, pinned separately).
    // Registry-wide, self-validating like the low-card sweep.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
      GlobalLimit, LocalLimit, Window => LW}
    def hasBad(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case w: LW if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
            !w.child.exists(n => n.isInstanceOf[Aggregate] ||
              n.isInstanceOf[GlobalLimit] || n.isInstanceOf[LocalLimit])
          => w
      }.nonEmpty
    // detector self-check: the r11 q_ev_latearrival shape (global
    // running max straight over the event scan) must trip it
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{col, max, unix_micros}
    val oldShape = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("wm", max("us").over(W.orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)))
    assert(hasBad(oldShape), "detector missed the known-bad shape")
    val offenders = Registry.all.map(_.name).filter(n => hasBad(q(n)))
    assert(offenders.isEmpty,
      s"global ordered windows over unbounded input in: ${offenders.mkString(", ")}")
  }

  test("the fused gram-postings build plans exactly ONE Exchange") {
    // The whole point of the CappedIdSet fuse: raw hashed grams group
    // straight to capped postings in a single aggregation — one
    // shuffle. A second Exchange appearing here means the build
    // regressed to the r3 multi-shuffle shape.
    val p = graft.ops.TextSim
      .gramPostingsFrame(spark, sf, graft.ops.TextSim.DfCap)
      .queryExecution.executedPlan.toString
    val nExchanges = "\\bExchange\\b".r.findAllIn(p).length
    assert(nExchanges === 1, s"expected 1 Exchange, got $nExchanges:\n$p")
    // And the single shuffle's aggregate is the bounded native kernel,
    // partial (map-side) as well as final.
    assert(p.contains("graft_capped_id_set"), s"native aggregate missing:\n$p")
    assert(p.contains("partial_graft_capped_id_set"),
      s"no map-side partial aggregation:\n$p")
  }

  test("q_dedup_jaccard joins key on the charset triples, never on doc ids") {
    // The de-blocked formulation's contract: every join keys on the
    // bounded (lang, blk, cs) space; a join keyed on doc_id/ida/idb
    // would mean the quadratic stage regressed to pairing documents.
    // (Key lists are the first two [...] groups a join line prints;
    // the pair-dedup condition legitimately references ida/idb, so
    // only the KEYS are pinned.)
    val joinLines = plan("q_dedup_jaccard").linesIterator
      .filter(_.contains("Join")).toSeq
    assert(joinLines.nonEmpty, "no joins found in q_dedup_jaccard plan")
    val keyGroups = joinLines.map(l =>
      "\\[[^\\]]*\\]".r.findAllIn(l).take(2).mkString(" "))
    keyGroups.foreach { k =>
      assert(!k.contains("doc_id") && !k.contains("ida#") && !k.contains("idb#"),
        s"join keyed on document ids: $k")
    }
    assert(keyGroups.exists(k => k.contains("cs_a#") || k.contains("cs_b#")),
      s"no join keyed on the charset:\n${joinLines.mkString("\n")}")
  }

  test("q_join_range pairs through a day-bucket EQUI join, not a nested loop") {
    // The large-large range join's contract: bucketing turns the
    // non-equi interval predicate into an equi join on the bucket (plus
    // an exact filter), so the plan must carry a hash or sort-merge
    // join keyed on b — never the BroadcastNestedLoopJoin Spark gives a
    // raw BETWEEN condition.
    val p = plan("q_join_range")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join regressed to a product join:\n$p")
    val joinLine = p.linesIterator.find(l =>
      l.contains("HashJoin") || l.contains("SortMergeJoin")).getOrElse("")
    assert(joinLine.contains("b#"), s"equi join not keyed on the bucket:\n$p")
  }

  test("q_sim_ann_pq scores from codes via a broadcast ADC table, never a product join") {
    // The PQ contract: the corpus side of the ADC scan is the 8-int
    // code table joined against the BROADCAST per-query distance table
    // on (m, cid) — small side shipped to the codes, embeddings only
    // touched by the rerank join. A cartesian or nested-loop anywhere
    // means the compressed-domain scan regressed to a brute product.
    val p = plan("q_sim_ann_pq")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"PQ scan regressed to a product join:\n$p")
    val adcJoin = p.linesIterator.find(l =>
      l.contains("BroadcastHashJoin") && l.contains("cid#")).getOrElse("")
    assert(adcJoin.nonEmpty, s"ADC join not a broadcast hash join on the codes:\n$p")
  }

  test("q_text_decontaminate broadcasts the benchmark gram set") {
    // The eval-set side is fixed-size by construction; the training
    // corpus is the 100 TB side. The contamination join must therefore
    // be a broadcast hash join — a shuffle here drags the whole corpus
    // gram index through an Exchange.
    val p = plan("q_text_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"no BroadcastHashJoin:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-shuffling join:\n$p")
  }

  test("q_text_decontam_bloom probes the Bloom filter and matches the exact query") {
    // The Bloom path must carry the might_contain probe (pruning the
    // corpus BEFORE any exchange — the shape for an eval gram set too
    // big to broadcast raw), and because the exact verify join removes
    // every false positive while false negatives are impossible by
    // construction, its rows must equal the broadcast-exact query's
    // EXACTLY.
    val p = plan("q_text_decontam_bloom")
    assert(p.contains("might_contain"), s"no Bloom probe in plan:\n$p")
    val bloomRows = q("q_text_decontam_bloom").collect().toSeq
    val exactRows = q("q_text_decontaminate").collect().toSeq
    assert(bloomRows === exactRows)
  }

  test("graft_dot matches the HOF formulation on ragged and null inputs") {
    // Ragged arrays and null elements return NULL — the same answer the
    // zip_with/aggregate formulation gives — in both the interpreted
    // eval and the generated code, so SQL-text users see one contract.
    val rows = spark.sql("""
      SELECT graft_dot(array(1.0D, 2.0D), array(3.0D)) AS ragged,
             graft_dot(array(1.0D, CAST(NULL AS DOUBLE)),
                       array(3.0D, 4.0D)) AS null_elem,
             graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS null_arr,
             aggregate(zip_with(array(1.0D, 2.0D), array(3.0D),
               (x, y) -> x * y), 0D, (acc, x) -> acc + x) AS hof_ragged
      """).head()
    assert(rows.isNullAt(0), "ragged arrays must yield NULL")
    assert(rows.isNullAt(1), "null elements must yield NULL")
    assert(rows.isNullAt(2), "null array must yield NULL")
    assert(rows.isNullAt(3), "HOF reference check: ragged is NULL there too")
  }
}
