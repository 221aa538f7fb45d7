package graft.ops

import graft.{QuerySpec, StageCache, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space clustering: distributed Lloyd k-means and the
  * SemDeDup-style semantic near-duplicate screen built on it — the
  * "cluster the corpus, then look for duplicates only inside a
  * cluster" pattern large training-data pipelines use to turn the
  * quadratic all-pairs cosine problem into cluster-bounded work.
  *
  * DETERMINISM DESIGN (the whole point of this module): k-means over
  * doubles is not reproducible across engines or even across Spark
  * partitionings — float summation order changes centroid low bits,
  * near-ties flip assignments, and the drift COMPOUNDS per iteration.
  * So, exactly like the PageRank oracle (Graph.scala), every step of
  * Lloyd's loop here runs in FIXED-POINT INTEGER arithmetic:
  *
  *   - coordinates quantize ONCE: xi = trunc((x + 4.0) * 1e6) as LONG
  *     (`CAST(trunc(...) AS BIGINT)` in DuckDB mirrors Spark's
  *     truncating double→long cast; the +4 shift makes every value
  *     non-negative — see the guard below — so truncating and floor
  *     division coincide and Scala `/` == DuckDB `//`);
  *   - distances are Σ(xi−ci)² in LONG — integer addition is
  *     associative/commutative, so the sum is partitioning-invariant
  *     and bit-exact, not merely close;
  *   - argmin ties break by centroid id (only possible when two
  *     centroids coincide exactly);
  *   - the M-step centroid is the truncating integer mean
  *     Σxi `div` n, so the ROUND-TRIPPED STATE is integer-exact and
  *     per-iteration drift is structurally impossible;
  *   - seeds are the K vectors with the smallest
  *     (md5(vec_id), vec_id) — the same cross-engine-byte-identical
  *     hash order q_mix_source_cap pins.
  *
  * The oracle therefore unrolls the SAME recurrence in DuckDB CTEs and
  * matches bit-exact by construction — no validity precondition, no
  * tolerance. Quantization granularity (1e-6 of a coordinate) is far
  * below any cluster-structure scale, and identical in both engines.
  *
  * 100 TB shape: the E-step is a narrow per-row projection against the
  * K×dim centroid LITERAL (no join, no shuffle); the M-step is one
  * posexplode + groupBy(cid, idx) — map-side combinable, shuffle
  * output bounded by K×dim regardless of corpus size. Per iteration
  * the driver collects exactly K×dim (cid, idx, sum, count) rows — the
  * same documented bounded-collect class as the BPE vocabulary table.
  * Long-sum bounds: xi ≤ ~5e6, so Σxi per (cid, idx) stays exact up to
  * ~1.8e12 members per cluster; the readout's Σdist² (≤ ~1e14 per
  * vector at dim 64) is exact to ~9e4 × fewer members — at a scale
  * beyond that, widen the readout sum to a two-level aggregate. Both
  * bounds are far past any tested tier and documented here rather than
  * silently assumed.
  */
object Clustering {

  private def q(name: String, oracle: String)(
      df: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec.sql(name, oracle)(df)

  /** Fixed-point scale: 1 coordinate unit == 1e6 integer units. */
  private val ScaleD = 1000000.0
  /** Coordinate shift making quantized values non-negative; valid for
    * any embedding-like data with coordinates > −4 (the fixtures and
    * ScaleGen vectors live in (−1, 1)). Guarded at train time. */
  private val ShiftD = 4.0
  /** Cluster count and Lloyd iterations — compile-time constants: the
    * oracle text is generated from the SAME values, so they cannot
    * drift apart. */
  private[ops] val K = 8
  private[ops] val Iters = 4

  /** Quantized training frame (vec_id, label, xq: array<long>),
    * materialized once per (session, dir) via the stage cache — shared
    * by q_embed_kmeans and q_dedup_semantic. */
  private[graft] def base(s: SparkSession, d: String): DataFrame =
    StageCache.memoized(s, d, "kmeans_base") {
      Tables.embeddings(s, d).select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => ((x + lit(ShiftD)) * lit(ScaleD)).cast("long")).as("xq"))
    }

  /** Squared integer distance from xq to the literal centroid `c`. */
  private def dist2(c: Array[Long]): Column =
    aggregate(
      zip_with(col("xq"), typedLit(c.toSeq),
        (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)

  /** struct(d, cid) of the nearest centroid — least() over K struct
    * literals orders by (distance, cid), so ties (possible only for
    * coinciding centroids) break deterministically. */
  private def best(cents: Array[Array[Long]]): Column =
    least(cents.zipWithIndex.toIndexedSeq.map { case (c, j) =>
      struct(dist2(c).as("d"), lit(j.toLong).as("cid"))
    }: _*)

  /** Final centroids after [[Iters]] integer Lloyd rounds, memoized per
    * (session, dir): training runs ONCE even though two registry
    * queries ride it. */
  private val centMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Long]]]()

  private[ops] def centroids(s: SparkSession, d: String): Array[Array[Long]] = {
    val key = s"${Integer.toHexString(System.identityHashCode(s))}|$d"
    centMemo.computeIfAbsent(key, _ => train(base(s, d)))
  }

  private[graft] def train(b: DataFrame): Array[Array[Long]] = {
    // Non-negativity guard for the truncating-division contract: one
    // scan of the materialized narrow stage, once per (session, dir).
    val mn = b.agg(min(array_min(col("xq")))).head().getLong(0)
    require(mn >= 0L,
      s"kmeans quantization saw coordinate <= -$ShiftD (min scaled $mn)")
    // Seeds: K smallest (md5(vec_id), vec_id) — one TakeOrdered pass.
    var cents: Array[Array[Long]] = b
      .select(col("xq"), md5(col("vec_id").cast("string")).as("h"),
        col("vec_id"))
      .orderBy(col("h"), col("vec_id")).limit(K)
      .select("xq").collect()
      .map(_.getSeq[Long](0).toArray)
    require(cents.length == K, s"need >= $K vectors to seed kmeans")
    var it = 0
    while (it < Iters) {
      // One job: literal-centroid E-step, bounded K×dim M-step.
      val m = b
        .withColumn("cid", best(cents).getField("cid"))
        .select(col("cid"), posexplode(col("xq")).as(Seq("idx", "xi")))
        .groupBy("cid", "idx")
        .agg(sum("xi").as("s"), count(lit(1)).as("n"))
        .collect() // bounded: ≤ K×dim rows
      val next = cents.map(_.clone()) // empty clusters carry forward
      m.foreach { r =>
        next(r.getLong(0).toInt)(r.getInt(1)) = r.getLong(2) / r.getLong(3)
      }
      cents = next
      it += 1
    }
    cents
  }

  /** The k-means recurrence unrolled in DuckDB — same quantization,
    * same integer ops, same tie-breaks; bit-exact by construction. */
  private[ops] def kmeansCtes(k: Int = K, iters: Int = Iters): String = {
    val rounds = (1 to iters).map { i =>
      s"""d$i AS (SELECT e.vec_id, c.cid,
        |    CAST(sum((e.xi - c.c) * (e.xi - c.c)) AS BIGINT) AS d
        |  FROM e JOIN c${i - 1} c ON e.idx = c.idx GROUP BY 1, 2),
        |a$i AS MATERIALIZED (SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d$i)
        |  WHERE rn = 1),
        |c$i AS MATERIALIZED (
        |  SELECT p.cid, p.idx, coalesce(m.c, p.c) AS c
        |  FROM c${i - 1} p LEFT JOIN (
        |    SELECT a.cid, e.idx,
        |      CAST(sum(e.xi) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
        |    FROM a$i a JOIN e USING (vec_id) GROUP BY 1, 2) m
        |  ON p.cid = m.cid AND p.idx = m.idx)"""
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
      |    CAST(trunc((unnest(CAST(embedding AS DOUBLE[])) + 4.0)
      |      * 1000000.0) AS BIGINT) AS xi
      |  FROM embeddings),
      |sd0 AS MATERIALIZED (SELECT vec_id, cid FROM (
      |    SELECT vec_id, row_number() OVER (
      |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
      |    FROM embeddings) WHERE cid < $k),
      |c0 AS MATERIALIZED (
      |  SELECT sd0.cid, e.idx, e.xi AS c FROM sd0 JOIN e USING (vec_id)),
      |$rounds,
      |dF AS (SELECT e.vec_id, c.cid,
      |    CAST(sum((e.xi - c.c) * (e.xi - c.c)) AS BIGINT) AS d
      |  FROM e JOIN c$iters c ON e.idx = c.idx GROUP BY 1, 2),
      |af AS MATERIALIZED (SELECT vec_id, cid, d FROM (
      |    SELECT vec_id, cid, d, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY d, cid) AS rn FROM dF)
      |  WHERE rn = 1)"""
  }

  /** Near-duplicate threshold in quantized squared-Euclidean units:
    * the vectors are unit-norm (pinned by q_sim_norm), so
    * ‖a−b‖² = 2 − 2·cos(a,b) and d² ≤ 1.2 ⇔ cos ≥ 0.4 — the SAME
    * similarity bar as q_dedup_cosine, making the two queries a
    * brute-force/cluster-bounded pair. Scaled by (1e6)² = 1e12;
    * exactly representable, identical literal in both engines. */
  private val DupD2 = 1200000000000L

  val specs: Seq[QuerySpec] = Seq(

    // Distributed k-means cluster report: per cluster its size, the
    // rms member→centroid distance (cluster tightness), and the
    // dominant label with its share (does the unsupervised structure
    // recover the labels?). The readout every embedding-curation
    // pipeline prints before trusting cluster-bounded dedup.
    q("q_embed_kmeans",
      s"""WITH ${kmeansCtes()},
        |g AS (SELECT cid, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(d) AS BIGINT) AS sd2 FROM af GROUP BY 1),
        |lb AS (SELECT af.cid, em.label, CAST(count(*) AS BIGINT) AS c
        |  FROM af JOIN embeddings em USING (vec_id) GROUP BY 1, 2),
        |tp AS (SELECT cid, label, c FROM (
        |    SELECT cid, label, c, row_number() OVER (
        |      PARTITION BY cid ORDER BY c DESC, label) AS rn FROM lb)
        |  WHERE rn = 1)
        |SELECT CAST(g.cid AS BIGINT) AS cid, g.n,
        |  round(sqrt(CAST(g.sd2 AS DOUBLE) / g.n) / 1000000.0, 6)
        |    AS rms_dist,
        |  CAST(tp.label AS BIGINT) AS top_label,
        |  round(CAST(tp.c AS DOUBLE) / g.n, 6) AS top_share
        |FROM g JOIN tp USING (cid)
        |ORDER BY cid""") { (s, d) =>
      val b = best(centroids(s, d))
      val a = base(s, d).select(col("vec_id"), col("label"),
        b.getField("cid").as("cid"), b.getField("d").as("dist2"))
      val g = a.groupBy("cid")
        .agg(count(lit(1)).as("n"), sum("dist2").as("sd2"))
      // Dominant label without a window: min(struct(-count, label))
      // picks (count desc, label asc) — the K×|labels| aggregate is
      // tiny, and the final join is K rows on each side.
      val top = a.groupBy("cid", "label").agg(count(lit(1)).as("c"))
        .groupBy("cid")
        .agg(min(struct((-col("c")).as("negc"),
          col("label").as("lab"))).as("t"))
        .select(col("cid"), col("t.lab").cast("long").as("top_label"),
          (-col("t.negc")).as("topc"))
      g.join(top, "cid")
        .select(col("cid"), col("n"),
          round(sqrt(col("sd2").cast("double") / col("n"))
            / lit(1000000.0), 6).as("rms_dist"),
          col("top_label"),
          round(col("topc").cast("double") / col("n"), 6).as("top_share"))
        .orderBy("cid")
    },

    // SemDeDup-style semantic near-dup screen: pairwise similarity is
    // only ever computed INSIDE a k-means cluster, turning the
    // quadratic all-pairs problem q_dedup_cosine solves by brute force
    // into cluster-bounded work — the standard embedding-dedup recipe
    // for web-scale corpora. Same output shape and similarity bar as
    // q_dedup_cosine (keep_id = smallest same-cluster neighbor at
    // cos >= 0.4, i.e. quantized d² <= 1.2e12 on these unit-norm
    // vectors); pairs split across clusters are deliberately unseen —
    // that recall trade IS the algorithm, and the brute-force query
    // stays in the registry as the oracle-witness upper bound.
    //
    // 100 TB shape: the only fact-scale shuffle is the self-join on
    // cid. K here is a fixture-sized compile-time constant (the oracle
    // must replay the same training); at production scale K grows with
    // the corpus (SemDeDup runs tens of thousands of clusters, K ~
    // n/1000), so the join key cardinality — and with it parallelism
    // and the Σ n_c² pair bound — scales by construction, not by hope.
    // The pairwise stage is integer arithmetic on the quantized
    // vectors, so the oracle (same clustering CTEs + a pair join)
    // matches bit-exact.
    q("q_dedup_semantic",
      s"""WITH ${kmeansCtes()},
        |pr AS MATERIALIZED (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib
        |  FROM af a JOIN af b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |    JOIN e ea ON ea.vec_id = a.vec_id
        |    JOIN e eb ON eb.vec_id = b.vec_id AND eb.idx = ea.idx
        |  GROUP BY 1, 2
        |  HAVING CAST(sum((ea.xi - eb.xi) * (ea.xi - eb.xi)) AS BIGINT)
        |    <= $DupD2)
        |SELECT v.vec_id, CAST(v.cid AS BIGINT) AS cid,
        |  coalesce(min(pr.ia), v.vec_id) AS keep_id,
        |  count(pr.ia) AS n_nbrs
        |FROM af v LEFT JOIN pr ON pr.ib = v.vec_id
        |GROUP BY v.vec_id, v.cid
        |ORDER BY v.vec_id""") { (s, d) =>
      val cents = centroids(s, d)
      val v = base(s, d).select(col("vec_id"), col("xq"),
        best(cents).getField("cid").as("cid"))
      val pd2 = aggregate(
        zip_with(col("a.xq"), col("b.xq"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, t) => acc + t)
      val nbrs = v.as("a").join(v.as("b"),
          col("a.cid") === col("b.cid") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(pd2 <= lit(DupD2))
        .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"))
      v.select(col("vec_id"), col("cid"))
        .join(nbrs, col("vec_id") === col("ib"), "left")
        .groupBy("vec_id", "cid")
        .agg(coalesce(min("ia"), col("vec_id")).as("keep_id"),
          count(col("ia")).as("n_nbrs"))
        .select(col("vec_id"), col("cid"), col("keep_id"), col("n_nbrs"))
        .orderBy("vec_id")
    }
  )
}
