package graft.ops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the document similarity graph (nodes = docs,
  * edges = shared-rare-gram pairs from the stage-cached pair stats).
  *
  * PageRank here is the iterate-on-Spark template the cluster-label
  * fixpoint established (TextSim.clusterLabelsFixpoint): a driver loop
  * of shuffle-bounded rounds, each `localCheckpoint`ed so the logical
  * plan stays constant-size instead of doubling per round. Each round
  * is one join (ranks x out-edges) + one aggregation (sum of
  * contributions by destination) — the standard distributed PageRank
  * shape; at 100 TB both sides hash-partition on the node id and the
  * edge list is the reused stage artifact.
  *
  * Determinism: ranks are SCALED LONGS (1e9 = rank 1.0) and every
  * round is integer arithmetic only — contribution = rank / degree
  * (long division), damping = (15 * base + 85 * sum) / 100 — so sums
  * commute exactly and the result is bit-identical across runs,
  * partitionings, and merge orders (same rule as the codebooks'
  * integer-sum Lloyd rounds). GraphSpec replays the identical integer
  * recurrence single-threaded and asserts EXACT equality, and pins
  * bit-stability under a repartitioned edge list.
  *
  * Variant notes (both mirrored exactly in the spec's reference):
  * dangling nodes (degree 0) keep only the teleport term — their mass
  * is dropped, not redistributed; integer division truncates, so total
  * mass decays by < N * 100 scale units per round. Neither affects
  * the ranking order at any scale.
  */
object Graph {

  /** 1e9 scale: rank 1.0 == 1_000_000_000 scale units. */
  private val Scale = 1000000000L

  /** `iters` (>= 1) PageRank rounds (damping 0.85) over an UNDIRECTED
    * edge list (ida, idb) and a node frame with a `doc_id` column.
    * Returns (doc_id, deg, rank_scaled) — callers format rank_scaled.
    *
    * Unlike the label-propagation fixpoint, each round references the
    * previous ranks exactly ONCE (ranks' = conn ⨝ agg(ranks ⨝ eDeg)),
    * so the logical plan grows LINEARLY with iters — the whole
    * iteration compiles to one job of chained shuffle stages with no
    * per-round checkpoint barriers (measured 15 s -> ~1 s at sf0.1 for
    * 10 rounds vs the checkpoint-per-round formulation). Only the edge
    * frame is checkpointed: every round references it, and its build
    * pipeline must not inline iters times. Production periodic
    * checkpointing (lineage bound for fault recovery on a real
    * cluster) would slot in every ~10 rounds without changing results.
    *
    * Two closed forms keep the loop frames minimal: isolated nodes
    * (deg 0) receive no mass and send none, so after round 1 their
    * rank is exactly the teleport term — they are appended at the end,
    * never iterated; and the sender's degree is joined into the edge
    * list ONCE, so a round is one join + one aggregation + one join. */
  def pagerank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // Checkpoint the caller's edge list FIRST: symmetrize + degree
    // reference it four times, and each reference would otherwise
    // re-run the upstream edge pipeline (4 scans of the pair-stats
    // parquet, the bulk of the fixed setup cost).
    val eIn = edges.localCheckpoint(true)
    // Symmetrize, attach sender degree, checkpoint — the one frame
    // every round scans.
    val sym = eIn.select(col("ida").as("a"), col("idb").as("b"))
      .unionByName(eIn.select(col("idb").as("a"), col("ida").as("b")))
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
    val eDeg = sym.join(deg, "a").localCheckpoint(true)
    // conn is referenced by EVERY round's rank rebuild (and there is no
    // cross-plan subtree sharing), so without its own checkpoint the
    // distinct-over-edges would inline once per round.
    val conn = eDeg.select(col("a").as("doc_id"), col("deg")).distinct()
      .localCheckpoint(true)
    // N is a driver-side count of the NODE table (same documented
    // stats-pass family as the codebook sizing counts).
    val n = nodes.count()
    val base = Scale / n
    var ranks = conn.select(col("doc_id"), lit(base).as("r"))
    var round = 0
    while (round < iters) {
      // Column./ is DOUBLE division; the truncating casts restore
      // integer-division semantics exactly (every value here is a
      // non-negative integer < 2^53 — bounded by 85x the total rank
      // mass of 1e9 scale units — so the double quotient is exact).
      // The graph is UNDIRECTED, so every connected node appears as a
      // destination b of some edge whose sender has a rank row —
      // contribs covers EXACTLY the connected node set every round.
      // The inner join back onto the checkpointed conn frame is
      // therefore an identity on rows, but it is load-bearing for the
      // PLAN: conn's known (checkpointed) size anchors the static
      // cost estimate of every round's output, so Catalyst plans all
      // iters rounds as pipelined broadcast joins up front instead of
      // AQE re-planning one shuffle stage at a time — a sequential
      // materialization barrier per round that dominated wall-clock
      // (measured ~0.7 s/round -> ~0.1 s/round at sf0.1; with the
      // edge-list checkpoints, 10 rounds run in ~2.8 s total).
      val contribs = ranks
        .join(eDeg, ranks("doc_id") === eDeg("a"))
        .select(col("b"), (col("r") / col("deg")).cast("long").as("c"))
        .groupBy(col("b").as("doc_id"))
        .agg(((lit(15L) * base + lit(85L) * sum("c")) / 100L).cast("long")
          .as("r"))
      ranks = conn.select("doc_id").join(contribs, "doc_id")
      round += 1
    }
    ranks.join(conn, "doc_id")
      .select(col("doc_id"), col("deg"), col("r").as("rank_scaled"))
      .unionByName(nodes.select(col("doc_id"))
        .join(conn.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit(0L).as("deg"),
          lit(15L * base / 100L).as("rank_scaled")))
  }

  val specs: Seq[QuerySpec] = Seq(

    // Document centrality on the shared-gram graph: 10 deterministic
    // integer rounds; output the scaled rank as a rounded double. No
    // DuckDB oracle (iterative); GraphSpec pins exact equality to the
    // single-threaded integer reference and bit-stability across
    // partitionings; goldens pin the fixture output.
    QuerySpec.noOracle("q_graph_pagerank") { (s, d) =>
      pagerank(Tables.documents(s, d).select("doc_id"),
          graft.ops.TextSim.similarityEdges(s, d), iters = 10)
        .select(col("doc_id"), col("deg"),
          round(col("rank_scaled") / 1e9, 6).as("rank"))
        .orderBy(col("rank").desc, col("doc_id"))
    }
  )
}
