package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-analysis over document graphs. The near-dup stack turns
  * pairwise evidence into clusters ([[Dedup.clusters]]); this turns the
  * same evidence into a per-document CENTRALITY — "how embedded is this
  * document in its duplication neighborhood" — the score a curation
  * pipeline uses to pick the canonical representative of a template
  * family (most-central survives) or to down-weight boilerplate-heavy
  * hubs (Page et al. 1999, "The PageRank Citation Ranking", public
  * literature; the reference has no graph surface — its pairwise analog
  * is the CC matrix itself, /root/reference/xcorr/signal/correlate.py).
  */
object Graph {

  /** Fixed-iteration PageRank over an UNDIRECTED similarity graph, in the
    * unnormalized convention (GraphX's `staticPageRank`): rank₀ = 1 for
    * every node, then
    *
    *   rankₜ(v) = (1 − d) + d · Σ_{u ~ v} rankₜ₋₁(u) / deg(u)
    *
    * for a fixed number of iterations. Edges are symmetrized and deduped,
    * so every node with an edge has deg ≥ 1 — there are no dangling
    * nodes by construction and no global dangling-mass term (isolated
    * nodes hold rank exactly 1 − d from iteration 1 on). Ranks do not sum
    * to 1; only the ORDERING and ratios matter for canonical-pick use.
    *
    * Determinism: deg and the iteration count are exact; each rank is a
    * short chain of IEEE double ops whose only partition sensitivity is
    * the order of the per-neighbor SUM — ~1-ulp (≤1e-15 relative)
    * reorder noise, so gated surfaces read ranks round-6 (the q55/q56
    * precedent for float-sum surfaces).
    *
    * Scale shape: per iteration, ONE join of the edge list with the rank
    * table on the node key and ONE map-side-combined groupBy(dst) —
    * shuffle bytes ∝ edges, state ∝ nodes, never a neighborhood
    * materialized on one row. The symmetrized edge+degree table is
    * computed once and lineage-truncated (reliable checkpoint when the
    * session has a checkpoint dir, executor-local otherwise — the
    * [[Dedup.clusters]] discipline) so the plan does not grow with
    * iterations.
    *
    * @param nodes  one row per node id (absentees from `edges` come back
    *               ranked 1 − d); must have no duplicate ids
    * @param edges  undirected candidate pairs (e.g. [[Winnow.candidatePairs]]
    *               output); self-loops are dropped, duplicates collapse
    */
  def pageRank(nodes: DataFrame, nodeCol: String,
               edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5, d: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(d > 0 && d < 1, s"damping must be in (0, 1), got $d")
    val reliable = edges.sparkSession.sparkContext.getCheckpointDir.isDefined
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src") =!= col("dst"))
    val sym = truncate(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    val deg = truncate(sym.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val ids = nodes.select(col(nodeCol).as("id"))
    var ranks = ids.withColumn("rank", lit(1.0))
    for (_ <- 1 to iterations) {
      val contribs = sym
        .join(ranks, sym("src") === ranks("id"))
        .join(deg, "src")
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("c"))
      ranks = truncate(ids
        .join(contribs, ids("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(1.0 - d) + lit(d) * coalesce(col("c"), lit(0.0))).as("rank")))
    }
    ranks.select(col("id").as(nodeCol), col("rank"))
  }
}
