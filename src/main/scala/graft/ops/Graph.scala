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
    * Weighted variant: pass `weightCol` (a positive integer edge weight,
    * e.g. winnow's `n_shared`) and the recursion becomes
    * rankₜ(v) = (1 − d) + d · Σ w(u,v)·rankₜ₋₁(u) / wdeg(u) with
    * wdeg = Σ w over the node's edges — a doc tied to its family by 20
    * shared fingerprints pulls harder than a 2-fingerprint brush; with
    * all weights 1 this is exactly the unweighted recursion (spec-gated).
    * Duplicate (src, dst) rows must carry one weight (distinct applies to
    * the whole row; conflicting duplicate weights are the caller's bug).
    *
    * @param nodes  one row per node id (absentees from `edges` come back
    *               ranked 1 − d); must have no duplicate ids
    * @param edges  undirected candidate pairs (e.g. [[Winnow.candidatePairs]]
    *               output); self-loops are dropped, duplicates collapse
    */
  def pageRank(nodes: DataFrame, nodeCol: String,
               edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5, d: Double = 0.85,
               weightCol: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(d > 0 && d < 1, s"damping must be in (0, 1), got $d")
    val reliable = edges.sparkSession.sparkContext.getCheckpointDir.isDefined
    // lazy local checkpoint (r6): the caller's action materializes the
    // edge table in-line and later iterations read the cached blocks — no
    // separate eager job (the Dedup.clusters discipline)
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint(eager = false)
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        w.as("w"))
      .where(col("src") =!= col("dst"))
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst"),
      col("w"))).distinct()
    // r6: deg is attached to the edge table ONCE, so each iteration is a
    // single equi-join + one map-side-combined agg (was 2 joins/iter), and
    // sym+deg truncate as ONE table (sym's src-hash exchange feeds both the
    // degree agg and the join — ReusedExchange inside the one checkpoint
    // job, so the pair pipeline is still scanned once)
    val symdeg = truncate(sym.join(
      sym.groupBy(col("src")).agg(sum(col("w")).as("deg")), "src"))
    val ids = nodes.select(col(nodeCol).as("id"))
    var ranks = ids.withColumn("rank", lit(1.0))
    // r6: for small fixed iteration counts the rank recursion stays ONE
    // lazy plan — a linear chain of (join + agg) over the checkpointed
    // edge table, executed as a single job by the caller's action; the
    // per-iteration eager localCheckpoint (a materialization + cached
    // blocks per iteration, never freed) only pays for itself when the
    // chain would otherwise grow deep, so it is kept for iterations > 8,
    // now WITH the superseded iteration's blocks dropped.
    val pinEvery = iterations > 8
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iterations) {
      val contribs = symdeg
        .join(ranks, symdeg("src") === ranks("id"))
        .groupBy(col("dst"))
        .agg(sum(col("w") * col("rank") / col("deg")).as("c"))
      val next = ids
        .join(contribs, ids("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(1.0 - d) + lit(d) * coalesce(col("c"), lit(0.0))).as("rank"))
      if (pinEvery) {
        // EAGER here, unlike symdeg: the superseded iteration's blocks are
        // dropped right below, so this pin must be fully materialized
        // first (a lazy pin would still read them at its first action)
        val pinned = if (reliable) next.checkpoint() else next.localCheckpoint()
        prev.foreach(org.apache.spark.sql.GraftSqlShim.dropLocalCheckpoint)
        prev = Some(pinned)
        ranks = pinned
      } else ranks = next
    }
    ranks.select(col("id").as(nodeCol), col("rank"))
  }

  /** Triangle counts + local clustering coefficient per node over an
    * undirected graph — "how clique-like is this document's duplication
    * neighborhood": a template family shows up as a dense near-clique
    * (coefficient → 1), a hub-and-spokes boilerplate pattern as a star
    * (coefficient → 0), so the two centralities ([[pageRank]]) separate
    * only when read together with this.
    *
    * Algorithm: canonical edge ordering (a < b), each triangle
    * a < b < c found exactly once by joining (a,b)⋈(b,c) and probing
    * (a,c) — two hash equi-joins over the edge list (Cohen 2009,
    * "Graph twiddling in a MapReduce world"; Σ deg² candidate bound is
    * inherent to triangle listing). Per-node counts explode each found
    * triangle to its three corners — exact integers;
    * `coeff_r = round(2·tri / (deg·(deg−1)), 6)`, NULL when deg < 2.
    *
    * Output per node: `deg`, `tri_n`, `coeff_r` (absentees from the edge
    * list come back deg 0, tri 0, NULL coefficient).
    */
  def triangles(nodes: DataFrame, nodeCol: String,
                edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = e.select(col("a").as("id")).union(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val wedges = e.as("e1").join(e.as("e2"),
        col("e1.b") === col("e2.a")) // a < b < c by construction
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
    val tris = wedges.as("w").join(e.as("e3"),
      col("w.a") === col("e3.a") && col("w.c") === col("e3.b"))
      .select(col("w.a").as("a"), col("w.b").as("b"), col("w.c").as("c"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("tri_n"))
    nodes.select(col(nodeCol).as("id"))
      .join(deg, Seq("id"), "left")
      .join(perNode, Seq("id"), "left")
      .select(col("id").as(nodeCol),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("tri_n"), lit(0L)).as("tri_n"))
      .withColumn("coeff_r",
        when(col("deg") >= 2,
          round(lit(2L) * col("tri_n") /
            (col("deg") * (col("deg") - 1L)).cast("double"), 6)))
  }
}
