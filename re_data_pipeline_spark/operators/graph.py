"""Iterative graph propagation beyond connected components: PageRank.

Link-graph rank is a standard corpus-curation signal (OPT/CCNet-style
pipelines weight pages by link authority before sampling).  The loop is the
same join+groupBy-per-round shape as ``dedup.connected_components`` —
shuffle keyed by node id, lineage truncated per round — but propagates a
NUMERIC mass instead of a min-label, which raises the cross-engine
determinism problem CC doesn't have: floating-point mass sums depend on
partition order.

Solution: FIXED-POINT integer arithmetic end to end.  Ranks are BIGINTs at
``scale`` (1e6) resolution; per-edge contributions use integer floor
division (``rank DIV out_degree``), and the damping update is
``(15·scale) DIV 100 + (85·incoming) DIV 100``.  Integer sums are
order-independent, so Spark and DuckDB agree bit-for-bit after any number
of iterations — same technique as ``selection.dsir_log_weights``.  The
deviation from real-valued PageRank is bounded by out_degree·ulp per node
per round (≤ 1e-6·deg), irrelevant for ranking use.

Dangling nodes (no out-edges) keep the teleport mass only — the standard
simplification; redistribute-dangling variants add one broadcast 1-row agg
per round if mass conservation matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from re_data_pipeline_spark.operators.ids import release_local_checkpoint


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """(node, rank_fixed) after ``iterations`` damped rounds (d=0.85),
    all-integer arithmetic at ``scale`` resolution.

    Checkpoint discipline (r14 — this loop was the one iterative operator
    the r13 release pass missed): rounds checkpoint EAGERLY so round r−1's
    blocks can be released as soon as round r is materialized (the
    BFS/SSSP protocol; the pre-r14 lazy chain left nodes + edges + every
    round's checkpoint pinned with NO release handle — 7 RDDs per
    invocation surviving ``clearCache`` for the session's lifetime).  The
    final round's checkpoint backs the returned frame and its handle rides
    ``_ordinal_caches`` so ``ids.release_spines`` frees it after
    materialization — it is a checkpoint scan, so release only after the
    result is consumed (the standard carry contract)."""
    from re_data_pipeline_spark.operators.ids import _carry_caches

    from re_data_pipeline_spark.operators.dedup import narrow_small_frame

    nodes = narrow_small_frame(
        edges.select(F.col(src).alias("n"))
        .union(edges.select(F.col(dst).alias("n")))
        .distinct()
        # size-derived narrow before the checkpoint the loop re-reads
        # (r19, see narrow_small_frame)
    ).localCheckpoint()
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst")).localCheckpoint()
    deg = e.groupBy("e_src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.withColumn("rank_f", F.lit(scale).cast("long"))
    prev = None  # round r-1's checkpoint — dead once round r materializes
    teleport = (15 * scale) // 100
    try:
        for _ in range(iterations):
            contrib = (
                ranks.join(deg, ranks.n == deg.e_src)
                .select(F.col("n"), F.expr("rank_f DIV out_deg").alias("c"))
                .join(e, F.col("n") == F.col("e_src"))
                .select(F.col("e_dst").alias("n2"), "c")
            )
            incoming = contrib.groupBy("n2").agg(F.sum("c").alias("inc"))
            new_ranks = narrow_small_frame(
                nodes.join(incoming, nodes.n == incoming.n2, "left")
                .select(
                    "n",
                    (
                        F.lit(teleport).cast("long")
                        + F.expr("85 * coalesce(inc, 0L) DIV 100")
                    ).alias("rank_f"),
                )
            ).localCheckpoint()  # eager: materializes, so prev is dead
            release_local_checkpoint(prev)
            prev = ranks = new_ranks
    except BaseException:
        # the caller gets no frame back — release everything before
        # propagating (release is idempotent on aliased handles)
        for f in (prev, nodes, e):
            release_local_checkpoint(f)
        raise
    out = ranks.select(F.col("n").alias("node"), F.col("rank_f").alias("rank_fixed"))
    if iterations >= 1:
        # every round is materialized and the result derives only from the
        # final round's checkpoint — the seed/edge checkpoints are dead.
        release_local_checkpoint(nodes)
        release_local_checkpoint(e)
        return _carry_caches(out, out, ranks)
    # iterations=0 returns the uniform seed, which still recomputes THROUGH
    # the nodes checkpoint — carry ITS handle so release_spines frees it
    # after the caller materializes; the edge checkpoint is provably dead
    # (nothing in the returned lineage reads it), release it now (r15).
    release_local_checkpoint(e)
    return _carry_caches(out, out, nodes)


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count over an undirected simple graph → 1 row
    ``(n_triangles bigint)``.

    The classic clustering/cohesion metric (and the standard MapReduce-era
    scalability benchmark).  Ordered-edge formulation: canonicalize each
    edge to (lo, hi), dedupe, then count paths lo<mid<hi that close —
    every triangle {a<b<c} is counted exactly once as (a,b)+(b,c)+(a,c).

    Plan shape at 100 TB: two equi-joins on node keys — no direction
    explosion, no cross join; the ordered orientation means each join
    probes only HIGHER-numbered neighbors, which bounds the join fan-out
    by the ordered degree (the classic trick that tames power-law hubs:
    a hub's ordered out-degree is ~sqrt of its total degree on average).
    AQE skew-split covers the residual hot nodes.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a2"), F.col("v").alias("c2"))
    return (
        ab.join(bc, "b")
        .join(ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")), "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_iterations: int = 64,
) -> DataFrame:
    """Multi-source BFS over a DIRECTED edge list → ``(node, dist)`` with
    the minimum hop count from any source (sources at 0).  Unreachable
    nodes are absent.  The third iterative-graph shape next to connected
    components (connectivity) and PageRank (numeric fixpoint): frontier
    expansion with monotone state.

    Each round: frontier ⨝ edges → candidate nodes → anti-join against
    the visited set (BFS's first visit IS the min distance, so no
    re-relaxation ever happens — unlike weighted SSSP).  Shuffles are
    keyed on node ids; per-round lineage is localCheckpoint-truncated;
    rounds = eccentricity of the source set.  At 100 TB scale the frontier
    is the only growing term — visited stays an id set, and hub fan-out
    is one AQE-splittable join per round.
    """
    visited = sources.select(F.col(node), F.lit(0).alias("dist")).distinct().localCheckpoint()
    frontier = visited
    nxt = None
    try:
        for level in range(1, max_iterations + 1):
            nxt = (
                frontier.join(edges, frontier[node] == edges[src])
                .select(F.col(dst).alias(node))
                .distinct()
                .join(visited, node, "left_anti")
                .withColumn("dist", F.lit(level))
            )
            nxt = nxt.localCheckpoint()
            if nxt.isEmpty():
                release_local_checkpoint(nxt)  # empty frontier: nothing reads it
                break
            prev_visited, prev_frontier = visited, frontier
            visited = visited.unionByName(nxt).localCheckpoint()
            frontier = nxt
            # the new visited checkpoint is materialized and round r's nxt was
            # the last reader of the old frontier — release both superseded
            # checkpoints (level-1 frontier IS level-1 visited on entry, so
            # guard against double-releasing the same handle)
            release_local_checkpoint(prev_visited)
            if prev_frontier is not prev_visited:
                release_local_checkpoint(prev_frontier)
        else:
            raise RuntimeError(
                f"bfs_distances did not exhaust the frontier in {max_iterations} "
                "rounds — raise max_iterations (graph eccentricity too large)"
            )
    except BaseException:
        # the caller gets no frame back — release EVERY live checkpoint
        # before propagating (the non-convergence raise and any mid-loop
        # failure otherwise leak pinned storage; release is idempotent,
        # so aliased handles are fine)
        for f in (nxt, frontier, visited):
            release_local_checkpoint(f)
        raise
    # the last non-empty frontier is dead once the empty probe broke the
    # loop; only the final visited checkpoint backs the returned frame
    if frontier is not visited:
        release_local_checkpoint(frontier)
    return visited


def sssp_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "node",
    max_iterations: int = 256,
    _plan_probe=None,
) -> DataFrame:
    """Single/multi-source shortest WEIGHTED path distances (non-negative
    integer weights) → ``(node, dist)``; unreachable nodes absent.

    Frontier-limited Bellman-Ford: each round relaxes only out-edges of
    nodes whose distance improved last round (the delta-stepping intuition
    without buckets), so settled regions stop generating traffic.  Rounds
    ≤ the hop count of the longest minimum-weight path; each round is one
    node-keyed join + min-combine + improvement anti-filter, with lineage
    localCheckpoint-truncated — the CC/PageRank/BFS loop discipline.
    Weights must be ≥ 0 (negative edges need true Bellman-Ford with a
    final negative-cycle probe — out of scope for distance-to-content
    use cases).

    ``_plan_probe`` (plan audits only — the kcenter_select precedent):
    called with ``(round, improved_frame)`` on the round's PRE-checkpoint
    relaxation frame, so the join + min-combine + improvement-filter plan
    shape is assertable from outside before localCheckpoint truncates it.
    """
    dist = (
        sources.select(F.col(node), F.lit(0).cast("long").alias("dist"))
        .distinct()
        .localCheckpoint()
    )
    frontier = dist
    improved = new_dist = None
    try:
        for _r in range(max_iterations):
            cand = (
                frontier.join(edges, frontier[node] == edges[src])
                .select(
                    edges[dst].alias("__n"),
                    (frontier["dist"] + edges[weight]).alias("__cand"),
                )
                .groupBy("__n")
                .agg(F.min("__cand").alias("__cand"))
            )
            # alias both sides: on round 1 the frontier IS the dist frame,
            # so cand derives from dist and an attribute-reference join
            # (dist["dist"]) trips Spark's ambiguous-self-join check
            improved = (
                cand.alias("__c")
                .join(dist.alias("__d"), F.col("__n") == F.col(f"__d.{node}"), "left")
                .where(
                    F.col("__d.dist").isNull() | (F.col("__cand") < F.col("__d.dist"))
                )
                .select(F.col("__n").alias(node), F.col("__cand").alias("dist"))
            )
            if _plan_probe is not None:
                _plan_probe(_r + 1, improved)
            improved = improved.localCheckpoint()
            if improved.isEmpty():
                release_local_checkpoint(improved)  # empty: nothing reads it
                break
            new_dist = (
                dist.withColumnRenamed("dist", "__old")
                .join(improved.withColumnRenamed("dist", "__new"), node, "full")
                .select(
                    node,
                    F.least(
                        F.coalesce(F.col("__old"), F.col("__new")),
                        F.coalesce(F.col("__new"), F.col("__old")),
                    ).alias("dist"),
                )
                .localCheckpoint()
            )
            # new_dist is materialized; the old dist and the old frontier
            # (improved_{r-1}, last read by this round's cand) are
            # superseded — on round 1 both are the seed checkpoint, guard
            # the double free
            release_local_checkpoint(dist)
            if frontier is not dist:
                release_local_checkpoint(frontier)
            dist = new_dist
            frontier = improved
        else:
            raise RuntimeError(
                f"sssp_distances did not settle in {max_iterations} rounds — "
                "raise max_iterations (longest min-weight path has more hops)"
            )
    except BaseException:
        # the caller gets no frame back — release EVERY live checkpoint
        # before propagating (the non-convergence raise and any mid-loop
        # failure otherwise leak pinned storage; release is idempotent,
        # so aliased handles are fine)
        for f in (improved, new_dist, frontier, dist):
            release_local_checkpoint(f)
        raise
    # the final frontier is dead once the loop broke; only the final dist
    # checkpoint backs the returned frame
    if frontier is not dist:
        release_local_checkpoint(frontier)
    return dist
