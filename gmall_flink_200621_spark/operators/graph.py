"""Graph algorithms over distributed edge lists.

The reference repo has no graph surface; this extends the engine the same
way `dedup_clusters` (operators/dedup.py) does — iterative algorithms as
driver-orchestrated loops of joins over distributed frames, with the
driver holding only scalars. First citizen: PageRank over the corpus
k-NN graph (`knn_graph`, operators/similarity.py), the standard
centrality pass behind graph-based curation — rank-weighted sampling,
hub detection in near-duplicate neighborhoods, seed selection for
label propagation.

Arithmetic is FIXED-POINT INTEGER end to end (ranks in units of
1/PR_SCALE): integer sums commute exactly, so the result is independent
of partition count and shuffle order, and the DuckDB oracle — the same
iteration unrolled as a CTE chain from the same Python constants —
matches bit-for-bit. A float implementation could not be hash-certified:
the per-vertex Σ contrib would differ in the last ulp across partition
orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_ITERS = 5
PR_SCALE = 10**9  # fixed-point units per 1.0 of rank
PR_DAMP_PCT = 85  # damping 0.85 as an integer percentage
PR_TELEPORT = (100 - PR_DAMP_PCT) * PR_SCALE // 100


def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    iters: int = PR_ITERS,
) -> DataFrame:
    """PageRank over a directed edge list, fixed-point, fixed iteration
    count (deterministic — no convergence test, so the oracle can unroll
    the exact same number of steps).

    `edges`: (src_id, nbr_id) rows, no weights, duplicates allowed
    upstream but expected pre-deduped (knn_graph emits each arc once).
    `vertices`: one column of vertex ids — the full vertex universe,
    including isolated vertices (they keep the teleport-only rank).

    Semantics (mirrored exactly in the PAGERANK_KNN oracle):
      r0(v)   = PR_SCALE                       (unnormalised: 1.0/vertex)
      contrib = r(v) div out_deg(v)            (integer floor division)
      r'(u)   = PR_TELEPORT + (85 · Σ contrib(u)) div 100
    Dangling vertices (out_deg 0) simply don't forward mass — the
    lost-mass variant; with a fixed iteration count on both sides that
    is a *definition*, not an approximation error.

    Scale shape: per iteration ONE join of the rank frame (|V| rows,
    16 bytes) to the degree-annotated edge list on src_id and ONE
    aggregation keyed by nbr_id — the Pregel message-passing shape.
    Ranks are localCheckpoint-ed per iteration (the dedup_clusters
    lineage discipline: plans stay O(1) deep; on a real cluster swap for
    reliable checkpoint()). The edge list is checkpointed ONCE and
    re-used by all iterations, so an expensive upstream edge builder
    (knn_graph's banded matmul) runs once, not `iters` times.

    Overflow margin: a vertex's in-sum is ≤ in_deg · max_rank; ranks stay
    O(PR_SCALE · in_deg/out_deg) ≈ O(PR_SCALE · k) on k-NN graphs, so
    85 · Σ fits int64 with ~9 orders of headroom at any corpus size
    (hub in-degree would need to exceed ~10⁸·k to overflow)."""
    vcol = vertices.columns[0]
    verts = (
        vertices.select(F.col(vcol).alias("vertex_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src_id").agg(F.count(F.lit(1)).alias("deg"))
    ed = (
        edges.select("src_id", "nbr_id")
        .join(deg, "src_id")
        .localCheckpoint(eager=True)
    )
    ranks = verts.select("vertex_id", F.lit(PR_SCALE).cast("long").alias("r"))
    for _ in range(iters):
        contribs = (
            ed.join(ranks, ed.src_id == ranks.vertex_id)
            .groupBy("nbr_id")
            .agg(F.sum(F.expr("r div deg")).alias("s"))
        )
        ranks = (
            verts.join(contribs, verts.vertex_id == contribs.nbr_id, "left")
            .select(
                "vertex_id",
                (
                    F.lit(PR_TELEPORT)
                    + F.expr(f"({PR_DAMP_PCT} * coalesce(s, 0L)) div 100")
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.join(deg, ranks.vertex_id == deg.src_id, "left")
        .select(
            "vertex_id",
            F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("out_deg"),
            F.col("r").alias("rank_units"),
            F.round(F.col("r") / F.lit(PR_SCALE), 6).alias("rank"),
        )
    )
