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


def triangle_count(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Per-vertex triangle count + local clustering coefficient over an
    (undirected-ized) edge list — the graph-density diagnostic behind
    community detection and near-duplicate neighborhood analysis (a
    high-clustering k-NN region is a semantic cluster; a hub with zero
    closure is an artifact).

    Enumeration is the a<b<c ordered-wedge join: canonicalize arcs to
    a<b pairs (each undirected edge exactly once), then wedge b→c on the
    middle vertex and close with a third join — every triangle is
    produced EXACTLY once, no ÷6 correction, no symmetric blow-up. Scale
    shape: two hash joins on vertex keys; wedge count is Σ_v deg(v)² —
    the standard skew bound (production twist for power-law graphs:
    orient edges low-degree→high-degree before wedging, which caps the
    square at the max low-side degree; unnecessary on k-NN graphs where
    out-degree ≤ k by construction).

    Clustering coefficient = 2·T / (deg·(deg−1)) on the undirected
    degree; 0.0 when deg < 2 (no wedge to close)."""
    und = (
        edges.select(
            F.least("src_id", "nbr_id").alias("a"),
            F.greatest("src_id", "nbr_id").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    per_vertex = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    vcol = vertices.columns[0]
    verts = vertices.select(F.col(vcol).alias("v")).distinct()
    return (
        verts.join(deg, "v", "left")
        .join(per_vertex, "v", "left")
        .select(
            F.col("v").alias("vertex_id"),
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    (F.lit(2) * F.coalesce("triangles", F.lit(0)))
                    / (F.col("degree") * (F.col("degree") - F.lit(1))),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


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
