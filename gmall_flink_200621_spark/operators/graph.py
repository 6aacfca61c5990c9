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

from pyspark.sql import DataFrame, Window, functions as F

PR_ITERS = 5
PR_SCALE = 10**9  # fixed-point units per 1.0 of rank
PR_DAMP_PCT = 85  # damping 0.85 as an integer percentage
PR_TELEPORT = (100 - PR_DAMP_PCT) * PR_SCALE // 100


LP_ITERS = 3
LP_SEED_MOD = 5  # vec_id % LP_SEED_MOD == 0 keeps its ground-truth label


def label_propagation(
    edges: DataFrame,
    labeled_vertices: DataFrame,
    iters: int = LP_ITERS,
    seed_mod: int = LP_SEED_MOD,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Semi-supervised label propagation: a sparse set of SEED vertices
    (vertex_id % seed_mod == 0) keeps its ground-truth label; everyone
    else takes, each iteration, the majority label among currently
    labeled neighbors (ties → smallest label; no labeled neighbor →
    keep current, possibly none). The auto-labeling pass of a curation
    pipeline: spread scarce human labels across the k-NN graph, then
    audit agreement against held-out truth.

    Deterministic by construction — votes are integer counts and the
    argmax order (count desc, label asc) is total — so the DuckDB
    oracle (same iterations unrolled) matches hash-exactly; seeds are
    CLAMPED (never re-voted).

    Scale shape per iteration: one join of the current label frame onto
    the symmetrized edge list, one (dst, label) count aggregation, one
    per-dst argmax window — all keyed by vertex, no broadcast of
    anything vertex-sized. Labels localCheckpoint-ed every
    `checkpoint_every` iterations (the pagerank cadence knob: bounded
    lineage without paying one barrier job per iteration). Unlike
    pagerank, each iteration references `labels` TWICE (votes + carry),
    so the un-truncated logical plan doubles per iteration —
    2^checkpoint_every plan copies is the analysis-cost bound (runtime
    stays single-execution via exchange reuse); keep the cadence small
    here, and never set it above ~6.

    `labeled_vertices`: (vertex id, label) ground truth; output carries
    true_label, is_seed, the propagated label (null if never reached),
    and a correctness flag for the non-seed audit."""
    vid, lbl = labeled_vertices.columns[0], labeled_vertices.columns[1]
    base = (
        labeled_vertices.select(
            F.col(vid).alias("vertex_id"),
            F.col(lbl).cast("long").alias("true_label"),
            (F.col(vid) % seed_mod == 0).alias("is_seed"),
        )
        .withColumn(
            "seed_label", F.when(F.col("is_seed"), F.col("true_label"))
        )
        .localCheckpoint(eager=False)
    )
    # materialize upstream edges once — the symmetrizing union references
    # them twice, which would otherwise run an expensive builder twice.
    # Only `edges` is an eager barrier (it truncates the builder out of
    # the loop's doubling plans); base/und build on leaves and are LAZY
    # (r13), materializing inside iteration 1's vote job.
    edges = edges.select("src_id", "nbr_id").localCheckpoint(eager=True)
    und = (
        edges.select(F.col("src_id").alias("src"), F.col("nbr_id").alias("dst"))
        .unionByName(
            edges.select(
                F.col("nbr_id").alias("src"), F.col("src_id").alias("dst")
            )
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = base.select("vertex_id", F.col("seed_label").alias("label"))
    w = Window.partitionBy("dst").orderBy(F.desc("c"), F.asc("label"))
    for it in range(iters):
        votes = (
            und.join(
                labels.where(F.col("label").isNotNull()),
                und.src == labels.vertex_id,
            )
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("dst"), F.col("label").alias("vote"))
        )
        labels = (
            base.join(labels, "vertex_id")
            .join(votes, base.vertex_id == votes.dst, "left")
            .select(
                "vertex_id",
                F.coalesce("seed_label", "vote", "label").alias("label"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            labels = labels.localCheckpoint(eager=True)
    return base.join(labels, "vertex_id").select(
        "vertex_id",
        "true_label",
        F.col("is_seed").cast("int").alias("is_seed"),
        F.col("label").alias("propagated"),
        F.when(F.col("label") == F.col("true_label"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("correct"),
    )


def triangle_count(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Per-vertex triangle count + local clustering coefficient over an
    (undirected-ized) edge list — the graph-density diagnostic behind
    community detection and near-duplicate neighborhood analysis (a
    high-clustering k-NN region is a semantic cluster; a hub with zero
    closure is an artifact).

    Enumeration is DEGREE-ORIENTED wedging (Schank's algorithm, the
    power-law-safe shape): orient each undirected edge from its
    lower-(degree, id) endpoint to the higher one — a total order, so
    the oriented graph is acyclic and every triangle has exactly one
    vertex with two out-arcs. Wedge at that vertex (join the oriented
    list with itself on the source) and close with one oriented-edge
    probe — each triangle produced EXACTLY once, and wedge volume is
    Σ out-deg² = O(m^1.5) instead of the naive Σ deg² (a celebrity hub
    with degree d contributes d² unordered wedges but only ~m^0.5·d
    oriented ones, because all its heavy neighbors orient TOWARD it).
    On k-NN graphs out-degree is additionally ≤ 2k by construction.

    Clustering coefficient = 2·T / (deg·(deg−1)) on the undirected
    degree; 0.0 when deg < 2 (no wedge to close)."""
    # materialized once: deg, both wedge sides, and the closing probe all
    # reuse this frame (4 plan branches — without the checkpoint each one
    # would re-run the upstream edge builder)
    und = (
        edges.select(
            F.least("src_id", "nbr_id").alias("a"),
            F.greatest("src_id", "nbr_id").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("degree").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    e3 = und.alias("e3")
    # wedge at the (unique) vertex with two out-arcs; e1.dst < e2.dst
    # generates each wedge once; close by probing the UNDIRECTED
    # canonical edge on (least, greatest) — a plain two-key equi-join
    # (an oriented-edge probe would need an OR over both directions,
    # which no hash join can serve)
    tris = (
        e1.join(e2, (F.col("e1.src") == F.col("e2.src")) & (F.col("e1.dst") < F.col("e2.dst")))
        .join(
            e3,
            (F.col("e3.a") == F.least(F.col("e1.dst"), F.col("e2.dst")))
            & (F.col("e3.b") == F.greatest(F.col("e1.dst"), F.col("e2.dst"))),
        )
        .select(
            F.col("e1.src").alias("x"), F.col("e1.dst").alias("y"), F.col("e2.dst").alias("z")
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
    checkpoint_every: int = 4,
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
    Ranks are localCheckpoint-ed every `checkpoint_every` iterations
    (the dedup_clusters lineage discipline, with a cadence knob: each
    eager checkpoint is a full job BARRIER, so truncating every
    iteration costs `iters` sequential jobs while lineage only needs
    bounding — ≤ checkpoint_every join layers accumulate between
    truncations, and the un-truncated tail fuses into the final job.
    On a real cluster swap for reliable checkpoint(); the cadence then
    also sets recovery replay depth). The edge list is checkpointed
    ONCE and re-used by all iterations, so an expensive upstream edge
    builder (knn_graph's banded matmul) runs once, not `iters` times.

    Overflow margin: a vertex's in-sum is ≤ in_deg · max_rank; ranks stay
    O(PR_SCALE · in_deg/out_deg) ≈ O(PR_SCALE · k) on k-NN graphs, so
    85 · Σ fits int64 with ~9 orders of headroom at any corpus size
    (hub in-degree would need to exceed ~10⁸·k to overflow)."""
    vcol = vertices.columns[0]
    # verts/ed are LAZY (r13): they build on leaves (the vertex scan, the
    # edges checkpoint) and materialize inside iteration 1's job — the
    # single eager barrier stays on `edges`, which truncates the
    # expensive upstream builder (knn_graph's banded matmul) out of every
    # iteration's plan and runs it once, not once per plan branch
    verts = (
        vertices.select(F.col(vcol).alias("vertex_id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = edges.select("src_id", "nbr_id").localCheckpoint(eager=True)
    deg = edges.groupBy("src_id").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "src_id").localCheckpoint(eager=False)
    ranks = verts.select("vertex_id", F.lit(PR_SCALE).cast("long").alias("r"))
    for it in range(iters):
        contribs = (
            ed.join(ranks, ed.src_id == ranks.vertex_id)
            .groupBy("nbr_id")
            .agg(F.sum(F.expr("r div deg")).alias("s"))
        )
        ranks = verts.join(contribs, verts.vertex_id == contribs.nbr_id, "left").select(
            "vertex_id",
            (
                F.lit(PR_TELEPORT)
                + F.expr(f"({PR_DAMP_PCT} * coalesce(s, 0L)) div 100")
            )
            .cast("long")
            .alias("r"),
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return (
        ranks.join(deg, ranks.vertex_id == deg.src_id, "left")
        .select(
            "vertex_id",
            F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("out_deg"),
            F.col("r").alias("rank_units"),
            # raw division, NOT round(…, 6): both engines produce the
            # identical IEEE double from the identical integer, whereas
            # explicit 6-dp rounding hits half-way ties (…x500 unit
            # tails) where Spark's HALF_UP and DuckDB's nearest-double
            # disagree in the last digit
            (F.col("r") / F.lit(PR_SCALE)).alias("rank"),
        )
    )
