"""Pins for the round-12 graph families: the CDC-maintained k-NN graph's
delete-recall semantics and the graph-ANN search's plan/layout contracts.

The tri-SF oracle gates certify end-to-end equality with batch-over-
survivors on the real corpus; these tests pin the SPECIFIC semantics the
designs exist for, on planted inputs where the interesting case is
guaranteed to occur.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _stage_planted_cdc(vectors: dict[int, np.ndarray], deletes: list[int]) -> str:
    """Two-chunk CDC feed: chunk 0 inserts every vector, chunk 1 carries
    the V_DEL tombstones — the post-insert delete arrival order."""
    stage = tempfile.mkdtemp(prefix="spark_graft_kngtest_")
    ins = pd.DataFrame(
        {
            "side": ["V"] * len(vectors),
            "vec_id": list(vectors),
            "embedding": [v.astype("float32") for v in vectors.values()],
            "label": np.int32(0),
        }
    )
    dels = pd.DataFrame(
        {
            "side": ["V_DEL"] * len(deletes),
            "vec_id": deletes,
            "embedding": [np.zeros(0, dtype="float32")] * len(deletes),
            "label": np.int32(0),
        }
    )
    base = None
    for i, pdf in enumerate((ins, dels)):
        p = os.path.join(stage, f"part-{i}.parquet")
        pdf.to_parquet(p, index=False)
        if base is None:
            base = os.stat(p).st_mtime
        os.utime(p, (base + i, base + i))
    return stage


class TestKnnGraphCdcRecall:
    def test_deleted_crowder_recalls_runner_up(self, spark):
        """THE reason the maintained graph stores unpruned pair scores:
        while X is alive, S's top-3 is {X, A, B} and Y is crowded out;
        after X's tombstone lands, Y must appear at rank 3 WITHOUT any
        re-scoring — a per-src-top-k-pruned index could not serve this.
        Vectors are near-parallel (identical LSH buckets by construction)
        with strictly ordered cosines to S."""
        from gmall_flink_200621_spark.streaming.ingest import (
            knn_graph_cdc_view,
            run_knn_graph_cdc_stream,
        )

        rng = {}
        base = np.ones(64, dtype=np.float64)
        # cosine(S, base + eps*e1) strictly decreases with eps
        for vid, eps in ((1, 0.0), (2, 0.5), (3, 1.0), (4, 1.5), (5, 2.0)):
            v = base.copy()
            v[1] += eps
            rng[vid] = v / np.linalg.norm(v)
        stage = _stage_planted_cdc(rng, deletes=[2])  # X = vec_id 2

        name = f"t_kngrec_{os.getpid()}"
        q = run_knn_graph_cdc_stream(
            spark, sf_dir="", stage_dir=stage, name=name, fresh_tables=True
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
        for t in ("vec", "band", "edge", "del"):
            spark.catalog.refreshTable(f"{name}_{t}")

        got = {
            r["rank"]: r["nbr_id"]
            for r in knn_graph_cdc_view(spark, name).filter(F.col("src_id") == 1).collect()
        }
        # X (=2) is dead; the runner-up Y (=5) must be recalled at rank 3
        assert got == {1: 3, 2: 4, 3: 5}, got
        # and X serves nowhere — neither as src nor as neighbor
        full = knn_graph_cdc_view(spark, name)
        assert full.filter((F.col("src_id") == 2) | (F.col("nbr_id") == 2)).count() == 0


class TestGraphAnnContracts:
    def test_partition_layout_invariance(self, spark, sf_dir):
        """The walk's result must not depend on the shuffle layout (the
        same invariance contract as the ranking primitive — beams are
        checkpoint-materialized, boundaries never re-sample)."""
        import __spark_entry__ as entry_mod

        def run(shuffle: str):
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", shuffle)
            try:
                out = entry_mod.queries()["knn_graph_ann"](spark, sf_dir)
                return sorted(map(tuple, out.collect()))
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)

        assert run("4") == run("11")

    def test_plan_is_leaf_bounded_not_geometric(self, spark, sf_dir):
        """The r12 incident pin: without per-hop lineage truncation the
        plan tree re-embeds the graph-construction subtree once per hop
        and its explain string grows geometrically (a default-heap
        session OOMed just rendering it). The final plan must bottom out
        in checkpoint leaves and render in bounded space."""
        import __spark_entry__ as entry_mod

        df = entry_mod.queries()["knn_graph_ann"](spark, sf_dir)
        s = df._jdf.queryExecution().optimizedPlan().treeString()
        assert "LogicalRDD" in s  # the per-hop checkpoint leaves
        assert len(s) < 200_000, f"plan string {len(s)} chars — lineage compounding"


class TestKnnGraphCdcBucketCap:
    def test_planted_hot_bucket_is_split_and_bounded(self, spark):
        """Stream-side parity for the batch `_capped_buckets` pathology
        pin: 300 EXACT duplicates (identical LSH signs at any depth — no
        banding splits them) land in one bucket in a single epoch. With
        cap=32 the maintainer must hash-split the scored group into
        vec_id residues — bounding the matmul and the stored edge set at
        O(B·cap) instead of B² — while every duplicate still serves a
        full fan-out of cosine≈1 neighbors from the maintained view."""
        from gmall_flink_200621_spark.operators.similarity import (
            DIM,
            KNN_GRAPH_K,
            LSH_SIGN_BANDS,
        )
        from gmall_flink_200621_spark.streaming.ingest import (
            knn_graph_cdc_view,
            run_knn_graph_cdc_stream,
        )

        rng = np.random.RandomState(11)
        base = rng.uniform(-0.5, 0.5, DIM)
        vecs = {i: base.copy() for i in range(300)}
        vecs.update(
            {1000 + i: rng.uniform(-0.5, 0.5, DIM) for i in range(50)}
        )
        stage = _stage_planted_cdc(vecs, deletes=[])

        cap = 32
        name = f"t_kngcap_{os.getpid()}"
        q = run_knn_graph_cdc_stream(
            spark,
            sf_dir="",
            stage_dir=stage,
            name=name,
            fresh_tables=True,
            bucket_cap=cap,
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
        for t in ("vec", "band", "edge", "del"):
            spark.catalog.refreshTable(f"{name}_{t}")

        # boundedness: uncapped, the duplicate bucket stores C(300,2) ≈
        # 44.8k pairs; capped residues (~10 groups of ~30) store ≤
        # bands · nsub · C(cap,2) — assert an order of magnitude under
        # the uncapped volume
        dup_pairs = (
            spark.table(f"{name}_edge")
            .filter((F.col("id_a") < 300) & (F.col("id_b") < 300))
            .select("id_a", "id_b")
            .distinct()
            .count()
        )
        nsub = -(-300 // cap)
        assert 0 < dup_pairs <= LSH_SIGN_BANDS * nsub * cap * (cap - 1) // 2, dup_pairs
        assert dup_pairs < 44850 / 4, dup_pairs

        # serving quality: every duplicate keeps a full fan-out of
        # ~identical neighbors through the residue split
        g = knn_graph_cdc_view(spark, name).toPandas()
        dup = g[g.src_id < 300]
        assert (dup.groupby("src_id").size() == KNN_GRAPH_K).all()
        assert (dup.cosine > 0.999999).all()


class TestKnnGraphCdcBridgeSplit:
    """The transitive-closure retraction pin for graph operators composed
    on the maintained graph: deleting a BRIDGE vector must SPLIT a
    component — the case a maintainer that dropped only the bridge's own
    rows but kept stale derived connectivity would get wrong."""

    @staticmethod
    def _planted_corpus():
        """Two 4-vector clusters + per-cluster edge members + a bridge X,
        laid out on a small angular arc in dims (0,1) over a constant
        positive base (near-parallel vectors — every pair shares LSH
        bands, so the candidate set is complete and the geometry alone
        decides the graph). Top-3 lists: core members stay in-cluster;
        X's own top-3 reaches BOTH edge members, so X is the only path
        between the clusters."""
        import math

        def vec(theta_deg: float) -> np.ndarray:
            v = np.ones(64, dtype=np.float64)
            t = math.radians(theta_deg)
            v[0] += 30.0 * math.cos(t)
            v[1] += 30.0 * math.sin(t)
            return v

        vecs = {}
        for i, th in enumerate((0.0, 0.2, 0.4, 0.6)):  # cluster A core
            vecs[1 + i] = vec(th)
        vecs[5] = vec(2.0)  # a_edge
        vecs[21] = vec(4.5)  # X, the bridge
        vecs[15] = vec(7.0)  # b_edge
        for i, th in enumerate((8.4, 8.6, 8.8, 9.0)):  # cluster B core
            vecs[11 + i] = vec(th)
        return vecs

    @staticmethod
    def _components(edges: list[tuple[int, int]], verts: list[int]) -> int:
        parent = {v: v for v in verts}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        return len({find(v) for v in verts})

    def _run(self, spark, vecs, deletes, tag):
        from gmall_flink_200621_spark.streaming.ingest import (
            knn_graph_cdc_view,
            run_knn_graph_cdc_stream,
        )

        stage = _stage_planted_cdc(vecs, deletes=deletes)
        name = f"t_kngbr{tag}_{os.getpid()}"
        q = run_knn_graph_cdc_stream(
            spark, sf_dir="", stage_dir=stage, name=name, fresh_tables=True
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
        for t in ("vec", "band", "edge", "del"):
            spark.catalog.refreshTable(f"{name}_{t}")
        edges = [
            (r.src_id, r.nbr_id)
            for r in knn_graph_cdc_view(spark, name).collect()
        ]
        return edges

    def test_deleting_bridge_splits_component(self, spark):
        vecs = self._planted_corpus()
        # alive: X's top-3 spans both edge members — one component
        alive = self._run(spark, vecs, deletes=[], tag="a")
        assert self._components(alive, list(vecs)) == 1, sorted(alive)
        # X tombstoned: every X-sided edge retracts at read, the edge
        # members re-close into their own clusters, the component SPLITS
        dead = self._run(spark, vecs, deletes=[21], tag="d")
        survivors = [v for v in vecs if v != 21]
        assert all(21 not in e for e in dead), sorted(dead)
        assert self._components(dead, survivors) == 2, sorted(dead)
