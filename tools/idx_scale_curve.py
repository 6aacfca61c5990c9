"""Maintenance scale curve for the CDC-maintained index families
(r12 verdict item #7): feed each maintainer EQUAL-SIZE epochs while the
index grows, and read per-epoch maintenance cost off the streaming
progress log. The docstring claim this measures is "per-epoch cost is
O(batch), not O(index)": with batch size held constant across N_EPOCHS
epochs, an O(batch) maintainer's per-epoch seconds stay FLAT as the
index grows N_EPOCHS×, while an O(index) one climbs linearly.

Two expected shapes, asserted separately:
- FLAT families — BM25 (stats partials + per-batch postings), flat
  store, PQ codes, SQ8 codes: append-only encodes; late/early epoch
  ratio ≈ 1.
- BUCKET families — near-dup LSH, k-NN graph: per-epoch cost is
  O(batch · live-bucket-members), and bucket occupancy grows with the
  index at fixed banding depth — the curve is expected to climb
  SUB-LINEARLY in index size (the deepen-bands lever is the production
  control); what must NOT appear is super-linear growth (a pair-
  quadratic regression).

Epoch content derives from the real sf0.1 corpus, perturbed per epoch
(vec_id/doc_id offsets; embeddings np.roll-ed per epoch so cross-epoch
vectors are decorrelated while each epoch keeps the corpus's own
pairwise geometry; documents get a per-epoch token) — scaled content,
no planted duplicate pathology (the scale_probe discipline).

One pass per family (a curve, not a ratchet); run ALONE — host
contention skews per-epoch times.

Usage: python tools/idx_scale_curve.py [sf_dir] [n_epochs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

N_EPOCHS_DEFAULT = 8


def stage_embedding_epochs(sf_dir: str, n_epochs: int) -> str:
    """n_epochs equal-size insert-only chunks: epoch i is the full
    corpus with vec_id offset i·10^7 and embeddings rolled i dims."""
    base_pdf = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    stage = tempfile.mkdtemp(prefix="spark_graft_idxcurve_v_")
    mt = None
    for i in range(n_epochs):
        out = pd.DataFrame(
            {
                "side": "V",
                "vec_id": base_pdf["vec_id"] + i * 10_000_000,
                "embedding": [
                    np.roll(np.asarray(v, dtype="float32"), i)
                    for v in base_pdf["embedding"]
                ],
                "label": base_pdf["label"].astype("int32"),
            }
        )
        p = os.path.join(stage, f"part-{i}.parquet")
        out.to_parquet(p, index=False)
        mt = mt or os.stat(p).st_mtime
        os.utime(p, (mt + i, mt + i))
    return stage


def stage_document_epochs(sf_dir: str, n_epochs: int) -> str:
    """n_epochs equal-size insert-only chunks of the documents corpus,
    doc_id offset + per-epoch token (replicate_docs's perturbation)."""
    base_pdf = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    stage = tempfile.mkdtemp(prefix="spark_graft_idxcurve_d_")
    mt = None
    for i in range(n_epochs):
        out = base_pdf.copy()
        out["doc_id"] = out["doc_id"] + i * 10_000_000
        out["text"] = out["text"] + f" rep{i}"
        out.insert(0, "side", "D")
        p = os.path.join(stage, f"part-{i}.parquet")
        out.to_parquet(p, index=False)
        mt = mt or os.stat(p).st_mtime
        os.utime(p, (mt + i, mt + i))
    return stage


def epoch_times(q) -> list[tuple[int, int, float]]:
    """(batchId, numInputRows, triggerExecution sec) for every non-empty
    batch, read from the query's own progress log."""
    rows = []
    for p in q.recentProgress:
        d = json.loads(p.json) if hasattr(p, "json") else p
        if d.get("numInputRows", 0) > 0:
            rows.append(
                (
                    d["batchId"],
                    d["numInputRows"],
                    d["durationMs"].get("triggerExecution", 0) / 1000.0,
                )
            )
    return sorted(rows)


def run_family(spark, label: str, start_fn, expect: str) -> dict:
    t0 = time.perf_counter()
    q = start_fn()
    q.processAllAvailable()
    times = epoch_times(q)
    q.stop()
    q.awaitTermination()
    wall = time.perf_counter() - t0
    # warmup epochs 0-1 carry JVM/codegen + (PQ/SQ8) training; compare
    # the steady-state head (epochs 2-3) to the grown-index tail (last 2)
    head = [t for _, _, t in times[2:4]]
    tail = [t for _, _, t in times[-2:]]
    ratio = (sum(tail) / len(tail)) / (sum(head) / len(head)) if head and tail else 0.0
    growth = (times[-1][0] + 1) / (times[2][0] + 1) if len(times) > 3 else 1.0
    if expect == "flat":
        verdict = "FLAT-OK" if ratio <= 1.8 else "GROWING"
    else:  # bucket families: sub-linear in index growth is the pass bar
        verdict = "SUBLINEAR-OK" if ratio <= growth else "SUPER-LINEAR"
    per_epoch = ", ".join(f"{t:.1f}" for _, _, t in times)
    print(
        f"{label:14s} epochs={len(times)} wall={wall:6.1f}s"
        f" per-epoch=[{per_epoch}] tail/head={ratio:4.2f}x"
        f" (index grew {growth:.1f}x)  {verdict}"
    )
    return {"family": label, "ratio": round(ratio, 3), "verdict": verdict,
            "per_epoch_sec": [round(t, 2) for _, _, t in times]}


def main() -> None:
    from gmall_flink_200621_spark.session import get_spark
    from gmall_flink_200621_spark.streaming import ingest as I

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else N_EPOCHS_DEFAULT
    spark = get_spark("idx_scale_curve")
    v_stage = stage_embedding_epochs(sf_dir, n_epochs)
    d_stage = stage_document_epochs(sf_dir, n_epochs)

    fams = [
        ("bm25", "flat", lambda: I.run_bm25_index_stream(
            spark, sf_dir, name="csv_bm", stage_dir=d_stage, cdc=True)),
        ("flat_vec", "flat", lambda: I.run_flat_index_cdc_stream(
            spark, sf_dir, name="csv_fl", stage_dir=v_stage)),
        ("pq", "flat", lambda: I.run_pq_index_cdc_stream(
            spark, sf_dir, name="csv_pq", stage_dir=v_stage)),
        ("sq8", "flat", lambda: I.run_sq8_index_cdc_stream(
            spark, sf_dir, name="csv_s8", stage_dir=v_stage)),
        ("neardup_lsh", "bucket", lambda: I.run_neardup_cdc_stream(
            spark, sf_dir, name="csv_nd", stage_dir=d_stage)),
        ("knn_graph", "bucket", lambda: I.run_knn_graph_cdc_stream(
            spark, sf_dir, name="csv_kg", stage_dir=v_stage)),
    ]
    results = []
    for label, expect, fn in fams:
        results.append(run_family(spark, label, fn, expect))
    print(json.dumps({"sf_dir": sf_dir, "n_epochs": n_epochs, "families": results}))
    shutil.rmtree(v_stage, ignore_errors=True)
    shutil.rmtree(d_stage, ignore_errors=True)


if __name__ == "__main__":
    main()
