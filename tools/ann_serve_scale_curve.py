"""ANN SERVING-time scale curve: what a query costs as the CORPUS grows,
with the query load held fixed — the claim that separates the ANN ladder
rungs at 100 TB. Graph construction / index build happen OUTSIDE the
timed region (they are maintenance, measured by tools/idx_scale_curve.py
on the stream side); the timed region is search only:

- brute        — per-query corpus scan: expected ~linear in N
- ivf          — the BATCH operator, which is build+serve in one plan
                 (its coarse assignment is an in-operator corpus pass;
                 the serve-only IVF path at scale is the CDC-maintained
                 index family reading stored lists): expected ~linear
- graph_ann    — coarse-quantizer entry + fixed beam·hops·deg walk over
                 a PREBUILT graph: entry scores only the centroid
                 table, the walk budget is independent of N — expected
                 strongly sublinear. (The r13 first cut joined probed
                 lists' members via a corpus×centroid argmax AT SERVE
                 TIME — this tool measured it 46× at 40× corpus, and the
                 entry was redesigned to seed at the centroids
                 themselves: 2.8× at 40× corpus, recall 0.88 via the
                 deg-8 walk graph.)

Corpus scaling reuses the idx_scale_curve perturbation (vec_id offsets +
np.roll per replica: decorrelated replicas, per-replica geometry
preserved, no planted duplicate pathology). The query set is held at a
FIXED size via query_mod = 100·k (1/100k of a k× corpus = the base
query count, uniform across replicas).

Prebuilt inputs are parquet round-tripped so the timed plans start from
clean scans — no lineage back into construction.

One pass per (method, k) — a curve, not a ratchet; run ALONE.

Usage: python tools/ann_serve_scale_curve.py [sf_dir] [k]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def replicated_embeddings(spark, sf_dir: str, k: int, out_dir: str) -> str:
    base = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    parts = []
    for i in range(k):
        parts.append(
            pd.DataFrame(
                {
                    "vec_id": base["vec_id"] + i * 10_000_000,
                    "embedding": [
                        np.roll(np.asarray(v, dtype="float32"), i)
                        for v in base["embedding"]
                    ],
                    "label": base["label"].astype("int32"),
                }
            )
        )
    path = os.path.join(out_dir, f"emb_k{k}.parquet")
    pd.concat(parts, ignore_index=True).to_parquet(path, index=False)
    return path


def main() -> None:
    from gmall_flink_200621_spark.operators.similarity import (
        _idot,
        graph_ann_search,
        knn_brute,
        knn_graph,
        knn_ivf,
        quantize,
    )
    from gmall_flink_200621_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ann_serve_scale_curve")
    work = tempfile.mkdtemp(prefix="spark_graft_annserve_")

    def release() -> None:
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(False)

    results = {}
    for kk in (1, k):
        emb_path = replicated_embeddings(spark, sf_dir, kk, work)
        emb = spark.read.parquet(emb_path)
        n = emb.count()  # warm the scan outside every timed region
        qmod = 100 * kk  # fixed query count across scales

        # prebuild the graph OUTSIDE the timed region, round-tripped
        # through parquet so the serve plan scans a leaf
        edges_path = os.path.join(work, f"edges_k{kk}.parquet")
        knn_graph(emb).select("src_id", "nbr_id").write.mode("overwrite").parquet(
            edges_path
        )
        edges = spark.read.parquet(edges_path)
        e = (
            emb.select("vec_id", quantize(F.col("embedding")).alias("q"))
            .withColumn("n2", _idot(F.col("q"), F.col("q")))
        )
        release()

        timed = {}
        for label, fn in (
            ("brute", lambda: knn_brute(emb, query_mod=qmod)),
            ("ivf", lambda: knn_ivf(emb, query_mod=qmod)),
            ("graph_ann", lambda: graph_ann_search(e, edges, query_mod=qmod)),
        ):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            timed[label] = time.perf_counter() - t0
            release()
        results[kk] = (n, timed)
        print(
            f"k={kk} N={n} |Q|={n // qmod} "
            + " ".join(f"{m}={t:.2f}s" for m, t in timed.items())
        )

    n1, t1 = results[1]
    nk, tk = results[k]
    print(f"\n{'method':10s} {'1x':>7s} {f'{k}x':>7s} {'ratio':>7s}  shape (corpus {nk / n1:.0f}x)")
    for m in t1:
        r = tk[m] / t1[m]
        shape = (
            "CORPUS-BOUND" if r > (nk / n1) * 0.5
            else "SUBLINEAR" if r > 1.8
            else "SERVE-FLAT"
        )
        print(f"{m:10s} {t1[m]:7.2f} {tk[m]:7.2f} {r:6.1f}x  {shape}")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
