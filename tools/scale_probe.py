"""Empirical scale-up probe: run representative operator classes on k×
replicated sf0.1 inputs (k = 1, 4, 10) and report the fitted scaling
exponent alpha in t ≈ c·n^alpha per query.

The claim this tool checks is the one SCALING.md makes qualitatively:
every operator's cost is scan/shuffle-linear (alpha ≈ 1) — not
pair-quadratic, not driver-bound. Replication is PERTURBED so the scaled
input has scaled *content*, not k clones of the same keys:

- events: event_id/user_id offset per replica (key cardinality scales),
  ts shifted by 90 days per replica (window count scales);
- documents: doc_id offset and a per-replica token appended to the text
  (shingle/minhash universes scale instead of planting k-way dup
  clusters, which would quadratically inflate the TRUE pair answer —
  that would measure the data's pathology, not the engine);

knn_brute is intentionally excluded: its query set is a fixed fraction
of the corpus, so its COMPUTE is Θ(N²/query_mod) by problem statement —
the scale path for ANN is the bucketed LSH/IVF pair (see SCALING.md).

Usage: python tools/scale_probe.py [sf_dir] — prints one line per
(query, k) plus the fitted alpha; run alone (host contention skews it).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

KS = (1, 10, 40)  # big enough that work outgrows local fixed job overhead


def replicate_events(e: DataFrame, k: int) -> DataFrame:
    parts = []
    for i in range(k):
        parts.append(
            e.select(
                (F.col("event_id") + i * 1_000_000_000).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {i * 90} DAYS")).alias("ts"),
                (F.col("user_id") + i * 1_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

def replicate_docs(d: DataFrame, k: int) -> DataFrame:
    parts = []
    for i in range(k):
        parts.append(
            d.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" rep{i}")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    from gmall_flink_200621_spark.operators.dedup import dedup_minhash_lsh
    from gmall_flink_200621_spark.operators.textops import (
        importance_weights,
        quality_gopher,
    )
    from gmall_flink_200621_spark.session import get_spark
    from gmall_flink_200621_spark.sources.loaders import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe")
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    events.count(), docs.count()  # warm the scans + JVM

    def page_view_k(k: int) -> DataFrame:
        e = replicate_events(events, k)
        return (
            e.filter(F.col("event_type") == "view")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("pv"))
        )

    def sessionize_k(k: int) -> DataFrame:
        from pyspark.sql import Window

        e = replicate_events(events, k).select(
            "user_id", F.col("ts").cast("long").alias("ts_s"), "event_id"
        )
        w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
        marked = e.withColumn(
            "new_s",
            F.when(F.col("ts_s") - F.lag("ts_s").over(w) > 1800, 1).otherwise(
                F.when(F.lag("ts_s").over(w).isNull(), 1).otherwise(0)
            ),
        )
        return (
            marked.withColumn(
                "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
            )
            .groupBy("user_id", "sid")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    probes = {
        "map (quality_gopher)": lambda k: quality_gopher(replicate_docs(docs, k)),
        "window agg (page_view)": page_view_k,
        "sort window (sessionize)": sessionize_k,
        "explode+broadcast (importance_weights)": lambda k: importance_weights(
            replicate_docs(docs, k)
        ),
        "bucket self-join (minhash_lsh)": lambda k: dedup_minhash_lsh(
            replicate_docs(docs, k)
        ),
    }

    def sessionize_skewed(k: int) -> DataFrame:
        # planted hot key: ~97% of events collapse onto ONE user — the
        # adversarial case for the per-user sort window; AQE skew
        # handling + in-partition sort keep it from wedging one core
        from pyspark.sql import Window

        e = replicate_events(events, k).select(
            F.when(F.col("event_id") % 32 != 0, F.lit(0)).otherwise(F.col("user_id")).alias(
                "user_id"
            ),
            F.col("ts").cast("long").alias("ts_s"),
            "event_id",
        )
        w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
        marked = e.withColumn(
            "new_s",
            F.when(F.col("ts_s") - F.lag("ts_s").over(w) > 1800, 1).otherwise(
                F.when(F.lag("ts_s").over(w).isNull(), 1).otherwise(0)
            ),
        )
        return (
            marked.withColumn(
                "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
            )
            .groupBy("user_id", "sid")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    probes["sort window SKEWED 97%-one-key"] = sessionize_skewed

    def pagerank_synthetic(k: int) -> DataFrame:
        # pure iteration scaling, isolated from knn_graph's bucket
        # density (which has its own banding-depth knob): a synthetic
        # 3-out-regular digraph over k×5000 vertices built relationally.
        # Expected alpha ≈ 1 — per iteration one |V| join + one |E| agg.
        from gmall_flink_200621_spark.operators.graph import pagerank

        n = k * 5000
        verts = spark.range(n).select(F.col("id").alias("vec_id"))
        edges = verts.select(
            F.col("vec_id").alias("src_id"),
            F.explode(
                F.array(
                    *[
                        (F.col("vec_id") * 7 + F.lit(off)) % n
                        for off in (1, 3_001, 17)
                    ]
                )
            ).alias("nbr_id"),
        ).where(F.col("src_id") != F.col("nbr_id"))
        return pagerank(edges, verts)

    probes["iterative joins (pagerank 3-regular)"] = pagerank_synthetic

    def rfm_chain_k(k: int) -> DataFrame:
        # the decile/pareto/gini/rfm consumer shape at k× orders: one
        # per-customer aggregate (the grain contract the ranking
        # primitive's materialization depends on), then THREE chained
        # global_rank_ntile passes (rfm_segments' exact structure).
        # Expected alpha ≈ 1: each pass is a range shuffle + pid window
        # over |customers| rows; the materialized checkpoint is the
        # aggregate-grain frame, never the fact rows (bytes reported
        # separately below).
        from gmall_flink_200621_spark.operators.ranking import global_rank_ntile

        orders = load_table(spark, sf_dir, "orders")
        parts = [
            orders.select(
                (F.col("o_custkey") + i * 10_000_000).alias("cust"),
                "o_totalprice",
                "o_orderdate",
            )
            for i in range(k)
        ]
        o = parts[0]
        for p in parts[1:]:
            o = o.unionByName(p)
        agg = o.groupBy("cust").agg(
            F.max("o_orderdate").alias("r"),
            F.count(F.lit(1)).alias("f"),
            F.sum("o_totalprice").alias("m"),
        )
        out = agg
        for metric, nm in (("r", "rt"), ("f", "ft"), ("m", "mt")):
            out = (
                global_rank_ntile(out, [F.col(metric), F.col("cust")], 5)
                .withColumnRenamed("ntile", nm)
                .drop("global_rank")
            )
        return out

    probes["chained ntile x3 (rfm shape)"] = rfm_chain_k

    ranking_only = "--ranking-only" in sys.argv
    if ranking_only:
        probes = {}
    print(f"{'query':42s} " + " ".join(f"t({k}x)" for k in KS) + "   alpha")
    for name, build in probes.items():
        build(1).write.format("noop").mode("overwrite").save()  # codegen warmup
        spark.catalog.clearCache()
        ts = []
        for k in KS:
            best = None
            for _ in range(2):  # min-of-2 damps host bursts
                t0 = time.time()
                build(k).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
                spark.catalog.clearCache()
            ts.append(best)
        alpha = math.log(ts[-1] / ts[0]) / math.log(KS[-1] / KS[0])
        print(
            f"{name:42s} " + " ".join(f"{t:5.2f}" for t in ts) + f"   {alpha:5.2f}"
        )

    # ---- ranking-primitive materialization probes (r11 verdict #5) ----
    # (a) the localCheckpoint bytes must track the AGGREGATE-grain frame
    # (|customers| rows), not the replicated fact rows — measured from
    # the live RDD storage infos right after an action, before cleanup;
    # (b) results must be partition-count-invariant: the r11 incident
    # class was AQE-coalesce-dependent boundary sampling, so the chain
    # re-runs under different shuffle-partition counts, npartitions and
    # advisory sizes, and the full-result hash must not move.
    def _all_storage_bytes() -> int:
        sc = spark.sparkContext._jsc.sc()
        return sum(
            i.memSize() + i.diskSize() for i in sc.getRDDStorageInfo()
        )

    def _chain_hash(k: int) -> int:
        df = rfm_chain_k(k)
        cols = [F.col(c).cast("string") for c in df.columns]
        # pmod before sum: raw xxhash64 values overflow a long sum under
        # ANSI mode; 2^31-bounded terms keep the sum < 2^53 at any k here
        return df.select(
            F.sum(F.pmod(F.xxhash64(*cols), F.lit(1 << 31))).alias("h")
        ).first()["h"]

    def _release_all() -> None:
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(False)

    print("\nranking-primitive checkpoint bytes (aggregate-grain contract):")
    ckpt = {}
    _release_all()  # the timing loop's last run leaves its blocks live
    for k in KS:
        df = rfm_chain_k(k)
        n_agg = df.count()  # action materializes the lazy checkpoints
        ckpt[k] = _all_storage_bytes()
        print(
            f"  k={k:3d}  agg rows={n_agg:9d}  checkpoint+persist bytes="
            f"{ckpt[k]/2**20:8.2f} MiB  ({ckpt[k]/max(n_agg,1):6.1f} B/row)"
        )
        _release_all()
    print("  verdict: bytes/row should be ~flat across k (frame-proportional)")

    print("\nranking-primitive partition-count invariance (k=10):")
    base = None
    for tag, conf in (
        ("shuffle=32 advisory=64m", {"spark.sql.shuffle.partitions": "32",
                                     "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m"}),
        ("shuffle=7  advisory=64m", {"spark.sql.shuffle.partitions": "7",
                                     "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m"}),
        ("shuffle=131 advisory=1m", {"spark.sql.shuffle.partitions": "131",
                                     "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m"}),
    ):
        prev = {kk: spark.conf.get(kk, None) for kk in conf}
        for kk, vv in conf.items():
            spark.conf.set(kk, vv)
        try:
            h = _chain_hash(10)
        finally:
            for kk, vv in prev.items():
                if vv is not None:
                    spark.conf.set(kk, vv)
        ok = "" if base is None or h == base else "  <-- DIVERGED"
        base = base if base is not None else h
        print(f"  {tag}: hash={h}{ok}")
        _release_all()
    print("  verdict: all hashes identical = boundary sampling pinned")


if __name__ == "__main__":
    main()
