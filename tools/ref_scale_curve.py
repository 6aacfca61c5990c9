"""Reference-pipeline scale-up curve (r11 verdict item 8): run the 11
reference pipelines once at sf0.1 and once at a synthesized "sf1" — the
scale_probe methodology (10× perturbed replication: key cardinality and
the time axis scale, no planted duplicate pathology) materialized as a
real parquet directory so the pipelines run UNCHANGED through their own
loaders. Prints sec/query at both scales, the ratio, and a linearity
verdict (ratio ≤ ~10 = at-worst-linear in rows; well under 10 = fixed
job overhead still amortizing — both are passes; super-linear ratios
flag a pair-quadratic or driver-bound operator).

One pass per query by design (this is a curve, not a ratchet — the
per-round ratchet is bench.py); run alone, host contention skews it.

Usage: python tools/ref_scale_curve.py [sf0.1_dir] [k]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

PIPELINES = [
    "hot_items",
    "hot_urls",
    "page_view",
    "uv_exact",
    "market_by_channel",
    "ad_clicks_filtered",
    "login_fail",
    "order_timeout",
    "order_receipt_join",
    "dedup_minhash_lsh",
]


def build_synth_dir(spark, sf_dir: str, k: int) -> str:
    """Materialize the k×-perturbed tables (events, documents — all the
    reference pipelines read) as parquet; remaining tables copy over so
    any loader probe still resolves."""
    from tools.scale_probe import replicate_docs, replicate_events

    from gmall_flink_200621_spark.sources.loaders import load_table

    out = f"/tmp/spark_graft_sf_synth_k{k}_{os.getuid()}"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for t, rep in (("events", replicate_events), ("documents", replicate_docs)):
        tmp = os.path.join(out, f"_{t}_dir")
        rep(load_table(spark, sf_dir, t), k).coalesce(8).write.parquet(tmp)
        parts = [p for p in os.listdir(tmp) if p.endswith(".parquet")]
        if len(parts) == 1:
            os.replace(os.path.join(tmp, parts[0]), os.path.join(out, f"{t}.parquet"))
            shutil.rmtree(tmp)
        else:
            # loaders accept a directory of part files just as well
            os.replace(tmp, os.path.join(out, f"{t}.parquet"))
    for f in os.listdir(sf_dir):
        dst = os.path.join(out, f)
        if not os.path.exists(dst):
            shutil.copy2(os.path.join(sf_dir, f), dst)
    return out


def main() -> None:
    import __spark_entry__ as entry_mod
    from gmall_flink_200621_spark.session import get_spark
    from gmall_flink_200621_spark.sources.loaders import load_table
    from gmall_flink_200621_spark.streaming.late_data import run_hot_urls_late_stream

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ref_scale_curve")
    queries = entry_mod.queries()
    synth = build_synth_dir(spark, sf_dir, k)

    def release() -> None:
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(False)

    # warm both scans + JVM outside the timed region
    for d in (sf_dir, synth):
        load_table(spark, d, "events").count()
        load_table(spark, d, "documents").count()

    print(f"{'pipeline':28s} {'sf0.1':>8s} {f'{k}x':>8s} {'ratio':>7s}  verdict")
    rows = []
    for name in PIPELINES:
        ts = {}
        for tag, d in (("small", sf_dir), ("big", synth)):
            t0 = time.perf_counter()
            queries[name](spark, d).write.format("noop").mode("overwrite").save()
            ts[tag] = time.perf_counter() - t0
            release()
        r = ts["big"] / ts["small"]
        verdict = "LINEAR-OK" if r <= k * 1.2 else "SUPER-LINEAR"
        rows.append((name, ts["small"], ts["big"], r, verdict))
        print(f"{name:28s} {ts['small']:8.2f} {ts['big']:8.2f} {r:6.1f}x  {verdict}")

    # the streaming heavyweight: staged replay end-to-end at both scales
    ts = {}
    for tag, d in (("small", sf_dir), ("big", synth)):
        t0 = time.perf_counter()
        q = run_hot_urls_late_stream(spark, d, query_name=f"curve_{tag}")
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
        ts[tag] = time.perf_counter() - t0
        release()
    r = ts["big"] / ts["small"]
    verdict = "LINEAR-OK" if r <= k * 1.2 else "SUPER-LINEAR"
    print(
        f"{'hot_urls_late_stream':28s} {ts['small']:8.2f} {ts['big']:8.2f}"
        f" {r:6.1f}x  {verdict}"
    )
    shutil.rmtree(synth, ignore_errors=True)


if __name__ == "__main__":
    main()
