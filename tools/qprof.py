"""Per-query profiler for the optimization rounds.

    python tools/qprof.py <query> [query ...] [--sf=/root/testdata/sf0.1]
        [--passes=3] [--plandir=plans/r13] [--suffix=before]

For each query, measures with the SAME session shape as bench.py:
  - build_s: wall time of the plan-constructing Python call (trainer
    loops, collects and sidecar writes happen here — bench.py charges
    them to the query too, inside the timed region)
  - exec_s:  wall time of the noop-sink materialization (min over passes)
  - jobs/stages: scheduler work for execution PASS 1 ONLY (the job group
    is set around the noop sink, so trainer-loop jobs issued during
    build — before setJobGroup — are not counted)
and optionally writes `<plandir>/<query>_<suffix>.txt` with the
formatted physical plan (the judge-facing evidence files).

Caches are released between queries exactly like bench.py so numbers
compose with BENCH_DETAIL baselines.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = dict(
        f[2:].split("=", 1) if "=" in f else (f[2:], "1") for f in sys.argv[1:] if f.startswith("--")
    )
    sf_dir = flags.get("sf", "/root/testdata/sf0.1")
    passes = int(flags.get("passes", "3"))
    plandir = flags.get("plandir")
    suffix = flags.get("suffix", "before")

    import __spark_entry__ as entry_mod
    from gmall_flink_200621_spark.session import get_spark
    from gmall_flink_200621_spark.schemas import TESTDATA_TABLES
    from gmall_flink_200621_spark.sources.loaders import load_table

    spark = get_spark("qprof")
    queries = entry_mod.queries()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            load_table(spark, sf_dir, t).count()

    def release_caches() -> None:
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(False)

    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in args:
        if name not in queries:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        rec = {}
        samples = []
        builds = []
        for i in range(passes):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t1 = time.perf_counter()
            builds.append(round(t1 - t0, 3))
            if i == 0:
                if plandir:
                    os.makedirs(plandir, exist_ok=True)
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                    with open(os.path.join(plandir, f"{name}_{suffix}.txt"), "w") as f:
                        f.write(plan)
                spark.sparkContext.setJobGroup(f"qprof_{name}", name)
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            if i == 0:
                spark.sparkContext.setJobGroup("", "")
                jids = tracker.getJobIdsForGroup(f"qprof_{name}")
                stages = sum(
                    len(tracker.getJobInfo(j).stageIds) for j in jids if tracker.getJobInfo(j)
                )
                rec["jobs"] = len(jids)
                rec["stages"] = stages
            samples.append(round(t3 - t2, 3))
            release_caches()
        rec["build_s"] = min(builds)
        rec["build_all"] = builds
        rec["exec_s"] = min(samples)
        rec["exec_all"] = samples
        # min(build+exec) per pass — comparable to bench.py's per-pass time
        rec["total_s"] = round(min(b + x for b, x in zip(builds, samples)), 3)
        out[name] = rec
        print(name, json.dumps(rec), flush=True)
    print("TOTALS", json.dumps({n: r["total_s"] for n, r in out.items()}))


if __name__ == "__main__":
    main()
