"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line as the LAST stdout line:
  {"metric": "bench_total", "value": N, "unit": "sec", "value_median": M,
   "n": ..., "sf": ..., "detail": "BENCH_DETAIL_r{N}.json", "queries": {...}}

The driver captures only the final ~2000 characters of stdout, so the
full per-query min/median maps (104+ entries, ~5 KB — the reason the
driver recorded `parsed: null` for BENCH_r04/r05) are written to a
committed `BENCH_DETAIL_r{N}.json` instead; the stdout line carries the
totals plus a small headline subset of `queries` (the 11 reference
pipelines) and stays well under the capture limit.
`tools/bench_compare.py` reads either format.

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect, no output-side pruning shortcuts like count()).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: every execution shape the engine exercises —
# sliding/tumbling window aggs, top-N, stateful-rewrite CEP, interval join,
# star-schema joins/aggs, dedup (inverted index + LSH), ANN, text stats
BENCH_QUERIES = [
    "hot_items",
    "hot_urls",
    "page_view",
    "uv_exact",
    "market_by_channel",
    "ad_clicks_filtered",
    "login_fail",
    "order_timeout",
    "order_receipt_join",
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q13",
    "tpch_q18",
    "revenue_by_nation",
    "top_customers",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_stats",
    "rolling_fingerprint",
    "knn_brute",
    "knn_lsh",
    "knn_ivf",
    "knn_ivf_trained",
    "knn_rp",
    "knn_pq",
    "knn_pq_rotated",
    "knn_sq8",
    "knn_ivfsq8",
    "knn_ivfpq",
    "knn_ivfpq_residual",
    "knn_ivfpq_refine",
    "knn_lsh_multiprobe",
    "knn_brute_filtered",
    "knn_ivf_filtered",
    "knn_graph_ann",
    "token_counts",
    "corpus_prep",
    "sessionize_native",
    "dedup_clusters",
    "dedup_substring",
    "login_fail_relaxed",
    "browse_abandon",
    "tpch_q2",
    "tpch_q12",
    "tpch_q16",
    "last_click_before_purchase",
    "sales_cube",
    "decontaminate",
    "shingle_novelty",
    "funnel_conversion",
    "retention_cohorts",
    "scd2_snapshot",
    "session_error_overlap",
    "heavy_users",
    "kmeans_embeddings",
    "semdedup",
    "sequence_pack",
    "value_anomalies",
    "value_histogram",
    "doc_chunks",
    "corpus_mixture",
    "active_users_rolling7",
    "pii_scrub",
    "quality_gopher",
    "importance_weights",
    "hard_negatives",
    "perplexity_buckets",
    "tfidf_terms",
    "bm25_search",
    "hybrid_search_rrf",
    "dedup_rate_by_source",
    "source_minhash_setops",
    "bigram_lm_score",
    "sparse_cosine_pairs",
    "embedding_quantize",
    "contamination_matrix",
    "weighted_sample",
    "term_counts_cms",
    "time_to_purchase",
    "first_touch_attribution",
    "sales_grouping_sets",
    "nation_spend_pct_rank",
    "props_variant_stats",
    "sessionize_dynamic_gap",
    "tpch_expectations",
    "corpus_expectations",
    "value_by_weekday",
    "revenue_seasonality",
    "token_entropy",
    "source_divergence",
    "event_type_unpivot",
    "knn_graph",
    "pagerank_knn",
    "perceptron_lang",
    "lang_confusion",
    "embedding_norm_audit",
    "knn_triangles",
    "components_knn",
    "label_propagation_knn",
    "point_in_time_join",
    "skew_audit",
    "join_blowup_audit",
    "transition_matrix",
    "ltv_cohorts",
    "revenue_pareto",
    "attribution_position",
    "fuzzy_part_matches",
    "time_grid_fill",
    "boilerplate_scrub",
    "cluster_aware_split",
    "column_profile",
    "spend_gini",
    "cdc_compaction",
    "tokenizer_fertility",
    "zorder_layout_audit",
    "hilbert_layout_audit",
    "mixture_temperature",
    "unigram_lm_vocab",
    "wordpiece_encode_freq",
    "unigram_encode_freq",
    "rfm_segments",
    "knn_ivfpq_filtered",
    "knn_ivfsq8_filtered",
    "wordpiece_encode",
    "unigram_encode",
]


def _provenance_start() -> dict:
    """Run provenance (r11 verdict item 4): two consecutive rounds of
    byte-flat seconds drift were attributed to ambient host load by
    narrative — record the evidence inside the artifact instead, so a
    cross-round seconds ratio is auditable against the load the run
    actually saw. loadavg is sampled at start and end (bench_compare
    prints both next to the ratio); git SHA + UTC timestamps pin WHICH
    tree produced the committed numbers."""
    import subprocess

    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001 — provenance must never fail the bench
        sha = None
    return {
        "git_sha": sha,
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "cpus": os.cpu_count(),
    }


def main() -> None:
    import __spark_entry__ as entry_mod
    from gmall_flink_200621_spark.session import get_spark

    provenance = _provenance_start()
    spark = get_spark("bench")
    queries = entry_mod.queries()
    names = [n for n in BENCH_QUERIES if n in queries]

    # warm the session (JVM, codegen, parquet footers for every table)
    # outside the timed region so per-query numbers reflect steady state
    from gmall_flink_200621_spark.schemas import TESTDATA_TABLES
    from gmall_flink_200621_spark.sources.loaders import load_table

    for t in TESTDATA_TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            load_table(spark, SF_DIR, t).count()

    def release_caches() -> None:
        """Drop everything any query persisted/localCheckpointed.

        Intra-query persists (dedup shingle frames, dedup_clusters'
        per-iteration localCheckpoints) are execution scaffolding, not
        cross-query caches; leaving them pinned degrades every later
        measurement (observed: 46 queries of accumulation slowed
        pass-2 hot_items 1.2s → 4.3s via storage/GC pressure). Each
        pass pays its own persist cost — that's the honest accounting."""
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(False)

    # Per-query shuffle/spill bytes (VERDICT r08 item #8): wall time at
    # sf0.1 hides memory-scale regressions — a plan that doubles its
    # shuffle volume but stays inside one machine's page cache times the
    # same here and dies at 100×. Collected from the JVM AppStatusStore
    # on pass 1 only (data volumes are deterministic across passes;
    # timing passes stay instrumentation-free). Each query runs under a
    # job group; its stages are the store's NEWEST entries, so the scan
    # stops at the group's oldest stage id and eviction can't bite.
    # The AppStatusStore walk reaches into private JVM internals
    # (statusStore() + stageList$default$N reflection + a newest-first
    # ordering assumption) — fine on the pinned Spark, but a Spark
    # upgrade may rename any of it. Degrade to null-and-warn rather than
    # failing the bench or silently reporting zeros (which a compare
    # would misread as a 100% shuffle improvement); bench_compare treats
    # null/zero-only maps as 'instrumentation unavailable'.
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        _stage_defaults = [
            getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)
        ]
    except Exception as exc:  # noqa: BLE001 — any reflection break degrades alike
        print(f"WARN: shuffle instrumentation unavailable: {exc!r}", file=sys.stderr)
        store = None

    def group_shuffle_metrics(group: str) -> dict[str, int] | None:
        if store is None:
            return None
        tracker = spark.sparkContext.statusTracker()
        stage_ids: set[int] = set()
        for jid in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(jid)
            if info:
                stage_ids.update(info.stageIds)
        out = {"shuffle_write": 0, "shuffle_read": 0, "spill_memory": 0, "spill_disk": 0}
        if not stage_ids:
            return out
        lo = min(stage_ids)
        try:
            sl = store.stageList(None, *_stage_defaults)  # newest-first
            for i in range(sl.size()):
                s = sl.apply(i)
                sid = s.stageId()
                if sid < lo:
                    break
                if sid in stage_ids:
                    out["shuffle_write"] += s.shuffleWriteBytes()
                    out["shuffle_read"] += s.shuffleReadBytes()
                    out["spill_memory"] += s.memoryBytesSpilled()
                    out["spill_disk"] += s.diskBytesSpilled()
        except Exception as exc:  # noqa: BLE001
            print(
                f"WARN: shuffle metrics failed for {group}: {exc!r}", file=sys.stderr
            )
            return None
        return out

    # INTERLEAVED passes: steady-state timing resilient to transient host
    # contention (observed 5-40x stalls that hit whatever queries run
    # during a burst; back-to-back repeats of one query land both runs
    # inside the same burst, interleaved passes don't). Two statistics per
    # query: MIN (the contention-free floor, comparable round-over-round)
    # and MEDIAN of all passes (the typical clean run — robust to a single
    # burst, so round-over-round deltas aren't methodology artifacts).
    N_PASSES = 3
    samples: dict[str, list[float]] = {name: [] for name in names}
    shuffle_bytes: dict[str, dict[str, int]] = {}
    for pass_i in range(N_PASSES):
        for name in names:
            instrument = pass_i == 0
            if instrument:
                spark.sparkContext.setJobGroup(f"bench_{name}", f"bench pass-1 {name}")
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            if instrument:
                spark.sparkContext.setJobGroup("", "")
                shuffle_bytes[name] = group_shuffle_metrics(f"bench_{name}")
            release_caches()
    import statistics

    per_query = {name: min(s) for name, s in samples.items()}
    per_query_median = {name: statistics.median(s) for name, s in samples.items()}
    # streaming heavyweight: the distributed late-data engine end-to-end
    # (keyed state + parquet delta log), bounded by the staged replay —
    # processAllAvailable() returns once every staged file is consumed.
    # Timed as one pass per round (startup dominates; min of 2 like above).
    from gmall_flink_200621_spark.streaming.late_data import run_hot_urls_late_stream

    stream_samples = []
    for i in range(2):
        t0 = time.perf_counter()
        q = run_hot_urls_late_stream(spark, SF_DIR, query_name=f"bench_late_{i}")
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
        stream_samples.append(time.perf_counter() - t0)
    per_query["hot_urls_late_stream"] = min(stream_samples)
    per_query_median["hot_urls_late_stream"] = statistics.median(stream_samples)

    per_query = {n: round(v, 3) for n, v in per_query.items()}
    per_query_median = {n: round(v, 3) for n, v in per_query_median.items()}

    provenance["ended_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    provenance["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    detail = {
        "provenance": provenance,
        "metric": "bench_total",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "value_median": round(sum(per_query_median.values()), 3),
        "queries_median": per_query_median,
        # pass-1 per-query shuffle/spill byte totals (AppStatusStore) —
        # the memory-scale signal bench_compare.py diffs round-over-round
        "queries_shuffle_bytes": shuffle_bytes,
        "passes": N_PASSES,
        # the stream runs fewer passes (startup-dominated); its
        # 'median' is the mean of two samples — reported explicitly
        # so the envelope stats aren't misread as min/median-of-3
        "stream_passes": len(stream_samples),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # Full per-query maps go to a committed detail file; round number =
    # $SPARK_GRAFT_ROUND, else one past the newest BENCH_r{N}.json the
    # driver has already recorded (bench for round N runs before the
    # driver writes BENCH_rN, so max-existing + 1 is this round).
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        seen = [
            int(m.group(1))
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        rnd = str(max(seen, default=0) + 1)
    detail_name = f"BENCH_DETAIL_r{int(rnd):02d}.json"
    with open(os.path.join(here, detail_name), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    # Compact driver-facing line (LAST stdout line, <2000 chars): totals
    # plus the 11 reference-pipeline headliners so the driver still sees
    # a per-query signal without overflowing its tail capture.
    headliners = [
        "hot_items", "hot_urls", "page_view", "uv_exact", "market_by_channel",
        "ad_clicks_filtered", "login_fail", "order_timeout",
        "order_receipt_join", "dedup_minhash_lsh", "hot_urls_late_stream",
    ]
    compact = {
        "metric": "bench_total",
        "value": detail["value"],
        "unit": "sec",
        "value_median": detail["value_median"],
        "n": len(per_query),
        "passes": N_PASSES,
        "sf": detail["sf"],
        "detail": detail_name,
        # 1-min loadavg at run start/end — the drift-audit headline;
        # full provenance (SHA, UTC stamps, 5/15-min loads) in detail
        "load": [
            provenance["loadavg_start"][0],
            provenance["loadavg_end"][0],
        ],
        "queries": {k: per_query[k] for k in headliners if k in per_query},
    }
    line = json.dumps(compact)
    assert len(line) < 1800, f"compact bench line too long ({len(line)} chars)"
    print(line)


if __name__ == "__main__":
    main()
