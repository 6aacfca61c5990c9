"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect, no output-side pruning shortcuts like count()).
"""

from __future__ import annotations

import json
import os
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
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from gmall_flink_200621_spark.session import get_spark

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

    # INTERLEAVED passes: steady-state timing resilient to transient host
    # contention (observed 5-40x stalls that hit whatever queries run
    # during a burst; back-to-back repeats of one query land both runs
    # inside the same burst, interleaved passes don't). Two statistics per
    # query: MIN (the contention-free floor, comparable round-over-round)
    # and MEDIAN of all passes (the typical clean run — robust to a single
    # burst, so round-over-round deltas aren't methodology artifacts).
    N_PASSES = 3
    samples: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(N_PASSES):
        for name in names:
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
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

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": round(sum(per_query.values()), 3),
                "unit": "sec",
                "queries": per_query,
                "value_median": round(sum(per_query_median.values()), 3),
                "queries_median": per_query_median,
                "passes": N_PASSES,
                # the stream runs fewer passes (startup-dominated); its
                # 'median' is the mean of two samples — reported explicitly
                # so the envelope stats aren't misread as min/median-of-3
                "stream_passes": len(stream_samples),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
