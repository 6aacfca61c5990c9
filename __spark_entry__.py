"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes every implemented operator from SURVEY.md §2 as
`(spark, sf_dir) -> DataFrame`; `oracle_sql()` gives the DuckDB-equivalent
SQL for the correctness gate. Implementations live in the
`gmall_flink_200621_spark` package; this module is wiring only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gmall_flink_200621_spark.plans import pipelines as P
from gmall_flink_200621_spark.plans.analytics import ANALYTICS_ORACLES, ANALYTICS_QUERIES
from gmall_flink_200621_spark.plans.oracle import PIPELINE_ORACLES
from gmall_flink_200621_spark.plans.tpch import TPCH_QUERIES
from gmall_flink_200621_spark.plans.tpch_oracle import TPCH_ORACLES
from gmall_flink_200621_spark.plans.extras import EXTRA_ORACLES, EXTRA_QUERIES
from gmall_flink_200621_spark.plans.reference_oracle import REFERENCE_ORACLES
from gmall_flink_200621_spark.plans.reference_parity import REFERENCE_QUERIES
from gmall_flink_200621_spark.plans.training import TRAINING_QUERIES
from gmall_flink_200621_spark.plans.training_oracle import TRAINING_ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (hot_items: sliding-window Top-N) on sf0.001."""
    return P.hot_items(spark, "/root/testdata/sf0.001")


# LRU rotation policy (r05+): the driver's correctness gate checks the FIRST
# 50 entries of queries(). Every registry query has had at least one driver
# green row (r04 verdict), so the ordering goal switched from
# first-certification to FRESHNESS — least-recently-driver-certified first:
#   1. names absent from _LAST_DRIVER_ROUND (new this round) sort first;
#   2. then ascending by the round of the most recent CORRECTNESS_r{N}.json
#      green row, so the stalest certifications re-enter the window and every
#      query cycles through the driver gate every ceil(|registry|/50) rounds
#      (~5 at the round-11 size of 240).
# Maintenance: after each round, bump _LAST_DRIVER_ROUND[name] for every name
# in that round's CORRECTNESS_r{N}.json window.
_LAST_DRIVER_ROUND: dict[str, int] = {
    # ---- round 1 (CORRECTNESS_r01.json) — stalest, r05 window head ----
    **{n: 1 for n in [
        "hot_items", "hot_items_sql", "hot_urls", "page_view", "page_view_salted",
        "uv_exact", "uv_approx", "market_by_channel", "ad_click_by_province",
        "ad_click_blacklist", "ad_clicks_filtered", "login_fail", "login_fail_n3",
        "login_fail_run", "order_timeout", "order_receipt_join",
        "order_receipt_reconcile",
        "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7",
        "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q13", "tpch_q15", "tpch_q17",
        "tpch_q18", "tpch_q19", "tpch_q21", "tpch_q22",
    ]},
    # ---- round 2 ----
    **{n: 2 for n in [
        "doc_fingerprint", "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "minhash_signatures", "simhash_fingerprints", "dedup_simhash",
        "dedup_clusters", "doc_stats", "lang_id", "rolling_fingerprint",
        "customer_running_spend", "revenue_by_nation", "top_customers",
        "sales_rollup", "promo_revenue_share", "order_priority_by_segment",
    ]},
    # ---- round 3 (only the r03 names NOT re-certified in r04) ----
    **{n: 3 for n in [
        "corpus_sample_stratified", "embedding_centroids", "bigram_stats",
        "late_arrival_audit", "user_churn_sets", "funnel_conversion",
        "sales_cube", "spend_deciles", "retention_cohorts",
    ]},
    # ---- round 4 (CORRECTNESS_r04.json, 50/50) — freshest, sorts last ----
    **{n: 4 for n in [
        "heavy_users", "scd2_snapshot", "session_error_overlap", "value_anomalies",
        "value_histogram", "doc_chunks", "corpus_mixture", "pii_scrub",
        "active_users_rolling7", "token_counts", "corpus_prep", "knn_brute",
        "knn_lsh", "knn_ivf", "embedding_dedup", "ref_ad_click_by_province",
        "ref_ad_click_blacklist", "ref_ad_clicks_filtered", "ref_login_fail",
        "ref_order_timeout", "ref_order_receipt_join", "ref_order_receipt_reconcile",
        "sessionize", "sessionize_native", "event_type_pivot", "value_percentiles",
        "value_quantile_sketch", "props_extract_stats", "uv_sketch_rollup",
        "login_fail_relaxed", "last_click_before_purchase", "browse_abandon",
        "tpch_q2", "tpch_q11", "tpch_q12", "tpch_q14", "tpch_q16", "tpch_q20",
        "kmeans_embeddings", "semdedup", "sequence_pack", "dedup_substring",
        "doc_repetition", "dedup_containment", "corpus_profile", "corpus_sample",
        "corpus_split", "decontaminate", "shingle_novelty", "top_terms",
    ]},
    # ---- round 5 (CORRECTNESS_r05.json, 49/50 + bpe rows-only) ----
    # Overrides any earlier entry by merge order; the r06 window is then the
    # never-driver-certified names (ltv_cohorts/revenue_pareto from late r05
    # plus the six queries added in r06) + the stalest r01/r02 names.
    **{n: 5 for n in [
        "quality_gopher", "importance_weights", "hard_negatives",
        "perplexity_buckets", "tfidf_terms", "embedding_quantize",
        "contamination_matrix", "weighted_sample", "dedup_eval",
        "term_counts_cms", "bpe_merges", "split_leakage_audit",
        "duplicate_cluster_sizes", "token_entropy", "source_divergence",
        "knn_graph", "pagerank_knn", "perceptron_lang", "lang_confusion",
        "embedding_norm_audit", "bm25_search", "hybrid_search_rrf",
        "dedup_rate_by_source", "knn_triangles", "components_knn",
        "label_propagation_knn", "cluster_aware_split", "boilerplate_scrub",
        "bigram_lm_score", "sparse_cosine_pairs", "time_to_purchase",
        "nation_spend_pct_rank", "props_variant_stats",
        "sessionize_dynamic_gap", "tpch_expectations", "event_type_unpivot",
        "fuzzy_part_matches", "time_grid_fill", "corpus_expectations",
        "first_touch_attribution", "sales_grouping_sets", "value_by_weekday",
        "revenue_seasonality", "column_profile", "rfm_segments",
        "point_in_time_join", "skew_audit", "attribution_position",
        "join_blowup_audit", "transition_matrix",
    ]},
    # ---- round 6 (CORRECTNESS_r06.json, 50/50) — freshest, sorts last ----
    # The r07 window is then any never-driver-certified additions plus the
    # stalest r02/r03/r04 names (minhash_signatures .. the r04 head).
    **{n: 6 for n in [
        "knn_ivf_trained", "knn_rp", "tokenizer_fertility",
        "source_minhash_setops", "ltv_cohorts", "revenue_pareto", "spend_gini",
        "cdc_compaction", "hot_items", "hot_items_sql", "hot_urls", "page_view",
        "page_view_salted", "uv_exact", "uv_approx", "market_by_channel",
        "ad_click_by_province", "ad_click_blacklist", "ad_clicks_filtered",
        "login_fail", "login_fail_n3", "login_fail_run", "order_timeout",
        "order_receipt_join", "order_receipt_reconcile",
        "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7",
        "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q13", "tpch_q15", "tpch_q17",
        "tpch_q18", "tpch_q19", "tpch_q21", "tpch_q22",
        "customer_running_spend", "revenue_by_nation", "top_customers",
        "sales_rollup", "promo_revenue_share", "order_priority_by_segment",
        "doc_fingerprint", "dedup_exact", "dedup_ngram_jaccard",
    ]},
    # ---- round 7 (CORRECTNESS_r07.json, 50/50) — freshest, sorts last ----
    # The r08 window is then any never-driver-certified additions plus the
    # stalest r04/r05 names (heavy_users .. the r05 quality/graph block).
    **{n: 7 for n in [
        "corpus_stats_stream_view", "knn_pq", "knn_ivfpq", "mixture_temperature",
        "ann_eval", "knn_pq_index_view", "cdc_stream_view", "scd2_stream_view",
        "zorder_layout_audit", "hilbert_layout_audit", "dedup_minhash_lsh",
        "minhash_signatures", "simhash_fingerprints", "dedup_simhash",
        "dedup_clusters", "doc_stats", "lang_id", "rolling_fingerprint",
        "corpus_sample_stratified", "embedding_centroids", "bigram_stats",
        "late_arrival_audit", "user_churn_sets", "funnel_conversion",
        "sales_cube", "spend_deciles", "retention_cohorts", "login_fail_relaxed",
        "last_click_before_purchase", "browse_abandon",
        "tpch_q2", "tpch_q11", "tpch_q12", "tpch_q14", "tpch_q16", "tpch_q20",
        "kmeans_embeddings", "semdedup", "sequence_pack", "dedup_substring",
        "token_counts", "corpus_prep", "doc_repetition", "dedup_containment",
        "corpus_profile", "corpus_sample", "corpus_split", "decontaminate",
        "shingle_novelty", "top_terms",
    ]},
    # ---- round 8 (CORRECTNESS_r08.json, 50/50) — freshest, sorts last ----
    # The r09 window is then any never-driver-certified additions plus the
    # stalest r05 names (the quality/graph/search block) and early-r06 rows.
    **{n: 8 for n in [
        "knn_ivfpq_residual", "pagerank_stream_view", "dedup_clusters_stream_view",
        "knn_brute", "knn_lsh", "knn_ivf", "embedding_dedup", "doc_chunks",
        "corpus_mixture", "pii_scrub", "ref_ad_click_by_province",
        "ref_ad_click_blacklist", "ref_ad_clicks_filtered", "ref_login_fail",
        "ref_order_timeout", "ref_order_receipt_join",
        "ref_order_receipt_reconcile", "sessionize", "sessionize_native",
        "event_type_pivot", "value_percentiles", "value_quantile_sketch",
        "props_extract_stats", "uv_sketch_rollup", "heavy_users",
        "scd2_snapshot", "session_error_overlap", "value_anomalies",
        "value_histogram", "active_users_rolling7", "quality_gopher",
        "importance_weights", "hard_negatives", "perplexity_buckets",
        "tfidf_terms", "embedding_quantize", "contamination_matrix",
        "weighted_sample", "dedup_eval", "term_counts_cms", "bpe_merges",
        "split_leakage_audit", "duplicate_cluster_sizes", "token_entropy",
        "source_divergence", "knn_graph", "pagerank_knn", "perceptron_lang",
        "lang_confusion", "embedding_norm_audit",
    ]},
    # ---- round 9 (CORRECTNESS_r09.json, 50/50) — freshest, sorts last ----
    # The r10 window is then any never-driver-certified additions plus the
    # stalest r05/r06 names (the r05 tail and the r06 head).
    **{n: 9 for n in [
        "knn_lsh_multiprobe", "knn_sq8", "knn_ivfsq8", "knn_ivfpq_refine",
        "bpe_merges_sampled", "unigram_lm_vocab", "wordpiece_vocab",
        "wordpiece_vocab_sampled", "wordpiece_encode",
        "knn_pq_index_refine_view", "order_wide_stream_view",
        "order_wide_delete_stream_view", "revenue_by_cust_stream_view",
        "order_wide_purged_stream_view", "knn_sq8_index_view",
        "uv_sketch_stream_view", "bm25_search", "hybrid_search_rrf",
        "dedup_rate_by_source", "knn_triangles", "components_knn",
        "label_propagation_knn", "cluster_aware_split", "boilerplate_scrub",
        "bigram_lm_score", "sparse_cosine_pairs", "time_to_purchase",
        "nation_spend_pct_rank", "props_variant_stats",
        "sessionize_dynamic_gap", "tpch_expectations", "event_type_unpivot",
        "fuzzy_part_matches", "time_grid_fill", "corpus_expectations",
        "first_touch_attribution", "sales_grouping_sets", "value_by_weekday",
        "revenue_seasonality", "column_profile", "rfm_segments",
        "point_in_time_join", "skew_audit", "attribution_position",
        "join_blowup_audit", "transition_matrix", "hot_items", "hot_items_sql",
        "hot_urls", "page_view",
    ]},
    # ---- round 10 (CORRECTNESS_r10.json, 50/50) — freshest, sorts last ----
    # The r11 window is then any never-driver-certified additions plus the
    # stalest r06 names (the r06 tail: ref pipelines, TPCH mid-block, dedup).
    **{n: 10 for n in [
        "knn_brute_filtered", "knn_ivf_filtered", "knn_pq_rotated",
        "wordpiece_encode_freq", "unigram_encode_freq", "unigram_encode",
        "order_wide_line_delete_stream_view", "revenue_max_by_cust_stream_view",
        "distinct_qty_by_cust_stream_view", "order_cust_wide_stream_view",
        "revenue_by_nation_ivm_stream_view", "revenue_by_region_ivm_stream_view",
        "bm25_index_stream_view", "bm25_index_delete_stream_view",
        "hybrid_index_stream_view", "bm25_index_purged_stream_view",
        "order_wide_cascade_stream_view", "order_wide_upsert_stream_view",
        "revenue_by_cust_upsert_stream_view", "order_wide_asof_stream_view",
        "hot_items_mv_stream_view", "top_customers_stream_view",
        "value_quantile_stream_view", "heavy_hitters_stream_view",
        "value_quantile_purged_stream_view", "hot_items_mv_unordered_stream_view",
        "flat_index_delete_stream_view", "flat_index_purged_stream_view",
        "top_customers_by_status_stream_view", "sessionize_stream_view",
        "sessionize_purged_stream_view", "page_view_salted", "uv_exact",
        "uv_approx", "market_by_channel", "ad_click_by_province",
        "ad_click_blacklist", "ad_clicks_filtered", "login_fail",
        "login_fail_n3", "login_fail_run", "order_timeout",
        "order_receipt_join", "order_receipt_reconcile",
        "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7",
    ]},
    # ---- round 11 (CORRECTNESS_r11.json, 50/50) — freshest, sorts last ----
    # The r12 window is then any never-driver-certified additions plus the
    # stalest r06 names (the r06 tail: windows/streaming refs, dedup family).
    **{n: 11 for n in [
        "knn_ivfpq_filtered", "knn_ivfsq8_filtered", "filtered_eval",
        "knn_pq_index_delete_view", "knn_pq_index_purged_view",
        "order_cust_wide_upsert_stream_view",
        "revenue_by_nation_ivm_upsert_stream_view",
        "order_cust_wide_asof_stream_view",
        "order_cust_wide_dimupd_stream_view",
        "revenue_by_nation_dimupd_stream_view",
        "dedup_lsh_index_delete_stream_view",
        "dedup_lsh_index_purged_stream_view",
        "top_customers_by_status_purged_stream_view",
        "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q13", "tpch_q15", "tpch_q17",
        "tpch_q18", "tpch_q19", "tpch_q21", "tpch_q22",
        "customer_running_spend", "revenue_by_nation", "top_customers",
        "sales_rollup", "promo_revenue_share", "order_priority_by_segment",
        "doc_fingerprint", "dedup_exact", "dedup_ngram_jaccard",
        "knn_ivf_trained", "knn_rp", "tokenizer_fertility",
        "source_minhash_setops", "ltv_cohorts", "revenue_pareto",
        "spend_gini", "cdc_compaction", "login_fail_relaxed",
        "last_click_before_purchase", "browse_abandon",
        "tpch_q2", "tpch_q11", "tpch_q12", "tpch_q14", "tpch_q16",
        "tpch_q20", "kmeans_embeddings",
    ]},
    # ---- round 12 (CORRECTNESS_r12.json, 50/50) — freshest, sorts last ----
    # The r13 window is then any never-driver-certified additions plus the
    # stalest r06 names (remaining r06 tail: ref streaming views, windows).
    **{n: 12 for n in [
        "knn_pq_index_filtered_view", "pq_index_filtered_eval",
        "knn_graph_stream_view", "knn_graph_purged_stream_view",
        "knn_graph_ann", "graph_ann_eval", "knn_graph_ann_stream_view",
        "hybrid_index_delete_stream_view", "hybrid_index_purged_stream_view",
        "knn_sq8_index_delete_view", "knn_sq8_index_purged_view",
        "semdedup", "sequence_pack", "dedup_minhash_lsh",
        "minhash_signatures", "simhash_fingerprints", "dedup_simhash",
        "dedup_clusters", "dedup_substring", "doc_stats", "lang_id",
        "rolling_fingerprint", "token_counts", "corpus_prep",
        "doc_repetition", "dedup_containment", "corpus_profile",
        "corpus_stats_stream_view", "corpus_sample", "corpus_split",
        "decontaminate", "shingle_novelty", "top_terms",
        "corpus_sample_stratified", "knn_pq", "knn_ivfpq",
        "embedding_centroids", "bigram_stats", "mixture_temperature",
        "ann_eval", "knn_pq_index_view", "late_arrival_audit",
        "user_churn_sets", "funnel_conversion", "sales_cube",
        "spend_deciles", "retention_cohorts", "cdc_stream_view",
        "scd2_stream_view", "zorder_layout_audit",
    ]},
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    pipeline_queries = {
        "hot_items": P.hot_items,
        "hot_items_sql": P.hot_items_sql,
        "hot_urls": P.hot_urls,
        "page_view": P.page_view,
        "page_view_salted": P.page_view_salted,
        "uv_exact": P.uv_exact,
        "uv_approx": P.uv_approx,
        "market_by_channel": P.market_by_channel,
        "ad_click_by_province": P.ad_click_by_province,
        "ad_click_blacklist": P.ad_click_blacklist,
        "ad_clicks_filtered": P.ad_clicks_filtered,
        "login_fail": P.login_fail,
        "login_fail_n3": P.login_fail_n3,
        "login_fail_relaxed": P.login_fail_relaxed,
        "login_fail_run": P.login_fail_run,
        "order_timeout": P.order_timeout,
        "order_receipt_join": P.order_receipt_join,
        "order_receipt_reconcile": P.order_receipt_reconcile,
        "last_click_before_purchase": P.last_click_before_purchase,
        "browse_abandon": P.browse_abandon,
    }
    everything = {
        **pipeline_queries,
        **TPCH_QUERIES,
        **TRAINING_QUERIES,
        **REFERENCE_QUERIES,
        **EXTRA_QUERIES,
        **ANALYTICS_QUERIES,
    }
    # never-certified (new) first, then least-recently-certified; insertion
    # order within a round is the registry order (stable sort), which keeps
    # related queries adjacent in the window.
    names = sorted(
        everything,
        key=lambda n: _LAST_DRIVER_ROUND.get(n, 0),
    )
    return {n: everything[n] for n in names}


def oracle_sql() -> dict[str, str]:
    return {
        **PIPELINE_ORACLES,
        **TPCH_ORACLES,
        **TRAINING_ORACLES,
        **REFERENCE_ORACLES,
        **EXTRA_ORACLES,
        **ANALYTICS_ORACLES,
    }
