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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # reference pipeline parity (SURVEY.md §2, events table)
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
        "login_fail_run": P.login_fail_run,
        "order_timeout": P.order_timeout,
        "order_receipt_join": P.order_receipt_join,
        "order_receipt_reconcile": P.order_receipt_reconcile,
        # relational analytics surface (TPC-H-ish star schema)
        **TPCH_QUERIES,
        # training-data pipeline surface (documents / embeddings)
        **TRAINING_QUERIES,
        # reference fixtures with the reference's exact parameters
        **REFERENCE_QUERIES,
        # broader engine surface (sessionization, pivot, percentiles, JSON)
        **EXTRA_QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    return {
        **PIPELINE_ORACLES,
        **TPCH_ORACLES,
        **TRAINING_ORACLES,
        **REFERENCE_ORACLES,
        **EXTRA_ORACLES,
    }
