"""General analytics surface over the TPC-H-ish star schema.

The reference has no relational/batch surface at all (SURVEY.md §2.11), but
this engine is DataFrame-first, so the classic scan→filter→join→agg→rank
shapes come free from Catalyst. These queries exercise them end-to-end on
the driver's testdata and are the headline bench queries: pushdown (q6),
partial aggregation (q1), broadcast + shuffle joins (q3/q5), rollup, and
Top-N (top_customers).

Numeric policy: monetary aggregates are computed in DECIMAL (exact,
order-independent — a double sum's value depends on partition merge order,
which is nondeterministic on a cluster) and returned as doubles, so results
are bit-identical to the DuckDB oracle and across any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table


def _dec(col: str | F.Column, scale: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): one wide partial-agg over
    lineitem. Whole-stage-codegen'd single scan, no join."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    out = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).alias("_sq"),
        F.sum(_dec("l_extendedprice")).alias("_sbp"),
        F.sum(disc_price).alias("_sdp"),
        F.sum(charge).alias("_sc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_sbp").cast("double").alias("sum_base_price"),
        F.col("_sdp").cast("double").alias("sum_disc_price"),
        F.col("_sc").cast("double").alias("sum_charge"),
        (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
        (F.col("_sbp").cast("double") / F.col("count_order")).alias("avg_price"),
        "count_order",
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape): broadcast the filtered customer
    dim into orders, shuffle-join lineitem, top-10 by revenue.

    At 100 TB the customer⋈orders join must be broadcast (customer segment
    filter makes it small relative to fact tables); lineitem⋈orders shuffles
    on orderkey — both sides partition on the same key, AQE coalesces."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-06-01"))
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-06-01"))
    revenue = F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("_rev"))
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_orderpriority",
            F.col("_rev").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): 6-table join; the three dims
    (region→nation→supplier link) broadcast, facts shuffle on their keys."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("_rev"))
        .select("n_name", F.col("_rev").cast("double").alias("revenue"))
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change (TPC-H Q6 shape): pure scan+filter+agg — the
    pushdown showcase; all four predicates reach the parquet reader."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg((F.sum(_dec("l_extendedprice") * _dec("l_discount"))).cast("double").alias("revenue"))


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup by customer nation: fact⋈fact shuffle join + two
    broadcast dims."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(revenue.alias("_rev"), F.countDistinct("o_orderkey").alias("n_orders"))
        .select("n_name", F.col("_rev").cast("double").alias("revenue"), "n_orders")
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by order revenue (Top-N over a join, T1 shape on the
    relational surface)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    by_cust = (
        o.groupBy("o_custkey")
        .agg(F.sum(_dec("o_totalprice")).alias("_spend"), F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        by_cust.join(F.broadcast(c), by_cust.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("_spend").cast("double").alias("total_spend"),
            "n_orders",
        )
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(10)
    )


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (returnflag → linestatus) — grouping-sets surface the reference
    lacks entirely (SURVEY §2.5 note); free in Spark and DuckDB."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select("l_returnflag", "l_linestatus", "sum_qty", "n")
    )


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share per ship-month (TPC-H Q14 shape): conditional
    aggregation over a broadcast-joined dim."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return (
        j.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,2)"))).alias("_pr"),
            F.sum(rev).alias("_tr"),
        )
        .select(
            "ship_month",
            F.round(F.lit(100.0) * F.col("_pr").cast("double") / F.col("_tr").cast("double"), 6).alias("promo_share"),
        )
    )


def order_priority_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per (mktsegment, priority) — broadcast dim + two-key agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(_dec("o_totalprice")).cast("double").alias("total_price"))
    )


TPCH_QUERIES = {
    "tpch_q1": tpch_q1,
    "tpch_q3": tpch_q3,
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
    "revenue_by_nation": revenue_by_nation,
    "top_customers": top_customers,
    "sales_rollup": sales_rollup,
    "promo_revenue_share": promo_revenue_share,
    "order_priority_by_segment": order_priority_by_segment,
}
