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

from pyspark.sql import DataFrame, SparkSession, Window
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
    """Revenue rollup by customer nation: per-order pre-aggregation, then
    fact⋈fact shuffle join + two broadcast dims.

    Revenue is summed per l_orderkey BEFORE the join: lineitem is stored
    ordered by orderkey so the partial agg combines map-side, the join
    shuffles (orderkey, partial-decimal) instead of raw lineitems, and —
    because each order is now one row — the per-nation order count is a
    plain count(*), eliminating the countDistinct Expand-and-reshuffle
    over the joined fact rows that the naive formulation pays."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
    per_order = l.groupBy("l_orderkey").agg(revenue.alias("_orev"))
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("_orev").alias("_rev"), F.count(F.lit(1)).alias("n_orders"))
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


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): orders in a quarter having
    at least one heavily-discounted lineitem — the LEFT SEMI join surface
    (EXISTS); the fact-side probe never widens the orders rows."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.05)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (TPC-H Q7 shape): revenue flow between two nations —
    the same dim table joined twice under different roles (supplier nation,
    customer nation), both broadcast."""
    n1, n2 = "NATION_18", "NATION_19"
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    supp_n = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cust_n = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    rev = F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(rev.alias("_rev"))
        .select("supp_nation", "cust_nation", "l_year", F.col("_rev").cast("double").alias("revenue"))
    )


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): one nation's share of the
    revenue sold into a region, per order year — conditional aggregation
    over a 6-table join; the share divide runs on decimal-exact sums."""
    target = "NATION_19"
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cust_n = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    supp_n = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == target, rev).otherwise(zero)).alias("_tr"),
            F.sum(rev).alias("_ar"),
        )
        .select(
            "o_year",
            F.round(F.col("_tr").cast("double") / F.col("_ar").cast("double"), 6).alias("mkt_share"),
        )
    )


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): per-supplier revenue over a quarter,
    keep the supplier(s) equal to the global max — the scalar-max subquery
    as a broadcast 1-row join."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
    by_supp = l.groupBy("l_suppkey").agg(rev.alias("_rev"))
    max_rev = by_supp.agg(F.max("_rev").alias("_max"))
    return (
        by_supp.crossJoin(F.broadcast(max_rev))
        .filter(F.col("_rev") == F.col("_max"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("_rev").cast("double").alias("total_revenue"))
    )


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): DISJUNCTIVE brand/size/quantity
    predicate classes — the OR-of-ANDs that must still prune the part dim
    and ride the hash join, never a cartesian fallback."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    cls1 = (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10)
    cls2 = (F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 20)
    cls3 = (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 30)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cls1 | cls2 | cls3)
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape): part-name filter + supplier
    nation, revenue per (nation, year). Two broadcast dims over the fact."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").cast("long").alias("o_year"))
        .agg(rev.alias("_rev"))
        .select("nation", "o_year", F.col("_rev").cast("double").alias("sum_profit"))
    )


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): top-20 customers by lost
    revenue on returned lineitems in a quarter."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01")) & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("_rev"))
        .select("c_custkey", "c_name", "n_name", F.col("_rev").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER join
    keeps order-less customers, then a second aggregation histograms the
    per-customer counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): the correlated
    per-part average rewritten as a self-aggregation join — lineitems below
    20% of their part's mean quantity, for one brand. The per-part averages
    are a broadcast-able aggregate, never a per-row subquery.

    The threshold is sum_decimal/count scaled in IEEE double — identical
    operations both engines, so the < compare is bit-deterministic.

    The brand filter prunes lineitem BEFORE the per-part aggregation: the
    per-part mean only depends on that part's own rows, so semi-joining
    lineitem to the ~1/25-of-parts brand subset first shrinks both the
    aggregation input and the broadcast by the part selectivity — at 100 TB
    an all-parts aggregate broadcast is an OOM candidate."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    l = load_table(spark, sf_dir, "lineitem")
    lp = l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey")).drop(
        "p_partkey"
    )
    per_part = lp.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        lp.join(F.broadcast(per_part), lp.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): orders whose total lineitem
    quantity exceeds the threshold, with customer attribution — HAVING on a
    fact-side aggregate, then dim join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty").cast("double") > 180.0)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("o_totalprice"),
            F.col("_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sole-supplier orders (TPC-H Q21's join shape: EXISTS plus NOT
    EXISTS against the same fact under different aliases): suppliers
    ranked by how many multi-line orders they supplied alone. The
    reduced schema has no commit/receipt dates, so the lateness predicate
    becomes multi-line-ness — the plan shape (two correlated semi/anti
    probes on lineitem) is the point."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    l1 = l.select("l_orderkey", "l_suppkey").distinct()
    # EXISTS: another lineitem of the same order (multi-line order)
    multi = (
        l.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .select("l_orderkey")
    )
    # NOT EXISTS: no other supplier on the order
    others = (
        l1.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("_ns"))
        .filter(F.col("_ns") > 1)
        .select("l_orderkey")
    )
    return (
        l1.join(multi, "l_orderkey", "left_semi")
        .join(others, "l_orderkey", "left_anti")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(20)
    )


def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed window aggregation (the one window-function family the rest
    of the surface doesn't exercise — running totals, not ranking/lag):
    each customer's cumulative spend over their order sequence."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape): customers with
    above-average positive balances and no recent orders — scalar-subquery
    threshold (broadcast 1-row cross join) + LEFT ANTI join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


def _lineitem_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reduced schema has no `partsupp`, so the part-supplier relation
    is DERIVED from lineitem: per (part, supplier), the minimum observed
    unit price stands in for ps_supplycost. Double division + min are
    order-independent (same IEEE ops both engines), so this derived dim is
    deterministic. One hash-agg over lineitem; at 100 TB it shuffles only
    (partkey, suppkey, cost) triples."""
    l = load_table(spark, sf_dir, "lineitem")
    unit = F.col("l_extendedprice").cast("double") / F.col("l_quantity").cast("double")
    return l.groupBy("l_partkey", "l_suppkey").agg(F.min(unit).alias("supply_cost"))


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): the correlated MIN subquery
    — for each qualifying part, the EUROPE supplier(s) with the lowest
    derived supply cost. The per-part min is a re-aggregation of the same
    derived relation (broadcast back), never a per-row subquery; all dims
    broadcast, the only shuffle is the partsupp derivation itself.

    The selective part filter (p_size & p_type) is applied BEFORE the
    per-part MIN: the min over a part's EU suppliers doesn't depend on part
    attributes, so joining the filtered `part` into the derived relation
    first shrinks the persisted frame, the MIN aggregation, and the
    broadcast by the part selectivity — the all-parts aggregate broadcast
    the naive shape produces is a driver/executor OOM candidate at scale."""
    ps = _lineitem_supply(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "LARGE")
    )
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # feeds both the probe side and the per-part MIN re-aggregation —
    # persist so the lineitem derivation runs once, not twice; part-pruned,
    # so what persists is only the qualifying parts' supplier rows
    eu_ps = (
        ps.join(F.broadcast(eu_supp), ps.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(p.select("p_partkey", "p_name")), ps.l_partkey == F.col("p_partkey"))
        .persist()
    )
    per_part_min = eu_ps.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        eu_ps.join(
            F.broadcast(per_part_min),
            (eu_ps.l_partkey == F.col("m_partkey"))
            & (eu_ps.supply_cost == F.col("min_cost")),
        )
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("supply_cost").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (TPC-H Q11 shape): per-part value for
    one nation's suppliers, kept when above a FRACTION of the nation's
    total — the global-scalar HAVING as a broadcast 1-row cross join.
    Value is the decimal lineitem revenue of the nation's suppliers
    (availqty·supplycost has no analog in the reduced schema)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    nat_lines = l.join(F.broadcast(nat_supp), l.l_suppkey == F.col("s_suppkey"))
    by_part = nat_lines.groupBy("l_partkey").agg(F.sum(_dec("l_extendedprice")).alias("_v"))
    total = by_part.agg(F.sum("_v").alias("_t"))
    return (
        by_part.crossJoin(F.broadcast(total))
        .filter(F.col("_v").cast("double") > F.lit(0.0008) * F.col("_t").cast("double"))
        .select("l_partkey", F.col("_v").cast("double").alias("part_value"))
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority classes (TPC-H Q12 shape): fact⋈fact join +
    conditional two-way CASE aggregation. The reduced schema has no
    l_shipmode/commit/receipt dates, so the group key is l_returnflag and
    the date predicate is one shipdate year — the plan shape (orderkey
    shuffle join, branchless conditional sums) is the point."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 exact scalar shape): one-month window,
    100·promo/total revenue ratio — the monthly breakdown lives in
    promo_revenue_share; this is the single-scalar original."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01")) & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,2)"))).alias("_pr"),
            F.sum(rev).alias("_tr"),
        )
        .select(
            (F.lit(100.0) * F.col("_pr").cast("double") / F.col("_tr").cast("double")).alias(
                "promo_revenue"
            )
        )
    )


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape): distinct-supplier
    count per part descriptor, excluding one brand, one type, and a
    NOT-IN supplier list (complaints analog: supplier names ending in 7)
    — semi/anti probes + countDistinct."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 3, 5, 7, 9))
    )
    complaints = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%7")
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(complaints), ps.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape): nested semi-joins — the
    suppliers who shipped more than a threshold quantity of qualifying
    ('small%') parts in one year, restricted to one region. availqty has
    no analog, so the correlated half-of-stock predicate becomes a
    shipped-quantity threshold; the two-level IN-subquery plan shape
    (agg-derived keys → semi join → dim filter) is the point."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    big = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("_q"))
        .filter(F.col("_q").cast("double") > 50.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(big, s.s_suppkey == big.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )


TPCH_QUERIES = {
    "tpch_q2": tpch_q2,
    "tpch_q11": tpch_q11,
    "tpch_q12": tpch_q12,
    "tpch_q14": tpch_q14,
    "tpch_q16": tpch_q16,
    "tpch_q20": tpch_q20,
    "tpch_q1": tpch_q1,
    "tpch_q3": tpch_q3,
    "tpch_q4": tpch_q4,
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
    "tpch_q7": tpch_q7,
    "tpch_q8": tpch_q8,
    "tpch_q9": tpch_q9,
    "tpch_q10": tpch_q10,
    "tpch_q13": tpch_q13,
    "tpch_q15": tpch_q15,
    "tpch_q17": tpch_q17,
    "tpch_q18": tpch_q18,
    "tpch_q19": tpch_q19,
    "tpch_q21": tpch_q21,
    "tpch_q22": tpch_q22,
    "customer_running_spend": customer_running_spend,
    "revenue_by_nation": revenue_by_nation,
    "top_customers": top_customers,
    "sales_rollup": sales_rollup,
    "promo_revenue_share": promo_revenue_share,
    "order_priority_by_segment": order_priority_by_segment,
}
