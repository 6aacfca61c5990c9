"""The reference pipelines run on the reference's OWN bundled CSV fixtures
with the reference's EXACT parameters — the strongest parity evidence:

| query | fixture | reference params (file:line) |
|---|---|---|
| ref_ad_click_by_province   | AdClickLog.csv | sliding 1h/5s (AdClickByProvinceApp.java:59) |
| ref_ad_click_blacklist     | AdClickLog.csv | 100 clicks/(user,ad)/day, UTC+8 day boundary (AdClickByProvinceApp.java:51,146) |
| ref_ad_clicks_filtered     | AdClickLog.csv | blacklist suppression (AdClickByProvinceApp.java:52-54) |
| ref_login_fail             | LoginLog.csv   | 2 consecutive fails ≤2 s (LoginFailApp2.java:77) |
| ref_order_timeout          | OrderLog.csv   | create→pay ≤15 min per orderId (OrderTimeoutAppWithCep.java:55) |
| ref_order_receipt_join     | Order+Receipt  | intervalJoin between(-3 s, +5 s) on txId (OrderReceiptAppWithJoin.java:60) |
| ref_order_receipt_reconcile| Order+Receipt  | CoProcess matched/payButNoReceipt/receiptButNoPay (OrderReceiptAppWithConnect.java:72-162) |

All event times stay epoch-second BIGINTs (the fixtures' native form), so
every comparison is integer-exact. UserBehavior.csv is missing from the
reference (stripped large blob) — its pipelines are covered by the events
analogs in plans/pipelines.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import AD_CLICK_EVENT, LOGIN_EVENT, ORDER_EVENT, RECEIPT_EVENT
from ..sources.loaders import read_csv

REFERENCE_INPUT = "/root/reference/input"

AD_WINDOW_S, AD_SLIDE_S = 3600, 5
BLACKLIST_CAP = 100
TZ_OFFSET_S = 8 * 3600  # the reference hardcodes UTC+8 day boundaries
LOGIN_GAP_S = 2
ORDER_TIMEOUT_S = 900
RECEIPT_LO_S, RECEIPT_HI_S = 3, 5


def _ad_clicks(spark: SparkSession) -> DataFrame:
    return read_csv(spark, f"{REFERENCE_INPUT}/AdClickLog.csv", AD_CLICK_EVENT)


def _logins(spark: SparkSession) -> DataFrame:
    return read_csv(spark, f"{REFERENCE_INPUT}/LoginLog.csv", LOGIN_EVENT)


def _orders(spark: SparkSession) -> DataFrame:
    # CSV '' reads as null; normalize to '' to mirror the bean's String field
    return read_csv(spark, f"{REFERENCE_INPUT}/OrderLog.csv", ORDER_EVENT).withColumn(
        "tx_id", F.coalesce(F.col("tx_id"), F.lit(""))
    )


def _receipts(spark: SparkSession) -> DataFrame:
    return read_csv(spark, f"{REFERENCE_INPUT}/ReceiptLog.csv", RECEIPT_EVENT)


def ref_ad_click_by_province(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Province click counts per sliding 1h/5s window — epoch-integer window
    math (window_end_s = 5s-bucket + j·5), two-level: raw rows are counted
    per (5s bucket, province) FIRST, and only the tiny bucket counts are
    exploded into their 720 windows (AdClickByProvinceApp.java:59 semantics;
    at scale this keeps the 720× Expand off the raw-row path)."""
    from ..operators.windows import sliding_count_two_level

    return sliding_count_two_level(
        _ad_clicks(spark), "ts", AD_WINDOW_S, AD_SLIDE_S, keys={"province": F.col("province")}
    )


def _ad_day(col: F.Column) -> F.Column:
    """UTC+8 day index (AdClickByProvinceApp.java:146's boundary math)."""
    return ((col + TZ_OFFSET_S) / 86400).cast("long")


def ref_ad_click_blacklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _ad_clicks(spark)
    return (
        e.groupBy("user_id", "ad_id", _ad_day(F.col("ts")).alias("day_idx"))
        .agg(F.count(F.lit(1)).alias("click_cnt"))
        .filter(F.col("click_cnt") >= BLACKLIST_CAP)
    )


def ref_ad_clicks_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _ad_clicks(spark).withColumn("day_idx", _ad_day(F.col("ts")))
    bl = ref_ad_click_blacklist(spark, sf_dir).select("user_id", "ad_id", "day_idx")
    return e.join(bl, ["user_id", "ad_id", "day_idx"], "left_anti").select(
        "user_id", "ad_id", "province", "city", "ts"
    )


def ref_login_fail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two consecutive fails within 2 s (rolling detector, C4)."""
    e = _logins(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "ip")
    seq = e.select(
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    return seq.filter(
        (F.col("event_type") == "fail")
        & (F.col("prev_type") == "fail")
        & (F.col("ts") - F.col("prev_ts") <= LOGIN_GAP_S)
    ).select("user_id", F.col("prev_ts").alias("first_fail_ts"), F.col("ts").alias("second_fail_ts"))


def ref_order_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Create→pay ≤15 min per orderId; unpaid or late → the reference's
    timeout side outputs."""
    e = _orders(spark)
    creates = e.filter(F.col("event_type") == "create").select("order_id", F.col("ts").alias("create_ts"))
    pays = e.filter(F.col("event_type") == "pay").select(
        F.col("order_id").alias("p_order"), F.col("ts").alias("pay_ts")
    )
    j = creates.join(pays, creates.order_id == pays.p_order, "full")
    return j.select(
        F.coalesce("order_id", "p_order").alias("order_id"),
        "create_ts",
        "pay_ts",
        F.when(F.col("pay_ts").isNull(), F.lit("timeout"))
        .when(F.col("create_ts").isNull(), F.lit("payed but no create"))
        .when(F.col("pay_ts") - F.col("create_ts") <= ORDER_TIMEOUT_S, F.lit("payed"))
        .otherwise(F.lit("payed timeout"))
        .alias("status"),
    )


def ref_order_receipt_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intervalJoin.between(-3 s, +5 s) on txId (J1, exact bounds)."""
    pays = (
        _orders(spark)
        .filter((F.col("event_type") == "pay") & (F.col("tx_id") != ""))
        .select("tx_id", "order_id", F.col("ts").alias("pay_ts"))
    )
    receipts = _receipts(spark).select(
        F.col("tx_id").alias("r_tx"), "pay_channel", F.col("ts").alias("receipt_ts")
    )
    return pays.join(
        receipts,
        (pays.tx_id == receipts.r_tx)
        & (F.col("receipt_ts") >= F.col("pay_ts") - RECEIPT_LO_S)
        & (F.col("receipt_ts") <= F.col("pay_ts") + RECEIPT_HI_S),
    ).select("tx_id", "order_id", "pay_ts", "pay_channel", "receipt_ts")


def ref_order_receipt_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matched ∪ payButNoReceipt ∪ receiptButNoPay with a tag column
    (the CoProcessFunction's main + two side outputs)."""
    matched = ref_order_receipt_join(spark, sf_dir)
    pays = (
        _orders(spark)
        .filter((F.col("event_type") == "pay") & (F.col("tx_id") != ""))
        .select("tx_id", F.col("ts").alias("pay_ts"))
    )
    receipts = _receipts(spark).select("tx_id", F.col("ts").alias("receipt_ts"))
    m = matched.select("tx_id", "pay_ts", "receipt_ts", F.lit("matched").alias("tag"))
    pay_only = pays.join(matched.select("tx_id"), "tx_id", "left_anti").select(
        "tx_id", "pay_ts", F.lit(None).cast("long").alias("receipt_ts"), F.lit("payButNoReceipt").alias("tag")
    )
    receipt_only = receipts.join(matched.select("tx_id"), "tx_id", "left_anti").select(
        "tx_id", F.lit(None).cast("long").alias("pay_ts"), "receipt_ts", F.lit("receiptButNoPay").alias("tag")
    )
    return m.unionByName(pay_only).unionByName(receipt_only)


REFERENCE_QUERIES = {
    "ref_ad_click_by_province": ref_ad_click_by_province,
    "ref_ad_click_blacklist": ref_ad_click_blacklist,
    "ref_ad_clicks_filtered": ref_ad_clicks_filtered,
    "ref_login_fail": ref_login_fail,
    "ref_order_timeout": ref_order_timeout,
    "ref_order_receipt_join": ref_order_receipt_join,
    "ref_order_receipt_reconcile": ref_order_receipt_reconcile,
}
