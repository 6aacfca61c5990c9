"""The 11 reference pipelines as declarative batch plans over `events`.

Each function is `(spark, sf_dir) -> DataFrame` against the driver's
testdata; the matching DuckDB oracle SQL lives in `plans/oracle.py` (same
column names, same deterministic tie-breaks). Streaming variants of the
windowed ones are in `streaming/jobs.py`.

Parity map (reference app → here), with the events→shape mapping from
`functions/scalars.py`:

| reference | query | SURVEY ops |
|---|---|---|
| HotItemApp / HotItemsWithSQLApp         | hot_items / hot_items_sql | W1 A1 A2 T1 T2 |
| HotUrlApp / HotUrlApp2                  | hot_urls                  | W2 T1 T3 |
| PageViewApp / PageViewApp2              | page_view / page_view_salted | W4 A3 P4 A4 |
| UvCountApp / UvCountWithBloomFilterApp  | uv_exact / uv_approx      | W5 A5 A6 |
| MarketByChannelApp                      | market_by_channel         | K2 W3 A1 P6 |
| AdClickByProvinceApp (count side)       | ad_click_by_province      | K1 W3 A1 |
| AdClickByProvinceApp (blacklist side)   | ad_click_blacklist / ad_clicks_filtered | A7 A8 P9 |
| LoginFailApp2 (rolling pair)            | login_fail                | C4 C1 |
| LoginFailApp (buffered run)             | login_fail_run            | C3 |
| OrderTimeoutApp{WithCep,WithState}      | order_timeout             | J3 J4 C2 |
| OrderReceiptAppWithJoin                 | order_receipt_join        | J1 |
| OrderReceiptAppWithConnect              | order_receipt_reconcile   | J2 + side outputs |

All timestamps in outputs are epoch-second BIGINTs (`*_ts_s` /
`window_end_s`) so values hash identically across engines regardless of
timestamp physical precision (Spark µs vs parquet ns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import scalars as S
from ..operators.topn import top_n_per_group
from ..operators.windows import windowed_agg
from ..sources.loaders import load_table

# Tunables (chosen so every query is non-empty on sf0.001..sf0.1; see oracle.py)
TOP_N = 5
BLACKLIST_THRESHOLD = 2  # reference uses 100 clicks/day (AdClickByProvinceApp.java:51)
LOGIN_FAIL_GAP = "1 hour"  # reference: 2 s (LoginFailApp2.java:77); scaled to data density
ORDER_TIMEOUT = "15 minutes"  # reference: Time.minutes(15) (OrderTimeoutAppWithCep.java:55)
RECEIPT_LO = "1 hour"  # reference: between(-3 s, +5 s) (OrderReceiptAppWithJoin.java:60)
RECEIPT_HI = "2 hours"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------- hot items


def hot_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 items per sliding 1h/5min window (HotItemApp.java:54-64).

    filter(pv) → two-level sliding count (per-5min-bucket pre-agg, then
    bucket→window rollup — each input row aggregated once, no ×12 window
    Expand on the hot path) → row_number ≤ 5 per window end.
    """
    from ..operators.windows import sliding_count_two_level

    e = _events(spark, sf_dir).filter(F.col("event_type") == "view")
    counts = sliding_count_two_level(e, "ts", 3600, 300, keys={"item_k": S.item_k()})
    return top_n_per_group(
        counts, ["window_end_s"], "cnt", TOP_N, tiebreak_cols=["item_k"], prune_salts=8
    ).select("window_end_s", "item_k", "cnt", "rank")


def hot_items_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query through the SQL surface (HotItemsWithSQLApp.java:50-62 used
    Blink `hop`/`hop_end` + row_number; Spark SQL `window()` is the analog),
    written two-level like the declarative plan: raw rows aggregate once
    into 5-min buckets, and only the tiny bucket counts explode into their
    12 sliding windows — no ×12 Expand on the raw-row path."""
    _events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(
        f"""
        WITH buckets AS (
          SELECT CAST(window(ts, '5 minutes').end AS LONG) AS bucket_end,
                 CAST(get_json_object(props, '$.k') AS INT) AS item_k,
                 count(*) AS bcnt
          FROM events WHERE event_type = 'view'
          GROUP BY 1, 2
        ), counts AS (
          SELECT bucket_end + (j - 1) * 300 AS window_end_s, item_k, sum(bcnt) AS cnt
          FROM buckets LATERAL VIEW explode(sequence(1, 12)) t AS j
          GROUP BY 1, 2
        ), ranked AS (
          SELECT window_end_s, item_k, cnt,
                 CAST(row_number() OVER (PARTITION BY window_end_s ORDER BY cnt DESC, item_k ASC) AS INT) AS rank
          FROM counts
        )
        SELECT * FROM ranked WHERE rank <= {TOP_N}
        """
    )


def hot_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 urls per sliding 10min/5min window over GET-analog clicks
    (HotUrlApp.java:57-66: filter GET → window 10min → Top-5)."""
    from ..operators.windows import sliding_count_two_level

    e = _events(spark, sf_dir).filter(F.col("event_type") == "click")
    counts = sliding_count_two_level(e, "ts", 600, 300, keys={"url_k": S.url_k()})
    return top_n_per_group(
        counts, ["window_end_s"], "cnt", TOP_N, tiebreak_cols=["url_k"], prune_salts=8
    ).select("window_end_s", "url_k", "cnt", "rank")


# --------------------------------------------------------------------- pv / uv


def page_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly PV count (PageViewApp.java:39-48: filter pv → ('pv',1) → sum)."""
    e = _events(spark, sf_dir).filter(F.col("event_type") == "view")
    return windowed_agg(e, "ts", "1 hour", aggs=[F.count(F.lit(1)).alias("pv")])


def page_view_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PV with explicit two-phase salted aggregation (PageViewApp2.java:54-69:
    key 'pv_'+rand(8) partial counts, then re-agg per windowEnd).

    Spark's partial aggregation already defeats single-key skew, so this is
    a *technique demonstration* kept for parity: salt → partial per
    (window, salt) → final sum per window. Result ≡ page_view.
    """
    e = _events(spark, sf_dir).filter(F.col("event_type") == "view")
    salted = e.withColumn("salt", (F.rand(seed=42) * 8).cast("int"))
    partial = (
        salted.groupBy(F.window("ts", "1 hour").alias("w"), "salt")
        .agg(F.count(F.lit(1)).alias("partial_cnt"))
    )
    return (
        partial.groupBy(F.col("w.end").cast("long").alias("window_end_s"))
        .agg(F.sum("partial_cnt").alias("pv"))
    )


def uv_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly exact UV (UvCountApp.java:58-79 HashSet distinct →
    countDistinct; the global window is just a key-less groupBy)."""
    e = _events(spark, sf_dir).filter(F.col("event_type") == "view")
    return windowed_agg(e, "ts", "1 hour", aggs=[F.countDistinct("user_id").alias("uv")])


def uv_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly approx UV — the reference's 2^29-bit Bloom filter + Redis bitmap
    (UvCountWithBloomFilterApp.java:87-161) is exactly what HLL++
    `approx_count_distinct` replaces: bounded memory, mergeable across
    executors, no external store.

    Bounded-error oracle: the estimate itself is engine-specific, so the
    hashed output carries the exact per-window UV plus `est_ok` =
    |estimate − exact| ≤ 5%·exact (≫3σ for rsd=1%) evaluated inside the
    query; the oracle expects `est_ok` ≡ TRUE, turning the estimator's
    error bound into a hash-checked correctness property."""
    e = _events(spark, sf_dir).filter(F.col("event_type") == "view")
    agg = windowed_agg(
        e,
        "ts",
        "1 hour",
        aggs=[
            F.countDistinct("user_id").alias("uv"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("__est"),
        ],
    )
    return agg.select(
        "window_end_s",
        "uv",
        (F.abs(F.col("__est") - F.col("uv")) <= F.col("uv") * F.lit(0.05)).alias("est_ok"),
    )


# --------------------------------------------------------------------- market / ads


def market_by_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """App-market counts by (channel, behavior) per sliding 1h/15min window,
    UNINSTALL-analog excluded (MarketByChannelApp.java:31-34)."""
    from ..operators.windows import sliding_count_two_level

    e = _events(spark, sf_dir).filter(F.col("event_type") != "error")
    return sliding_count_two_level(
        e, "ts", 3600, 900,
        keys={"channel": S.channel(), "behavior": F.col("event_type")},
    ).select("window_end_s", "channel", "behavior", "cnt")


def ad_click_by_province(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ad clicks by province per sliding 1h/20min window
    (AdClickByProvinceApp.java:58-61)."""
    from ..operators.windows import sliding_count_two_level

    e = _events(spark, sf_dir).filter(F.col("event_type") == "click")
    return sliding_count_two_level(e, "ts", 3600, 1200, keys={"province": S.province()}).select(
        "window_end_s", "province", "cnt"
    )


def ad_click_blacklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-(user, ad) click-cap blacklist warnings
    (AdClickByProvinceApp.java:124-168: ValueState counter + emit-once at
    threshold). Batch form: day-grouped count ≥ threshold — the emit-once
    guard is the HAVING; the daily timer reset is the `day_s` group key."""
    e = _events(spark, sf_dir).filter(F.col("event_type") == "click")
    return (
        e.groupBy(
            "user_id",
            S.ad_k().alias("ad_k"),
            F.date_trunc("day", F.col("ts")).cast("long").alias("day_s"),
        )
        .agg(F.count(F.lit(1)).alias("click_cnt"))
        .filter(F.col("click_cnt") >= BLACKLIST_THRESHOLD)
    )


def ad_clicks_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The main (non-blacklisted) click stream (AdClickByProvinceApp.java:52-54
    suppression, P9): anti-join clicks against the blacklist keys —
    the batch-exact form of the reference's dynamic stateful filter."""
    e = _events(spark, sf_dir).filter(F.col("event_type") == "click")
    clicks = e.select(
        "event_id",
        "user_id",
        S.ad_k().alias("ad_k"),
        F.date_trunc("day", F.col("ts")).cast("long").alias("day_s"),
        S.epoch_s().alias("ts_s"),
    )
    bl = ad_click_blacklist(spark, sf_dir).select("user_id", "ad_k", "day_s")
    return clicks.join(bl, ["user_id", "ad_k", "day_s"], "left_anti").select(
        "event_id", "user_id", "ad_k", "ts_s"
    )


# --------------------------------------------------------------------- login fail


def login_fail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two consecutive failures within the gap → alert
    (LoginFailApp2.java:59-99 rolling variant; LoginFailAppWithCep.java:61-69
    `times(2).consecutive().within(...)`). Batch rewrite: `lag` over each
    user's event sequence — a success between fails breaks adjacency exactly
    like the reference's state reset."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    gap = F.expr(f"INTERVAL {LOGIN_FAIL_GAP}")
    return (
        seq.filter(
            (F.col("event_type") == "error")
            & (F.col("prev_type") == "error")
            & (F.col("ts") <= F.col("prev_ts") + gap)
        )
        .select(
            "user_id",
            F.col("prev_ts").cast("long").alias("first_fail_ts_s"),
            F.col("ts").cast("long").alias("second_fail_ts_s"),
        )
    )


def login_fail_n3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 at generic n: `times(3).consecutive().within(1 day)` (gap scaled to testdata density) through the
    reusable CEP operator (operators/cep.py:consecutive_within) — the
    reference only instantiates n=2 (LoginFailAppWithCep.java:63); this
    query oracle-checks the generalized lag-chain for n=3."""
    from ..operators.cep import consecutive_within

    return consecutive_within(
        _events(spark, sf_dir),
        ["user_id"],
        "ts",
        F.col("event_type") == "error",
        n=3,
        within_s=86400,
        order_cols=["event_id"],
    )


def login_fail_relaxed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 under Flink's DEFAULT (relaxed) contiguity: `times(3).within(2h)`
    with no `.consecutive()` — the engine-generality variant the reference
    never instantiates (LoginFailAppWithCep.java:63 always adds
    `consecutive()`). Successes between failures are skipped rather than
    breaking the pattern; the 3 failures' span must fit the window (1 day,
    scaled to testdata error density like login_fail_n3)."""
    from ..operators.cep import relaxed_times_within

    return relaxed_times_within(
        _events(spark, sf_dir),
        ["user_id"],
        "ts",
        F.col("event_type") == "error",
        n=3,
        within_s=86400,
        order_cols=["event_id"],
    )


def login_fail_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buffered-run variant (LoginFailApp.java:56-125: ListState of fails +
    timer): maximal runs of consecutive failures per user; alert when a run
    has ≥2 fails and its span fits the gap. Run-id via the count of
    non-failure events seen so far (a window cumsum, no state machine)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = e.withColumn(
        "run_id",
        F.count(F.when(F.col("event_type") != "error", 1)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).filter(F.col("event_type") == "error")
    gap_s = 3600 * 2
    return (
        runs.groupBy("user_id", "run_id")
        .agg(
            F.min(F.col("ts").cast("long")).alias("run_start_ts_s"),
            F.max(F.col("ts").cast("long")).alias("run_end_ts_s"),
            F.count(F.lit(1)).alias("n_fails"),
        )
        .filter((F.col("n_fails") >= 2) & (F.col("run_end_ts_s") - F.col("run_start_ts_s") <= gap_s))
        .select("user_id", "run_start_ts_s", "n_fails")
    )


def browse_abandon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink CEP `notFollowedBy` — absence detection, the dual of C2's
    followedBy: `begin("view").notFollowedBy("purchase").within(1 day)`.
    The reference's only absence construct is the timeout side-output of
    OrderTimeoutAppWithCep.java:50-66 (match-or-timeout on ONE key); this
    is the generic per-event form — every view with no purchase by the
    same user within the next day (scaled to testdata event density, like
    login_fail_n3's window).

    Shape: one shuffle on user_id, no join — a RANGE frame over epoch
    seconds counts purchases in (ts, ts+86400]; range framing (not rows)
    makes same-second edge cases exact: a purchase in the same second as
    the view is NOT "after" it, one a day later still is. Per-user frames
    scan each user's event list once (sorted within partition); nothing
    N² and nothing driver-side."""
    e = _events(spark, sf_dir).select("event_id", "user_id", "event_type", S.epoch_s().alias("ts_s"))
    w = Window.partitionBy("user_id").orderBy("ts_s").rangeBetween(1, 86400)
    flagged = e.withColumn(
        "n_purchases_after",
        F.count(F.when(F.col("event_type") == "purchase", 1)).over(w),
    )
    return (
        flagged.filter((F.col("event_type") == "view") & (F.col("n_purchases_after") == 0))
        .select("user_id", "event_id", "ts_s")
    )


def last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/asof.py): each purchase paired with
    the user's most recent click at or before it — the feature-backfill
    join (J1's sibling: latest-prior instead of within-interval). One
    key shuffle, no range blowup; DuckDB's native ASOF JOIN is the
    oracle."""
    from ..operators.asof import asof_join

    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").cast("long").alias("purchase_ts_s"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").cast("long").alias("click_ts_s"),
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="purchase_ts_s",
        right_ts="click_ts_s",
        payload_cols=["click_id", "click_ts_s"],
        tiebreak="click_id",
    )


# --------------------------------------------------------------------- order flows


def order_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Create→pay within 15 min else timeout (OrderTimeoutAppWithState.java:57-111,
    OrderTimeoutAppWithCep.java:46-65 `followedBy.within(15 min)`).

    Batch-exact: each click (create-analog) left-joins the earliest purchase
    (pay-analog) of the same user in [create, create+15min]; null ⇒ the
    reference's timer branch ('timeout' side output)."""
    e = _events(spark, sf_dir)
    creates = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("create_id"), "user_id", F.col("ts").alias("create_ts")
    )
    pays = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pay_ts")
    )
    timeout = F.expr(f"INTERVAL {ORDER_TIMEOUT}")
    joined = creates.join(
        pays,
        (creates.user_id == pays.p_user)
        & (pays.pay_ts >= creates.create_ts)
        & (pays.pay_ts <= creates.create_ts + timeout),
        "left",
    )
    return (
        joined.groupBy("create_id", "user_id", "create_ts")
        .agg(F.min("pay_ts").alias("pay_ts"))
        .select(
            "user_id",
            F.col("create_ts").cast("long").alias("create_ts_s"),
            F.col("pay_ts").cast("long").alias("pay_ts_s"),
            F.when(F.col("pay_ts").isNotNull(), F.lit("payed")).otherwise(F.lit("timeout")).alias("status"),
        )
    )


def order_receipt_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed interval join (OrderReceiptAppWithJoin.java:58-61:
    `intervalJoin.between(-3s, +5s)` on txId): purchases × signups of the
    same user with receipt time in [pay−1h, pay+2h]. At scale this is a
    shuffled range-join on the equi key; both sides partition on user_id."""
    e = _events(spark, sf_dir)
    pays = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pay_id"), F.col("ts").alias("pay_ts")
    )
    receipts = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("r_user"), F.col("event_id").alias("receipt_id"), F.col("ts").alias("receipt_ts")
    )
    lo, hi = F.expr(f"INTERVAL {RECEIPT_LO}"), F.expr(f"INTERVAL {RECEIPT_HI}")
    return (
        pays.join(
            receipts,
            (pays.user_id == receipts.r_user)
            & (receipts.receipt_ts >= pays.pay_ts - lo)
            & (receipts.receipt_ts <= pays.pay_ts + hi),
        )
        .select(
            "user_id",
            "pay_id",
            F.col("pay_ts").cast("long").alias("pay_ts_s"),
            "receipt_id",
            F.col("receipt_ts").cast("long").alias("receipt_ts_s"),
        )
    )


def order_receipt_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stream reconciliation with timeout diagnostics
    (OrderReceiptAppWithConnect.java:72-162: CoProcessFunction buffering both
    sides, timers emitting `payButNoReceipt` / `receiptButNoPay` side outputs).

    Batch-exact as matched ∪ pay-only ∪ receipt-only; the side-output tags
    become a `tag` column (the engine's side-output convention, SURVEY §7.1).
    """
    matched = order_receipt_join(spark, sf_dir).select(
        "user_id", "pay_id", "pay_ts_s", "receipt_id", "receipt_ts_s", F.lit("matched").alias("tag")
    )
    e = _events(spark, sf_dir)
    pays = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pay_id"), F.col("ts").cast("long").alias("pay_ts_s")
    )
    receipts = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("receipt_id"), F.col("ts").cast("long").alias("receipt_ts_s")
    )
    pay_only = pays.join(matched.select("pay_id"), "pay_id", "left_anti").select(
        "user_id",
        "pay_id",
        "pay_ts_s",
        F.lit(None).cast("long").alias("receipt_id"),
        F.lit(None).cast("long").alias("receipt_ts_s"),
        F.lit("payButNoReceipt").alias("tag"),
    )
    receipt_only = receipts.join(matched.select("receipt_id"), "receipt_id", "left_anti").select(
        "user_id",
        F.lit(None).cast("long").alias("pay_id"),
        F.lit(None).cast("long").alias("pay_ts_s"),
        "receipt_id",
        "receipt_ts_s",
        F.lit("receiptButNoPay").alias("tag"),
    )
    return matched.unionByName(pay_only).unionByName(receipt_only)
