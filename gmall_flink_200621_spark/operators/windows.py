"""Event-time windows (SURVEY.md §2.4 W1-W6).

The reference's `.timeWindow(size, slide)` (HotItemApp.java:56 sliding 1h/5m,
PageViewApp.java:47 tumbling 1h, UvCountApp.java:46 global tumbling) maps to
`F.window(ts, size, slide)`. Window assignment is epoch-aligned in both Flink
and Spark, so window boundaries agree exactly.

Scale note: Spark's window agg never materializes the slide-factor row copies
into the shuffle — partial aggregation (HashAggregate partial → Exchange on
(window, key) → final) combines map-side first, so shuffled bytes are
O(distinct groups), not O(rows × windows-per-row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_window(df: DataFrame, ts_col: str, size: str, slide: str | None = None) -> DataFrame:
    """Attach the event-time window struct as column `w`."""
    win = F.window(F.col(ts_col), size, slide) if slide else F.window(F.col(ts_col), size)
    return df.withColumn("w", win)


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str | None = None,
    keys: dict[str, Column] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Per-(window, keys) aggregation.

    The reference's AggregateFunction+WindowFunction pair (A1+A2,
    HotItemApp.java:72-104 and 4 clones) collapses to this one declarative
    agg; Catalyst supplies the partial/final split the reference hand-wrote
    as `add/merge`, and `w.end` replaces the WindowFunction that attached
    `window.getEnd()` (HotItemApp.java:96-104).

    Output columns: <keys>..., window_end_s (epoch-seconds BIGINT), <aggs>...
    """
    keys = keys or {}
    aggs = aggs or [F.count(F.lit(1)).alias("cnt")]
    keyed = df
    for k, v in keys.items():
        keyed = keyed.withColumn(k, v)
    out = with_window(keyed, ts_col, size, slide).groupBy("w", *keys.keys()).agg(*aggs)
    return out.select(
        F.col("w.end").cast("long").alias("window_end_s"),
        *keys.keys(),
        *[c for c in out.columns if c not in ("w", *keys.keys())],
    )


def sliding_count_two_level(
    df: DataFrame,
    ts_col: str,
    size_s: int,
    slide_s: int,
    keys: dict[str, Column],
    count_alias: str = "cnt",
) -> DataFrame:
    """Sliding-window count via two-level aggregation: count per
    (slide-bucket, key) FIRST, then explode each bucket into its size/slide
    windows and re-sum.

    Identical results to `windowed_agg` (same epoch-aligned assignment),
    different physical shape: the expensive first aggregation touches each
    input row ONCE (no ×size/slide Expand before the partial agg), and the
    window explode runs on the already-tiny bucket counts. At 100 TB with
    a 1h/5min window this is 12× less map-side hash-aggregate input on the
    hot path — the same trick the reference hand-built as
    AggregateFunction-in-window-state (HotItemApp.java:72-93), lifted one
    level up."""
    keyed = df
    for k, v in keys.items():
        keyed = keyed.withColumn(k, v)
    buckets = (
        keyed.withColumn("__bucket", F.col(ts_col).cast("long") - F.col(ts_col).cast("long") % slide_s)
        .groupBy("__bucket", *keys.keys())
        .agg(F.count(F.lit(1)).alias("__bcnt"))
    )
    n = size_s // slide_s
    return (
        buckets.withColumn("__j", F.explode(F.sequence(F.lit(1), F.lit(n))))
        .select(
            (F.col("__bucket") + F.col("__j") * slide_s).alias("window_end_s"),
            *keys.keys(),
            "__bcnt",
        )
        .groupBy("window_end_s", *keys.keys())
        .agg(F.sum("__bcnt").alias(count_alias))
    )
