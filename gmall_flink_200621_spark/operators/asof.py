"""As-of join: for each left row, the most recent right row at or before
it (per key) — the temporal-join sibling the reference's interval join
(OrderReceiptAppWithJoin.java:58-61) doesn't cover, and a staple of
feature backfill ("the last known X when Y happened").

Spark has no native as-of join, and the naive rewrite — range join +
per-left-row max — explodes into |left| × |right-within-range| rows
before pruning. This implementation is the sorted-union carry-forward
form instead:

    union(left tagged 1, right tagged 0)
      → window per key ordered by (ts, side)
      → last(payload, ignorenulls=True) carried forward
      → keep left rows

Cost: ONE shuffle of |left|+|right| rows on the key, one sort per
partition, zero row blowup — the plan you'd want at 100 TB (the same
merge-scan shape a native as-of join executes). Right rows sort before
left rows at equal timestamps, so `right_ts <= left_ts` matches
inclusively, like DuckDB's ASOF JOIN (the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join. Output: all left columns + payload_cols from
    the latest right row with right_ts <= left_ts per key (nulls when no
    such row). `on` columns must exist under the same names in both frames.

    `tiebreak`: right column deciding among right rows sharing (key, ts)
    — the max wins, keeping results deterministic (DuckDB's ASOF leaves
    this unspecified, so the oracle pre-dedupes the same way)."""
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"asof_join: non-key columns shared by both sides would collide "
            f"in the union: {sorted(overlap)} — rename one side first"
        )
    if tiebreak is not None:
        w_dedup = Window.partitionBy(*on, right_ts).orderBy(F.desc(tiebreak))
        right = (
            right.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    left_only = [c for c in left.columns if c not in on]
    l = left.select(
        *on,
        *left_only,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
    )
    r = right.select(
        *on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
    )
    # right rows sort first at equal __ts -> inclusive (<=) match semantics
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l.unionByName(r)
    for c in payload_cols:
        carried = carried.withColumn(f"__p_{c}", F.last(f"__p_{c}", ignorenulls=True).over(w))
    return carried.filter(F.col("__side") == 1).select(
        *on, *left_only, *[F.col(f"__p_{c}").alias(c) for c in payload_cols]
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row at or
    after it per key — "time to next X" feature extraction (time-to-
    conversion, time-to-failure). Pure wrapper: negate both timestamp
    columns and run the backward carry-forward, so it inherits the one-
    shuffle zero-blowup plan and the inclusive-at-equal-ts semantics
    (DuckDB's `ASOF ... ON l.ts <= r.ts` oracle form). The negated column
    is internal; output carries the caller's columns unchanged."""
    ln = left.withColumn("__neg_lts", -F.col(left_ts))
    rn = right.withColumn("__neg_rts", -F.col(right_ts))
    out = asof_join(
        ln,
        rn,
        on=on,
        left_ts="__neg_lts",
        right_ts="__neg_rts",
        payload_cols=payload_cols,
        tiebreak=tiebreak,
    )
    return out.drop("__neg_lts")
