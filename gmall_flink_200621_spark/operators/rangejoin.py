"""Binned point-in-interval join — the equi-join rewrite of a range join.

A naive `points JOIN intervals ON p BETWEEN lo AND hi` has no equality
key, so Spark plans BroadcastNestedLoopJoin (fine for tiny interval sets,
O(|P|·|I|) otherwise). The standard scale rewrite bins the domain:

- every interval is exploded to the integer bins it overlaps
  (`sequence(lo DIV w, hi DIV w)`);
- every point maps to its single bin (`p DIV w`);
- an equi-join on the bin plus the exact `BETWEEN` residual recovers the
  range predicate.

Each matching (point, interval) pair is produced exactly once — the point
lives in exactly one bin, and the interval covers that bin exactly once —
so no dedup pass is needed. Cost is |P| + Σ(len_i/w + 1) shuffled rows:
pick `bin_width` near the median interval length so the explosion factor
stays ~2. This is a shuffle-partitioned hash join on the bin key, so it
survives arbitrarily large sides (neither side needs to broadcast), and
bins spread wide intervals over many partitions.

Related surface: `operators/asof.py` (nearest-predecessor join),
`plans/pipelines.py` interval join J1 (bounded-lag equi-key join,
OrderReceiptApp reference). This operator covers the containment case
(point ∈ [lo, hi]) with no equality key at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join `points` to every interval containing them (inclusive
    `[lo, hi]`), via the bin equi-join rewrite above.

    Requirements: the three bound columns are non-negative integers
    (`DIV` truncates toward zero — for event-time epochs that's floor),
    `lo <= hi` on every interval row, and the two frames share no column
    names (the caller aliases first).
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    binned_i = intervals.withColumn(
        "__bin", F.explode(F.expr(f"sequence({lo_col} DIV {bin_width}, {hi_col} DIV {bin_width})"))
    )
    binned_p = points.withColumn("__bin", F.expr(f"{point_col} DIV {bin_width}"))
    return (
        binned_p.join(binned_i, "__bin")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("__bin")
    )
