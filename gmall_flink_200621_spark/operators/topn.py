"""Per-group Top-N ranking (SURVEY.md §2.6 T1-T4).

The reference buffers rows in ListState and sorts on an event-time timer
(TopNItemIdCountProcessFunc, HotItemApp.java:107-179, ~70 LoC ×2 clones);
declaratively this is one rank-and-filter:

    row_number() OVER (PARTITION BY group ORDER BY metric DESC, tiebreak ASC) <= n

which Catalyst executes as a single shuffle on `group` + in-partition sort —
exactly the reference's keyBy(windowEnd)+sort, minus the state machinery.
Ties are broken deterministically on the key column so results are stable
across partitionings and engines (the reference's Comparator,
HotItemApp.java:143-154, left ties unspecified).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    n: int,
    tiebreak_cols: list[str] | None = None,
    rank_alias: str = "rank",
) -> DataFrame:
    """Keep the top `n` rows per group by `order_col` desc (deterministic)."""
    order: list[Column] = [F.col(order_col).desc()]
    for c in tiebreak_cols or []:
        order.append(F.col(c).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= n)
        .withColumn(rank_alias, F.col(rank_alias).cast("int"))
    )
