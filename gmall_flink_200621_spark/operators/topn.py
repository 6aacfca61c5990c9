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
    prune_salts: int | None = None,
) -> DataFrame:
    """Keep the top `n` rows per group by `order_col` desc (deterministic).

    `prune_salts=S` enables the EXACT two-stage pre-prune for extreme
    per-group cardinality: stage 1 ranks within (group, hash-salt) — S
    parallel sub-sorts instead of one task sorting the whole group — and
    keeps each sub-top-n; stage 2 ranks the surviving ≤ n·S rows per
    group. Exact because every global top-n row is the top-≤n of its own
    salt bucket, whatever the hash distribution; ties break on the same
    tiebreak columns in both stages, so the final ranking is identical to
    the single-stage form (oracle hashes unchanged). At 100 TB this turns
    a |keys|-row single-partition sort per window into S bounded sorts +
    an n·S-row final sort."""
    order: list[Column] = [F.col(order_col).desc()]
    for c in tiebreak_cols or []:
        order.append(F.col(c).asc())
    if prune_salts and prune_salts > 1:
        salt_src = [F.col(c) for c in (tiebreak_cols or [order_col])]
        w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order)
        df = (
            df.withColumn("__salt", F.pmod(F.xxhash64(*salt_src), F.lit(prune_salts)))
            .withColumn("__pr", F.row_number().over(w1))
            .filter(F.col("__pr") <= n)
            .drop("__salt", "__pr")
        )
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= n)
        .withColumn(rank_alias, F.col(rank_alias).cast("int"))
    )
