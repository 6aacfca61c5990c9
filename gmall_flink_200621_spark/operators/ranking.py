"""Distributed global ranking — the two-level (range-partition + offset)
pattern that replaces partition-less `row_number()`/`ntile()` windows.

A partition-less Window is a SINGLE task: every row moves through one
`Exchange SinglePartition` and one sort — the classic scale cliff. The
registry's decile queries feed it per-user AGGREGATES (|users| rows, never
facts), which is survivable into the millions, but at ~1B users it becomes
a 1B-row one-task sort. `global_rank_ntile` computes the exact same ranks
and ntile buckets with no corpus-sized single-partition stage:

1. `repartitionByRange(P, order)` — one shuffle; ordering is now TOTAL
   across partitions (partition i's rows all precede partition i+1's).
   The ranged frame is MATERIALIZED (localCheckpoint) because steps 2
   and 3 both consume it: two independent evaluations of a range
   exchange can sample different boundaries (the r11 sf0.1 incident —
   see global_rank_ntile's inline note), and offsets keyed to one set
   of boundaries must meet ranks computed on the same set.
2. per-partition row_number via a Window partitioned on
   `spark_partition_id()` — a second shuffle of the materialized frame
   (hash on pid, P balanced groups, all JVM; ~16-byte rows for the
   decile callers), never a single task.
3. per-partition counts (P rows) → cumulative offsets + grand total via
   a window over that P-ROW frame (the only single-partition stage left,
   bounded by the partition count, not the data).
4. global_rank = offset + local row_number; ntile derived from
   (global_rank, N) with Spark's exact ntile bucket-size rule — first
   (N mod n) buckets get one extra row — so results are bit-identical to
   `F.ntile(n).over(Window.orderBy(...))`.

Caller contract: `order` must be a TOTAL order (include a tiebreak key).
With ties, range boundaries could split equal rows across partitions and
make ranks nondeterministic — the same caveat the window form has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank_ntile(
    df: DataFrame,
    order: list[Column],
    n: int | None = None,
    npartitions: int | None = None,
) -> DataFrame:
    """Append `global_rank` (row_number over the total order `order`)
    and, when `n` is given, `ntile` — computed distributed as described
    in the module docstring. Column names `_pid`/`_lrn`/`_off`/`_N` are
    reserved internally and dropped."""
    p = npartitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint is LOAD-BEARING: the rank pass and the P-row count
    # pass below both consume `ranged`, and two independent evaluations
    # of the range exchange can sample DIFFERENT partition boundaries
    # (observed at sf0.1: the column-pruned count subtree saw different
    # AQE-coalesced input partitions than the rank subtree → different
    # reservoir samples → `_pid` keyed offsets to the wrong partitions →
    # ntile(5) emitting 6). The checkpoint pins ONE set of boundaries:
    # the RDD computes once at first action and every consumer (same
    # action or later ones) reads the same materialized blocks.
    # eager=False keeps plan CONSTRUCTION side-effect free — composing
    # then discarding this frame runs no Spark job; the upstream
    # pipeline executes on first action only. Tradeoffs the caller
    # inherits (both eager and lazy): blocks live on executor-local
    # storage and lineage is truncated, so losing an executor AFTER
    # materialization fails the job unrecoverably (fail-loud beats the
    # silent rank divergence above), and the materialized bytes are
    # proportional to `df` — pass AGGREGATE-grain frames (the decile
    # callers' ~16-25-byte rows), not fact-grain ones.
    ranged = (
        df.repartitionByRange(p, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("_pid").orderBy(*order)
    local = ranged.withColumn("_lrn", F.row_number().over(w_local))

    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(Window.partitionBy()).alias("_N"),
    )

    out = local.join(F.broadcast(offsets), "_pid").withColumn(
        "global_rank", (F.col("_off") + F.col("_lrn")).cast("long")
    )
    if n is not None:
        # Spark ntile: q = N div n, r = N mod n; buckets 1..r hold q+1
        # rows, buckets r+1..n hold q rows. floor(a/b) on doubles is
        # exact below 2^53 rows — comfortably past any 100 TB row count.
        q = F.expr(f"_N DIV {n}")
        r = F.col("_N") % n
        in_big = F.col("global_rank") <= r * (q + 1)
        big = F.floor((F.col("global_rank") - 1) / (q + 1)) + 1
        small = r + F.floor((F.col("global_rank") - r * (q + 1) - 1) / q) + 1
        out = out.withColumn(
            "ntile", F.when(in_big, big).otherwise(small).cast("int")
        )
    return out.drop("_pid", "_lrn", "_off", "_N")


def global_prefix_sum(
    df: DataFrame,
    order: list[Column],
    value: str,
    out: str = "prefix",
    exclusive: bool = True,
    npartitions: int | None = None,
) -> DataFrame:
    """Append `out` = the running sum of `value` over the total order
    `order` — the distributed exclusive/inclusive prefix sum, same
    two-level design as `global_rank_ntile`: range-partition on the
    order (total across partitions), per-partition running sum (windows
    partitioned on `spark_partition_id()`), then a P-ROW offset frame
    (the only single-partition stage, bounded by partition count) joined
    back by broadcast. Replaces the textbook partition-less
    `sum().over(Window.orderBy(...))` single-task cumsum. Same caller
    contract: `order` must be a total order."""
    p = npartitions or df.sparkSession.sparkContext.defaultParallelism
    # single evaluation of the range exchange — same load-bearing
    # boundary-consistency materialization (and same lazy/executor-loss
    # contract) as global_rank_ntile
    ranged = (
        df.repartitionByRange(p, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("_pid").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1 if exclusive else 0
    )
    local = ranged.withColumn(
        "_lps", F.coalesce(F.sum(value).over(w_local), F.lit(0))
    )
    counts = ranged.groupBy("_pid").agg(F.sum(value).alias("_psum"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_psum").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, F.col("_off") + F.col("_lps"))
        .drop("_pid", "_lps", "_off")
    )
