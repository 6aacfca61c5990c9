"""Sinks (SURVEY §2.1 S5/S6).

The reference prints to stdout (S5) and pokes Redis bitmaps per element
(S6). The engine's sinks are declarative and cluster-shaped:

- console/show for interactive parity with `.print()`;
- partitioned parquet as the durable batch sink (day-partitioned by
  default — the layout that gives downstream readers partition pruning);
- `foreachBatch` for arbitrary keyed external stores (the Redis analog) —
  exactly-once per micro-batch via idempotent upserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str] | None = None, mode: str = "overwrite") -> None:
    """Durable columnar sink. Default layout partitions by event day when a
    timestamp column exists — at 100 TB, daily partitions keep file counts
    sane and give readers partition pruning on the dominant filter."""
    cols = partition_cols
    if cols is None and "ts" in df.columns:
        df = df.withColumn("dt", F.to_date("ts"))
        cols = ["dt"]
    w = df.write.mode(mode)
    if cols:
        w = w.partitionBy(*cols)
    w.parquet(path)


def console_sink(df: DataFrame, label: str = "", n: int = 20) -> None:
    """S5 `.print(label)` parity for batch frames."""
    if label:
        print(f"== {label} ==")
    df.show(n, truncate=False)


def foreach_batch_upsert(store: dict, key_cols: list[str]):
    """S6-style external keyed store as a foreachBatch function: idempotent
    upsert per micro-batch (re-running an epoch converges, matching the
    reference's SETBIT/HINCRBY-once-per-element intent without an external
    service)."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        for r in batch_df.collect():
            store[tuple(r[c] for c in key_cols)] = r.asDict()

    return fn
