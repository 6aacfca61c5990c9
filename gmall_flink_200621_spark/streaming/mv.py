"""Incremental materialized view: a continuously-maintained aggregate
table over a stream — the production pattern behind every "pv by hour"
dashboard table that cannot rescan the raw stream per refresh.

Shape: an UPDATE-mode streaming aggregation emits only the groups each
micro-batch changed; foreachBatch rewrites exactly those groups'
partitions of a parquet table via dynamic partition overwrite. The
combination is exactly-once WITHOUT a transaction log:

- update mode → the per-batch frame is the complete new value of every
  changed group (not a delta), so rewriting its partition is idempotent —
  a retried/replayed batch rewrites byte-identical content;
- `partitionOverwriteMode=dynamic` → only partitions present in the
  batch are replaced; untouched history stays as-is. No read-modify-write
  of the table, no MERGE, no driver state;
- late data is handled for free: a late event changes its window's
  aggregate, the window re-emits, its partition is rewritten.

At 100 TB the partition key is the time bucket (+ any coarse dimension):
each micro-batch touches O(changed buckets) files regardless of table
size, and readers get partition pruning on the dominant predicate. The
same code runs unchanged over a transactional table format when
snapshot-isolated readers are needed (the rewrite becomes a commit).

No watermark is set, so state holds every window ever seen and ANY
lateness still updates the table (the unbounded-state trade an MV makes);
add `withWatermark` + append-close semantics when the window domain is
unbounded in production.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_pv_mv_stream(
    spark: SparkSession,
    stage_dir: str,
    table_path: str,
    query_name: str = "pv_mv",
):
    """Maintain an hourly page-view MV (window_end_s, pv) at `table_path`,
    partitioned by window_end_s, from a staged events file stream."""
    from ..sources.loaders import events_parquet_stream

    if os.path.exists(table_path):
        shutil.rmtree(table_path)

    counts = (
        events_parquet_stream(spark, stage_dir, maxFilesPerTrigger=1)
        .filter(F.col("event_type") == "view")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("pv"))
        .select(F.col("w.end").cast("long").alias("window_end_s"), "pv")
    )

    def rewrite_changed_partitions(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.write.mode("overwrite")
                .partitionBy("window_end_s")
                .parquet(table_path)
            )
        finally:
            s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        counts.writeStream.outputMode("update")
        .foreachBatch(rewrite_changed_partitions)
        .queryName(query_name)
        .start()
    )
