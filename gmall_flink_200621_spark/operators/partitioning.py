"""Partitioning helpers shared by the CPU-heavy text/vector operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Parallelism guard for CPU-heavy per-row work (tokenize → shingle →
    hash, regex extraction, vectorized UDF batches): a small input arrives
    as one scan partition (one parquet file ⇒ one split ⇒ ONE core does
    all the work), so fan out to the cluster's parallelism first. At real
    scale the scan already has ≥ defaultParallelism splits and this is a
    no-op — the round-robin shuffle is only ever paid on inputs small
    enough for it to be trivial."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
