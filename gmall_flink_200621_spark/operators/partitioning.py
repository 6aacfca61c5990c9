"""Partitioning helpers shared by the CPU-heavy text/vector operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

# (session id, semanticHash, input-file-listing hash) → scan partition
# count. getNumPartitions forces a full physical plan; memoizing per
# canonical plan means each distinct input pays planning once, not once per
# wrapping operator (fan_out wraps nearly every text/vector operator and
# runs 3× per ingest micro-batch). The file-listing hash invalidates the
# entry when the same path's contents change (growing stage dirs,
# regenerated testdata) — without it a stale large count would silently
# disable the one-core guard for the life of the session. inputFiles() only
# consults the already-materialized file index (no physical planning), so
# the key stays cheap.
_PARTITIONS_CACHE: dict[tuple[int, int, int], int] = {}
_CACHE_CAP = 1024


def fan_out(df: DataFrame) -> DataFrame:
    """Parallelism guard for CPU-heavy per-row work (tokenize → shingle →
    hash, regex extraction, vectorized UDF batches): a small input arrives
    as one scan partition (one parquet file ⇒ one split ⇒ ONE core does
    all the work), so fan out to the cluster's parallelism first. At real
    scale the scan already has ≥ defaultParallelism splits and this is a
    no-op — the round-robin shuffle is only ever paid on inputs small
    enough for it to be trivial.

    The partition probe reads the pre-AQE count (what the scan would
    produce, which is the quantity that matters for the one-core hazard)
    and is memoized per canonicalized plan so repeated wrapping of the
    same input doesn't re-trigger physical planning."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        key = (id(df.sparkSession), df.semanticHash(), hash(tuple(sorted(df.inputFiles()))))
    except Exception:  # semanticHash/inputFiles unavailable — probe direct
        key = None
    if key is not None and key in _PARTITIONS_CACHE:
        n = _PARTITIONS_CACHE[key]
    else:
        n = df.rdd.getNumPartitions()
        if key is not None:
            if len(_PARTITIONS_CACHE) >= _CACHE_CAP:
                _PARTITIONS_CACHE.clear()
            _PARTITIONS_CACHE[key] = n
    if n < target:
        return df.repartition(target)
    return df
