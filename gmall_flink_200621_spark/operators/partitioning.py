"""Partitioning helpers shared by the CPU-heavy text/vector operators."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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

# bytes of input per fan-out slice: below this per-core share, the
# round-robin exchange costs more than single-threaded execution of the
# whole input (measured at sf0.1: a ~160 KB documents scan ran 0.33 s on
# one core vs 0.54 s behind a 32-way repartition — the exchange itself
# dominated). 256 KB/slice keeps tiny inputs unshuffled while a corpus of
# even a few MB still fans out to every core.
FANOUT_BYTES_PER_SLICE = 256 * 1024


def _input_bytes(files: list[str]) -> int | None:
    total = 0
    for f in files:
        p = f[7:] if f.startswith("file://") else f[5:] if f.startswith("file:") else f
        if not os.path.isfile(p):  # non-local scheme — size unknown
            return None
        total += os.path.getsize(p)
    return total


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-proof equi-join: the FACT side gets a random-uniform salt
    in [0, salt), the DIM side is replicated salt× with every salt value,
    and the join runs on (key, salt) — a hot fact key's rows now spread
    over `salt` shuffle partitions instead of hammering one task. The
    manual form of what AQE skew-join does adaptively (plan-pinned in
    TestSkewJoin); use THIS when the skew is known ahead of time, the
    join is stream-stream (AQE can't split), or a deterministic layout
    matters more than adaptivity.

    Cost model: dim shuffle volume × salt (fine for dimension tables —
    that's the point; NEVER salt two fact-sized sides, pre-aggregate or
    bucket instead). Row multiplicity is unchanged: each fact row carries
    exactly one salt value and meets exactly one of the dim's salt
    replicas. Salt uses a hash of the full row's monotonic id, not
    rand(), so retried tasks re-derive the same assignment
    (nondeterministic salting + task retry = lost/duplicated rows, the
    classic production incident).

    `how` is restricted to FACT-preserving join types: under
    right/full-outer, an unmatched dim key would surface once per salt
    replica — `salt` phantom output rows — so those modes are rejected
    rather than silently wrong. The salt itself uses pmod, not
    abs(...)%salt: abs(Long.MIN_VALUE) stays negative in the JVM, and a
    negative salt for a non-power-of-two `salt` would silently drop
    (inner) or null-extend (left) that fact row (ADVICE r05; same idiom
    as operators/topn.py)."""
    if salt < 1:
        raise ValueError(f"salted_join: salt must be >= 1, got {salt}")
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join: how={how!r} is not fact-preserving — unmatched dim "
            f"rows would be duplicated {salt}x by the salt replication; use a "
            "plain join for right/full outer semantics"
        )
    f = facts.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int"),
    )
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = f.join(d, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def fan_out(df: DataFrame) -> DataFrame:
    """Parallelism guard for CPU-heavy per-row work (tokenize → shingle →
    hash, regex extraction, vectorized UDF batches): a small input arrives
    as one scan partition (one parquet file ⇒ one split ⇒ ONE core does
    all the work), so fan out toward the cluster's parallelism first. At
    real scale the scan already has ≥ defaultParallelism splits and this
    is a no-op.

    The fan-out TARGET is sized to the input, not the cluster: tiny
    inputs (< FANOUT_BYTES_PER_SLICE per prospective slice) stay
    unshuffled, because for them the round-robin exchange costs more than
    the single-core work it parallelizes; the target grows with input
    bytes up to defaultParallelism. The partition probe reads the pre-AQE
    count (what the scan would produce — the quantity that matters for
    the one-core hazard) and is memoized per canonicalized plan so
    repeated wrapping of the same input doesn't re-trigger physical
    planning."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    files: list[str] | None
    try:
        files = df.inputFiles()
        key = (id(df.sparkSession), df.semanticHash(), hash(tuple(sorted(files))))
    except Exception:  # semanticHash/inputFiles unavailable — probe direct
        files = None
        key = None
    if files is not None:
        nbytes = _input_bytes(files)
        if nbytes is not None:
            target = max(1, min(target, nbytes // FANOUT_BYTES_PER_SLICE))
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
