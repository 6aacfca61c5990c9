"""Heavy hitters with EXACT output via Misra-Gries candidate pruning.

The naive exact plan (`groupBy(key).count().filter(cnt >= thr)`) shuffles
every distinct key. When the key cardinality is huge (user ids, URLs,
n-grams at 100 TB) and only the tiny frequent tail matters, that shuffle
is almost entirely wasted. The two-phase sketch plan:

1. **Candidates** — one Arrow-batched `mapInPandas` pass runs a
   Misra-Gries summary with K counters *per partition* and emits only the
   surviving keys. MG guarantees each key's undercount is at most
   n_p/(K+1), so any key with partition count > n_p/(K+1) survives.
   Summing over partitions: a key with GLOBAL count C missed by every
   partition has C <= n/(K+1). With K = 2047 and threshold
   thr = max(1, n DIV 400): if n < 2048 then n/(K+1) < 1 <= thr, and if
   n >= 2048 then thr >= n/400 - 1 > n/2048 (equivalent to
   n·(1/400 - 1/2048) > 1, true for n >= 498). Either way
   thr > n/(K+1), so candidates ⊇ {keys with C >= thr}: NO false
   negatives for any data distribution or partitioning.
2. **Exact recount** — semi-join the raw rows against the (tiny,
   broadcast) candidate list, aggregate exactly, filter by the threshold.
   False positives from phase 1 die here, so the final output is exact
   and independent of partitioning — which is what lets a plain SQL
   GROUP BY/HAVING serve as the oracle.

State per task is K counters (a few KiB); the only wide shuffle is over
candidate keys (bounded by K × #partitions, not by key cardinality). The
BroadcastNestedLoopJoin in the physical plan is the 1-row `totals` frame
joined onto the candidates (the scalar-subquery shape) — constant-size,
not a data×data nested loop.

This is the engine's answer to the reference's Bloom-filter trick
(UvCountWithBloomFilterApp.java:64-85): both replace a huge exact
key-state with a small-memory summary; here the summary is mergeable and
the final answer is exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MG_COUNTERS = 2047  # K; guarantees no false negatives for thr >= max(1, n/400)
DEFAULT_DENOM = 400  # heavy = at least 1/400th of all rows


def _mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries: value_counts per Arrow batch merged into
    a counter dict; on overflow past K entries, subtract the (K+1)-th
    largest counter value from all and drop the non-positive ones. Each
    such decrement of m removes >= m·(K+1) total mass, so the summed
    decrements — the max undercount — are <= n_p/(K+1)."""
    counters: dict[int, int] = {}
    for pdf in batches:
        for key, cnt in pdf["key"].value_counts().items():
            counters[key] = counters.get(key, 0) + int(cnt)
        if len(counters) > MG_COUNTERS:
            m = sorted(counters.values(), reverse=True)[MG_COUNTERS]
            counters = {k: v - m for k, v in counters.items() if v > m}
    yield pd.DataFrame({"key": pd.Series(list(counters.keys()), dtype="int64")})


def heavy_hitters(df: DataFrame, key_col: str, denom: int = DEFAULT_DENOM) -> DataFrame:
    """Exact keys appearing in at least max(1, n DIV denom) rows, with
    their exact counts and the threshold used. `denom` must be <= 400 so
    the MG_COUNTERS=2047 no-false-negative bound above applies."""
    if denom > DEFAULT_DENOM:
        raise ValueError(f"denom {denom} would break the MG superset guarantee (max {DEFAULT_DENOM})")
    keyed = df.select(F.col(key_col).cast("long").alias("key"))
    candidates = keyed.mapInPandas(_mg_candidates, schema="key long").distinct()
    totals = keyed.agg(F.count(F.lit(1)).alias("total"))
    exact = (
        keyed.join(F.broadcast(candidates), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    thr = F.greatest(F.lit(1).cast("long"), F.expr(f"total DIV {denom}"))
    return (
        exact.crossJoin(F.broadcast(totals))
        .filter(F.col("n_rows") >= thr)
        .select(F.col("key").alias(key_col), "n_rows", thr.alias("threshold"))
    )


CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_TOP_K = 20


def term_counts_cms(docs: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH, k: int = CMS_TOP_K) -> DataFrame:
    """Count-Min sketch over the corpus term stream, reported as estimate
    vs exact for the top-k terms — the mergeable fixed-memory frequency
    summary (Cormode & Muthukrishnan 2005) that complements Misra-Gries
    (exact heavy keys) and HLL (distinct counts): CMS answers point
    frequency queries for ANY term with ε=e/width overcount at δ=e^-depth
    confidence, never undercounting.

    Build: one explode pass emits (row, col) cells via the engine-portable
    h60 per hash row; the sketch is a ≤ depth·width-row aggregate (map-side
    partial to 4096 keys — the shuffle is sketch-sized, not corpus-sized)
    that broadcasts back for estimation. Estimates = min over rows of the
    joined cell counts; the exact side reuses the same token collapse. The
    report keys on the exact top-k (count desc, term asc) so output is
    deterministic; `overcount = est − exact ≥ 0` is the collision audit.

    On a cluster the sketch frame IS the mergeable state: per-executor
    partial cells sum into the global sketch, same as any partial+final
    agg — no driver bottleneck, O(depth·width) memory anywhere."""
    from ..functions.text import h60, tokens

    tok = docs.select(F.explode(tokens("text")).alias("term"))
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (h60(F.concat(F.lit(f"cms{d}:"), F.col("term"))) % width).alias("c"),
            )
            for d in range(depth)
        ]
    )
    cms = (
        tok.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.d").alias("d"), F.col("cell.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = tok.groupBy("term").agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), F.asc("term")).limit(k)
    # same cell expression re-applied to the top-k probe terms
    probes = top.select("term", "exact_n", F.explode(cells).alias("cell"))
    return (
        probes.select("term", "exact_n", F.col("cell.d").alias("d"), F.col("cell.c").alias("c"))
        .join(F.broadcast(cms), ["d", "c"])
        .groupBy("term", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "term",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
    )
