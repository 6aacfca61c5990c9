"""Physical data-layout operators: Z-order clustering and small-file
compaction — the warehouse-maintenance surface that decides how much of
100 TB a query actually READS.

Why this module exists: Spark's scan-side pruning (partition pruning,
parquet row-group min/max skipping) is only as good as the physical
layout of the files. A table sorted on one column skips beautifully on
that column and not at all on any other; a table ingested append-only
degrades into thousands of small files whose per-file overhead (footer
reads, task scheduling, open/close) dominates the scan. The two
operators here are the standard remedies:

- `write_zordered`: multi-dimensional clustering. Interleaving the bits
  of k bounded columns into one Z-value and RANGE-partitioning + sorting
  on it gives every output file a compact hyper-rectangle of the key
  space, so parquet min/max stats are tight on EVERY interleaved column
  at once — a point/box predicate on any of them prunes most files. The
  Z-value is pure integer bit arithmetic (built-ins only, exactly
  reproducible in any engine).
- `compact_small_files`: partition-selective bin-packing rewrite. Only
  partitions whose file population is actually fragmented (more files
  than `ceil(bytes/target)` would need, above a tolerance) are
  rewritten, via dynamic partition overwrite — untouched partitions are
  physically untouched (same discipline as the streaming MV tables'
  touched-bucket writes in streaming/ingest.py).

Scale shape: the Z-write is one range shuffle (sampled boundaries —
Spark's RangePartitioner samples, it never sorts globally) + a
per-partition sort, exactly what a 1000-executor rewrite job wants; the
compactor reads only the partitions it rewrites and the driver handles
only per-partition (path, bytes, n_files) triples — O(partitions)
scalars, never data.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ZORDER_BITS = 11  # bits per dimension (2048 cells/dim); 2 dims → 22-bit zval


def zorder_value(cols: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Bit-interleaved Z-value of k ALREADY-BOUNDED non-negative integer
    columns (each must fit in `bits` bits — callers bound with pmod /
    bucketing first): bit b of column i lands at position b·k + i. The
    expression is a flat sum of shift/mask terms (k·bits of them) —
    whole-stage-codegen-friendly, no UDF, no shuffle; identical integer
    arithmetic in DuckDB certifies it under the oracle gate."""
    k = len(cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(F.lit(1)), b * k + i
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zcol: Column,
    n_files: int,
    sort_extra: list[str] | None = None,
) -> None:
    """Write `df` as `n_files` parquet files clustered on the Z-value:
    range-partition on zval (sampled boundaries — no global sort), sort
    within each partition, drop the helper column at the writer. Every
    file then owns a compact Z-range ⇒ a compact hyper-rectangle in the
    interleaved dimensions ⇒ tight per-file min/max stats on each of
    them (the property tests/test_layout.py pins against the
    one-dimensional-sort strawman)."""
    out = df.withColumn("__z", zcol).repartitionByRange(n_files, F.col("__z"))
    order = [F.col("__z")] + [F.col(c) for c in (sort_extra or [])]
    out.sortWithinPartitions(*order).drop("__z").write.mode("overwrite").parquet(path)


def compact_small_files(
    spark: SparkSession,
    table: str,
    target_bytes: int = 128 * 1024 * 1024,
    tolerance: int = 1,
) -> dict[str, tuple[int, int]]:
    """Bin-pack fragmented partitions of a partitioned parquet TABLE:
    any partition holding more than `ceil(bytes / target_bytes) +
    tolerance` files is rewritten (coalesced to the ideal count) via
    dynamic partition overwrite; every other partition is left
    physically untouched. Returns {partition_spec: (files_before,
    files_after)} for the rewritten partitions — ≤ n_partitions tiny
    tuples to the driver, never rows.

    This is the maintenance companion of the streaming MV sinks
    (streaming/ingest.py): their touched-bucket overwrites keep write IO
    O(delta) per epoch, at the price of each bucket accreting one small
    file per epoch that touches it; a periodic compaction pass restores
    scan efficiency without rewriting the table. (Flat un-partitioned
    parquet directories use `sources/sinks.compact_table` instead — same
    bin-packing policy, whole-directory staging swap.) Correctness is
    content-identity: rewrite is `INSERT OVERWRITE` of the partition's
    own rows (replay-idempotent — a crashed pass re-finds the same
    fragmented partitions; a replayed one finds them compact and writes
    nothing)."""
    parts = [r[0] for r in spark.sql(f"SHOW PARTITIONS {table}").collect()]
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
        .filter(F.col("col_name") == "Location")
        .first()[1]
    )
    # Hadoop FileSystem API, not os.* — works for file://, hdfs://, s3a://
    # alike; per-partition listStatus is a metadata call, O(files) names,
    # zero data movement.
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    rewritten: dict[str, tuple[int, int]] = {}
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for p in parts:
            jpath = jvm.org.apache.hadoop.fs.Path(os.path.join(loc, p))
            fs = jpath.getFileSystem(hconf)
            sizes = [
                st.getLen()
                for st in fs.listStatus(jpath)
                if st.isFile() and not st.getPath().getName().startswith(("_", "."))
            ]
            ideal = max(1, math.ceil(sum(sizes) / target_bytes))
            if len(sizes) <= ideal + tolerance:
                continue
            spec = " AND ".join(
                f"{k}='{v}'" for k, v in (kv.split("=", 1) for kv in p.split("/"))
            )
            # localCheckpoint materializes the partition's rows BEFORE the
            # overwrite starts (a plan that still read the table would be
            # rejected as read-and-overwrite; and without it the rewrite
            # would race its own input). Bounded by one partition's data,
            # spilled via the executor storage layer, released right after.
            rows = spark.table(table).filter(F.expr(spec)).localCheckpoint(eager=True)
            rows.coalesce(ideal).write.mode("overwrite").insertInto(table, overwrite=True)
            rewritten[p] = (len(sizes), ideal)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    if rewritten:
        spark.catalog.refreshTable(table)
    return rewritten


def hilbert_index(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = ZORDER_BITS,
    out: str = "hd",
) -> DataFrame:
    """Hilbert-curve index of two ALREADY-BOUNDED non-negative integer
    columns — the seam-free alternative to `zorder_value`: the Z-curve
    jumps across quadrant boundaries (a range-partitioned Z-file that
    straddles a seam spans a wide extent in one dimension — observed and
    documented in tests/test_layout.py), while consecutive Hilbert
    indices are always grid-adjacent, so EVERY contiguous index range is
    a compact blob and no file inherits a seam.

    The canonical xy2d bit-walk (d += s²·((3·rx) ⊕ ry); reflect + swap
    when ry = 0) is unrolled into `bits` chained projections — each
    level's (x, y, d) update references the PREVIOUS level's columns by
    name via one simultaneous withColumns, keeping the plan linear in
    `bits` (folding the recurrence into a single expression would double
    the tree per level: 2^bits nodes). Intermediate x/y go negative by
    design; `&` on negatives is two's-complement int64 in Spark, DuckDB
    and Python alike (verified), so the oracle replicates it exactly.
    Pure integer arithmetic, no UDF, no shuffle."""
    d = df.withColumns(
        {
            "__hx": F.col(xcol).cast("long"),
            "__hy": F.col(ycol).cast("long"),
            out: F.lit(0).cast("long"),
        }
    )
    one, zero = F.lit(1).cast("long"), F.lit(0).cast("long")
    for i in reversed(range(bits)):
        s = 1 << i
        d = d.withColumns(
            {
                "__rx": F.when(F.col("__hx").bitwiseAND(F.lit(s)) > 0, one).otherwise(zero),
                "__ry": F.when(F.col("__hy").bitwiseAND(F.lit(s)) > 0, one).otherwise(zero),
            }
        )
        d = d.withColumns(
            {
                out: F.col(out)
                + F.lit(s * s) * (F.lit(3) * F.col("__rx")).bitwiseXOR(F.col("__ry")),
                "__hx": F.when(F.col("__ry") == 1, F.col("__hx"))
                .when(F.col("__rx") == 1, F.lit(s - 1) - F.col("__hy"))
                .otherwise(F.col("__hy")),
                "__hy": F.when(F.col("__ry") == 1, F.col("__hy"))
                .when(F.col("__rx") == 1, F.lit(s - 1) - F.col("__hx"))
                .otherwise(F.col("__hx")),
            }
        )
    return d.drop("__hx", "__hy", "__rx", "__ry")
