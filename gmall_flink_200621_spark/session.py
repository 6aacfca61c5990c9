"""SparkSession factory tuned for this engine.

Local-mode defaults match the test/bench environment (single JVM,
``local[N]``), but every setting here is chosen to also be correct on a
large multi-executor cluster: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), shuffle partitions sized explicitly, Arrow enabled
for the Pandas-UDF paths, and the session timezone pinned to UTC so
event-time window math agrees with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def sf_namespace(sf_dir: str) -> str:
    """Deterministic warehouse-table namespace suffix for a data directory.

    Stream-maintained registry queries materialize fixed-name catalog
    tables; two harnesses sharing one warehouse (e.g. pytest at sf0.001
    alongside verify_oracle at sf0.1) would cross-contaminate each other's
    state. Suffixing every state-table name with a stable hash of the
    input directory makes concurrent runs at different SFs collision-free
    while keeping reruns at the same SF replay-idempotent (same name →
    same dynamic-overwrite partitions). crc32, not ``hash()``: Python
    salts str hashes per process, and the name must be stable so a replay
    in a NEW process overwrites the same table rather than leaking one
    orphan table per run. The path is realpath-normalized first, so
    'data/sf0.01', 'data/sf0.01/' and an absolute spelling of the same
    directory all map to the same namespace.
    """
    import zlib

    return f"{zlib.crc32(os.path.realpath(sf_dir).encode('utf-8')) % 10**8:08d}"


def get_spark(
    app_name: str = "gmall_flink_200621_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    On a real cluster, ``master`` comes from spark-submit and
    ``shuffle_partitions`` should be ~2-3x total cores; locally we default
    to ``local[$SPARK_GRAFT_CPUS]`` and one partition per core.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime bloom-filter join pruning: on a cluster, the selective
        # side of a shuffle join seeds a bloom filter that prunes the big
        # side's scan (no effect at test scale — creation threshold 10 MB)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # zstd for all parquet writes: ~25-35% smaller files than the
        # snappy default at comparable CPU — at 100 TB that's tens of TB
        # of storage and proportionally less scan I/O on every read
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
