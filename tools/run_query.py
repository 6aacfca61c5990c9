"""Run any registry query by name against a testdata scale factor.

    python tools/run_query.py <query> [sf_dir] [--explain] [--show[=N]]

Examples:
    python tools/run_query.py hot_items
    python tools/run_query.py tpch_q2 /root/testdata/sf0.1 --explain
    python tools/run_query.py doc_chunks --show=5

Lists all queries when called without arguments. Uses a plain local
session (the same shape the driver uses), prints row count and wall
time; `--explain` prints the formatted physical plan instead of
executing, `--show N` displays the first N rows after counting.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    show_n = 0
    for f in flags:
        if f.startswith("--show"):
            show_n = int(f.split("=", 1)[1]) if "=" in f else 10

    import __spark_entry__ as entry

    queries = entry.queries()
    if not args:
        print(f"{len(queries)} queries:")
        for name in queries:
            print(f"  {name}")
        return

    name = args[0]
    if name not in queries:
        sys.exit(f"unknown query {name!r} — run with no arguments to list")
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    df = queries[name](spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
        return
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"{name} @ {sf_dir}: {n} rows in {dt:.2f}s")
    if show_n:
        df.show(show_n, truncate=False)


if __name__ == "__main__":
    main()
