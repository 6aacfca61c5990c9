"""Allowed lateness + late-data side output + upsert Top-N (SURVEY §2.4
W7/W8, §2.6 T3 — the reference's HotUrlApp/HotUrlApp2, the hardest
streaming parity case).

Flink semantics being reproduced (HotUrlApp.java:52-61, HotUrlApp2.java:111-190):
- a window keeps accepting (and re-firing for) late events until
  `window.end + allowedLateness <= watermark`; each re-fire REPLACES the
  key's previous row (HotUrlApp2's MapState upsert, T3);
- an event whose every window has expired goes to the side output
  (`sideOutputLateData`, W8) instead of vanishing;
- watermark = max event time − bounded out-of-orderness (WM2).

Spark's built-in windowed aggregation drops beyond-watermark rows
*silently*, so the exact semantics live in a foreachBatch state machine
(per SURVEY §7.4: "exact re-fire semantics need stateful op"): the
un-aggregated click stream arrives in micro-batches, and the handler owns
watermark tracking, per-(window,key) counts, expiry, the side output, and
the per-fire Top-N upsert. State is a driver-side dict here (observable in
tests); at scale it is the same algorithm over a keyed store (RocksDB
state store / Delta MERGE) with the watermark broadcast from the engine.

The staged replay source makes the scenario real: time-contiguous chunks
so the watermark advances batch by batch, plus a jittered fraction of
each chunk deferred to the next file — those arrive late by up to a chunk
span, some within the lateness budget (window re-fires) and some beyond
it (side output).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalars as S
from ..operators.topn import top_n_per_group

WINDOW_S = 600  # 10 min window (W2)
SLIDE_S = 300  # 5 min slide
OUT_OF_ORDER_S = 3600  # WM2, scaled to testdata density
ALLOWED_LATENESS_S = 5 * 86400  # W7 budget, scaled (reference: 60 s on demo data)
LATE_FRACTION = 0.05  # of each chunk deferred one batch

# per query name: watermark, live counts, expired-window drop counts,
# re-fired (window,key) pairs, side-output events, final ranking
STATE: dict[str, dict] = {}


def staged_replay_source(spark: SparkSession, sf_dir: str, n_files: int = 3) -> DataFrame:
    """Replay the events table as n time-contiguous micro-batches with a
    deterministic ~5% of each chunk deferred to the next batch (late
    arrivals spanning both sides of the lateness budget)."""
    import pyarrow.parquet as pq

    stage = tempfile.mkdtemp(prefix="spark_graft_late_")
    pdf = (
        pq.read_table(os.path.join(sf_dir, "events.parquet"))
        .to_pandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    n = len(pdf)
    bounds = [(i * n // n_files, (i + 1) * n // n_files) for i in range(n_files)]
    files: list[list] = [[] for _ in range(n_files)]
    for i, (lo, hi) in enumerate(bounds):
        chunk = pdf.iloc[lo:hi]
        # defer every 20th event (deterministic) to the next file
        late_mask = (chunk.index % int(1 / LATE_FRACTION)) == 0
        if i + 1 < n_files:
            files[i + 1].append(chunk[late_mask])
            files[i].append(chunk[~late_mask])
        else:
            files[i].append(chunk)
    import pandas as pd

    for i in range(n_files):
        pd.concat(files[i]).to_parquet(os.path.join(stage, f"part-{i}.parquet"), index=False)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = "event_id long, ts long, user_id long, event_type string, value double, props string"
    raw = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def _window_ends(ts_s: int) -> list[int]:
    """Epoch-aligned sliding-window ends containing ts (same assignment as
    F.window / the DuckDB oracle)."""
    bucket = ts_s - ts_s % SLIDE_S
    return [bucket + j * SLIDE_S for j in range(1, WINDOW_S // SLIDE_S + 1)]


def run_hot_urls_late_stream(
    spark: SparkSession, sf_dir: str, top_n: int = 5, query_name: str = "hot_urls_late"
):
    """HotUrlApp2 end-to-end with exact Flink lateness semantics."""
    clicks = (
        staged_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("ts").cast("long").alias("ts_s"), S.url_k().alias("url_k"))
    )

    st = STATE[query_name] = {
        "wm": float("-inf"),
        "counts": {},  # (wend, url) -> cnt, live windows only
        "dropped": {},  # (wend, url) -> cnt dropped after expiry (for conservation)
        "refires": set(),  # (wend, url) updated after first fire
        "side": [],  # events with every window expired (W8)
        "ranking": [],
    }

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.collect()
        if not rows:
            return
        wm = st["wm"]
        for r in rows:
            any_open = False
            for wend in _window_ends(r.ts_s):
                if wend + ALLOWED_LATENESS_S > wm:  # window still accepts (W7)
                    key = (wend, r.url_k)
                    st["counts"][key] = st["counts"].get(key, 0) + 1
                    if wend <= wm:  # window already fired once → this is a re-fire
                        st["refires"].add(key)
                    any_open = True
                else:  # expired window: count what batch mode would have credited
                    dkey = (wend, r.url_k)
                    st["dropped"][dkey] = st["dropped"].get(dkey, 0) + 1
            if not any_open:
                st["side"].append((r.ts_s, r.url_k))  # W8 side output
        # advance the watermark exactly like WM2: max event time − delay
        st["wm"] = max(wm, max(r.ts_s for r in rows) - OUT_OF_ORDER_S)
        # T3: upsert + re-rank from the replaced counts
        data = [(w, u, c) for (w, u), c in st["counts"].items()]
        if data:
            ranked = top_n_per_group(
                spark.createDataFrame(data, "window_end_s long, url_k string, cnt long"),
                ["window_end_s"],
                "cnt",
                top_n,
                tiebreak_cols=["url_k"],
            )
            st["ranking"] = ranked.collect()

    return clicks.writeStream.outputMode("append").foreachBatch(on_batch).queryName(query_name).start()
