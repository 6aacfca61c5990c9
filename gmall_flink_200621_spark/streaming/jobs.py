"""Structured Streaming variants of the windowed pipelines.

The reference is streaming-first (Flink DataStream); here each batch plan
from plans/pipelines.py has a streaming twin: same logical query over
`readStream` + `withWatermark`. Batch/stream parity is tested in
tests/test_streaming.py by replaying the events parquet as a file stream
and comparing final results against the batch plan — the reference never
had such a check (SURVEY §5: it eyeballed print() output).

Watermark policy (SURVEY §2.4 WM1/WM2): the reference used ascending or
1-3 s bounded out-of-orderness; we default to 10 s, which subsumes both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalars as S
from ..schemas import EVENTS

WATERMARK = "10 seconds"


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-replay streaming source over the events table (S1 as a stream).

    Physical-type handling (nanos vs naive micros ts) lives in
    `events_parquet_stream` — one probe, shared by every streaming job."""
    # the streaming file source requires a *directory*; stage a symlink dir
    # holding just the events file (testdata dirs mix all tables)
    import tempfile

    from ..sources.loaders import events_parquet_stream

    stage = os.path.join(tempfile.gettempdir(), "spark_graft_stream", sf_dir.strip("/").replace("/", "_"))
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return events_parquet_stream(spark, stage).withWatermark("ts", WATERMARK)


def page_view_stream(events: DataFrame) -> DataFrame:
    """Hourly PV as a stream (PageViewApp): tumbling window agg, append mode
    emits each window once its watermark passes."""
    return (
        events.filter(F.col("event_type") == "view")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("pv"))
        .select(F.col("w.end").cast("long").alias("window_end_s"), "pv")
    )


def uv_stream(events: DataFrame) -> DataFrame:
    """Hourly approx UV (UvCountWithBloomFilterApp semantics: bounded-memory
    distinct): HLL++ replaces the Bloom/Redis bitmap."""
    return (
        events.filter(F.col("event_type") == "view")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("uv_approx"))
        .select(F.col("w.end").cast("long").alias("window_end_s"), "uv_approx")
    )


def run_rules_filter_stream(events: DataFrame, rules_dir: str, query_name: str):
    """Dynamic-rules stream filter — the Flink BROADCAST-STATE pattern
    (a control stream updates rules that every parallel task applies to
    the main stream; the reference's dynamic blacklist is the keyed
    special case). A plain stream-static join will NOT do it: Spark pins
    the static side's file listing when the query starts, so a published
    rules update is invisible (and a replaced file crashes the scan). The
    correct Spark idiom is foreachBatch with the rules table RE-RESOLVED
    inside the batch function — a fresh `spark.read` per micro-batch
    re-lists the directory, picking up whatever snapshot the control
    plane last published, no restart.

    Rules table schema: `event_type string` = the currently-blocked
    types; each batch anti-joins against it. At scale the rules frame is
    dims-sized → broadcast anti hash join per batch. Publish snapshots
    with `publish_rules` (immutable snapshot dir + atomic symlink flip);
    each batch resolves the link ONCE and reads that frozen snapshot, so
    a publication landing mid-batch can neither crash the scan nor be
    half-applied. Results land in the `query_name` table (executor-side
    append, no driver collect)."""
    import re
    import shutil

    spark = events.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {query_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(re.sub(r"^file:/*", "/", warehouse), query_name.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)

    out = events.select(
        "event_id", "user_id", "event_type", F.col("ts").cast("long").alias("ts_s")
    )

    def filter_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # resolve the publication symlink up front: the batch reads ONE
        # immutable snapshot even if the control plane flips the link
        # mid-batch (plain directories resolve to themselves)
        rules_snap = os.path.realpath(rules_dir)
        rules = batch_df.sparkSession.read.schema("event_type string").parquet(rules_snap)
        batch_df.join(rules, "event_type", "left_anti").write.mode("append").saveAsTable(
            query_name
        )
        # foreachBatch runs on a CLONED session: its insert invalidates the
        # clone's relation cache, not the main session's — refresh the
        # outer catalog so readers between micro-batches see the append
        spark.catalog.refreshTable(query_name)

    return (
        out.writeStream.outputMode("append")
        .foreachBatch(filter_batch)
        .queryName(query_name + "_q")
        .start()
    )


RULES_RETAIN = 3  # snapshots kept for in-flight readers of older links


def publish_rules(spark, blocked_types, rules_path: str) -> str:
    """Atomic rules publication — the control-plane side of
    `run_rules_filter_stream`'s contract, with one enforced
    implementation instead of a docstring plea:

    1. write the snapshot to an immutable uniquely-named dir under
       `<rules_path>.snapshots/`;
    2. flip `rules_path` onto it with symlink + `os.replace` (atomic on
       POSIX) — a concurrent reader sees either the old snapshot or the
       new one, never a half-written or vanished table;
    3. retain the last RULES_RETAIN snapshots so a batch that resolved an
       older link keeps its files until it finishes.

    `rules_path` must not pre-exist as a plain directory (publish from
    the start, as the test does). Accepts a list of blocked event types
    or a ready DataFrame; returns the snapshot path."""
    import shutil as _shutil
    import uuid

    base = rules_path.rstrip("/")
    snaps_root = base + ".snapshots"
    os.makedirs(snaps_root, exist_ok=True)
    snap = os.path.join(snaps_root, uuid.uuid4().hex[:12])
    df = (
        blocked_types
        if isinstance(blocked_types, DataFrame)
        else spark.createDataFrame([(t,) for t in blocked_types], "event_type string")
    )
    df.coalesce(1).write.mode("overwrite").parquet(snap)
    tmp = f"{base}.lnk-{uuid.uuid4().hex[:8]}"
    os.symlink(snap, tmp)
    os.replace(tmp, base)
    snaps = sorted(
        (os.path.join(snaps_root, s) for s in os.listdir(snaps_root)), key=os.path.getmtime
    )
    for s in snaps[: -RULES_RETAIN]:
        _shutil.rmtree(s, ignore_errors=True)
    return snap


def market_by_channel_stream(events: DataFrame) -> DataFrame:
    """MarketByChannelApp streaming twin (W3 sliding 1h/15min): per
    (channel, behavior) counts, UNINSTALL-analog excluded
    (MarketByChannelApp.java:31-34). Same logical query as the batch
    `plans.pipelines.market_by_channel`; append mode emits each window
    once the watermark closes it."""
    return (
        events.filter(F.col("event_type") != "error")
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"),
            S.channel().alias("channel"),
            F.col("event_type").alias("behavior"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.end").cast("long").alias("window_end_s"), "channel", "behavior", "cnt")
    )


def ad_click_by_province_stream(events: DataFrame) -> DataFrame:
    """AdClickByProvinceApp count-side streaming twin (W3 sliding
    1h/20min, AdClickByProvinceApp.java:58-61): per-province click counts
    under a watermark — the stream==batch pair for
    `plans.pipelines.ad_click_by_province`."""
    return (
        events.filter(F.col("event_type") == "click")
        .groupBy(
            F.window("ts", "1 hour", "20 minutes").alias("w"),
            S.province().alias("province"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.end").cast("long").alias("window_end_s"), "province", "cnt")
    )


def hot_items_windowed_counts_stream(events: DataFrame) -> DataFrame:
    """HotItemApp stage 1 (windowed per-item counts) as an append stream.
    The Top-N stage runs per-microbatch in foreachBatch (see
    `run_hot_items_stream`) — the Spark-idiomatic place for a ranking that
    must re-emit per window (the reference's onTimer sort)."""
    return (
        events.filter(F.col("event_type") == "view")
        .withColumn("item_k", S.item_k())
        .groupBy(F.window("ts", "1 hour", "5 minutes").alias("w"), "item_k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.end").cast("long").alias("window_end_s"), "item_k", "cnt")
    )


def dedup_redelivery_stream(spark: SparkSession, sf_dir: str, within: str = "30 days") -> DataFrame:
    """Exactly-once-ification of an at-least-once source:
    `dropDuplicatesWithinWatermark` keeps per-key dedup state only until
    the watermark passes the budget — the bounded-state exact dedup
    (A5's streaming form for duplicate DELIVERY, complementing the
    per-window distinct-user dedup). The staged source re-delivers every
    7th event in a later file, so the operator is genuinely exercised;
    output must equal the distinct batch rows."""
    import tempfile

    import pyarrow.parquet as pq

    stage = tempfile.mkdtemp(prefix="spark_graft_redeliver_")
    pdf = (
        pq.read_table(os.path.join(sf_dir, "events.parquet"))
        .to_pandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    pdf.to_parquet(os.path.join(stage, "part-0.parquet"), index=False)
    pdf.iloc[::7].to_parquet(os.path.join(stage, "part-1.parquet"), index=False)  # re-delivery
    from ..sources.loaders import events_parquet_stream

    raw = events_parquet_stream(spark, stage, maxFilesPerTrigger=1)
    return (
        raw.withWatermark("ts", within)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", F.col("ts").cast("long").alias("ts_s"), "event_type")
    )


def order_receipt_join_stream(spark: SparkSession, sf_dir: str, delay: str = "30 days") -> DataFrame:
    """J1 as Spark's NATIVE stream-stream interval join — the exact
    streaming analog of `intervalJoin.between(-3s, +5s)` on txId
    (OrderReceiptAppWithJoin.java:58-61): two independent watermarked
    streams, equi key + event-time band, inner join.

    Spark's symmetric hash join emits matches eagerly and uses the
    watermark + band to evict buffered rows, exactly Flink's interval-join
    state retention. `delay` is the WM2 out-of-orderness budget: it must
    cover the source's worst reordering (the staged replay defers rows by
    up to one chunk span ≈ 10 days, so 30 days keeps results batch-exact;
    a production deployment would use the reference's seconds-scale
    delay, trading late matches for state size)."""
    from ..plans.pipelines import RECEIPT_HI, RECEIPT_LO
    from .late_data import staged_replay_source

    pays = (
        staged_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("pay_id"), F.col("ts").alias("pay_ts"))
        .withWatermark("pay_ts", delay)
    )
    receipts = (
        staged_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("receipt_id"),
            F.col("ts").alias("receipt_ts"),
        )
        .withWatermark("receipt_ts", delay)
    )
    lo, hi = F.expr(f"INTERVAL {RECEIPT_LO}"), F.expr(f"INTERVAL {RECEIPT_HI}")
    return (
        pays.join(
            receipts,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("receipt_ts") >= F.col("pay_ts") - lo)
            & (F.col("receipt_ts") <= F.col("pay_ts") + hi),
            "inner",
        )
        .select(
            "user_id",
            "pay_id",
            F.col("pay_ts").cast("long").alias("pay_ts_s"),
            "receipt_id",
            F.col("receipt_ts").cast("long").alias("receipt_ts_s"),
        )
    )


RECEIPT_SALTS = 8  # sub-keys a hot join key spreads across
RECEIPT_HOT_THRESHOLD = 1000  # per-key row count above which a key salts


def hot_join_keys(df: DataFrame, key: str, threshold: int) -> list:
    """Keys whose row count reaches `threshold` — the hot-key list a
    salted join plants into its plan. BOUNDED driver read by
    construction: at most total_rows/threshold keys can clear the bar,
    so the collect is small no matter how big the table (at 100 TB with
    threshold 10⁶ that is ≤ 10⁸/task-sized... in practice dozens)."""
    return [
        r[0]
        for r in df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
        .select(key)
        .collect()
    ]


def order_receipt_join_stream_salted(
    spark: SparkSession,
    sf_dir: str,
    delay: str = "30 days",
    n_salts: int = RECEIPT_SALTS,
    hot_threshold: int = RECEIPT_HOT_THRESHOLD,
    hot_ids: list | None = None,
) -> DataFrame:
    """`order_receipt_join_stream` hardened against JOIN-KEY SKEW
    (VERDICT r08 item #7): a hot txId/user concentrates every buffered
    row of both streams in ONE state-store partition of the symmetric
    hash join — the task that owns it becomes the straggler and, at
    100 TB, the OOM. The fix is targeted salting: keys on a hot list
    split into `n_salts` sub-keys on the pays side (salt =
    hash(pay_id) % n_salts — derived from the row id, so a pay lands in
    exactly one sub-partition), and the receipts side REPLICATES hot-key
    rows across all n_salts sub-keys; non-hot keys keep salt 0 and pay
    no replication. Every (pay, receipt) pair therefore meets exactly
    once — at the pay's salt — and the output is row-identical to the
    unsalted join (pinned in tests) while the hot key's state spreads
    over n_salts partitions (per-task bound pinned too).

    The hot list comes from `hot_join_keys` over the HISTORICAL batch
    table (the standard deployment pattern: audit yesterday's key
    distribution — `skew_audit` is exactly this signal — and plant the
    list into today's streaming plan; a bounded driver read). Pass
    `hot_ids` to override. AQE's runtime skew-join split does this
    automatically for BATCH shuffles but does not apply to streaming
    state partitioning — hence the explicit salt."""
    from ..plans.pipelines import RECEIPT_HI, RECEIPT_LO
    from ..sources.loaders import load_table
    from .late_data import staged_replay_source

    if hot_ids is None:
        pays_hist = load_table(spark, sf_dir, "events").filter(
            F.col("event_type") == "purchase"
        )
        hot_ids = hot_join_keys(pays_hist, "user_id", hot_threshold)
    is_hot = F.col("user_id").isin(hot_ids) if hot_ids else F.lit(False)

    pays = (
        staged_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("pay_id"),
            F.col("ts").alias("pay_ts"),
            F.when(is_hot, F.pmod(F.xxhash64("event_id"), F.lit(n_salts)))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("salt"),
        )
        .withWatermark("pay_ts", delay)
    )
    receipts = (
        staged_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("receipt_id"),
            F.col("ts").alias("receipt_ts"),
            F.when(
                F.col("user_id").isin(hot_ids) if hot_ids else F.lit(False),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            )
            .otherwise(F.array(F.lit(0)))
            .alias("salts"),
        )
        .withWatermark("receipt_ts", delay)
        .withColumn("r_salt", F.explode("salts"))
        .drop("salts")
    )
    lo, hi = F.expr(f"INTERVAL {RECEIPT_LO}"), F.expr(f"INTERVAL {RECEIPT_HI}")
    return (
        pays.join(
            receipts,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("salt") == F.col("r_salt"))
            & (F.col("receipt_ts") >= F.col("pay_ts") - lo)
            & (F.col("receipt_ts") <= F.col("pay_ts") + hi),
            "inner",
        )
        .select(
            "user_id",
            "pay_id",
            F.col("pay_ts").cast("long").alias("pay_ts_s"),
            "receipt_id",
            F.col("receipt_ts").cast("long").alias("receipt_ts_s"),
        )
    )


def run_hot_items_retract_stream(
    spark: SparkSession, sf_dir: str, top_n: int = 5, queryName: str = "hot_items_retract"
):
    """Retract-stream parity for the SQL Top-N (HotItemsWithSQLApp.java:65
    `toRetractStream`): downstream sees (is_add, row) pairs — every ranking
    change emits a retraction of the old row then an addition of the new,
    exactly Flink's retract encoding at micro-batch granularity.

    Shape: events explode into their 12 sliding-window assignments
    (stateless), then ONE `applyInPandasWithState` keyed by window fuses
    count + rank + diff — per-window item counts and the current top-N
    live in keyed state on the executors, and only the (is_add, row)
    delta rows leave the operator. No driver-side state, no collect():
    Spark disallows a stateful map after a streaming aggregation, so the
    aggregation moves INTO the keyed state instead of feeding it. State
    per key is O(items-in-window) — the same cardinality the windowed
    aggregate itself would hold — and delta traffic is O(rank changes).
    No watermark is set, so every late update still retracts-and-replaces
    (the unbounded-state trade Flink's retract mode makes too)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions import scalars as S
    from .late_data import staged_replay_source

    assigns = (
        staged_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(S.item_k().alias("item_k"), F.col("ts").cast("long").alias("ts_s"))
        # windows ending at the next 5-min boundary and the 11 after it
        .withColumn("first_end", (F.floor(F.col("ts_s") / 300) + 1) * 300)
        .select(
            "item_k",
            F.explode(
                F.sequence(F.col("first_end"), F.col("first_end") + 11 * 300, F.lit(300))
            ).alias("window_end_s"),
        )
    )

    def topn_retract_fn(key, pdf_iter, state):
        (wend,) = key
        st = state.get if state.exists else ([], [], [], [], [])
        counts = dict(zip(st[0] or [], st[1] or []))
        old = {
            int(i): (int(c), int(r))
            for i, c, r in zip(st[2] or [], st[3] or [], st[4] or [])
        }
        for pdf in pdf_iter:
            for item, n in pdf["item_k"].value_counts().items():
                counts[int(item)] = counts.get(int(item), 0) + int(n)
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
        new = {item: (cnt, i + 1) for i, (item, cnt) in enumerate(ranked)}
        out = []
        for item, (cnt, rank) in old.items():  # retract first, like Flink
            if new.get(item) != (cnt, rank):
                out.append((False, wend, item, cnt, rank))
        for item, (cnt, rank) in new.items():
            if old.get(item) != (cnt, rank):
                out.append((True, wend, item, cnt, rank))
        state.update(
            (
                list(counts.keys()),
                list(counts.values()),
                [i for i in new],
                [c for c, _ in new.values()],
                [r for _, r in new.values()],
            )
        )
        if out:
            yield pd.DataFrame(
                out, columns=["is_add", "window_end_s", "item_k", "cnt", "rank"]
            )

    deltas = assigns.groupBy("window_end_s").applyInPandasWithState(
        topn_retract_fn,
        outputStructType="is_add BOOLEAN, window_end_s LONG, item_k INT, cnt LONG, rank INT",
        stateStructType=(
            "items ARRAY<LONG>, cnts ARRAY<LONG>, "
            "top_items ARRAY<LONG>, top_cnts ARRAY<LONG>, top_ranks ARRAY<LONG>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        deltas.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    )


def sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows as a STREAM — the streaming twin of
    `plans/extras.sessionize_native`. `session_window` under a watermark
    merges per-key session fragments across micro-batches and emits a
    session (append mode) once the watermark passes its close (last event
    + gap): Flink's EventTimeSessionWindows analog, running on the same
    engine path as the batch form.

    Event times are truncated to whole seconds BEFORE the watermark so
    stream and batch see identical session splits (the batch twin
    truncates too — gap comparison happens on the input precision)."""
    import tempfile

    from ..plans.extras import SESSION_GAP_S
    from ..sources.loaders import events_parquet_stream

    stage = os.path.join(
        tempfile.gettempdir(), "spark_graft_stream", sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    events = (
        events_parquet_stream(spark, stage)
        .withColumn("ts", F.timestamp_seconds(F.col("ts").cast("long")))
        .withWatermark("ts", WATERMARK)
    )
    return (
        events.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.col("ts").cast("long")).alias("session_end_s"),
        )
        .select(
            "user_id",
            F.col("sw.start").cast("long").alias("session_start_s"),
            "session_end_s",
            "n_events",
        )
    )


def run_hot_items_stream(spark: SparkSession, sf_dir: str, top_n: int = 5, queryName: str = "hot_items_stream"):
    """End-to-end streaming Top-N: windowed counts (append mode past the
    watermark) → per-batch row_number ranking in foreachBatch → memory
    sink table named `queryName`. The ranking runs as a distributed batch
    job inside foreachBatch and the sink write is executor-side — no
    driver collect anywhere on the path."""
    from ..operators.topn import top_n_per_group

    counts = hot_items_windowed_counts_stream(events_stream(spark, sf_dir))

    def rank_batch(batch_df: DataFrame, epoch_id: int) -> None:
        ranked = top_n_per_group(batch_df, ["window_end_s"], "cnt", top_n, tiebreak_cols=["item_k"])
        ranked.write.mode("append").saveAsTable(queryName)

    spark.sql(f"DROP TABLE IF EXISTS {queryName}")
    # the warehouse dir outlives the in-memory catalog across sessions; a
    # stale location would fail the first saveAsTable (same cleanup as
    # sources/bucketed.py)
    import re
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(re.sub(r"^file:/*", "/", warehouse), queryName.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)
    return (
        counts.writeStream.outputMode("append")
        .foreachBatch(rank_batch)
        .queryName(queryName + "_q")
        .start()
    )


def _gate_epoch(batch_df: DataFrame, epoch_id: int, kept_t: str, audit_t: str) -> None:
    """One micro-batch of the quality gate, written idempotently: score,
    stamp the epoch, dynamic-partition-OVERWRITE each sink's epoch
    partition. Calling this twice with the same (batch, epoch) leaves the
    tables unchanged — the unit the crash-replay test exercises directly."""
    from ..operators.textops import quality_gopher

    s = batch_df.sparkSession
    scored = quality_gopher(batch_df).withColumn("epoch", F.lit(epoch_id)).persist()
    prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        scored.filter(F.col("keep") == 1).write.mode("overwrite").insertInto(kept_t, overwrite=True)
        scored.filter(F.col("keep") == 0).write.mode("overwrite").insertInto(audit_t, overwrite=True)
    finally:
        s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        scored.unpersist()


def run_quality_gate_stream(
    spark: SparkSession,
    sf_dir: str,
    name: str = "quality_gate",
    stage_dir: str | None = None,
    checkpoint_dir: str | None = None,
    reset_tables: bool = True,
):
    """Streaming quality gate with a REJECT-side audit table — the
    side-output convention (HotUrlApp.java:52-61's late-data tag) applied
    to corpus curation: documents stream in, `quality_gopher`'s rule
    flags are computed per micro-batch, keepers append to `<name>_kept`
    and every reject lands in `<name>_audit` WITH its failing rule flags
    (a silent drop is how a quality regression eats a corpus unnoticed —
    the audit table is what you sample to see WHICH rule fired).

    The rules are stateless row-local expressions, so stream==batch holds
    exactly: kept ∪ audit partitions the corpus, and flags equal the
    batch operator's row for every doc. foreachBatch (not two
    writeStreams) so one scan feeds both sinks per batch.

    Crash semantics: both sinks are PARTITIONED BY the micro-batch epoch
    and written with dynamic-partition OVERWRITE (`_gate_epoch`), so a
    replayed epoch — foreachBatch's at-least-once case after a crash
    mid-batch — rewrites exactly its own partition instead of appending
    duplicates. The rules are deterministic functions of the batch rows,
    so the replay writes byte-identical content: effectively-once
    without a transactional table format."""
    from .ingest import _drop_table, stage_document_chunks

    kept_t, audit_t = f"{name}_kept", f"{name}_audit"
    if reset_tables:
        for t in (kept_t, audit_t):
            _drop_table(spark, t)
        cols = (
            "doc_id BIGINT, n_words INT, mean_word_len DOUBLE, stop_count INT, "
            "top_unigram_ratio DOUBLE, flag_word_count INT, flag_mean_word_len INT, "
            "flag_stopwords INT, flag_repetition INT, keep INT"
        )
        for t in (kept_t, audit_t):
            spark.sql(
                f"CREATE TABLE {t} ({cols}, epoch BIGINT) USING parquet PARTITIONED BY (epoch)"
            )

    stage = stage_dir or stage_document_chunks(sf_dir)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    docs = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)

    def gate_batch(batch_df: DataFrame, epoch_id: int) -> None:
        _gate_epoch(batch_df, epoch_id, kept_t, audit_t)

    w = docs.writeStream.foreachBatch(gate_batch).queryName(f"{name}_q")
    if checkpoint_dir:
        # restart with the same (stage_dir, checkpoint_dir, reset_tables=
        # False) and only unseen files are read — same recovery contract
        # as run_corpus_ingest_stream (clean stop = exactly-once; crash
        # mid-batch can double the interrupted batch's appends)
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()


def sessionize_dynamic_gap_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic PER-EVENT gap session windows as a stream — the twin of
    `plans/extras.sessionize_dynamic_gap` (error events hold sessions
    open 300 s, everything else 1800 s). Column-typed gapDuration works
    identically under a watermark: fragments merge across micro-batches
    on the running max of per-event extents, sessions emit (append) when
    the watermark passes their end-inclusive close."""
    import tempfile

    from ..plans.extras import ERROR_GAP_S, SESSION_GAP_S
    from ..sources.loaders import events_parquet_stream

    stage = os.path.join(
        tempfile.gettempdir(), "spark_graft_stream", sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    events = (
        events_parquet_stream(spark, stage)
        .withColumn("ts", F.timestamp_seconds(F.col("ts").cast("long")))
        .withWatermark("ts", WATERMARK)
    )
    gap = F.when(F.col("event_type") == "error", F.lit(f"{ERROR_GAP_S} seconds")).otherwise(
        F.lit(f"{SESSION_GAP_S} seconds")
    )
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").cast("long").alias("session_start_s"),
            F.col("sw.end").cast("long").alias("session_end_s"),
            "n_events",
        )
    )
