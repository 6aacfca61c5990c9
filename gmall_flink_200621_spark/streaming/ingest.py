"""Incremental corpus ingest: the streaming form of the training-data prep
pipeline (plans/training.corpus_prep's dedup ∘ quality ∘ lang gates).

A production corpus is not built in one batch — documents arrive
continuously and each increment must be deduplicated against EVERYTHING
already accepted, then quality-gated, then appended. This module runs that
loop on Structured Streaming:

  docs stream → foreachBatch:
      fingerprint (md5)                       — operators/dedup machinery
    → in-batch exact dedup (min doc_id / fp)
    → cross-batch dedup: left_anti against the accumulated fingerprint
      table (every fp ever seen, accepted or rejected — a re-sent
      duplicate of a rejected doc must not be re-evaluated)
    → quality + language gates (same thresholds as corpus_prep)
    → append accepted rows to `<name>_kept`, new fps to `<name>_fps`

Both tables are day-one warehouse tables (parquet via saveAsTable); the
anti-join probe is a shuffle join on the 16-byte fp. At 100 TB the fp
table is the corpus' fingerprint index — bucketed by fp it joins
co-located, and a bloom/cuckoo filter in front absorbs the common
no-hit case; the foreachBatch body is identical.

Exactness: replaying the corpus ordered by doc_id reproduces the batch
pipeline exactly — the min-doc_id copy of every duplicate group arrives
first (in-batch min handles same-chunk ties), and exact duplicates share
byte-identical text, hence identical quality/lang verdicts. The test
asserts set equality of kept doc_ids against batch corpus_prep.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUALITY_MIN = 0.5  # same gates as plans/training.corpus_prep
LANG_KEEP = "en"


def _drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(re.sub(r"^file:/*", "/", warehouse), name.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)


def stage_document_chunks(sf_dir: str, n_chunks: int = 5) -> str:
    """Split documents.parquet into n_chunks files ordered by doc_id — the
    chunked-arrival replay source (one file per micro-batch)."""
    import pyarrow.parquet as pq

    stage = tempfile.mkdtemp(prefix="spark_graft_ingest_")
    pdf = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    n = len(pdf)
    base = None
    for i in range(n_chunks):
        lo, hi = i * n // n_chunks, (i + 1) * n // n_chunks
        path = os.path.join(stage, f"part-{i}.parquet")
        pdf.iloc[lo:hi].to_parquet(path, index=False)
        # FileStreamSource orders files by modification time; chunks written
        # within the same mtime granularity would tie and could be picked up
        # out of doc_id order, breaking the kept==batch replay equivalence.
        # Pin strictly increasing mtimes so arrival order IS doc_id order.
        if base is None:
            base = os.stat(path).st_mtime
        os.utime(path, (base + i, base + i))
    return stage


def run_corpus_ingest_stream(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 5,
    name: str = "corpus_ingest",
    stage_dir: str | None = None,
    checkpoint_dir: str | None = None,
    reset_tables: bool = True,
):
    """Start the ingest stream; returns the StreamingQuery. Results land in
    tables `<name>_kept` (accepted docs + stats) and `<name>_fps` (every
    fingerprint ever seen).

    Restartability: pass the same (stage_dir, checkpoint_dir) with
    reset_tables=False and a new invocation resumes from the checkpointed
    source offset — already-ingested chunks are not re-read, and the kept/
    fps tables continue accumulating. (foreachBatch output is
    at-least-once on a CRASH mid-batch — the fps anti-join makes a
    replayed batch re-converge for dedup, but kept rows of the interrupted
    batch could double; a clean stop() is exactly-once.)

    Reader caveat: the stream appends through the micro-batch's CLONED
    session, which does not invalidate other sessions' cached file
    listings for these parquet catalog tables — a session that read
    `<name>_kept` before a restart must `spark.catalog.refreshTable` it
    (or reopen) to see post-restart appends. (A transactional table
    format lifts this; the ingest logic is unchanged.)"""
    from ..operators.dedup import doc_fingerprints
    from ..operators.textops import doc_stats, lang_id, token_counts

    kept_t, fps_t = f"{name}_kept", f"{name}_fps"
    if reset_tables:
        for t in (kept_t, fps_t):
            _drop_table(spark, t)
        spark.sql(f"CREATE TABLE {kept_t} (doc_id BIGINT, n_tokens INT, n_bpe_est BIGINT, quality_score DOUBLE) USING parquet")
        spark.sql(f"CREATE TABLE {fps_t} (fp STRING) USING parquet")

    stage = stage_dir or stage_document_chunks(sf_dir, n_chunks)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    docs = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)

    def ingest_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.persist()
        # in-batch exact dedup: canonical (min) doc_id per fingerprint
        fps = doc_fingerprints(batch_df)
        canon = fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        # cross-batch dedup: drop fingerprints the corpus has already seen
        seen = batch_df.sparkSession.table(fps_t)
        fresh = canon.join(seen, "fp", "left_anti").persist()
        # quality + language gates on the surviving canonical docs
        survivors = batch_df.join(fresh.select("doc_id"), "doc_id")
        gated = (
            doc_stats(survivors)
            .select("doc_id", "n_tokens", "quality_score")
            .join(lang_id(survivors), "doc_id")
            .join(token_counts(survivors).select("doc_id", "n_bpe_est"), "doc_id")
            .filter((F.col("quality_score") >= QUALITY_MIN) & (F.col("lang_pred") == LANG_KEEP))
            .select("doc_id", "n_tokens", "n_bpe_est", "quality_score")
        )
        # ORDERING MATTERS: the kept-docs write goes first, the fps append
        # LAST. `fresh`'s plan anti-joins the fps table, and a persisted
        # frame can still be recomputed (cache eviction, canonicalization
        # miss across the catalog-table file-listing change); with the
        # append last, any recompute reads the PRE-batch fingerprint state
        # and stays correct — mutate-after-read, never read-after-mutate.
        gated.write.mode("append").saveAsTable(kept_t)
        fresh.select("fp").write.mode("append").saveAsTable(fps_t)
        fresh.unpersist()
        batch_df.unpersist()

    w = docs.writeStream.outputMode("append").foreachBatch(ingest_batch).queryName(name + "_q")
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()
