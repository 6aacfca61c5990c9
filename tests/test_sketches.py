"""HLL sketch rollup (A6 scale path) + streaming exact-UV via
dropDuplicates (A5 streaming rewrite per SURVEY §2.5)."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestSketchRollup:
    def test_merged_estimate_close_to_exact(self, spark, sf_dir):
        from gmall_flink_200621_spark.plans.extras import uv_sketch_rollup
        from gmall_flink_200621_spark.sources.loaders import load_table

        row = uv_sketch_rollup(spark, sf_dir).first()
        exact = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "view")
            .select("user_id")
            .distinct()
            .count()
        )
        # exact uv is hash-checked by the oracle; est_ok carries the in-query
        # assertion that the merged-daily HLL estimate is within 5% of exact
        assert row.uv == exact
        assert row.est_ok is True
        assert row.n_days >= 28


class TestStreamingExactUV:
    def test_dropduplicates_uv_matches_batch(self, spark, sf_dir):
        """Streaming exact UV: dedupe (user, window) with a watermark, then
        count per window — the bounded-state exact alternative to HLL."""
        from gmall_flink_200621_spark.plans.pipelines import uv_exact
        from gmall_flink_200621_spark.streaming.jobs import events_stream

        views = events_stream(spark, sf_dir).filter(F.col("event_type") == "view")
        deduped = views.withColumn("w", F.window("ts", "1 hour")).dropDuplicates(["user_id", "w"])
        counts = (
            deduped.groupBy("w")
            .agg(F.count(F.lit(1)).alias("uv"))
            .select(F.col("w.end").cast("long").alias("window_end_s"), "uv")
        )
        q = counts.writeStream.outputMode("append").format("memory").queryName("uv_dd").start()
        q.processAllAvailable()
        q.stop()
        got = {r.window_end_s: r.uv for r in spark.sql("SELECT * FROM uv_dd").collect()}
        expected = {r.window_end_s: r.uv for r in uv_exact(spark, sf_dir).collect()}
        assert got
        assert all(expected.get(k) == v for k, v in got.items())
        assert len(got) >= len(expected) - 1  # last window may be held by the watermark


class TestCountMinSketch:
    def test_never_undercounts_and_tight_on_testdata(self, spark, sf_dir):
        from gmall_flink_200621_spark.operators.frequency import CMS_TOP_K, term_counts_cms
        from gmall_flink_200621_spark.sources.loaders import load_table

        out = term_counts_cms(load_table(spark, sf_dir, "documents")).collect()
        assert len(out) == CMS_TOP_K
        assert all(r.overcount >= 0 for r in out)  # CMS never undercounts
        assert all(r.cms_est == r.exact_n + r.overcount for r in out)

    def test_planted_collision_overcounts_min_property(self, spark):
        """With width≫vocab there are no collisions → est == exact; with
        width=1 every term collides into one cell → est == total tokens."""
        from gmall_flink_200621_spark.operators.frequency import term_counts_cms

        docs = spark.createDataFrame(
            [(1, "x x x y z"), (2, "y z z q r")], "doc_id long, text string"
        )
        wide = {r.term: r for r in term_counts_cms(docs, width=1 << 16, k=10).collect()}
        assert all(r.overcount == 0 for r in wide.values())
        narrow = {r.term: r for r in term_counts_cms(docs, width=1, k=10).collect()}
        assert all(r.cms_est == 10 for r in narrow.values())  # 10 tokens total
