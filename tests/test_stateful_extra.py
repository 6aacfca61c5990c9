"""Streaming tests for the remaining §2.9 stateful wirings: blacklist
(A7/A8/P9) and pay↔receipt reconcile (J2)."""

from __future__ import annotations

from collections import Counter

import pytest


def _run(spark, sf_dir, build, name):
    from gmall_flink_200621_spark.streaming.jobs import events_stream

    out = build(events_stream(spark, sf_dir))
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").toPandas()


class TestBlacklistStream:
    def test_warning_emitted_once_and_clicks_suppressed(self, spark, sf_dir):
        from gmall_flink_200621_spark.plans.pipelines import ad_click_blacklist
        from gmall_flink_200621_spark.streaming.stateful import blacklist_stream

        got = _run(spark, sf_dir, blacklist_stream, "bl_stream")
        warnings = got[got.tag == "blacklist_warning"]
        # exactly one warning per (user, ad, day) that crossed the cap
        assert warnings.duplicated(["user_id", "ad_k", "day_s"]).sum() == 0
        # warned pairs must be exactly the batch blacklist (same threshold)
        batch = ad_click_blacklist(spark, sf_dir).toPandas()
        w = set(map(tuple, warnings[["user_id", "ad_k", "day_s"]].values.tolist()))
        b = set(map(tuple, batch[["user_id", "ad_k", "day_s"]].values.tolist()))
        assert w == b
        # passed-through clicks stay below the cap per key/day
        clicks = got[got.tag == "click"]
        per_key = clicks.groupby(["user_id", "ad_k", "day_s"]).size()
        from gmall_flink_200621_spark.streaming.stateful import BLACKLIST_THRESHOLD

        assert (per_key < BLACKLIST_THRESHOLD).all()


class TestPayReceiptStream:
    def test_reconcile_tags_and_timeouts(self, spark, sf_dir):
        from gmall_flink_200621_spark.streaming.stateful import pay_receipt_stream

        got = _run(spark, sf_dir, pay_receipt_stream, "pr_stream")
        tags = Counter(got.tag)
        assert tags["matched"] > 0
        # matched rows carry both sides; diagnostics carry exactly one
        m = got[got.tag == "matched"]
        assert m.pay_ts_s.notna().all() and m.receipt_ts_s.notna().all()
        lone_pay = got[got.tag == "payButNoReceipt"]
        assert lone_pay.receipt_ts_s.isna().all()
        lone_receipt = got[got.tag == "receiptButNoPay"]
        assert lone_receipt.pay_ts_s.isna().all()
