"""Direct unit tests for the transformWithStateInPandas processors
(streaming/stateful.py) via fake handles — the TWS driver worker needs
google.protobuf (absent in this env), but the per-key logic is plain
Python over pandas and fully testable without a cluster.

Also pins the cross-wiring agreement the two stateful paths must keep:
the TWS processor and the portable applyInPandasWithState function are
the SAME operator, so identical inputs must give identical outputs
(two-creates-then-pay, same-side double-buffering, asymmetric waits).
"""

from __future__ import annotations

import pandas as pd
import pytest

from gmall_flink_200621_spark.streaming.stateful import (
    BLACKLIST_THRESHOLD,
    BlacklistProcessor,
    LoginFailProcessor,
    OrderTimeoutProcessor,
    PayReceiptProcessor,
    ORDER_TIMEOUT_S,
    _order_timeout_fn,
    _pay_receipt_fn,
)


# ----------------------------------------------------------------- fakes


class FakeValueState:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None

    def exists(self):
        return self._v is not None


class FakeHandle:
    def __init__(self):
        self.states: dict[str, FakeValueState] = {}
        self.timers: list[int] = []

    def getValueState(self, name, schema):
        st = self.states.setdefault(name, FakeValueState())
        return st

    def registerTimer(self, ts_ms):
        self.timers.append(ts_ms)

    def deleteTimer(self, ts_ms):
        self.timers.remove(ts_ms)


class FakeTimerInfo:
    def __init__(self, ms):
        self._ms = ms

    def getExpiryTimeInMs(self):
        return self._ms


class FakeGroupState:
    """Just enough of pyspark.sql.streaming.state.GroupState for the
    applyInPandasWithState functions."""

    def __init__(self, wm_ms=0, timed_out=False):
        self._v = None
        self._wm = wm_ms
        self._timed_out = timed_out
        self.timeout_ts = None
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        assert self._v is not None
        return self._v

    @property
    def hasTimedOut(self):
        return self._timed_out

    def update(self, v):
        self._v = tuple(v)
        self.removed = False

    def remove(self):
        self._v = None
        self.removed = True

    def setTimeoutTimestamp(self, ms):
        self.timeout_ts = ms

    def getCurrentWatermarkMs(self):
        return self._wm


def _drive(proc, key, pdf):
    """Run init+handleInputRows on one pandas batch, return (rows, handle)."""
    h = FakeHandle()
    proc.init(h)
    out = list(proc.handleInputRows(key, iter([pdf]), None))
    rows = pd.concat(out) if out else pd.DataFrame()
    return rows, h


# ------------------------------------------------------- LoginFailProcessor


class TestLoginFailProcessor:
    def test_consecutive_fail_pair_alerts(self):
        p = LoginFailProcessor()
        pdf = pd.DataFrame(
            {
                "ts_s": [100, 200, 300, 5000, 5100],
                "event_id": [1, 2, 3, 4, 5],
                "event_type": ["error", "error", "view", "error", "error"],
            }
        )
        rows, _ = _drive(p, (7,), pdf)
        got = set(map(tuple, rows[["first_fail_ts_s", "second_fail_ts_s"]].values.tolist()))
        assert got == {(100, 200), (5000, 5100)}

    def test_state_carries_across_batches(self):
        p = LoginFailProcessor()
        h = FakeHandle()
        p.init(h)
        b1 = pd.DataFrame({"ts_s": [100], "event_id": [1], "event_type": ["error"]})
        b2 = pd.DataFrame({"ts_s": [150], "event_id": [2], "event_type": ["error"]})
        assert list(p.handleInputRows((7,), iter([b1]), None)) == []
        out = pd.concat(p.handleInputRows((7,), iter([b2]), None))
        assert out.iloc[0].first_fail_ts_s == 100 and out.iloc[0].second_fail_ts_s == 150


# ---------------------------------------------------- OrderTimeoutProcessor


class TestOrderTimeoutProcessor:
    def test_pay_within_timeout(self):
        p = OrderTimeoutProcessor()
        pdf = pd.DataFrame({"ts_s": [100, 500], "event_type": ["click", "purchase"]})
        rows, h = _drive(p, (1,), pdf)
        assert rows.iloc[0].status == "payed"
        assert h.timers == [(100 + ORDER_TIMEOUT_S) * 1000]

    def test_expired_timer_emits_timeout_once(self):
        p = OrderTimeoutProcessor()
        pdf = pd.DataFrame({"ts_s": [100], "event_type": ["click"]})
        _, h = _drive(p, (1,), pdf)
        fired = list(p.handleExpiredTimer((1,), None, FakeTimerInfo((100 + ORDER_TIMEOUT_S) * 1000)))
        out = pd.concat(fired)
        assert list(out.status) == ["timeout"]
        # stale second firing: state cleared -> no-op
        assert list(p.handleExpiredTimer((1,), None, FakeTimerInfo(10**15))) == []

    def test_stale_timer_before_deadline_is_noop(self):
        p = OrderTimeoutProcessor()
        pdf = pd.DataFrame({"ts_s": [100], "event_type": ["click"]})
        _, h = _drive(p, (1,), pdf)
        assert list(p.handleExpiredTimer((1,), None, FakeTimerInfo(100 * 1000))) == []

    def test_two_creates_then_pay_agrees_with_portable_fn(self):
        """ADVICE parity: a second create supersedes the pending one and
        emits it as 'timeout' in BOTH wirings."""
        pdf = pd.DataFrame({"ts_s": [100, 200, 300], "event_type": ["click", "click", "purchase"]})
        p = OrderTimeoutProcessor()
        tws_rows, _ = _drive(p, (1,), pdf)
        st = FakeGroupState()
        fn_rows = pd.concat(_order_timeout_fn((1,), iter([pdf]), st))
        tws = list(map(tuple, tws_rows[["create_ts_s", "pay_ts_s", "status"]].fillna(-1).values.tolist()))
        fn = list(map(tuple, fn_rows[["create_ts_s", "pay_ts_s", "status"]].fillna(-1).values.tolist()))
        assert tws == fn == [(100, -1, "timeout"), (200, 300, "payed")]


# ----------------------------------------------------- BlacklistProcessor


class TestBlacklistProcessor:
    def test_warning_once_then_suppression_and_day_reset(self):
        p = BlacklistProcessor()
        day0, day1 = 1000, 1000 + 86400
        pdf = pd.DataFrame({"ts_s": [day0, day0 + 1, day0 + 2, day1]})
        rows, _ = _drive(p, (9, 3), pdf)
        tags = list(rows.tag)
        # threshold=2: first click passes, second warns, third suppressed,
        # next-day click passes again (daily reset)
        assert BLACKLIST_THRESHOLD == 2
        assert tags == ["click", "blacklist_warning", "click"]
        assert list(rows.day_s) == [0, 0, 86400]


# ---------------------------------------------------- PayReceiptProcessor


class TestPayReceiptProcessor:
    def test_two_pays_before_receipt_no_loss(self):
        """ADVICE medium: a second same-side event must not overwrite the
        buffered first — both pays must eventually match or time out."""
        p = PayReceiptProcessor()
        pdf = pd.DataFrame({"ts_s": [100, 200, 300], "side": ["pay", "pay", "receipt"]})
        rows, h = _drive(p, (5,), pdf)
        # FIFO: earliest pay matches the receipt
        assert list(map(tuple, rows[["pay_ts_s", "receipt_ts_s", "tag"]].values.tolist())) == [
            (100, 300, "matched")
        ]
        # the second pay is still pending, then expires to payButNoReceipt
        fired = pd.concat(
            p.handleExpiredTimer((5,), None, FakeTimerInfo((200 + PayReceiptProcessor.PAY_WAIT_S) * 1000))
        )
        assert list(map(tuple, fired[["pay_ts_s", "tag"]].values.tolist())) == [(200, "payButNoReceipt")]

    def test_asymmetric_waits(self):
        """ADVICE low: a lone receipt expires after RECEIPT_WAIT_S, not
        PAY_WAIT_S."""
        p = PayReceiptProcessor()
        pdf = pd.DataFrame({"ts_s": [100], "side": ["receipt"]})
        _, h = _drive(p, (5,), pdf)
        assert h.timers == [(100 + PayReceiptProcessor.RECEIPT_WAIT_S) * 1000]
        early = (100 + PayReceiptProcessor.RECEIPT_WAIT_S) * 1000
        fired = pd.concat(p.handleExpiredTimer((5,), None, FakeTimerInfo(early)))
        assert list(fired.tag) == ["receiptButNoPay"]

    def test_portable_fn_same_semantics(self):
        """The applyInPandasWithState wiring agrees: list buffers, FIFO
        match, asymmetric per-entry deadlines."""
        pdf = pd.DataFrame({"ts_s": [100, 200, 300], "side": ["pay", "pay", "receipt"]})
        st = FakeGroupState()
        out = pd.concat(_pay_receipt_fn((5,), iter([pdf]), st))
        assert list(map(tuple, out[["pay_ts_s", "receipt_ts_s", "tag"]].values.tolist())) == [
            (100, 300, "matched")
        ]
        # pending second pay arms the timeout at its pay deadline
        assert st.timeout_ts == (200 + PayReceiptProcessor.PAY_WAIT_S) * 1000
        # watermark passes the deadline -> timeout path emits it
        st2 = FakeGroupState(wm_ms=(200 + PayReceiptProcessor.PAY_WAIT_S) * 1000, timed_out=True)
        st2._v = st._v
        fired = pd.concat(_pay_receipt_fn((5,), iter([]), st2))
        assert list(map(tuple, fired[["pay_ts_s", "tag"]].values.tolist())) == [(200, "payButNoReceipt")]
        assert st2.removed

    def test_portable_fn_receipt_deadline(self):
        pdf = pd.DataFrame({"ts_s": [100], "side": ["receipt"]})
        st = FakeGroupState()
        assert list(_pay_receipt_fn((5,), iter([pdf]), st)) == []
        assert st.timeout_ts == (100 + PayReceiptProcessor.RECEIPT_WAIT_S) * 1000


# ------------------------------------------------- wiring chooser (capability gate)


class TestWiringChooser:
    """The TWS_USABLE probe must actually steer wiring selection: the
    portable applyInPandasWithState plan when TWS can't execute (this
    env has no google.protobuf), the TWS plan when it can. Construction
    of BOTH plans is checked; TWS execution needs protobuf, so output
    agreement between the wirings is pinned by the fake-handle tests
    above plus the two below."""

    @staticmethod
    def _stream_events(spark):
        from pyspark.sql import functions as F

        return (
            spark.readStream.format("rate").option("rowsPerSecond", "1").load()
            .select(
                F.col("value").alias("user_id"),
                F.col("timestamp").alias("ts"),
                F.col("value").alias("event_id"),
                F.lit("error").alias("event_type"),
                F.lit('{"k": 3}').alias("props"),
            )
        )

    def test_probe_is_negative_in_this_env(self):
        from gmall_flink_200621_spark.streaming import stateful

        try:
            import google.protobuf  # noqa: F401

            pytest.skip("protobuf present: probe legitimately positive")
        except ImportError:
            pass
        assert stateful.TWS_USABLE is False

    @pytest.mark.parametrize("name", ["login_fail", "order_timeout", "blacklist", "pay_receipt"])
    def test_chooser_selects_by_capability(self, spark, name):
        from gmall_flink_200621_spark.streaming.stateful import stateful_stream

        ev = self._stream_events(spark)
        portable = stateful_stream(name, ev, tws_usable=False)
        plan = portable._jdf.queryExecution().analyzed().toString()
        assert "FlatMapGroupsInPandasWithState" in plan
        assert "TransformWithState" not in plan

        tws = stateful_stream(name, ev, tws_usable=True)
        plan = tws._jdf.queryExecution().analyzed().toString()
        assert "TransformWithState" in plan
        # both wirings expose the same output schema -> downstream-identical
        assert tws.schema == portable.schema

    def test_default_probe_selects_portable_here(self, spark):
        from gmall_flink_200621_spark.streaming import stateful

        if stateful.TWS_USABLE:  # pragma: no cover - protobuf-present envs
            pytest.skip("TWS executable here; default selection covered above")
        out = stateful.stateful_stream("login_fail", self._stream_events(spark))
        assert "FlatMapGroupsInPandasWithState" in out._jdf.queryExecution().analyzed().toString()


class TestCrossWiringAgreement:
    """login_fail and blacklist agreement (order_timeout and pay_receipt
    agreement live in their processor test classes above): the TWS
    processor and the portable function are the same operator."""

    def test_login_fail_agreement(self):
        from gmall_flink_200621_spark.streaming.stateful import _login_fail_fn

        pdf = pd.DataFrame(
            {
                "ts_s": [100, 200, 300, 5000, 5100],
                "event_id": [1, 2, 3, 4, 5],
                "event_type": ["error", "error", "view", "error", "error"],
            }
        )
        tws_rows, _ = _drive(LoginFailProcessor(), (7,), pdf)
        st = FakeGroupState()
        fn_rows = pd.concat(_login_fail_fn((7,), iter([pdf]), st))
        cols = ["user_id", "first_fail_ts_s", "second_fail_ts_s"]
        assert tws_rows[cols].values.tolist() == fn_rows[cols].values.tolist()

    def test_blacklist_agreement(self):
        from gmall_flink_200621_spark.streaming.stateful import _blacklist_fn

        day0, day1 = 1000, 1000 + 86400
        pdf = pd.DataFrame({"ts_s": [day0, day0 + 1, day0 + 2, day1]})
        tws_rows, _ = _drive(BlacklistProcessor(), (9, 3), pdf)
        st = FakeGroupState()
        fn_rows = pd.concat(_blacklist_fn((9, 3), iter([pdf]), st))
        cols = ["user_id", "ad_k", "day_s", "tag"]
        assert tws_rows[cols].values.tolist() == fn_rows[cols].values.tolist()
