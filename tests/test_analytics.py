"""Unit tests for the product-analytics pack (plans/analytics.py) and its
two supporting operators (binned range join, MG heavy hitters)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F


def _write_events(spark, rows, d):
    """rows: (event_id, ts_s, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [(i, float(ts), u, et, '{"k": 1}', float(v)) for (i, ts, u, et, v) in rows],
        "event_id long, _ts double, user_id long, event_type string, props string, value double",
    ).select(
        "event_id", F.col("_ts").cast("timestamp").alias("ts"), "user_id", "event_type", "value", "props"
    )
    df.write.parquet(f"{d}/events.parquet")


class TestRetentionCohorts:
    def test_matrix(self, spark):
        from gmall_flink_200621_spark.plans.analytics import retention_cohorts

        day = 86400
        rows = [
            # u1 first active day 0, also active day 1 (twice: distinct-day dedup) and day 3
            (1, 10, 1, "view", 1), (2, day + 5, 1, "view", 1),
            (3, day + 6, 1, "click", 1), (4, 3 * day, 1, "view", 1),
            # u2 first active day 1 only
            (5, day + 100, 2, "view", 1),
        ]
        with tempfile.TemporaryDirectory() as d:
            _write_events(spark, rows, d)
            got = {(r.cohort_day, r.day_offset): r.n_active for r in retention_cohorts(spark, d).collect()}
        epoch_day = 0  # ts_s below 86400 -> epoch day 0
        assert got == {
            (epoch_day, 0): 1,
            (epoch_day, 1): 1,
            (epoch_day, 3): 1,
            (epoch_day + 1, 0): 1,
        }


class TestSCD2:
    def test_collapse_versions_open_end(self, spark):
        from gmall_flink_200621_spark.plans.analytics import scd2_snapshot

        rows = [
            # u1: view, view (collapsed), click, view again -> 3 versions
            (1, 10, 1, "view", 1), (2, 20, 1, "view", 1),
            (3, 30, 1, "click", 1), (4, 40, 1, "view", 1),
            # u2: single state, open-ended
            (5, 10, 2, "signup", 1),
        ]
        with tempfile.TemporaryDirectory() as d:
            _write_events(spark, rows, d)
            out = scd2_snapshot(spark, d).collect()
        u1 = sorted([r for r in out if r.user_id == 1], key=lambda r: r.version)
        assert [(r.state, r.valid_from_us, r.valid_to_us, r.version) for r in u1] == [
            ("view", 10_000_000, 30_000_000, 1),
            ("click", 30_000_000, 40_000_000, 2),
            ("view", 40_000_000, None, 3),
        ]
        (u2,) = [r for r in out if r.user_id == 2]
        assert (u2.state, u2.valid_to_us, u2.version) == ("signup", None, 1)


class TestValueAnomalies:
    def test_strict_three_sigma(self, spark):
        from gmall_flink_200621_spark.plans.analytics import value_anomalies

        # group A: eleven 0.00 + one 12.00 -> z = 3.32 for the 12.00 (outlier)
        rows = [(i, i, 1, "A", 0.0) for i in range(11)] + [(11, 11, 2, "A", 12.0)]
        # group B: nine 0.00 + one 10.00 -> z = 3.0 EXACTLY: strict > excludes it
        rows += [(100 + i, 100 + i, 3, "B", 0.0) for i in range(9)] + [(109, 109, 4, "B", 10.0)]
        with tempfile.TemporaryDirectory() as d:
            _write_events(spark, rows, d)
            out = value_anomalies(spark, d).collect()
        assert [(r.event_id, r.event_type, r.v_cents) for r in out] == [(11, "A", 1200)]


class TestValueHistogram:
    def test_bins(self, spark):
        from gmall_flink_200621_spark.plans.analytics import value_histogram

        rows = [(1, 1, 1, "A", 0.0), (2, 2, 1, "A", 49.99), (3, 3, 1, "A", 50.0), (4, 4, 1, "B", 120.5)]
        with tempfile.TemporaryDirectory() as d:
            _write_events(spark, rows, d)
            got = {(r.event_type, r.bin): (r.bin_lo_cents, r.n, r.sum_cents) for r in value_histogram(spark, d).collect()}
        assert got == {
            ("A", 0): (0, 2, 4999),
            ("A", 1): (5000, 1, 5000),
            ("B", 2): (10000, 1, 12050),
        }


class TestIntervalJoinBinned:
    def _frames(self, spark):
        import random

        rng = random.Random(7)
        pts = spark.createDataFrame(
            [(i, rng.randrange(0, 5000)) for i in range(300)], "pid long, p long"
        )
        ivs = spark.createDataFrame(
            [
                (j, lo, lo + rng.randrange(0, 900))
                for j, lo in ((j, rng.randrange(0, 4800)) for j in range(80))
            ],
            "iid long, lo long, hi long",
        )
        return pts, ivs

    def test_matches_naive_and_no_nested_loop(self, spark):
        from gmall_flink_200621_spark.operators.rangejoin import interval_join_binned

        pts, ivs = self._frames(spark)
        out = interval_join_binned(pts, ivs, "p", "lo", "hi", 256)
        got = sorted((r.pid, r.iid) for r in out.collect())
        naive = sorted(
            (r.pid, r.iid)
            for r in pts.crossJoin(ivs).filter("p >= lo AND p <= hi").collect()
        )
        assert got == naive and len(got) > 100
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan

    def test_exactly_once_per_pair(self, spark):
        from gmall_flink_200621_spark.operators.rangejoin import interval_join_binned

        # interval spanning many bins; point matched exactly once
        pts = spark.createDataFrame([(1, 500)], "pid long, p long")
        ivs = spark.createDataFrame([(9, 0, 10_000)], "iid long, lo long, hi long")
        out = interval_join_binned(pts, ivs, "p", "lo", "hi", 16).collect()
        assert [(r.pid, r.iid) for r in out] == [(1, 9)]

    def test_column_collision_raises(self, spark):
        from gmall_flink_200621_spark.operators.rangejoin import interval_join_binned

        df = spark.range(1).select(F.col("id").alias("x"))
        with pytest.raises(ValueError, match="collision"):
            interval_join_binned(df, df, "x", "x", "x", 10)


class TestHeavyHitters:
    def test_planted_key_and_partition_invariance(self, spark):
        from gmall_flink_200621_spark.operators.frequency import heavy_hitters

        # 500 rows of key 7 + 300 singleton keys -> n=800, thr=2, only key 7
        rows = [(7,)] * 500 + [(1000 + i,) for i in range(300)]
        df = spark.createDataFrame(rows, "user_id long")
        got = [(r.user_id, r.n_rows, r.threshold) for r in heavy_hitters(df, "user_id").collect()]
        assert got == [(7, 500, 2)]
        again = [
            (r.user_id, r.n_rows, r.threshold)
            for r in heavy_hitters(df.repartition(13), "user_id").collect()
        ]
        assert again == got

    def test_mg_overflow_keeps_heavy_key(self, spark):
        from gmall_flink_200621_spark.operators.frequency import heavy_hitters

        # 5000 distinct singletons force MG counter evictions in one partition;
        # the planted heavy key must still come out exactly
        rows = [(7,)] * 500 + [(10_000 + i,) for i in range(5000)]
        df = spark.createDataFrame(rows, "user_id long").repartition(2)
        got = [(r.user_id, r.n_rows, r.threshold) for r in heavy_hitters(df, "user_id").collect()]
        assert got == [(7, 500, 13)]

    def test_denom_guard(self, spark):
        from gmall_flink_200621_spark.operators.frequency import heavy_hitters

        with pytest.raises(ValueError, match="guarantee"):
            heavy_hitters(spark.range(1).select(F.col("id").alias("k")), "k", denom=100_000)


class TestSessionErrorOverlap:
    def test_external_errors_only(self, spark):
        from gmall_flink_200621_spark.plans.analytics import session_error_overlap

        rows = [
            # u1 session [0, 100] (own error at 60 is internal)
            (1, 0, 1, "view", 1), (2, 60, 1, "error", 1), (3, 100, 1, "view", 1),
            # u2's error at 50 lands inside u1's session (external)
            (4, 50, 2, "error", 1),
            # u3's lone error far away: its own session, no external errors
            (5, 5000, 3, "error", 1),
        ]
        with tempfile.TemporaryDirectory() as d:
            _write_events(spark, rows, d)
            out = session_error_overlap(spark, d).collect()
        assert [(r.user_id, r.session_start_s, r.n_ext_errors) for r in out] == [(1, 0, 1)]


class TestActiveUsersRolling:
    def test_wau_covers_trailing_window(self, spark):
        """wau7(day) counts distinct users active in [day-6, day]; dau is
        the per-day distinct count; only days present in the data emit."""
        from gmall_flink_200621_spark.plans.analytics import active_users_rolling7

        day = 86400
        rows = [
            # u1 active day 0 and day 3; u2 active day 3; u3 active day 10
            (1, 0 * day + 10, 1, "view", 1),
            (2, 3 * day + 10, 1, "view", 1),
            (3, 3 * day + 20, 2, "click", 1),
            (4, 10 * day + 5, 3, "view", 1),
        ]
        with tempfile.TemporaryDirectory() as d:
            _write_events(spark, rows, d)
            out = {r.day: (r.dau, r.wau7) for r in active_users_rolling7(spark, d).collect()}
        # day 0: u1 only. day 3: u1,u2 active; trailing window [−3,3] has u1,u2.
        # day 10: u3 only (u1/u2's day-3 activity fell out of [4,10]... day 3 < 10-6=4).
        assert out == {0: (1, 1), 3: (2, 2), 10: (1, 1)}

    def test_wau_geq_dau_on_testdata(self, spark, sf_dir):
        from gmall_flink_200621_spark.plans.analytics import active_users_rolling7

        rows = active_users_rolling7(spark, sf_dir).collect()
        assert rows
        assert all(r.wau7 >= r.dau for r in rows)


class TestColumnProfile:
    def test_matches_duckdb_per_column_truth(self, spark, sf_dir, duck):
        """Profile stats equal independently-computed per-column answers
        (straight per-column aggregates, not the long-form recipe the
        operator and its oracle share)."""
        from gmall_flink_200621_spark.plans.analytics import column_profile

        prof = {r.column_name: r for r in column_profile(spark, sf_dir).collect()}
        assert set(prof) == {
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        }
        n, = duck.execute("SELECT count(*) FROM orders").fetchone()
        for c in prof.values():
            assert c.n_rows == n and c.n_null == 0
        ndv_status, min_s, max_s = duck.execute(
            "SELECT count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus) FROM orders"
        ).fetchone()
        st = prof["o_orderstatus"]
        assert (st.n_distinct, st.min_str, st.max_str) == (ndv_status, min_s, max_s)
        assert st.min_num is None and st.max_num is None
        ndv_key, min_k, max_k = duck.execute(
            "SELECT count(DISTINCT o_orderkey), min(o_orderkey), max(o_orderkey) FROM orders"
        ).fetchone()
        ok = prof["o_orderkey"]
        assert (ok.n_distinct, ok.min_num, ok.max_num) == (ndv_key, float(min_k), float(max_k))
        assert ok.min_str is None and ok.max_str is None

    def test_approx_mode_same_shape_bounded_error(self, spark, sf_dir):
        """ndv_mode='approx' (the 100 TB swap): identical schema and
        column set, exact stats (rows/nulls/min/max) EQUAL the exact
        mode's, and the HLL n_distinct lands within the sketch's error
        band (rsd 5%; assert 15% — 3σ) of the exact NDV per column. The
        plan carries no per-(column, value) aggregation — the shuffle is
        O(columns), pinned by the single HashAggregate pair."""
        from gmall_flink_200621_spark.plans.analytics import column_profile

        exact_df = column_profile(spark, sf_dir)
        approx_df = column_profile(spark, sf_dir, ndv_mode="approx")
        assert [(f.name, f.dataType) for f in approx_df.schema] == [
            (f.name, f.dataType) for f in exact_df.schema
        ]  # nullability differs (count vs sum aggregates) — immaterial
        exact = {r.column_name: r for r in exact_df.collect()}
        approx = {r.column_name: r for r in approx_df.collect()}
        assert set(exact) == set(approx)
        for name, e in exact.items():
            a = approx[name]
            assert (a.n_rows, a.n_null, a.min_num, a.max_num, a.min_str, a.max_str) == (
                e.n_rows, e.n_null, e.min_num, e.max_num, e.min_str, e.max_str
            ), name
            assert abs(a.n_distinct - e.n_distinct) <= max(1, 0.15 * e.n_distinct), (
                name, a.n_distinct, e.n_distinct,
            )
        # one aggregation pair over the stacked frame (partial+final; the
        # HLL+min/max mix plans as SortAggregate), no per-value stage —
        # AQE echoes an "Initial Plan" section, so read the final only
        s = approx_df._jdf.queryExecution().executedPlan().toString()
        final = s.split("== Initial Plan ==")[0]
        assert final.count("Aggregate") == 2

        import pytest

        with pytest.raises(ValueError, match="ndv_mode"):
            column_profile(spark, sf_dir, ndv_mode="hll")


class TestTimeGridFill:
    def test_locf_fills_planted_gaps(self, spark, tmp_path):
        """User 1 has events on days 1, 2, 5 (values 1.50, 2.25, 4.00):
        the grid must be dense over 1..5, days 3-4 carry n_events=0 with
        day_value NULL, and filled_value carries 2.25 forward until day 5
        overwrites it. User 2 (single day) gets a single-row grid."""
        from gmall_flink_200621_spark.plans.extras import time_grid_fill

        day = 86400.0
        rows = [
            (1, 0.5 * day, 1, "view", 1.50),
            (2, 1.5 * day, 1, "view", 2.25),
            (3, 4.5 * day, 1, "view", 4.00),
            (4, 2.5 * day, 2, "view", 9.99),
        ]
        _write_events(spark, rows, str(tmp_path))
        got = {
            (r.user_id, str(r.day)): (r.n_events, r.day_value, r.filled_value)
            for r in time_grid_fill(spark, str(tmp_path)).collect()
        }
        assert len(got) == 5 + 1
        assert got[(1, "1970-01-01")] == (1, 1.50, 1.50)
        assert got[(1, "1970-01-02")] == (1, 2.25, 2.25)
        assert got[(1, "1970-01-03")] == (0, None, 2.25)
        assert got[(1, "1970-01-04")] == (0, None, 2.25)
        assert got[(1, "1970-01-05")] == (1, 4.00, 4.00)
        assert got[(2, "1970-01-03")] == (1, 9.99, 9.99)

    def test_same_day_events_sum_exactly(self, spark, tmp_path):
        """Fixed-point cents: 0.10+0.20 sums to exactly 0.30 (a float sum
        would carry representation error into the hash)."""
        from gmall_flink_200621_spark.plans.extras import time_grid_fill

        rows = [(1, 100.0, 7, "view", 0.10), (2, 200.0, 7, "view", 0.20)]
        _write_events(spark, rows, str(tmp_path))
        (r,) = time_grid_fill(spark, str(tmp_path)).collect()
        assert (r.n_events, r.day_value, r.filled_value) == (2, 0.30, 0.30)


class TestFuzzyPartMatches:
    def test_blocking_and_distance_threshold(self, spark, tmp_path):
        """Within-block pairs at levenshtein ≤ 3 match; a cross-block
        near-pair ('hot lace' vs 'cot lace', distance 1) is NOT emitted —
        blocking is a documented semantic, not an optimization; counts
        aggregate over duplicate rows before the quadratic stage."""
        from gmall_flink_200621_spark.plans.extras import fuzzy_part_matches

        rows = [
            (1, "small ring"), (2, "small ruby"), (3, "small ring"),
            (4, "small spinning top"),   # dist > 3 from both smalls
            (5, "hot lace"), (6, "cot lace"),
        ]
        spark.createDataFrame(rows, "p_partkey long, p_name string").write.parquet(
            f"{tmp_path}/part.parquet"
        )
        got = {
            (r.name_a, r.name_b): (r.dist, r.n_a, r.n_b, r.canonical_key)
            for r in fuzzy_part_matches(spark, str(tmp_path)).collect()
        }
        assert got == {("small ring", "small ruby"): (3, 2, 1, 1)}


class TestPerceptron:
    @staticmethod
    def _py_reference(feats, iters):
        w = [0, 0, 0, 0]
        for _ in range(iters):
            g = [0, 0, 0, 0]
            for y, x in feats:
                if y * sum(wj * xj for wj, xj in zip(w, x)) <= 0:
                    for j in range(4):
                        g[j] += y * x[j]
            w = [wj + gj for wj, gj in zip(w, g)]
        return w

    def test_matches_python_reference_and_separates(self, spark):
        """Batch perceptron vs an independent Python implementation of
        the same integer rule — exact score equality — and on linearly
        separable data (en docs systematically longer) it must reach
        100% training accuracy within the fixed iteration budget."""
        from gmall_flink_200621_spark.operators.classifier import (
            PERC_ITERS,
            perceptron_lang,
        )

        # separable along the distinct-token axis: en docs have a rich
        # vocabulary (distinct == total), zh docs repeat one token
        docs = []
        for i in range(30):
            if i % 2 == 0:
                text = " ".join(f"w{j}" for j in range(10 + i // 2))
                docs.append((i, text, "en", len(text)))
            else:
                text = " ".join("a" for _ in range(40 + i))
                docs.append((i, text, "zh", len(text)))
        df = spark.createDataFrame(docs, "doc_id long, text string, lang string, n_chars long")
        got = {r.doc_id: r for r in perceptron_lang(df).collect()}

        feats = []
        by_id = {}
        for i, text, lang, n_chars in docs:
            toks = text.split(" ")
            x = [1, n_chars // 64, len(toks), len(set(toks))]
            y = 1 if lang == "en" else -1
            feats.append((y, x))
            by_id[i] = (y, x)
        w = self._py_reference(feats, PERC_ITERS)
        for i, (y, x) in by_id.items():
            score = sum(wj * xj for wj, xj in zip(w, x))
            assert got[i].score_units == score, i
            assert got[i].label == y
        assert all(r.correct == 1 for r in got.values())  # separable ⇒ 100%


class TestPointInTimeJoin:
    def test_views_see_only_past_tier_versions(self, spark, tmp_path):
        """User 1: views at t=5 (pre-purchase → none), t=15 (after 1st
        purchase → bronze), t=45 (after 3rd → silver), t=75 (after 6th →
        gold). A view at the exact promotion timestamp joins inclusively.
        No future-version leakage: the t=15 view must NOT see silver."""
        from gmall_flink_200621_spark.plans.analytics import point_in_time_join

        rows = [(100 + i, 10.0 * (i + 1), 1, "purchase", 1.0) for i in range(6)]
        rows += [
            (1, 5.0, 1, "view", 0.0),
            (2, 15.0, 1, "view", 0.0),
            (3, 45.0, 1, "view", 0.0),
            (4, 75.0, 1, "view", 0.0),
            (5, 30.0, 1, "view", 0.0),  # exactly at the silver promotion
            (6, 50.0, 2, "view", 0.0),  # user with no purchases at all
        ]
        _write_events(spark, rows, str(tmp_path))
        got = {r.view_id: r.tier for r in point_in_time_join(spark, str(tmp_path)).collect()}
        assert got == {1: "none", 2: "bronze", 3: "silver", 4: "gold", 5: "silver", 6: "none"}


class TestSkewAudit:
    def test_planted_hot_key_lands_in_top_bucket(self, spark, tmp_path):
        """One user with 1000 rows + 50 singleton users: the hot key must
        surface alone in magnitude bucket 9 (512..1023) holding ~95% of
        rows, singletons in bucket 0 — the exact signature the salting
        decision keys off."""
        from gmall_flink_200621_spark.plans.analytics import skew_audit

        rows = [(i, float(i), 7, "view", 1.0) for i in range(1000)]
        rows += [(10_000 + u, 5000.0 + u, 100 + u, "view", 1.0) for u in range(50)]
        _write_events(spark, rows, str(tmp_path))
        got = {
            (r.key_name, r.bucket): (r.n_keys, r.n_rows, r.max_key_rows, r.row_share)
            for r in skew_audit(spark, str(tmp_path)).collect()
        }
        assert got[("user_id", 9)] == (1, 1000, 1000, 1000 / 1050)
        assert got[("user_id", 0)] == (50, 50, 1, 50 / 1050)
        assert got[("event_type", 10)] == (1, 1050, 1050, 1.0)


class TestAttributionPosition:
    def test_u_shape_credit_exact(self, spark, tmp_path):
        """Journey credit rules, pinned per cardinality: n=1 takes all;
        n=2 splits 50/50; n=5 gives 40/40 to the ends and the 200000
        middle pool splits 66666+66667+66667 with the REMAINDER... on the
        EARLIEST middle (66668, 66666, 66666). Credits per journey sum to
        exactly 1e6; post-first-purchase events never earn credit."""
        from gmall_flink_200621_spark.plans.analytics import attribution_position

        rows = [
            # u1: single touch then purchase
            (1, 10.0, 1, "view", 1.0), (2, 20.0, 1, "purchase", 1.0),
            # u2: two touches
            (3, 10.0, 2, "view", 1.0), (4, 11.0, 2, "click", 1.0), (5, 20.0, 2, "purchase", 1.0),
            # u3: five touches: view click error click signup | purchase
            (6, 1.0, 3, "view", 1.0), (7, 2.0, 3, "click", 1.0), (8, 3.0, 3, "error", 1.0),
            (9, 4.0, 3, "click", 1.0), (10, 5.0, 3, "signup", 1.0), (11, 9.0, 3, "purchase", 1.0),
            # u3 post-purchase touch: must NOT be credited
            (12, 50.0, 3, "view", 1.0),
        ]
        _write_events(spark, rows, str(tmp_path))
        got = {r.channel: (r.credit_ppm, r.n_users) for r in attribution_position(spark, str(tmp_path)).collect()}
        # u1: view 1_000_000. u2: view 500_000 + click 500_000.
        # u3 middles pool 200_000 over 3: click(rn2)=66_666+2, error(rn3)=66_666, click(rn4)=66_666
        assert got["view"] == (1_000_000 + 500_000 + 400_000, 3)
        assert got["click"] == (500_000 + 66_668 + 66_666, 2)
        assert got["error"] == (66_666, 1)
        assert got["signup"] == (400_000, 1)
        assert sum(c for c, _ in got.values()) == 3_000_000


class TestJoinBlowupAudit:
    def test_planted_hot_key_forecast(self, spark, tmp_path):
        """10 rows of user 7 + 5 singletons: a self-join on user_id would
        produce exactly 10²+5·1²=105 rows (blowup 7.0), with the hot key
        alone contributing 100 — the forecast the audit must report."""
        from gmall_flink_200621_spark.plans.analytics import join_blowup_audit

        rows = [(i, float(i), 7, "view", 1.0) for i in range(10)]
        rows += [(100 + u, 500.0 + u, 100 + u, "view", 1.0) for u in range(5)]
        _write_events(spark, rows, str(tmp_path))
        got = {r.key_name: r for r in join_blowup_audit(spark, str(tmp_path)).collect()}
        u = got["user_id"]
        assert (u.n_rows, u.n_keys, u.self_join_rows, u.max_key_rows, u.max_key_pairs) == (
            15, 6, 105, 10, 100,
        )
        assert u.blowup == 105 / 15
        t = got["event_type"]
        assert (t.n_keys, t.self_join_rows, t.blowup) == (1, 225, 15.0)


class TestTransitionMatrix:
    def test_counts_and_conditional_p(self, spark, tmp_path):
        """u1: view->click->view within gap, then a >gap jump to error
        (that pair must NOT count); u2: view->view. Conditional p rows
        sum to 1 per from_type."""
        from gmall_flink_200621_spark.plans.analytics import transition_matrix

        rows = [
            (1, 0.0, 1, "view", 1.0), (2, 10.0, 1, "click", 1.0), (3, 20.0, 1, "view", 1.0),
            (4, 20_000.0, 1, "error", 1.0),  # gap > 1800s: boundary, not a transition
            (5, 0.0, 2, "view", 1.0), (6, 5.0, 2, "view", 1.0),
        ]
        _write_events(spark, rows, str(tmp_path))
        got = {(r.from_type, r.to_type): (r.n, r.p) for r in transition_matrix(spark, str(tmp_path)).collect()}
        assert got == {
            ("view", "click"): (1, 0.5),
            ("view", "view"): (1, 0.5),
            ("click", "view"): (1, 1.0),
        }


class TestLtvCohorts:
    def test_cumulative_revenue_per_cohort_user(self, spark, tmp_path):
        """Cohort day 0 has two users (one never purchases — still in the
        denominator); purchases on offsets 0 and 2 accumulate: LTV curve
        10.00 -> 17.50 per 2 users."""
        from gmall_flink_200621_spark.plans.analytics import ltv_cohorts

        day = 86400.0
        rows = [
            (1, 0.0, 1, "purchase", 10.00),
            (2, 2 * day + 5, 1, "purchase", 7.50),
            (3, 10.0, 2, "view", 1.0),  # same cohort, no revenue
        ]
        _write_events(spark, rows, str(tmp_path))
        got = {r.day_offset: (r.rev_cents, r.cum_rev_cents, r.n_users, r.ltv_per_user)
               for r in ltv_cohorts(spark, str(tmp_path)).collect()}
        assert got == {
            0: (1000, 1000, 2, 5.0),
            2: (750, 1750, 2, 8.75),
        }


class TestFuzzyBlockCap:
    def test_hot_block_dropped_before_quadratic_stage(self, spark, tmp_path):
        """A block with more than FUZZY_BLOCK_CAP distinct names (an
        adversarial stop-word first token) is dropped entirely; normal
        blocks still match. Guards the cap²-pair task at scale."""
        from gmall_flink_200621_spark.plans.extras import FUZZY_BLOCK_CAP, fuzzy_part_matches

        rows = [(i, f"mega name{i:05d}") for i in range(FUZZY_BLOCK_CAP + 1)]
        rows += [(90_001, "tiny ring"), (90_002, "tiny ruby")]
        spark.createDataFrame(rows, "p_partkey long, p_name string").write.parquet(
            f"{tmp_path}/part.parquet"
        )
        got = {(r.name_a, r.name_b) for r in fuzzy_part_matches(spark, str(tmp_path)).collect()}
        assert got == {("tiny ring", "tiny ruby")}


class TestCorpusExpectations:
    def test_clean_corpus_all_zero_and_planted_violations_caught(self, spark, tmp_path):
        """Planted defects: duplicate doc_id, n_chars drift, empty text,
        off-vocabulary lang — each must surface in exactly its own rule's
        violation count."""
        from gmall_flink_200621_spark.plans.extras import corpus_expectations

        docs = [
            (1, "good text", "en", 9),
            (1, "dup id", "en", 6),          # unique:doc_id
            (2, "drifted", "en", 99),        # consistent:n_chars
            (3, "", "en", 0),                # non_empty:text
            (4, "bad lang", "xx", 8),        # accepted:lang
        ]
        spark.createDataFrame(docs, "doc_id long, text string, lang string, n_chars long").write.parquet(
            f"{tmp_path}/documents.parquet"
        )
        spark.createDataFrame(
            [(1, [0.1] * 64, 3), (2, [0.2] * 32, 11)],  # short vector + label out of range
            "vec_id long, embedding array<float>, label int",
        ).write.parquet(f"{tmp_path}/embeddings.parquet")
        got = {r.rule: r.violations for r in corpus_expectations(spark, str(tmp_path)).collect()}
        assert got == {
            "unique:doc_id": 1,
            "not_null:text": 0,
            "consistent:n_chars": 1,
            "non_empty:text": 1,
            "accepted:lang": 1,
            "unique:vec_id": 0,
            "dim:embedding=64": 1,
            "range:label": 1,
        }


class TestRevenuePareto:
    def test_concentration_curve(self, spark, tmp_path):
        """20 users: one whale (1000.00) + 19 at 1.00 each. The whale's
        decile must hold ~98% of revenue; cum_share is monotone ending at
        exactly 1.0; decile sizes partition the users."""
        from gmall_flink_200621_spark.plans.analytics import revenue_pareto

        rows = [(1, 10.0, 99, "purchase", 1000.00)]
        rows += [(10 + u, 20.0 + u, u, "purchase", 1.00) for u in range(19)]
        _write_events(spark, rows, str(tmp_path))
        out = sorted(revenue_pareto(spark, str(tmp_path)).collect(), key=lambda r: r.decile)
        assert sum(r.n_users for r in out) == 20
        # 20 users / 10 deciles = 2 each: decile 1 = whale + one 1.00 user
        assert (out[0].n_users, out[0].decile_cents) == (2, 100000 + 100)
        shares = [r.cum_share for r in out]
        assert shares == sorted(shares) and shares[-1] == 1.0
        assert out[0].cum_share > 0.98


class TestDedupRateBySource:
    def test_within_and_cross_source_stats(self, spark, tmp_path):
        """srcA: 3 docs, one text twice (1 within-source dup) and one text
        shared with srcB (cross-source flag). srcB: 2 distinct docs, one
        shared with A."""
        from gmall_flink_200621_spark.plans.training import dedup_rate_by_source

        docs = [
            (1, "same", "en", 4, "srcA"),
            (2, "same", "en", 4, "srcA"),
            (3, "shared", "en", 6, "srcA"),
            (4, "shared", "en", 6, "srcB"),
            (5, "only b", "en", 6, "srcB"),
        ]
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, n_chars long, source string"
        ).write.parquet(f"{tmp_path}/documents.parquet")
        got = {r.source: r for r in dedup_rate_by_source(spark, str(tmp_path)).collect()}
        a, b = got["srcA"], got["srcB"]
        assert (a.n_docs, a.n_unique, a.n_dup_docs, a.n_shared_fps) == (3, 2, 1, 1)
        assert a.dup_rate == 1 / 3
        assert (b.n_docs, b.n_unique, b.n_dup_docs, b.n_shared_fps) == (2, 2, 0, 1)


class TestSpendGini:
    def test_known_distributions(self, spark, tmp_path):
        """Planted spends with hand-computable Gini: perfectly equal
        spenders → G = 0; and the 4-user case [1,1,1,7] cents →
        G = (2*(1+2+3+28) - 5*10) / (4*10) = 18/40 = 0.45."""
        import pandas as pd

        from gmall_flink_200621_spark.plans.analytics import spend_gini

        def stage(cents_list):
            d = str(tmp_path / f"sf_{len(cents_list)}_{sum(cents_list)}")
            import os

            os.makedirs(d, exist_ok=True)
            pd.DataFrame(
                {
                    "event_id": range(len(cents_list)),
                    "user_id": range(len(cents_list)),
                    "event_type": ["purchase"] * len(cents_list),
                    "value": [c / 100.0 for c in cents_list],
                    "ts": pd.to_datetime("2024-01-01"),
                }
            ).to_parquet(f"{d}/events.parquet", index=False)
            return d

        r = spend_gini(spark, stage([5, 5, 5, 5])).first()
        assert r.n_users == 4 and abs(r.gini) < 1e-12

        r = spend_gini(spark, stage([1, 1, 1, 7])).first()
        assert abs(r.gini - 0.45) < 1e-12


class TestTokenizerFertility:
    def test_invariants_on_corpus(self, spark, sf_dir):
        """Every language bucket: fertility ≥ 1 (a word is ≥1 subword),
        totals consistent with the per-doc token_counts sums."""
        from gmall_flink_200621_spark.plans.training import (
            token_counts,
            tokenizer_fertility,
        )

        rows = tokenizer_fertility(spark, sf_dir).collect()
        assert rows
        assert all(r.fertility >= 1.0 for r in rows)
        assert all(abs(r.fertility - r.bpe_tokens / r.ws_tokens) < 1e-12 for r in rows)
        tc = token_counts(spark, sf_dir).agg(
            {"n_ws_tokens": "sum", "n_bpe_est": "sum"}
        ).first()
        assert sum(r.ws_tokens for r in rows) == tc["sum(n_ws_tokens)"]
        assert sum(r.bpe_tokens for r in rows) == tc["sum(n_bpe_est)"]
