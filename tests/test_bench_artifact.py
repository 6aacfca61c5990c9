"""bench artifact contract: the compact stdout line stays under the
driver's ~2000-char tail capture, and tools/bench_compare.py reads every
format in the wild — the old single-line full map (r01–r03), a driver
artifact wrapping a (possibly front-truncated) tail, and the r06+ compact
line + BENCH_DETAIL_r{N}.json pair.

No SparkSession needed — this pins the serialization contract only.
"""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.bench_compare import load  # noqa: E402

FULL = {
    "metric": "bench_total",
    "value": 12.3,
    "unit": "sec",
    "queries": {f"q{i}": 0.1 * i for i in range(40)},
    "value_median": 13.0,
    "queries_median": {f"q{i}": 0.11 * i for i in range(40)},
    "passes": 3,
    "sf": 0.1,
}


def test_load_old_style_full_line(tmp_path):
    p = tmp_path / "old.json"
    p.write_text(json.dumps(FULL) + "\n")
    d = load(str(p))
    assert len(d["queries"]) == 40 and d["value"] == 12.3


def test_load_compact_line_follows_detail_pointer(tmp_path):
    detail_name = "BENCH_DETAIL_r06.json"
    (tmp_path / detail_name).write_text(json.dumps(FULL, indent=1))
    compact = {
        "metric": "bench_total",
        "value": 12.3,
        "unit": "sec",
        "value_median": 13.0,
        "n": 40,
        "passes": 3,
        "sf": 0.1,
        "detail": detail_name,
        "queries": {"q1": 0.1, "q2": 0.2},
    }
    p = tmp_path / "compact.json"
    p.write_text(json.dumps(compact) + "\n")
    d = load(str(p))
    assert len(d["queries"]) == 40  # followed the pointer


def test_load_compact_line_without_detail_file_uses_subset(tmp_path):
    compact = {
        "metric": "bench_total",
        "value": 12.3,
        "unit": "sec",
        "sf": 0.1,
        "detail": "BENCH_DETAIL_r99.json",  # not present
        "queries": {"q1": 0.1, "q2": 0.2},
    }
    p = tmp_path / "compact.json"
    p.write_text(json.dumps(compact) + "\n")
    d = load(str(p))
    assert d["queries"] == {"q1": 0.1, "q2": 0.2}


def test_load_driver_artifact_tail_with_compact_line(tmp_path):
    detail_name = "BENCH_DETAIL_r06.json"
    (tmp_path / detail_name).write_text(json.dumps(FULL, indent=1))
    compact_line = json.dumps(
        {
            "metric": "bench_total",
            "value": 12.3,
            "unit": "sec",
            "sf": 0.1,
            "detail": detail_name,
            "queries": {"q1": 0.1},
        }
    )
    artifact = {"rc": 0, "tail": "spark noise\nmore logs\n" + compact_line + "\n"}
    p = tmp_path / "BENCH_r06.json"
    p.write_text(json.dumps(artifact))
    d = load(str(p))
    assert len(d["queries"]) == 40  # found line in tail, followed pointer


def test_load_front_truncated_tail_recovers_pairs(tmp_path):
    # the r04/r05 failure mode: tail begins mid-queries-map
    full_line = json.dumps(FULL)
    artifact = {"rc": 0, "tail": full_line[len(full_line) // 2 :]}
    p = tmp_path / "BENCH_r05.json"
    p.write_text(json.dumps(artifact))
    d = load(str(p))
    assert d.get("partial") and len(d["queries"]) > 0


def test_compact_line_fits_driver_tail_capture():
    """The line bench.py emits for the CURRENT headliner set must stay
    far under 2000 chars even with pessimistic float widths."""
    headliners = [
        "hot_items", "hot_urls", "page_view", "uv_exact", "market_by_channel",
        "ad_clicks_filtered", "login_fail", "order_timeout",
        "order_receipt_join", "dedup_minhash_lsh", "hot_urls_late_stream",
    ]
    compact = {
        "metric": "bench_total",
        "value": 99999.999,
        "unit": "sec",
        "value_median": 99999.999,
        "n": 999,
        "passes": 3,
        "sf": 0.1,
        "detail": "BENCH_DETAIL_r99.json",
        "queries": {k: 99999.999 for k in headliners},
    }
    assert len(json.dumps(compact)) < 1000
