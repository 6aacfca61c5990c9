"""Regression ratchet for the ANN family's recall (VERDICT r07 item #6).

ann_eval is deterministic (fixed-point quantizers, deterministic seeds),
so every method's recall@5 at sf0.001 is an exact constant. Pinning the
full frame means a future change to any quantizer that silently degrades
recall fails a TEST, not just a docstring claim. If a change legitimately
moves a number (e.g. a better codebook init), re-measure at BOTH SFs,
update the constant here, and say so in the commit message.
"""

from __future__ import annotations

# (n_exact, n_method, n_common, recall) per method at sf0.001 — measured
# 2026-08-15, round 8 (trained-coarse residual IVF-PQ included).
EXPECTED_SF0001 = {
    "ivf": (25, 25, 25, 1.00),
    "ivf_trained": (25, 25, 14, 0.56),
    "ivfpq": (25, 25, 8, 0.32),
    "ivfpq_residual": (25, 25, 8, 0.32),
    "lsh": (25, 25, 8, 0.32),
    "pq": (25, 25, 8, 0.32),
    "rp": (25, 25, 1, 0.04),
}


def test_ann_eval_pinned(spark, sf_dir):
    from gmall_flink_200621_spark.plans.training import ann_eval

    rows = {
        r["method"]: (r["n_exact"], r["n_method"], r["n_common"], round(r["recall"], 6))
        for r in ann_eval(spark, sf_dir).collect()
    }
    assert rows == EXPECTED_SF0001


def test_ann_eval_oracle_matches(duck):
    """The DuckDB oracle reproduces the same pinned frame — guards the
    oracle side of the gate against drifting separately from Spark."""
    from gmall_flink_200621_spark.plans.training_oracle import ANN_EVAL

    df = duck.sql(ANN_EVAL).df()
    rows = {
        r.method: (r.n_exact, r.n_method, r.n_common, round(r.recall, 6))
        for r in df.itertuples()
    }
    assert rows == EXPECTED_SF0001
