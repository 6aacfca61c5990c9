"""Unit pins for the oracle-vocab sidecar lifecycle (plans/training.py:
_write_oracle_sidecar): fingerprint-keyed filenames so colliding corpora
coexist, and the keep-last-N age-out that bounds the per-uid dir across
rounds (VERDICT r12 item #8 / ADVICE r12 #1).
"""

from __future__ import annotations

import glob
import os
import time

from gmall_flink_200621_spark.plans.training import (
    ORACLE_SIDECAR_DIR,
    SIDECAR_KEEP_PER_KIND,
    _prune_oracle_sidecars,
    _write_oracle_sidecar,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


class TestSidecarLifecycle:
    def test_filename_carries_full_fingerprint(self):
        """The filename must embed (n_docs, n_chars, n_fp) — two corpora
        colliding on count+chars (the driver's 500-doc sf0.001/sf0.01
        pair is the live example for the first two) write DISTINCT files
        instead of overwriting each other."""
        _write_oracle_sidecar("tfp", SF_DIR, {"piece": ["a", "b"]})
        files = glob.glob(os.path.join(ORACLE_SIDECAR_DIR, "tfp_*.parquet"))
        assert files, "sidecar not written"
        parts = os.path.basename(files[0])[: -len(".parquet")].split("_")
        # tfp_<ndocs>_<nchars>_<nfp>
        assert len(parts) == 4 and all(p.isdigit() for p in parts[1:]), files[0]
        for f in files:
            os.remove(f)

    def test_dir_is_bounded_per_kind(self):
        """Age-out: after many writes of one kind, at most
        SIDECAR_KEEP_PER_KIND files survive, and the newest survives.
        Other kinds are untouched."""
        kind, other = "tprune", "tkeep"
        for d in (kind, other):
            for f in glob.glob(os.path.join(ORACLE_SIDECAR_DIR, f"{d}_*.parquet")):
                os.remove(f)
        os.makedirs(ORACLE_SIDECAR_DIR, exist_ok=True)
        keep_file = os.path.join(ORACLE_SIDECAR_DIR, f"{other}_1_1_1.parquet")
        open(keep_file, "wb").close()
        now = time.time()
        for i in range(SIDECAR_KEEP_PER_KIND * 2):
            p = os.path.join(ORACLE_SIDECAR_DIR, f"{kind}_{i}_{i}_{i}.parquet")
            open(p, "wb").close()
            os.utime(p, (now + i, now + i))
        _prune_oracle_sidecars(kind)
        left = glob.glob(os.path.join(ORACLE_SIDECAR_DIR, f"{kind}_*.parquet"))
        assert len(left) == SIDECAR_KEEP_PER_KIND, left
        # newest-first retention: the freshest file must survive
        newest = os.path.join(
            ORACLE_SIDECAR_DIR,
            f"{kind}_{SIDECAR_KEEP_PER_KIND * 2 - 1}"
            f"_{SIDECAR_KEEP_PER_KIND * 2 - 1}_{SIDECAR_KEEP_PER_KIND * 2 - 1}.parquet",
        )
        assert newest in left
        assert os.path.exists(keep_file)  # other kinds untouched
        for f in left + [keep_file]:
            os.remove(f)

    def test_write_prunes_inline(self):
        """Every _write_oracle_sidecar call prunes its own kind — the
        dir stays bounded without any external sweeper."""
        kind = "tinline"
        os.makedirs(ORACLE_SIDECAR_DIR, exist_ok=True)
        now = time.time()
        for i in range(SIDECAR_KEEP_PER_KIND + 5):
            p = os.path.join(ORACLE_SIDECAR_DIR, f"{kind}_{i}_{i}_{i}.parquet")
            open(p, "wb").close()
            os.utime(p, (now - 1000 + i, now - 1000 + i))
        _write_oracle_sidecar(kind, SF_DIR, {"piece": ["x"]})
        left = glob.glob(os.path.join(ORACLE_SIDECAR_DIR, f"{kind}_*.parquet"))
        assert len(left) <= SIDECAR_KEEP_PER_KIND, left
        for f in left:
            os.remove(f)
