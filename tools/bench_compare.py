"""Compare two bench JSON lines (bench.py output or the driver's
BENCH_r{N}.json `tail`): per-query deltas, flagged regressions, totals.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 0.25]

Reads either a raw bench JSON line or a driver artifact containing one;
compares the min-statistic per query (the contention-robust one), prints
queries sorted by relative regression, and exits 1 if any COMMON query
regressed beyond the threshold — the hook a CI perf gate calls.
"""

from __future__ import annotations

import json
import os
import re
import sys


def _follow_detail(d: dict, base_dir: str) -> dict:
    """r06+ compact lines carry totals + a headline `queries` subset and
    point at the committed BENCH_DETAIL_r{N}.json holding the full maps;
    prefer the detail file when it's resolvable, else use the compact
    subset (partial data beats none)."""
    if "detail" in d:
        dp = os.path.join(base_dir, d["detail"])
        if os.path.exists(dp):
            with open(dp) as f:
                return json.load(f)
    return d


def load(path: str) -> dict:
    base_dir = os.path.dirname(os.path.abspath(path))
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return _follow_detail(d, base_dir)
    # driver artifact: the bench line lives in the `tail` string
    if isinstance(d, dict) and "tail" in d:
        raw = d["tail"]
    # newest parseable {"metric": ...} JSON object in the text (compact
    # r06+ lines put "detail"/"queries" after "sf"; old lines ended at
    # "sf": N — match any balanced-looking candidate and json-validate)
    best = None
    for m in re.finditer(r'\{"metric".*?\}(?=\s*$|\s*\n)', raw, re.MULTILINE):
        try:
            best = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
    if best is not None and "queries" in best:
        return _follow_detail(best, base_dir)
    # driver tails are sometimes truncated at the FRONT, even mid-key —
    # recover what remains of the per-query min dict: complete "name":
    # number pairs up to the dict's closing brace (the partial first pair
    # and the later queries_median dict are excluded). Partial data beats
    # none for a cross-round comparison; the missing head queries simply
    # fall out of `common`.
    head = raw.split("}", 1)[0]
    pairs = dict(
        (m.group(1), float(m.group(2)))
        for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', head)
    )
    if pairs:
        return {"queries": pairs, "partial": True}
    raise SystemExit(f"{path}: no bench JSON found")


def _usable_shuffle(sb: dict | None) -> dict | None:
    """A shuffle-bytes map is comparable only if instrumentation actually
    ran: bench.py records null per query (or omits the map) when the
    AppStatusStore reflection breaks, and an all-zero map is the silent
    form of the same failure — either way, comparing would read as a
    100% improvement/regression artifact. Returns the dict of real
    per-query maps, or None when unusable."""
    if not isinstance(sb, dict):
        return None
    real = {k: m for k, m in sb.items() if isinstance(m, dict)}
    if not real or all(sum(m.values()) == 0 for m in real.values()):
        return None
    return real


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 0.25
    if "--threshold" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--threshold") + 1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    rows = []
    for k in common:
        a, b = oq[k], nq[k]
        rows.append(((b - a) / a if a else 0.0, k, a, b))
    rows.sort(reverse=True)
    bad = [r for r in rows if r[0] > thr]
    print(f"common {len(common)}  added {sorted(set(nq) - set(oq))}  removed {sorted(set(oq) - set(nq))}")
    tot_o, tot_n = sum(oq[k] for k in common), sum(nq[k] for k in common)
    ratio = f" ({tot_n / tot_o:.3f}x)" if tot_o else ""
    print(f"total(common): {tot_o:.2f}s -> {tot_n:.2f}s{ratio}")
    # run provenance (r12+): the load context a seconds ratio must be
    # read against — byte-flat drift under high ambient load is host
    # noise, the same drift at idle load is a real regression signal
    for tag, d in (("old", old), ("new", new)):
        p = d.get("provenance")
        if isinstance(p, dict):
            print(
                f"  {tag}: sha={str(p.get('git_sha'))[:12]}"
                f" start={p.get('started_utc')}"
                f" loadavg {p.get('loadavg_start')} -> {p.get('loadavg_end')}"
                f" cpus={p.get('cpus')}"
            )
    print(f"{'delta':>8s}  {'old':>7s} {'new':>7s}  query")
    for d, k, a, b in rows[:15]:
        flag = "  <-- REGRESSION" if d > thr else ""
        print(f"{d:+8.1%}  {a:7.2f} {b:7.2f}  {k}{flag}")

    # shuffle/spill byte deltas (r09+ detail files): the memory-scale
    # signal — seconds at sf0.1 can hide a plan that doubled its shuffle
    # volume. Compared on total bytes (write + read + both spills), with
    # the SAME exit-1 ratchet as the seconds above: a per-query byte
    # regression beyond the threshold (and > 1 MiB absolute, filtering
    # footer-noise on tiny queries) fails loudly.
    sbad = []
    osb = _usable_shuffle(old.get("queries_shuffle_bytes"))
    nsb = _usable_shuffle(new.get("queries_shuffle_bytes"))
    if osb and nsb:
        tot = lambda m: sum(m.values())
        srows = sorted(
            (
                ((tot(nsb[k]) - tot(osb[k])) / tot(osb[k]) if tot(osb[k]) else 0.0),
                k,
                tot(osb[k]),
                tot(nsb[k]),
            )
            for k in set(osb) & set(nsb)
        )
        print(f"\nshuffle+spill bytes: {sum(r[2] for r in srows)/2**20:.1f} MiB"
              f" -> {sum(r[3] for r in srows)/2**20:.1f} MiB (common {len(srows)})")
        print(f"{'delta':>8s}  {'old MiB':>9s} {'new MiB':>9s}  query")
        sbad = [r for r in srows if r[0] > thr and r[3] - r[2] > 2**20]
        for d, k, a, b in sorted(srows, reverse=True)[:10]:
            flag = "  <-- SHUFFLE REGRESSION" if d > thr and b - a > 2**20 else ""
            print(f"{d:+8.1%}  {a/2**20:9.2f} {b/2**20:9.2f}  {k}{flag}")
    elif nsb:
        biggest = sorted(nsb.items(), key=lambda kv: -sum(kv[1].values()))[:10]
        print("\nshuffle+spill bytes (new run only; old run has no usable"
              " instrumentation):")
        for k, m in biggest:
            spill = m.get("spill_memory", 0) + m.get("spill_disk", 0)
            print(f"  {sum(m.values())/2**20:9.2f} MiB  (spill {spill/2**20:.2f} MiB)  {k}")

    if bad or sbad:
        print(f"\n{len(bad)} queries regressed beyond {thr:.0%} (seconds);"
              f" {len(sbad)} beyond {thr:.0%} (shuffle bytes)")
        sys.exit(1)


if __name__ == "__main__":
    main()
