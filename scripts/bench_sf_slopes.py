"""Per-query growth slopes across scale factors (default sf0.1 vs the
10x replica from scripts/gen_scaled_sf.py).

Runs bench.py (itself interleaved best-of-6) at each SF dir,
ALTERNATING runs so host drift hits both sides equally, and prints a
slope table: slope = t(big) / t(small) on per-query best times.  With
10x data, slope << 10 means the fixed per-query floor (python stage
setup, stage scheduling, collect) dominates at small SF and amortizes
with data — the 100 TB claim measured instead of argued.

Caveat printed with the table: scalar_over_2k_stored times a
constant-size stored-blob scalar (slope ~1 expected, that's the point
of the row).  decontam_overlap is load-honest since round 9 (the
benchmark side is a FIXED 100-doc slice; the train side scales), so
its slope measures the train scan.

Usage: python scripts/bench_sf_slopes.py [small_dir] [big_dir] [pairs]
       (defaults: /root/testdata/sf0.1 /tmp/sf1 2)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_pairing import _run  # noqa: E402  (shared JSON-line runner)

FIXED_ROWS = {"scalar_over_2k_stored"}


def _run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    return _run([sys.executable, "bench.py"], env=env, timeout=1800)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    best_s: dict[str, float] = {}
    best_b: dict[str, float] = {}
    tot_s = tot_b = float("inf")
    for i in range(pairs):
        rs = _run_bench(small)
        rb = _run_bench(big)
        tot_s = min(tot_s, rs["value"])
        tot_b = min(tot_b, rb["value"])
        for q, t in rs["queries"].items():
            best_s[q] = min(best_s.get(q, t), t)
        for q, t in rb["queries"].items():
            best_b[q] = min(best_b.get(q, t), t)
        print(f"pair {i + 1}: small={rs['value']}s big={rb['value']}s", flush=True)
    rows = []
    for q in best_s:
        if q in best_b:
            rows.append((q, best_s[q], best_b[q], best_b[q] / max(best_s[q], 1e-9)))
    rows.sort(key=lambda r: -r[3])
    print(json.dumps({
        "small_dir": small, "big_dir": big,
        "small_total": tot_s, "big_total": tot_b,
        "total_slope": round(tot_b / tot_s, 2),
        "slopes": {q: round(sl, 2) for q, s, b, sl in rows},
    }))
    print("\n| query | t(small) s | t(10x) s | slope |")
    print("|---|---:|---:|---:|")
    for q, s, b, sl in rows:
        mark = " (fixed-size row, not a scaling signal)" if q in FIXED_ROWS else ""
        print(f"| {q}{mark} | {s:.3f} | {b:.3f} | {sl:.2f} |")


if __name__ == "__main__":
    main()
