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

Three-dir mode adds the honest superlinearity test (round-9 analysis):

       python scripts/bench_sf_slopes.py sf0.1_dir sf1_dir sf10_dir [pairs]

Per-query decade slopes RISE toward 10 as the fixed job floor
amortizes — that is expected, not a regression.  The failure signature
is t(sf100x) above the LINEAR EXTRAPOLATION of the (1x, 10x) fit
(t = floor + b*s), so three-dir mode prints ratio =
t(100x) / (floor + 100b) per query: <= 1 is at-or-below linear; > 1.4
at non-trivial absolute time and a real decade-1 growth signal
(b meaningfully > 0) deserves a root-cause.  Round 9's CPC ratio of
1.41 found the Arrow per-row sizeInBytes degradation this way.
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


def linear_check(
    t1: dict[str, float], t10: dict[str, float], t100: dict[str, float]
) -> dict[str, float | None]:
    """ratio = t(100x) / linear extrapolation of the (1x, 10x) fit.

    None when the fitted data slope b is non-positive (a flat or
    noise-inverted first decade makes the extrapolation meaningless).
    """
    out: dict[str, float | None] = {}
    for q in t1:
        if q not in t10 or q not in t100:
            continue
        b = (t10[q] - t1[q]) / 9.0
        pred = (t1[q] - b) + 100.0 * b
        out[q] = round(t100[q] / pred, 2) if b > 0 and pred > 0 else None
    return out


def _measure(dirs: list[str], pairs: int):
    """Alternate bench runs across all dirs; per-query and total bests."""
    bests: list[dict[str, float]] = [{} for _ in dirs]
    totals = [float("inf")] * len(dirs)
    for i in range(pairs):
        line = []
        for j, d in enumerate(dirs):
            r = _run_bench(d)
            totals[j] = min(totals[j], r["value"])
            for q, t in r["queries"].items():
                bests[j][q] = min(bests[j].get(q, t), t)
            line.append(f"{d}={r['value']}s")
        print(f"pair {i + 1}: " + " ".join(line), flush=True)
    return bests, totals


def _decade_report(small: str, big: str, bs: dict, bb: dict,
                   tot_s: float, tot_b: float) -> None:
    rows = []
    for q in bs:
        if q in bb:
            rows.append((q, bs[q], bb[q], bb[q] / max(bs[q], 1e-9)))
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


def main() -> None:
    args = sys.argv[1:]
    # only the FINAL arg may be the pairs count, and only when it is
    # not itself an existing directory (an SF dir literally named "10"
    # must not be silently dropped and misread as pairs)
    pairs = 2
    if args and args[-1].isdigit() and not os.path.isdir(args[-1]):
        pairs = int(args.pop())
    dirs = args or ["/root/testdata/sf0.1", "/tmp/sf1"]
    if len(dirs) not in (2, 3):
        sys.exit("expected 2 (decade) or 3 (two-decade) SF dirs")
    bests, totals = _measure(dirs, pairs)
    for j in range(len(dirs) - 1):
        _decade_report(dirs[j], dirs[j + 1], bests[j], bests[j + 1],
                       totals[j], totals[j + 1])
    if len(dirs) == 3:
        ratios = linear_check(bests[0], bests[1], bests[2])
        print(json.dumps({"linear_check_t100_over_pred": ratios}))
        print("\n| query | t(100x)/linear_pred |  (<=1 at-or-below linear; "
              "None = flat decade 1) |")
        print("|---|---:|---|")
        for q, r in sorted(ratios.items(), key=lambda kv: -(kv[1] or 0)):
            note = "fixed-size row" if q in FIXED_ROWS else ""
            print(f"| {q} | {r if r is not None else '—'} | {note} |")


if __name__ == "__main__":
    main()
