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

Usage: python scripts/bench_sf_slopes.py [dir ...] [pairs]
       (defaults: /root/testdata/sf0.1 /tmp/sf1 2; 2-4 dirs accepted)

With 3+ dirs the honest superlinearity test runs per CONSECUTIVE
TRIPLE (round-9 analysis, generalized in round 10): per-query decade
slopes RISE toward the data ratio as the fixed job floor amortizes —
that is expected, not a regression.  The failure signature is
t(big) above the LINEAR EXTRAPOLATION of the two smaller points
(t = floor + b*s, with s the TRUE data scale read from each dir's
lineitem row count — no name parsing), so each triple prints
ratio = t(s3) / (floor + b*s3): <= 1 is at-or-below linear; > 1.4 at
non-trivial absolute time and a real growth signal (b meaningfully
> 0) deserves a root-cause.  Round 9's CPC ratio of 1.41 found the
Arrow per-row sizeInBytes degradation this way.  The reason for 4-dir
mode: queries that are FLAT across the first decade (floor-dominated)
make the (sf0.1, sf1) fit meaningless — the (sf1, sf3, sf10) triple
re-fits them on points past the floor.
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


def data_scale(sf_dir: str) -> float:
    """TRUE data scale of a dir: its lineitem parquet row count (read
    from footer metadata, no Spark job).  Scales are then ratios of
    these — no directory-name parsing."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "lineitem.parquet")
    if os.path.isdir(path):
        return float(
            sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        )
    return float(pq.ParquetFile(path).metadata.num_rows)


def linear_check(
    t1: dict[str, float],
    t2: dict[str, float],
    t3: dict[str, float],
    s1: float,
    s2: float,
    s3: float,
) -> dict[str, float | None]:
    """ratio = t(s3) / linear extrapolation of the (s1, s2) fit.

    None when the fitted data slope b is non-positive (a flat or
    noise-inverted first interval makes the extrapolation meaningless).
    """
    out: dict[str, float | None] = {}
    for q in t1:
        if q not in t2 or q not in t3:
            continue
        b = (t2[q] - t1[q]) / (s2 - s1)
        pred = t1[q] + b * (s3 - s1)
        out[q] = round(t3[q] / pred, 2) if b > 0 and pred > 0 else None
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
    if not 2 <= len(dirs) <= 4:
        sys.exit("expected 2-4 SF dirs")
    scales = [data_scale(d) for d in dirs]
    rel = [round(s / scales[0], 3) for s in scales]
    print(json.dumps({"dirs": dirs, "lineitem_rows": scales, "rel_scale": rel}))
    bests, totals = _measure(dirs, pairs)
    for j in range(len(dirs) - 1):
        _decade_report(dirs[j], dirs[j + 1], bests[j], bests[j + 1],
                       totals[j], totals[j + 1])
    for j in range(len(dirs) - 2):
        ratios = linear_check(
            bests[j], bests[j + 1], bests[j + 2],
            scales[j], scales[j + 1], scales[j + 2],
        )
        print(json.dumps({
            "linear_check_fit": [dirs[j], dirs[j + 1]],
            "extrapolated_to": dirs[j + 2],
            "t_over_pred": ratios,
        }))
        print(f"\n| query | t({dirs[j + 2]})/linear_pred of "
              f"({dirs[j]},{dirs[j + 1]}) |  (<=1 at-or-below linear; "
              "None = flat fit interval) |")
        print("|---|---:|---|")
        for q, r in sorted(ratios.items(), key=lambda kv: -(kv[1] or 0)):
            note = "fixed-size row" if q in FIXED_ROWS else ""
            print(f"| {q} | {r if r is not None else '—'} | {note} |")


if __name__ == "__main__":
    main()
