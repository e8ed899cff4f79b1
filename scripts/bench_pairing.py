"""Warm same-window pairing: bench.py vs the DuckDB proxy, alternated.

The judge's bench gate is the RATIO of bench.py's total to
scripts/baseline_duckdb.py's total, measured warm and in the same time
window (this container has multi-second external load bursts, so two
single-shot runs taken minutes apart are not comparable — see
CLAUDE.md "Hard-won facts").  This script alternates full runs of both
harnesses N times and prints every pair plus the min/median ratios.

Usage: python scripts/bench_pairing.py [N] [--gate]   (default N=3)

With --gate the script becomes a HARD gate (nonzero exit) on two
committed bounds, sized with honest headroom for this container's
documented multi-second external load bursts:

- min-of-N pairing ratio must stay <= GATE_MAX_RATIO (1.8; the graded
  bar is 2x, recent rounds measured 1.2-1.5 — min-of-N is the only
  statistic stable under bursts because load inflates both sides of a
  pair together).
- best solo spark bench total must stay <= GATE_MAX_SPARK_SEC (16 s;
  best-known warm totals are 7.3-9.0 s, so this only trips on a real
  structural regression such as the Arrow per-row-sizeInBytes walk
  re-enabling, which measured ~6x).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _run(cmd: list[str], env: dict | None = None, timeout: int = 900) -> dict:
    """Run a harness command and parse its last JSON line (shared with
    bench_sf_slopes.py)."""
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        timeout=timeout,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from {cmd}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def _per_query_table(spark_q: dict, duck_q: dict) -> str:
    """Markdown per-query ratio table (best-of-pairing times)."""
    lines = [
        "| query | spark s | duckdb s | ratio |",
        "|---|---:|---:|---:|",
    ]
    for q in sorted(spark_q, key=lambda q: -spark_q[q]):
        s = spark_q[q]
        d = duck_q.get(q)
        r = f"{s / d:.2f}" if d else "—"
        lines.append(f"| {q} | {s:.3f} | {d if d is not None else float('nan'):.3f} | {r} |")
    return "\n".join(lines)


GATE_MAX_RATIO = 1.8
GATE_MAX_SPARK_SEC = 16.0


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--gate"]
    gate = "--gate" in sys.argv[1:]
    n = int(argv[0]) if argv else 3
    pairs = []
    best_spark_q: dict = {}
    best_duck_q: dict = {}
    for i in range(n):
        spark = _run([sys.executable, "bench.py"])
        duck = _run([sys.executable, "scripts/baseline_duckdb.py"])
        for q, t in spark.get("queries", {}).items():
            best_spark_q[q] = min(best_spark_q.get(q, t), t)
        for q, t in duck.get("queries", {}).items():
            best_duck_q[q] = min(best_duck_q.get(q, t), t)
        ratio = spark["value"] / duck["value"]
        pairs.append((spark["value"], duck["value"], ratio))
        print(
            json.dumps(
                {
                    "pair": i + 1,
                    "spark_total_sec": spark["value"],
                    "duckdb_total_sec": duck["value"],
                    "ratio": round(ratio, 2),
                }
            ),
            flush=True,
        )
    ratios = sorted(r for _, _, r in pairs)
    print(
        json.dumps(
            {
                "pairs": n,
                "min_ratio": round(ratios[0], 2),
                "median_ratio": round(ratios[n // 2], 2),
                "spark_best": min(p[0] for p in pairs),
                "duckdb_best": min(p[1] for p in pairs),
            }
        )
    )
    # per-query ratio table (judge round-5 item #7): totals hide
    # per-query regressions — print the table for BASELINE_LOCAL.md
    print()
    print(_per_query_table(best_spark_q, best_duck_q))
    if gate:
        spark_best = min(p[0] for p in pairs)
        failures = []
        if ratios[0] > GATE_MAX_RATIO:
            failures.append(
                f"min pairing ratio {ratios[0]:.2f} > {GATE_MAX_RATIO}"
            )
        if spark_best > GATE_MAX_SPARK_SEC:
            failures.append(
                f"best solo spark total {spark_best:.2f}s > "
                f"{GATE_MAX_SPARK_SEC}s floor tripwire"
            )
        if failures:
            sys.exit("PAIRING GATE FAILED: " + "; ".join(failures))
        print(
            f"pairing gate OK: min ratio {ratios[0]:.2f} <= "
            f"{GATE_MAX_RATIO}, spark best {spark_best:.2f}s <= "
            f"{GATE_MAX_SPARK_SEC}s"
        )


if __name__ == "__main__":
    main()
