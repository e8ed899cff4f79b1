"""Benchmark harness (driver contract): headline queries at sf0.1.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Coverage per BASELINE.md bench definition: sketch-build throughput for
each family, merge throughput over partition sketches, and scalar
query throughput over >=1k stored sketches.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from datasketches_spark import hll_native
from datasketches_spark.aggregation import sketch_agg


# the timed workload (must stay aligned with scripts/baseline_duckdb.py
# -- tests/test_bench_alignment.py enforces it)
HEADS = [
    "theta_distinct_orders",
    # shared-scan fused profiles: one sketch_agg_multi pass covers
    # theta+KLL+tdigest over lineitem and quantiles+REQ over orders
    # -- the realistic workload shape at scale (N families, one
    # scan) and the per-family build+merge paths are all still
    # exercised.  The DuckDB proxy runs the same fused queries.
    "lineitem_sketch_profile",
    "orders_sketch_profile",
    "hll_union_custkey",
    "cpc_distinct_parts",
    "frequent_priorities",
    "native_topk_priorities",
    "bloom_contains_customers",
    "theta_rollup_region",
    # training-data pipeline operators (beyond-reference surface)
    "ann_topk",
    "doc_token_counts",
    "minhash_near_dups",
    "duplicate_ngram_spans",
    "curation_sample",
    "decontam_overlap",
    "asof_latest_error",
    "range_join_errors",
    "quantity_equi_depth",
    "doc_chunk_pack",
    "skew_join_revenue",
    "table_profile",
]


def _bench_hll_native(spark, sf_dir):
    df = entrymod._t(spark, sf_dir, "lineitem")
    return df.agg(
        hll_native.hll_estimate(hll_native.hll_build("l_orderkey", 12)).alias("est")
    )


def _bench_scalar_over_stored(spark, sf_dir):
    """Scalar query throughput over >=1k stored sketches (BASELINE.md)."""
    entrymod._ensure(spark)  # registry: don't rely on a prior head's side effect
    orders = entrymod._t(spark, sf_dir, "orders")
    stored = sketch_agg(
        orders.withColumn("g", F.col("o_custkey") % 2048),
        "o_orderkey",
        "theta",
        group_cols=["g"],
        k=12,
    ).cache()
    stored.count()  # materialize the build; timing covers the scalar pass
    t0 = time.perf_counter()
    out = stored.select(
        F.expr("datasketch_theta_estimate(sketch)").alias("est"),
        F.expr("datasketch_theta_num_retained(sketch)").alias("nr"),
        F.expr("datasketch_theta_upper_bound(sketch, 2)").alias("ub"),
    )
    n = out.count()
    dt = time.perf_counter() - t0
    stored.unpersist()
    return n, dt


def _steal_ticks() -> int | None:
    """Aggregate steal ticks from /proc/stat (column 8 of the `cpu` line).

    Round-14 postmortem: the driver's 32-core bench window coincided
    with an external hypervisor load burst (identical code measured
    54.5 s there vs 16.2 s at 8 cores six minutes later) and nothing in
    the JSON line recorded it, so PERF mechanically scored 22/22
    regressions.  Emitting the per-run steal delta (additions-only)
    lets any later reader audit whether a window was poisoned.
    """
    try:
        with open("/proc/stat") as fh:
            for line in fh:
                if line.startswith("cpu "):
                    parts = line.split()
                    # fields: user nice system idle iowait irq softirq steal
                    return int(parts[8]) if len(parts) > 8 else None
    except OSError:
        return None
    return None


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    steal_before = _steal_ticks()
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # make the package importable inside python workers (the fastworker
    # daemon module below is imported by `python -m` in a fresh process)
    repo = os.path.dirname(os.path.abspath(__file__))
    os.environ["PYTHONPATH"] = repo + (
        os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
    )
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("datasketches-spark-bench")
        # memoized worker-side spark-files setup: stock pyspark re-reads
        # the pyspark.zip central directory (importlib.invalidate_caches)
        # on EVERY python task, ~115 ms/task measured -- the dominant
        # per-stage floor.  datasketches_spark/fastworker.py keeps the
        # wire protocol identical and re-invalidates only when the
        # files/includes state changes (sc.addPyFile still works;
        # regression-tested in tests/test_fastworker.py).  Measured:
        # trivial 1-task python stage 0.155 s -> 0.076 s, two-stage
        # 0.66 s -> 0.083 s.
        .config("spark.python.daemon.module", "datasketches_spark.fastworker")
        # sketch aggregation shuffles only (key, blob) rows, so a handful
        # of reducers suffices locally; on a real cluster size this to
        # cluster width (the map phase parallelism comes from input splits).
        # MEASURED (round 3, interleaved min-of-3): 2 beats 4 by ~0.1 s/query
        # on the blob-shuffle queries and 1 regresses the row-heavy
        # joins (skew_join/asof) -- 2 is the local sweet spot.
        .config("spark.sql.shuffle.partitions", "2")
        # AQE re-plans at every exchange; at sf0.1 the shuffles are a
        # few blobs, so its per-stage latency (~0.1-0.15 s/query,
        # measured) buys nothing. Keep AQE ON for real clusters --
        # this is a small-data harness setting only.
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.locality.wait", "0")
        # local-only knob, re-MEASURED round 7 (one-session sweep over
        # all 20 heads, best-of-3 interleaved): 8m beats 16m by ~0.65 s
        # total -- 16m leaves lineitem (10.8 MB) as ONE split, so the
        # heavy per-row stages (multi-family sketch builds, regex
        # scoring) serialize onto one core; 8m splits it in two, while
        # 4m/1m lose the gain to per-task overhead (round-2 result,
        # re-confirmed).  On a real cluster at 100 TB files outnumber
        # cores and the 128 MB default is correct; this is purely a
        # small-file harness setting.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        # fewer, larger Arrow batches through the Python sketch path:
        # per-batch pandas/numpy setup is the overhead, not the bytes
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # CRITICAL (round 9): any finite maxBytesPerBatch makes Spark
        # call ArrowWriter.sizeInBytes() PER ROW while filling each
        # python-input batch (BatchedPythonArrowInput.writeSizedBatch);
        # after the first grouped-map stage pollutes the JIT profile at
        # that call site it degrades ~6x and stays degraded for the JVM
        # lifetime (measured: a 60M-row mapInPandas pass 1.4s -> 8.2s,
        # 24 -> 237 CPU-sec, fully reversed by this setting).  The
        # sentinel Int.MaxValue short-circuits the per-row check; batch
        # memory stays bounded by maxRecordsPerBatch above.
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "2147483647b")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # diagnostics knob for the slope methodology: override the scan
    # split size (e.g. scale it with SF to hold tasks-per-core constant
    # and separate wave-quantization effects from real operator growth
    # — see BASELINE_LOCAL.md round-10 slope notes).  The committed 8m
    # above stays the bench default; this is runtime-settable.
    mpb = os.environ.get("SPARK_GRAFT_MPB")
    if mpb:
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    # SIZE-DERIVED confs (round 11, replacing the SPARK_GRAFT_CLUSTER_CONFS
    # env toggle): tuning.scale_confs derives shuffle fan-out / AQE /
    # scan-split sizing from the data directory's byte size with one
    # continuous rule.  At sf0.1 it reproduces the committed harness
    # knobs above EXACTLY (asserted in tests/test_tuning_scale.py), so
    # the pairing gate is untouched; at sf10+ it sizes the shuffles the
    # way the r10 slope analysis showed they must be (skew_join 28.9 s
    # -> 5.9 s at 32 partitions).  SPARK_GRAFT_FIXED_CONFS=1 pins the
    # sf0.1 knobs regardless — the knob the saturation diagnosis used.
    if not os.environ.get("SPARK_GRAFT_FIXED_CONFS"):
        from datasketches_spark import tuning as _tuning

        for _k, _v in _tuning.scale_confs(
            _tuning.dir_bytes(sf_dir), cores=int(cpus)
        ).items():
            if _k == "spark.sql.files.maxPartitionBytes" and mpb:
                continue  # explicit SPARK_GRAFT_MPB wins
            spark.conf.set(_k, _v)

    q = entrymod.queries()
    # optional comma-separated head filter for debugging session-order
    # effects (e.g. SPARK_GRAFT_HEADS=decontam_overlap isolates one
    # query under otherwise-identical bench conditions)
    head_filter = os.environ.get("SPARK_GRAFT_HEADS")
    extra_heads = ["hll_native_distinct", "scalar_over_2k_stored"]
    if head_filter:
        wanted = [h for h in head_filter.split(",") if h]
        unknown = sorted(set(wanted) - set(HEADS) - set(extra_heads))
        if unknown:
            # a typo'd head would silently shrink (or empty) the bench
            # and read as a huge speedup — fail loudly instead
            raise SystemExit(
                f"SPARK_GRAFT_HEADS names not in HEADS: {unknown}; "
                f"known: {sorted(HEADS + extra_heads)}"
            )
        heads = [h for h in HEADS if h in set(wanted)]
        extra_heads = [h for h in extra_heads if h in set(wanted)]
    else:
        heads = HEADS
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # fault isolation: one broken query must never zero the whole bench
    # signal -- time the survivors, report the failures alongside.
    # full untimed warmup pass: first execution of each plan shape pays
    # JVM JIT + python-worker spin-up that steady state never sees
    for name in heads:
        if name not in q:
            continue
        try:
            q[name](spark, sf_dir).collect()
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench warmup failed: {name}: {errors[name]}", file=sys.stderr)
        finally:
            # LSH/dedup/curation queries persist() intermediates; drop
            # them so cache pressure from one query never taxes the next
            spark.catalog.clearCache()

    # best-of-N (6 rounds, soft-deadline-guarded), INTERLEAVED
    # round-robin: host load on this container
    # arrives in multi-second bursts, so three consecutive attempts of
    # one query can all land inside a burst.  Spreading each query's
    # attempts across the whole measurement window makes min-of-3
    # robust to bursts shorter than a full round.  A soft deadline
    # guarantees the JSON line is printed even if the host is slow:
    # round 1 covers every query, later rounds only tighten the min.
    deadline = time.monotonic() + float(
        os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "240")
    )
    rounds_completed = 0
    for _round in range(6):
        if _round > 0 and time.monotonic() > deadline:
            print(
                f"bench: soft deadline hit after round {_round}",
                file=sys.stderr,
            )
            break
        for name in heads:
            if name not in q or name in errors:
                continue
            try:
                t0 = time.perf_counter()
                q[name](spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                timings[name] = round(min(timings.get(name, dt), dt), 3)
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                timings.pop(name, None)
                print(
                    f"bench timing failed: {name}: {errors[name]}",
                    file=sys.stderr,
                )
            finally:
                spark.catalog.clearCache()
        rounds_completed = _round + 1

    if "hll_native_distinct" in extra_heads:
        try:
            best = float("inf")
            # best-of-5: this row sat outside the budgeted best-of-N
            # loop at best-of-2, and its session-to-session variance
            # (±2x at ~0.2-0.6s absolutes) polluted the round-10 slope
            # artifact's linear check — see BENCH_SLOPES_r10 notes
            for _ in range(5):
                t0 = time.perf_counter()
                _bench_hll_native(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            timings["hll_native_distinct"] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            errors["hll_native_distinct"] = f"{type(exc).__name__}: {exc}"[:300]

    if "scalar_over_2k_stored" in extra_heads:
        try:
            _, dt = _bench_scalar_over_stored(spark, sf_dir)
            timings["scalar_over_2k_stored"] = round(dt, 3)
        except Exception as exc:  # noqa: BLE001
            errors["scalar_over_2k_stored"] = (
                f"{type(exc).__name__}: {exc}"[:300]
            )

    total = round(sum(timings.values()), 3)
    steal_after = _steal_ticks()
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # measurement-audit fields (ADDITIONS-only, round 15): how many
        # of the 6 interleaved min-of-N rounds actually completed before
        # the soft deadline (min-of-1 == warmup-contaminated), the run's
        # /proc/stat steal-tick delta (1 tick = 10 ms of a stolen core;
        # the r14 poisoned window measured ~hundreds of stolen
        # core-seconds), and the core count the run honored.
        "rounds_completed": rounds_completed,
        "cpus": int(cpus) if str(cpus).isdigit() else cpus,
    }
    if steal_before is not None and steal_after is not None:
        payload["steal_ticks_delta"] = steal_after - steal_before
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
