"""Capture .explain("formatted") for bench heads into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [suffix] [head,head,...]
Writes plans/<tag>/<head>_<suffix>.txt (suffix default "before").

Uses the exact bench session conf (bench.py) so the captured plans are
the plans the bench actually runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def bench_session(cpus: str = "32") -> SparkSession:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = repo + (
        os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
    )
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("plan-capture")
        .config("spark.python.daemon.module", "datasketches_spark.fastworker")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.locality.wait", "0")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "2147483647b")
        .getOrCreate()
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench as benchmod

    heads = sys.argv[3].split(",") if len(sys.argv) > 3 else list(benchmod.HEADS)
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(outdir, exist_ok=True)
    spark = bench_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()
    for name in heads:
        if name not in q:
            print(f"skip (not declared): {name}")
            continue
        try:
            from datasketches_spark import compat

            df = q[name](spark, sf_dir)
            plan = compat.formatted_plan_string(df)
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
        finally:
            spark.catalog.clearCache()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
