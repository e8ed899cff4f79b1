"""Interleaved A/B: minhash/simhash signature-pass fan-out (r15).

Both arms run in ONE session, alternating, min-of-N — the only
trustworthy methodology on this steal-bursty box.  The "before" arm
monkeypatches decontam._fan_out_if_narrow to identity; the "after" arm
uses the committed code.  Results are hash-compared.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: F401  (reuse its conf recipe via main-less import)
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from datasketches_spark.pipeline import decontam

N = 5


def steal():
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = repo + (
        os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
    )
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-minhash-fanout")
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
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()
    heads = sys.argv[1:] or ["minhash_near_dups"]

    real_fan = decontam._fan_out_if_narrow
    ident = lambda df: df  # noqa: E731

    # hash-identity check first (sorted rows)
    for h in heads:
        decontam._fan_out_if_narrow = ident
        before_rows = sorted(map(str, q[h](spark, sf_dir).collect()))
        spark.catalog.clearCache()
        decontam._fan_out_if_narrow = real_fan
        after_rows = sorted(map(str, q[h](spark, sf_dir).collect()))
        spark.catalog.clearCache()
        assert before_rows == after_rows, f"{h}: RESULTS DIFFER"
        print(f"{h}: results identical ({len(after_rows)} rows)")

    best = {(h, arm): float("inf") for h in heads for arm in ("before", "after")}
    s0 = steal()
    for _ in range(N):
        for h in heads:
            for arm, fn in (("before", ident), ("after", real_fan)):
                decontam._fan_out_if_narrow = fn
                t0 = time.perf_counter()
                q[h](spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                best[(h, arm)] = min(best[(h, arm)], dt)
                spark.catalog.clearCache()
    decontam._fan_out_if_narrow = real_fan
    print(f"steal_ticks_delta={steal() - s0}")
    for h in heads:
        b, a = best[(h, "before")], best[(h, "after")]
        print(f"{h}: before={b:.3f}s after={a:.3f}s ({b / a:.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
