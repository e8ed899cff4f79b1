"""fastworker daemon module: correctness under the memoized
spark-files setup (datasketches_spark/fastworker.py).

Runs in a SUBPROCESS because the shared test session already owns the
JVM and the daemon module is a session-construction conf.  Covers:

- python-worker results identical to stock (sketch two-phase path);
- ``sc.addPyFile`` mid-session still invalidates import caches (the
  one case the stock per-task invalidation exists for);
- worker reuse across jobs (the memo state persists per process).
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import os, sys, tempfile
    sys.path.insert(0, {repo!r})
    os.environ["PYTHONPATH"] = {repo!r} + os.pathsep + os.environ.get("PYTHONPATH", "")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("fastworker-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.python.daemon.module", "datasketches_spark.fastworker")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 1) two-phase sketch path returns the exact count (worker results OK)
    from datasketches_spark.aggregation import sketch_agg
    df = spark.range(1000).withColumnRenamed("id", "k")
    out = sketch_agg(
        df, "k", "theta", k=14,
        finalize=lambda sk: {{"est": int(round(sk.get_estimate()))}},
        finalize_schema="est bigint",
    ).collect()
    assert out[0]["est"] == 1000, out

    # 2) repeated jobs reuse workers and stay correct (memo steady state)
    for _ in range(3):
        assert sketch_agg(
            df, "k", "theta", k=14,
            finalize=lambda sk: {{"est": int(round(sk.get_estimate()))}},
            finalize_schema="est bigint",
        ).collect()[0]["est"] == 1000

    # 3) addPyFile mid-session: the memo must notice the includes change
    #    and re-invalidate, so the new module imports inside workers
    mod_dir = tempfile.mkdtemp()
    mod_path = os.path.join(mod_dir, "fastworker_probe_mod.py")
    with open(mod_path, "w") as fh:
        fh.write("MAGIC = 40411\\n")
    spark.sparkContext.addPyFile(mod_path)

    def use_mod(it):
        import pandas as pd
        import fastworker_probe_mod as m
        for pdf in it:
            yield pd.DataFrame({{"v": [m.MAGIC] * len(pdf)}})

    got = (
        spark.range(0, 3, 1, 1).toDF("x")
        .mapInPandas(use_mod, "v long").collect()
    )
    assert [r["v"] for r in got] == [40411] * 3, got

    print("FASTWORKER_OK")
    spark.stop()
    """
).format(repo=REPO)


def test_fastworker_subprocess():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert "FASTWORKER_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
