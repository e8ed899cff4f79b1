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


_NO_DAEMON_SCRIPT = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ["PYTHONPATH"] = {repo!r} + os.pathsep + os.environ.get("PYTHONPATH", "")
    from pyspark.sql import SparkSession

    # NO spark.python.daemon.module conf: the package must be plain
    # stock pyspark (graceful degradation — r10 verdict item #7)
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("no-daemon-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.python.daemon.module", None) in (None, "pyspark.daemon")

    from datasketches_spark.aggregation import sketch_agg
    df = spark.range(1000).withColumnRenamed("id", "k")
    out = sketch_agg(
        df, "k", "theta", k=14,
        finalize=lambda sk: {{"est": int(round(sk.get_estimate()))}},
        finalize_schema="est bigint",
    ).collect()
    assert out[0]["est"] == 1000, out
    print("NO_DAEMON_OK")
    spark.stop()
    """
).format(repo=REPO)


def test_no_daemon_conf_still_correct():
    """Without the fastworker conf the package runs on the stock
    daemon — slower, never wrong.  (The main test session sets the
    conf, so this must run in its own subprocess.)"""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", _NO_DAEMON_SCRIPT],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert "NO_DAEMON_OK" in r.stdout, r.stdout + r.stderr


def test_install_degrades_when_pyspark_moves_the_hooks(monkeypatch):
    """A future pyspark that renames setup_spark_files must NOT break
    worker startup: _install() catches everything and falls back to
    stock behavior (fastworker.py's defensive contract)."""
    import importlib

    import pyspark.worker as w
    import pyspark.worker_util as wu

    import datasketches_spark.fastworker as fw

    orig_w, orig_wu = w.setup_spark_files, wu.setup_spark_files
    monkeypatch.delattr(w, "setup_spark_files")
    monkeypatch.delattr(wu, "setup_spark_files")
    # removing utf8_deserializer makes _install's imports actually
    # RAISE, driving the defensive except path (not just a re-assign)
    monkeypatch.delattr(wu, "utf8_deserializer")
    try:
        importlib.reload(fw)  # import-time _install() must not raise
        # the failed install must not have half-patched anything
        assert not hasattr(w, "setup_spark_files")
    finally:
        w.setup_spark_files = orig_w
        wu.setup_spark_files = orig_wu
        monkeypatch.undo()
        importlib.reload(fw)  # restore the real patch for the session
