"""Spark-upgrade canary for the Arrow byte-limit sentinel (round-9
finding, tuning.py module docstring).

The ~6x permanent python-stage degradation fix depends on a
Spark-INTERNAL short-circuit: ``BatchedPythonArrowInput``'s
``underBatchSizeLimit`` skips the per-row ``ArrowWriter.sizeInBytes()``
walk only when ``maxBytesPerBatch == Int.MaxValue`` exactly.  A Spark
upgrade could rename the conf, change the sentinel, or drop the
short-circuit, silently re-enabling the per-row walk — nothing else in
the suite would notice until the bench regressed 6x.  These tests fail
LOUDLY on any such change:

1. conf survival — the sentinel string must be accepted by a live
   session and parse to exactly Int.MaxValue bytes;
2. structural probe — the installed spark-sql jar's compiled
   ``underBatchSizeLimit`` must still (a) exist, (b) compare the limit
   against the Int.MaxValue constant, and (c) only reach
   ``ArrowWriter.sizeInBytes`` on the non-sentinel path.  Probed by
   disassembling the class with javap (Java is a hard pyspark
   dependency, so a missing javap is itself a loud failure, not a
   skip).
"""

import glob
import os
import re
import shutil
import subprocess
import zipfile

import pyspark

from datasketches_spark import tuning

_CONF = "spark.sql.execution.arrow.maxBytesPerBatch"
_SENTINEL_LONG = 2147483647  # java Int.MaxValue


def test_sentinel_conf_survives_into_session(spark):
    old = spark.conf.get(_CONF, None)
    try:
        spark.conf.set(_CONF, tuning.ARROW_BYTE_LIMIT_OFF)
        assert spark.conf.get(_CONF) == tuning.ARROW_BYTE_LIMIT_OFF
        # the value Spark actually compares is the parsed byte count —
        # it must land on Int.MaxValue exactly (2147483646 would
        # re-enable the per-row walk)
        parsed = spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get(_CONF)
        )
        assert parsed == _SENTINEL_LONG
    finally:
        if old is None:
            spark.conf.unset(_CONF)
        else:
            spark.conf.set(_CONF, old)


def _javap() -> str:
    cand = shutil.which("javap")
    if cand:
        return cand
    jh = os.environ.get("JAVA_HOME", "")
    cand = os.path.join(jh, "bin", "javap")
    assert os.path.exists(cand), (
        "javap not found — cannot structurally verify the Arrow "
        "sentinel short-circuit; install a JDK or re-verify "
        "underBatchSizeLimit by hand after any Spark upgrade"
    )
    return cand


def test_under_batch_size_limit_short_circuit_is_intact(tmp_path):
    jars = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars", "spark-sql_*.jar")
    )
    assert jars, "spark-sql jar not found under pyspark/jars"
    cls = "org/apache/spark/sql/execution/python/BatchedPythonArrowInput$.class"
    with zipfile.ZipFile(jars[0]) as z:
        assert cls in z.namelist(), (
            "BatchedPythonArrowInput moved or was renamed — re-verify "
            "the Arrow maxBytesPerBatch sentinel behavior on this Spark "
            "(tuning.py round-9 finding) and update this canary"
        )
        z.extract(cls, tmp_path)
    asm = subprocess.run(
        [_javap(), "-c", "-p", os.path.join(str(tmp_path), cls)],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    # isolate the compiled underBatchSizeLimit body (scala lifts the
    # local def to underBatchSizeLimit$1 on the companion object)
    m = re.search(
        r"boolean underBatchSizeLimit[^\n]*\n(.*?)(?:\n\n|\Z)",
        asm,
        flags=re.DOTALL,
    )
    assert m, (
        "underBatchSizeLimit no longer exists in BatchedPythonArrowInput"
        " — the per-row sizeInBytes short-circuit changed upstream; "
        "re-measure the grouped-map JIT degradation and update "
        "tuning.ARROW_BYTE_LIMIT_OFF"
    )
    body = m.group(1)
    sentinel_at = body.find("2147483647")
    size_at = body.find("ArrowWriter.sizeInBytes")
    assert sentinel_at != -1, (
        "underBatchSizeLimit no longer compares against Int.MaxValue — "
        "the sentinel value changed upstream"
    )
    assert size_at != -1 and sentinel_at < size_at, (
        "underBatchSizeLimit no longer checks the sentinel BEFORE "
        "calling ArrowWriter.sizeInBytes — the short-circuit order "
        "changed upstream"
    )
