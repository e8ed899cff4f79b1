"""tuning.scale_confs: one continuous size-derived conf rule (round 11,
replacing the SPARK_GRAFT_CLUSTER_CONFS env toggle).  The critical
contract: at the sf0.1 bench data size it reproduces the committed
harness knobs EXACTLY (the pairing gate's numbers depend on them), and
at the sizes where the r10 slope analysis measured saturation it
derives the confs that fixed it (shuffle.partitions ~32 at 1.8 GB)."""

import pytest

from datasketches_spark import tuning

MB = 1 << 20


def test_sf01_anchor_reproduces_committed_bench_knobs():
    # 17.5 MB on disk — /root/testdata/sf0.1 (bench.py's default dir)
    confs = tuning.scale_confs(17_508_506, cores=32)
    assert confs == {
        "spark.sql.shuffle.partitions": "2",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.files.maxPartitionBytes": str(8 * MB),
        "spark.sql.files.openCostInBytes": "65536",
    }


def test_sf10_derives_the_measured_saturation_fix():
    # 1.82 GB (the sf10 replica): r9/r10 measured skew_join 28.9 s at
    # shuffle.partitions=2 vs 5.9 s at 32 — the derived value must be
    # in the fixed regime, with AQE on and cluster-regime open cost
    confs = tuning.scale_confs(1_821_033_060, cores=32)
    assert 16 <= int(confs["spark.sql.shuffle.partitions"]) <= 128
    assert confs["spark.sql.adaptive.enabled"] == "true"
    assert int(confs["spark.sql.files.maxPartitionBytes"]) >= 8 * MB
    assert confs["spark.sql.files.openCostInBytes"] == str(4 * MB)


def test_monotone_and_clamped():
    prev = 0
    for b in (MB, 100 * MB, 1 << 30, 10 << 30, 1 << 40):
        parts = int(
            tuning.scale_confs(b, cores=32)["spark.sql.shuffle.partitions"]
        )
        assert parts >= max(prev, 2)
        assert parts <= 4 * 32
        prev = parts
    # split size clamped to [8 MB, 128 MB]
    tiny = tuning.scale_confs(1, cores=32)
    huge = tuning.scale_confs(1 << 42, cores=32)
    assert int(tiny["spark.sql.files.maxPartitionBytes"]) == 8 * MB
    assert int(huge["spark.sql.files.maxPartitionBytes"]) == 128 * MB


def test_dir_bytes_and_df_plan_bytes(spark, tmp_path):
    import os

    p = tmp_path / "blob.bin"
    p.write_bytes(b"x" * 12345)
    assert tuning.dir_bytes(str(tmp_path)) == 12345
    df = spark.range(1000)
    assert tuning.plan_bytes(df) > 0
    confs = tuning.scale_confs(df=df, cores=8)
    assert confs["spark.sql.shuffle.partitions"] == "2"


def test_requires_a_size_input():
    with pytest.raises(ValueError, match="data_bytes"):
        tuning.scale_confs()
