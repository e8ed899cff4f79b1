"""Reservoir sample family: statistical + exact-mode + Spark surface.

Beyond-reference family (see sketches/reservoir.py).  Exact-mode tests
are deterministic (n <= k keeps everything); sampling properties are
tested statistically with wide bands.
"""

import numpy as np
import pandas as pd
import pytest

from datasketches_spark.sketches import (
    ReservoirSampleSketch,
    SketchDeserializeError,
    deserialize_any,
)


def test_exact_mode_keeps_everything():
    sk = ReservoirSampleSketch(k=100)
    sk.update_series(pd.Series(list("abcdefghij")))
    assert sk.is_exact and sk.n == 10 and sk.num_retained == 10
    assert sorted(sk.get_items()) == sorted("abcdefghij")


def test_sample_is_subset_and_sized():
    sk = ReservoirSampleSketch(k=50)
    vals = pd.Series(np.arange(10_000, dtype=np.int64))
    sk.update_series(vals)
    assert sk.n == 10_000 and sk.num_retained == 50 and not sk.is_exact
    assert set(sk.get_items()) <= {str(v) for v in range(10_000)}


def test_merge_equals_sampling_concatenated_stream():
    # distributional test: items from both halves appear ~equally often
    hits_a = 0
    trials = 200
    for t in range(trials):
        a = ReservoirSampleSketch(k=20)
        b = ReservoirSampleSketch(k=20)
        a.update_series(pd.Series(np.arange(0, 1000)))
        b.update_series(pd.Series(np.arange(1000, 2000)))
        a.merge(b)
        assert a.n == 2000 and a.num_retained == 20
        hits_a += sum(1 for it in a.get_items() if int(it) < 1000)
    frac = hits_a / (trials * 20)
    assert 0.45 < frac < 0.55  # ~N(0.5, 0.008): 6 sigma band


def test_merge_exact_mode_unions_all():
    a = ReservoirSampleSketch(k=100)
    b = ReservoirSampleSketch(k=100)
    a.update_series(pd.Series(["x", "y"]))
    b.update_series(pd.Series(["z"]))
    a.merge(b)
    assert sorted(a.get_items()) == ["x", "y", "z"] and a.is_exact


def test_mixed_k_merge_degrades():
    small = ReservoirSampleSketch(k=10)
    small.update_series(pd.Series(np.arange(100)))
    big = ReservoirSampleSketch(k=50)
    big.update_series(pd.Series(np.arange(100, 200)))
    big.merge(small)
    assert big.k == 10 and big.num_retained == 10 and big.n == 200


def test_serialize_roundtrip():
    sk = ReservoirSampleSketch(k=5)
    sk.update_series(pd.Series(["alpha", "beta", "gamma", ""]))
    back = ReservoirSampleSketch.deserialize(sk.serialize())
    assert back.get_items() == sk.get_items()
    assert back.n == 4 and back.k == 5
    assert (back.tags == sk.tags).all()
    assert isinstance(deserialize_any(sk.serialize()), ReservoirSampleSketch)


def test_corrupt_blob_and_validation():
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize"):
        ReservoirSampleSketch.deserialize(b"nope")
    with pytest.raises(ValueError, match="Invalid k"):
        ReservoirSampleSketch(k=0)


def test_numeric_canonicalization_matches_frequent_items():
    sk = ReservoirSampleSketch(k=10)
    sk.update_series(pd.Series([1.0, 2.0], dtype=np.float64))
    # std::to_string float formatting, same as Frequent Items
    assert sorted(sk.get_items()) == ["1.000000", "2.000000"]


# ---------------- Spark surface ---------------------------------------


def test_sql_reservoir_exact_and_merge(spark):
    spark.range(30).selectExpr("id % 3 AS g", "CAST(id AS string) AS v").createOrReplaceTempView(
        "res_in"
    )
    spark.sql(
        "SELECT g, datasketch_reservoir(100, v) AS sk FROM res_in GROUP BY g"
    ).createOrReplaceTempView("res_parts")
    rows = spark.sql(
        "SELECT g, sort_array(datasketch_reservoir_items(sk)) AS items,"
        " datasketch_reservoir_n(sk) AS n,"
        " datasketch_reservoir_is_exact(sk) AS ex FROM res_parts"
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n"] == 10 and r["ex"]
        assert len(r["items"]) == 10
    merged = spark.sql(
        "SELECT datasketch_reservoir_union_agg(100, sk) AS sk FROM res_parts"
    ).collect()[0]["sk"]
    back = ReservoirSampleSketch.deserialize(bytes(merged))
    assert back.n == 30 and sorted(back.get_items()) == sorted(str(i) for i in range(30))


def test_two_phase_reservoir_estimation_mode(spark):
    from datasketches_spark.aggregation import sketch_agg

    df = spark.range(20_000).selectExpr("CAST(id AS string) AS v")
    out = sketch_agg(df, "v", "reservoir", k=64)
    blob = out.collect()[0]["sketch"]
    sk = ReservoirSampleSketch.deserialize(bytes(blob))
    assert sk.n == 20_000 and sk.num_retained == 64
    assert all(0 <= int(i) < 20_000 for i in sk.get_items())


def test_reservoir_io_roundtrip_with_metadata(spark, tmp_path):
    from datasketches_spark import io as dio
    from datasketches_spark.aggregation import sketch_agg

    df = spark.range(40).selectExpr("CAST(id AS string) AS v")
    sk = sketch_agg(df, "v", "reservoir", k=100)
    path = str(tmp_path / "res_tbl")
    dio.write_sketch_table(sk, path, "sketch", "reservoir", k=100)
    back = dio.read_sketch_table(spark, path)
    assert dio.sketch_column_info(back, "sketch")["family"] == "reservoir"
    blob = back.collect()[0]["sketch"]
    got = ReservoirSampleSketch.deserialize(bytes(blob))
    assert sorted(got.get_items()) == sorted(str(i) for i in range(40))


# ---------------- weighted sampling (Efraimidis-Spirakis keys) ---------


def test_weighted_inclusion_proportional():
    # one heavy item (w=50) among 100 light items (w=1): P(include in
    # k=10 sample) for heavy is ~1; each light ~<10/100
    heavy_hits = 0
    trials = 200
    for _ in range(trials):
        sk = ReservoirSampleSketch(k=10)
        vals = pd.Series(["heavy"] + [f"light_{i}" for i in range(100)])
        w = pd.Series([50.0] + [1.0] * 100)
        sk.update_series(vals, weights=w)
        if "heavy" in sk.get_items():
            heavy_hits += 1
    assert heavy_hits > trials * 0.9  # heavy weight dominates


def test_weighted_exact_mode_keeps_all_and_drops_nonpositive():
    sk = ReservoirSampleSketch(k=100)
    vals = pd.Series(["a", "b", "c", "d"])
    w = pd.Series([1.0, 0.0, -3.0, 2.0])  # zero/negative weights dropped
    sk.update_series(vals, weights=w)
    assert sorted(sk.get_items()) == ["a", "d"] and sk.n == 2


def test_weighted_and_uniform_blobs_merge():
    a = ReservoirSampleSketch(k=100)
    a.update_series(pd.Series(["u1", "u2"]))
    b = ReservoirSampleSketch(k=100)
    b.update_series(pd.Series(["w1"]), weights=pd.Series([9.0]))
    a.merge(ReservoirSampleSketch.deserialize(b.serialize()))
    assert sorted(a.get_items()) == ["u1", "u2", "w1"] and a.n == 3


def test_sql_weighted_aggregate(spark):
    spark.range(50).selectExpr(
        "CAST(id AS string) AS v", "CAST(1 + id % 3 AS double) AS w"
    ).createOrReplaceTempView("wres_in")
    row = spark.sql(
        "SELECT datasketch_reservoir_n(datasketch_reservoir_weighted(100, v, w)) AS n,"
        " datasketch_reservoir_is_exact(datasketch_reservoir_weighted(100, v, w)) AS ex"
        " FROM wres_in"
    ).collect()[0]
    assert row["n"] == 50 and row["ex"]


def test_two_phase_weighted_reservoir(spark):
    """weight_col on sketch_agg (round 11): the weighted family on the
    blob-only shuffle plan.  Exact mode: every (item, weight) pair
    survives the partial->merge crossing; estimation mode: the merged
    state retains the k+1 threshold triple and the total-weight
    estimate lands near the true total."""
    from datasketches_spark.aggregation import sketch_agg
    from datasketches_spark.sketches.reservoir import ReservoirSampleSketch

    # exact mode, multi-partition: the sample IS the input
    df = spark.range(0, 40, 1, 8).selectExpr(
        "id % 4 AS g", "id AS v", "CAST(id + 1 AS DOUBLE) AS w"
    )
    out = sketch_agg(df, "v", "reservoir", group_cols=["g"], k=50, weight_col="w")
    rows = {r.g: ReservoirSampleSketch.deserialize(bytes(r.sketch)) for r in out.collect()}
    for g, sk in rows.items():
        want = {(str(i), float(i + 1)) for i in range(40) if i % 4 == g}
        got = set(zip(sk.get_items(), sk.get_sample_weights().tolist()))
        assert got == want and sk.weighted and sk.n == 10

    # estimation mode: threshold survives the two-phase merge
    big = spark.range(0, 5000, 1, 8).selectExpr(
        "id AS v", "CAST(1 + id % 7 AS DOUBLE) AS w"
    )
    sk = ReservoirSampleSketch.deserialize(
        bytes(sketch_agg(big, "v", "reservoir", k=64, weight_col="w").first().sketch)
    )
    assert sk.n == 5000 and len(sk.items) == 65 and sk.threshold_tag is not None
    true_total = sum(1 + i % 7 for i in range(5000))
    assert abs(sk.total_weight_estimate() / true_total - 1.0) < 0.5

    # weight_col is reservoir-only
    with pytest.raises(ValueError, match="reservoir"):
        sketch_agg(df, "v", "theta", k=12, weight_col="w")
