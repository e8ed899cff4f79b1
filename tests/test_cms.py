"""Count-Min sketch family (beyond-reference; sketches/cms.py)."""

import numpy as np
import pandas as pd
import pytest

from datasketches_spark.sketches import (
    CountMinSketch,
    SketchDeserializeError,
    deserialize_any,
)


def test_never_undercounts_and_exact_when_sparse():
    sk = CountMinSketch(lg_w=12, depth=5)
    s = pd.Series(["a"] * 10 + ["b"] * 3 + ["c"])
    sk.update_series(s)
    assert sk.get_estimate("a") >= 10 and sk.get_estimate("b") >= 3
    # 3 distinct items in 4096 buckets: no collisions -> exact
    assert sk.get_estimate("a") == 10
    assert sk.get_estimate("absent") == 0
    assert sk.total_weight() == 14


def test_error_bound_holds():
    rng = np.random.RandomState(0)
    sk = CountMinSketch(lg_w=10, depth=5)  # eps = 2/1024
    items = pd.Series(rng.randint(0, 5000, 20_000).astype(np.int64))
    sk.update_series(items)
    true = items.astype(str).value_counts()
    bound = sk.epsilon * sk.total_weight()
    for it in true.index[:200]:
        est = sk.get_estimate(it)
        assert true[it] <= est <= true[it] + 3 * bound


def test_merge_adds_counts():
    a, b = CountMinSketch(lg_w=12), CountMinSketch(lg_w=12)
    a.update_series(pd.Series(["x", "x", "y"]))
    b.update_series(pd.Series(["x", "z"]))
    a.merge(b)
    assert a.get_estimate("x") == 3 and a.total_weight() == 5
    empty = CountMinSketch(lg_w=8, depth=3)
    empty.merge(a)  # empty adopts shape
    assert empty.get_estimate("x") == 3
    c = CountMinSketch(lg_w=8)
    c.update_series(pd.Series(["q"]))
    with pytest.raises(ValueError, match="identical shape"):
        c.merge(a)


def test_estimate_series_vectorized():
    sk = CountMinSketch(lg_w=12)
    sk.update_series(pd.Series(["a", "a", "b"]))
    got = sk.estimate_series(pd.Series(["a", "b", "zz"]))
    assert got.tolist() == [2, 1, 0]


def test_roundtrip_and_errors():
    sk = CountMinSketch(lg_w=8, depth=3)
    sk.update_series(pd.Series([1, 2, 2], dtype=np.int64))
    back = CountMinSketch.deserialize(sk.serialize())
    assert (back.counts == sk.counts).all() and back.total_weight() == 3
    assert isinstance(deserialize_any(sk.serialize()), CountMinSketch)
    with pytest.raises(SketchDeserializeError, match="Failed to deserialize"):
        CountMinSketch.deserialize(b"junk")
    with pytest.raises(ValueError, match="Invalid lg_w"):
        CountMinSketch(lg_w=2)


def test_sql_surface(spark):
    spark.range(300).selectExpr("CAST(id % 3 AS string) AS v").createOrReplaceTempView(
        "cms_in"
    )
    spark.sql(
        "SELECT datasketch_cms(12, v) AS sk FROM cms_in"
    ).createOrReplaceTempView("cms_sk")
    row = spark.sql(
        "SELECT datasketch_cms_estimate(sk, '0') AS e0,"
        " datasketch_cms_total_weight(sk) AS tw,"
        " datasketch_cms_width(sk) AS w,"
        " datasketch_cms_depth(sk) AS d,"
        " datasketch_cms_is_empty(sk) AS em,"
        " datasketch_cms_describe(sk) AS ds FROM cms_sk"
    ).collect()[0]
    assert row["e0"] == 100 and row["tw"] == 300
    assert row["w"] == 4096 and row["d"] == 5 and not row["em"]
    assert "Count-Min sketch summary" in row["ds"]
    merged = spark.sql(
        "SELECT datasketch_cms_estimate(datasketch_cms_union_agg(12, sk), '1') AS e"
        " FROM (SELECT sk FROM cms_sk UNION ALL SELECT sk FROM cms_sk)"
    ).collect()[0]["e"]
    assert merged == 200  # two copies merged -> double counts
