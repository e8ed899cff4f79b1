"""Table profiler: exact stats + sketch estimates in two scans."""

import pytest
from pyspark.sql import Row

from datasketches_spark.profile import profile_table


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        Row(i=i, x=float(i) if i % 5 else None, s=f"s{i % 3}" if i % 7 else None)
        for i in range(100)
    ]
    return spark.createDataFrame(rows)


def _by_col(prof):
    return {r["column"]: r.asDict() for r in prof.collect()}


def test_exact_counts_and_nulls(df):
    p = _by_col(profile_table(df, ["i", "x", "s"]))
    assert p["i"]["n_rows"] == 100 and p["i"]["n_null"] == 0
    assert p["x"]["n_null"] == 20  # every 5th x is NULL
    assert p["s"]["n_null"] == 15  # every 7th s is NULL (0,7,...,98)
    assert p["s"]["n_nonnull"] == 85


def test_distinct_exact_mode(df):
    p = _by_col(profile_table(df, ["i", "s"], lg_k=12))
    assert p["i"]["distinct_est"] == 100.0
    assert p["s"]["distinct_est"] == 3.0


def test_numeric_minmax_and_quantiles(df):
    p = _by_col(profile_table(df, ["i"], kll_k=1024))
    assert p["i"]["min_num"] == 0.0 and p["i"]["max_num"] == 99.0
    # inclusive exact-mode quantile: smallest v with cume_dist >= p
    assert p["i"]["q_50"] == 49.0
    assert p["i"]["min_str"] is None and p["i"]["max_str"] is None


def test_string_columns_get_string_minmax(df):
    p = _by_col(profile_table(df, ["s"]))
    assert p["s"]["min_str"] == "s0" and p["s"]["max_str"] == "s2"
    assert p["s"]["min_num"] is None and p["s"]["q_50"] is None


def test_default_columns_and_validation(df, spark):
    prof = profile_table(df)  # all three columns are profilable
    assert {r["column"] for r in prof.collect()} == {"i", "x", "s"}
    with pytest.raises(ValueError, match="no such column"):
        profile_table(df, ["nope"])
    bin_df = spark.createDataFrame([Row(b=bytearray(b"x"))])
    with pytest.raises(ValueError, match="unsupported type"):
        profile_table(bin_df, ["b"])


def test_all_null_numeric_column(spark):
    """All-NULL numeric column: empty KLL -> NULL quantiles, not a
    TypeError inside the fused finalize (code-review regression)."""
    rows = [Row(i=i, dead=None) for i in range(20)]
    df = spark.createDataFrame(
        rows, "i long, dead double"
    )
    prof = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    assert prof["dead"]["n_nonnull"] == 0
    assert prof["dead"]["q_50"] is None
    assert prof["i"]["q_50"] is not None


def test_profile_all_null_column(spark):
    """An all-NULL column must profile as n/nonnull/null counts with
    NULL min/max/quantiles -- not crash the stats/KLL finalize."""
    df = spark.createDataFrame([(1, None), (2, None)], "a bigint, b double")
    rows = {r["column"]: r for r in profile_table(df).collect()}
    b = rows["b"]
    assert (b["n_rows"], b["n_nonnull"], b["n_null"]) == (2, 0, 2)
    assert b["distinct_est"] == 0.0
    assert b["min_num"] is None and b["q_50"] is None


def test_drift_report_exact_ks_and_validation(spark):
    from datasketches_spark.profile import drift_report
    from pyspark.sql import functions as F
    import pytest as _pt

    a = spark.range(1000).selectExpr("CAST(id % 100 AS double) AS x")
    b = spark.range(1000).selectExpr("CAST(id % 100 + 50 AS double) AS x")
    row = drift_report(a, b, ["x"], k=4096).first()
    # shifted uniform by half the support: classical KS = 0.5 exactly
    assert row.n_a == 1000 and row.n_b == 1000
    assert abs(row.ks - 0.5) < 1e-12
    assert abs(row.mean_b - row.mean_a - 50.0) < 1e-9
    same = drift_report(a, a, ["x"], k=4096).first()
    assert same.ks == 0.0
    with _pt.raises(ValueError, match="not numeric"):
        drift_report(
            a.selectExpr("CAST(x AS STRING) AS x"), b, ["x"]
        )
    with _pt.raises(ValueError, match="no such column"):
        drift_report(a, b, ["nope"])


def test_approx_drift_report_facade(spark):
    from datasketches_spark import approx

    a = spark.range(200).selectExpr("CAST(id AS double) AS x")
    b = spark.range(200).selectExpr("CAST(id + 100 AS double) AS x")
    row = approx.drift_report(a, b, ["x"], k=1024).first()
    assert row.column == "x" and abs(row.ks - 0.5) < 1e-12
