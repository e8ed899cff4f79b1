"""Funnel analysis and theta-based cohort retention."""

import pytest
from pyspark.sql import Row

from datasketches_spark.pipeline.cohorts import (
    activity_sketches,
    retention_from_sketches,
    retention_matrix,
)
from datasketches_spark.pipeline.funnel import funnel_conversion, funnel_counts

STEPS = ["view", "click", "buy"]


def _ev(u, t, s):
    return Row(user=u, ts=t, step=s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 completes the funnel in order
        _ev(1, 10, "view"), _ev(1, 20, "click"), _ev(1, 30, "buy"),
        # u2: click BEFORE view -> only counts view (no click after its view)
        _ev(2, 10, "click"), _ev(2, 20, "view"),
        # u3: click at the SAME ts as view -> strict > excludes the click
        _ev(3, 10, "view"), _ev(3, 10, "click"),
        # u4: view then click, no buy
        _ev(4, 5, "view"), _ev(4, 6, "click"),
        # u5: never views
        _ev(5, 1, "click"), _ev(5, 2, "buy"),
        # u6: two views; click lands between them (after the FIRST view)
        _ev(6, 10, "view"), _ev(6, 15, "click"), _ev(6, 20, "view"),
    ]
    return spark.createDataFrame(rows)


def test_funnel_counts_semantics(events):
    got = {
        r["step"]: r["users"]
        for r in funnel_counts(events, "user", "ts", "step", STEPS).collect()
    }
    # view: u1,u2,u3,u4,u6 (u5 never views)
    assert got["view"] == 5
    # click strictly after first view: u1,u4,u6 (u2 pre-view, u3 same-ts)
    assert got["click"] == 3
    # buy strictly after the click: u1 only
    assert got["buy"] == 1


def test_funnel_conversion_ratios(events):
    rows = {
        r["step"]: r
        for r in funnel_conversion(events, "user", "ts", "step", STEPS).collect()
    }
    assert rows["view"]["conversion_from_entry"] == 1.0
    assert rows["view"]["conversion_from_prev"] is None
    assert rows["click"]["conversion_from_entry"] == pytest.approx(3 / 5)
    assert rows["buy"]["conversion_from_prev"] == pytest.approx(1 / 3)


def test_funnel_empty_and_validation(events, spark):
    with pytest.raises(ValueError, match="non-empty"):
        funnel_counts(events, "user", "ts", "step", [])
    none = events.filter("user < 0")
    got = funnel_counts(none, "user", "ts", "step", STEPS).collect()
    assert [r["users"] for r in got] == [0, 0, 0]


@pytest.fixture(scope="module")
def activity(spark):
    # period 0: users 1..10; period 1: 1..5; period 2: 4,5,6 only
    rows = (
        [Row(user=u, period=0) for u in range(1, 11)]
        + [Row(user=u, period=1) for u in range(1, 6)]
        + [Row(user=u, period=2) for u in (4, 5, 6)]
    )
    return spark.createDataFrame(rows)


def test_retention_matrix_exact(activity):
    got = {
        (r["cohort_period"], r["period"]): r
        for r in retention_matrix(activity, "user", "period", lg_k=12).collect()
    }
    assert len(got) == 6  # pairs with period >= cohort_period
    assert got[(0, 0)]["retained_est"] == 10
    assert got[(0, 1)]["retained_est"] == 5
    assert got[(0, 2)]["retained_est"] == 3  # users 4,5,6
    assert got[(0, 2)]["cohort_size_est"] == 10
    assert got[(0, 2)]["retention_rate"] == pytest.approx(0.3)
    assert got[(1, 2)]["retained_est"] == 2
    assert got[(2, 2)]["retention_rate"] == pytest.approx(1.0)


def test_retention_single_cohort_from_stored(activity):
    sk = activity_sketches(activity, "user", "period", lg_k=12)
    got = retention_from_sketches(sk, "period", cohort_period=1).collect()
    assert sorted(r["period"] for r in got) == [1, 2]
    by_p = {r["period"]: r for r in got}
    assert by_p[1]["retained_est"] == 5 and by_p[2]["retained_est"] == 2
