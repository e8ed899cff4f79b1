"""BinomialBoundsN differential tests vs live datasketches-java.

The java class is public static, so every branch of the ported
algorithm (sketches/binomial_bounds.py) is driven directly against
the jar bundled in pyspark — exact double equality expected (the
arithmetic is identical operation-for-operation)."""

import math

import numpy as np
import pytest

from datasketches_spark.sketches.binomial_bounds import lower_bound, upper_bound


@pytest.fixture(scope="module")
def jbb(spark):
    return spark._jvm.org.apache.datasketches.thetacommon.BinomialBoundsN


def _matrix():
    # hit every branch: n in {0,1} geometric tails; n<=120 with
    # theta >= n/360 (exact tail summation), theta < n/360 (equiv
    # tables), theta > 0.99999; n > 120 contClassic; theta == 1.0
    rng = np.random.default_rng(12)
    cases = []
    for n in (0, 1, 2, 5, 17, 60, 119, 120, 121, 300, 5000, 1 << 20):
        for theta in (
            1.0, 0.999995, 0.75, 0.5, 0.2, 0.05, 1e-3, 1e-6,
            (n / 360.0) * 0.999 if n else 0.01,  # just under the table cut
            min(1.0, (n / 360.0) * 1.001) if n else 0.02,  # just over
        ):
            if not (0.0 < theta <= 1.0):
                continue
            cases.append((n, float(theta)))
    for _ in range(150):
        cases.append(
            (int(rng.integers(0, 3000)), float(rng.uniform(1e-7, 1.0)))
        )
    return cases


def test_matches_java_exactly(jbb):
    for n, theta in _matrix():
        for sdev in (1, 2, 3):
            jl = jbb.getLowerBound(n, theta, sdev, False)
            ju = jbb.getUpperBound(n, theta, sdev, False)
            pl = lower_bound(n, theta, sdev)
            pu = upper_bound(n, theta, sdev)
            assert pl == jl and pu == ju, (n, theta, sdev, pl, jl, pu, ju)


def test_no_data_seen_and_arg_checks(jbb):
    assert lower_bound(5, 0.5, 2, no_data_seen=True) == 0.0
    assert upper_bound(5, 0.5, 2, no_data_seen=True) == 0.0
    assert jbb.getLowerBound(5, 0.5, 2, True) == 0.0
    with pytest.raises(ValueError, match="numSDev must only be"):
        lower_bound(5, 0.5, 4)
    with pytest.raises(ValueError, match="theta"):
        upper_bound(5, 1.5, 2)


def test_bound_sanity():
    # lb <= est <= ub and bounds widen with sdev
    for n, theta in ((100, 0.01), (4096, 0.05), (7, 0.9)):
        est = n / theta
        lbs = [lower_bound(n, theta, s) for s in (1, 2, 3)]
        ubs = [upper_bound(n, theta, s) for s in (1, 2, 3)]
        assert lbs[2] <= lbs[1] <= lbs[0] <= est <= ubs[0] <= ubs[1] <= ubs[2]
        assert all(math.isfinite(x) for x in lbs + ubs)


def test_theta_sketch_bounds_match_java_estimation_mode(spark, jbb):
    """End-to-end: an estimation-mode theta sketch's get_bound equals
    java CompactSketch.getLower/UpperBound on the SAME wire blob."""
    import pandas as pd

    from datasketches_spark.sketches.theta import ThetaSketch

    jvm = spark.sparkContext._jvm
    sk = ThetaSketch(lg_k=6)
    sk.update_values(pd.Series(range(5000)))
    assert sk.num_retained and sk.is_estimation_mode  # consolidates first
    mem = jvm.org.apache.datasketches.memory.Memory.wrap(sk.to_wire())
    jsk = jvm.org.apache.datasketches.theta.Sketches.wrapSketch(mem)
    assert abs(jsk.getEstimate() - sk.get_estimate()) < 1e-9
    for sdev in (1, 2, 3):
        assert sk.get_bound(sdev, upper=False) == jsk.getLowerBound(sdev)
        assert sk.get_bound(sdev, upper=True) == jsk.getUpperBound(sdev)


def test_fdt_group_bounds_match_java_subset_bounds(spark):
    """get_result per-group bounds == java tuple.Sketch
    getLower/UpperBound(numStdDev, count) on the same heapified state."""
    import numpy as np
    import pandas as pd

    from datasketches_spark.sketches.fdt import FdtSketch

    jvm = spark.sparkContext._jvm
    sk = FdtSketch(5)
    rows = [np.array([f"g{i%4}", str(i)], dtype=object) for i in range(4000)]
    sk.update_series(pd.Series(rows))
    assert sk.num_retained and sk.is_estimation_mode  # consolidates first
    deser = (
        jvm.org.apache.datasketches.tuple.strings.ArrayOfStringsSummaryDeserializer()
    )
    mem = jvm.org.apache.datasketches.memory.Memory.wrap(sk.to_wire())
    jsk = jvm.org.apache.datasketches.tuple.Sketches.heapifySketch(mem, deser)
    assert jsk.getRetainedEntries() == sk.num_retained
    for sdev in (1, 2, 3):
        for grp in sk.get_result([0], num_std_dev=sdev):
            cnt = grp["count"]
            assert grp["lower_bound"] == jsk.getLowerBound(sdev, cnt)
            assert grp["upper_bound"] == jsk.getUpperBound(sdev, cnt)


def test_jaccard_bounds_match_java(spark, jbb):
    """jaccard_bounds == java JaccardSimilarity.jaccard on identical
    wire states — exact doubles, across exact/estimation/overlap
    regimes and the early-out paths."""
    import pandas as pd

    from datasketches_spark.sketches.theta import ThetaSketch, jaccard_bounds

    jvm = spark.sparkContext._jvm
    jc = jvm.org.apache.datasketches.theta.JaccardSimilarity

    def jsk(sk):
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(sk.to_wire())
        return jvm.org.apache.datasketches.theta.Sketches.wrapSketch(mem)

    cases = [
        (range(0), range(0)),            # both empty -> ONES
        (range(100), range(0)),          # one empty -> ZEROS
        (range(100), range(100)),        # identical exact -> ONES
        (range(100), range(50, 150)),    # exact overlap
        (range(5000), range(2500, 7500)),    # estimation overlap
        (range(5000), range(5000)),          # identical estimation
        (range(5000), range(4990, 5010)),    # est vs tiny exact
    ]
    for lg_a, lg_b in ((6, 6), (6, 10)):
        for va, vb in cases:
            a = ThetaSketch(lg_a)
            a.update_values(pd.Series(list(va), dtype="int64"))
            b = ThetaSketch(lg_b)
            b.update_values(pd.Series(list(vb), dtype="int64"))
            ours = jaccard_bounds(a, b)
            theirs = [float(x) for x in jc.jaccard(jsk(a), jsk(b))]
            assert list(ours) == theirs, (lg_a, lg_b, len(list(va)), ours, theirs)


def test_jaccard_bounds_sql(spark):
    import datasketches_spark as dss

    dss.register(spark)
    row = spark.sql(
        """
        WITH t AS (
          SELECT datasketch_theta(id) AS a FROM range(0, 300)
        ), u AS (
          SELECT datasketch_theta(id) AS b FROM range(150, 450)
        )
        SELECT datasketch_theta_jaccard_bounds(a, b) AS jb,
               datasketch_theta_jaccard(a, b) AS j
        FROM t CROSS JOIN u
        """
    ).first()
    lb, est, ub = row.jb
    assert lb <= est <= ub
    assert est == row.j == 150 / 450  # exact mode: exact jaccard


def test_binomial_proportions_match_java(spark):
    """approximate{Lower,Upper}BoundOnP and estimateUnknownP == java
    BoundsOnBinomialProportions (exact doubles) over all edge branches
    (k in {0, 1, n-1, n}) and the AS 26.5.22 general case."""
    from datasketches_spark.sketches.binomial_bounds import (
        approximate_lower_bound_on_p,
        approximate_upper_bound_on_p,
        estimate_unknown_p,
    )

    jbp = spark._jvm.org.apache.datasketches.common.BoundsOnBinomialProportions
    rng = np.random.default_rng(99)
    cases = [(0, 0), (1, 0), (1, 1), (2, 1), (10, 0), (10, 1), (10, 9),
             (10, 10), (500, 250), (500, 499), (100000, 137)]
    cases += [
        (int(n), int(rng.integers(0, n + 1)))
        for n in rng.integers(1, 100000, 60)
    ]
    for n, k in cases:
        for sdev in (0.5, 1.0, 1.98881, 2.0, 3.0):
            assert approximate_lower_bound_on_p(n, k, sdev) == (
                jbp.approximateLowerBoundOnP(n, k, sdev)
            ), (n, k, sdev, "lb")
            assert approximate_upper_bound_on_p(n, k, sdev) == (
                jbp.approximateUpperBoundOnP(n, k, sdev)
            ), (n, k, sdev, "ub")
        assert estimate_unknown_p(n, k) == jbp.estimateUnknownP(n, k)


def test_jaccard_class_surface_matches_java(spark):
    """exactlyEqual / similarityTest / dissimilarityTest == java
    JaccardSimilarity across the same state matrix."""
    import pandas as pd

    from datasketches_spark.sketches.theta import (
        ThetaSketch,
        theta_dissimilarity_test,
        theta_exactly_equal,
        theta_similarity_test,
    )

    jvm = spark.sparkContext._jvm
    jc = jvm.org.apache.datasketches.theta.JaccardSimilarity

    def jsk(sk):
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(sk.to_wire())
        return jvm.org.apache.datasketches.theta.Sketches.wrapSketch(mem)

    cases = [
        (range(0), range(0)),
        (range(100), range(0)),
        (range(100), range(100)),
        (range(100), range(50, 150)),
        (range(5000), range(2500, 7500)),
        (range(5000), range(5000)),
    ]
    for va, vb in cases:
        a = ThetaSketch(6)
        a.update_values(pd.Series(list(va), dtype="int64"))
        b = ThetaSketch(6)
        b.update_values(pd.Series(list(vb), dtype="int64"))
        ja, jb_ = jsk(a), jsk(b)
        assert theta_exactly_equal(a, b) == jc.exactlyEqual(ja, jb_)
        for thr in (0.1, 0.5, 0.9):
            assert theta_similarity_test(a, b, thr) == jc.similarityTest(
                ja, jb_, thr
            ), ("sim", len(list(va)), len(list(vb)), thr)
            assert theta_dissimilarity_test(a, b, thr) == jc.dissimilarityTest(
                ja, jb_, thr
            ), ("dis", len(list(va)), len(list(vb)), thr)


def test_jaccard_class_surface_sql(spark):
    import datasketches_spark as dss

    dss.register(spark)
    row = spark.sql(
        """
        WITH t AS (SELECT datasketch_theta(id) AS a FROM range(0, 300)),
             u AS (SELECT datasketch_theta(id) AS b FROM range(0, 300)),
             v AS (SELECT datasketch_theta(id) AS c FROM range(500, 800))
        SELECT datasketch_theta_exactly_equal(a, b) AS eq,
               datasketch_theta_exactly_equal(a, c) AS ne,
               datasketch_theta_similarity_test(a, b, 0.99) AS sim,
               datasketch_theta_dissimilarity_test(a, c, 0.01) AS dis
        FROM t CROSS JOIN u CROSS JOIN v
        """
    ).first()
    assert row.eq and not row.ne and row.sim and row.dis
