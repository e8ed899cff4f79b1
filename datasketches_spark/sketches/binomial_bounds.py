"""Apache BinomialBoundsN — the real theta-family confidence bounds.

Re-implements org.apache.datasketches.thetacommon.BinomialBoundsN
(algorithm recovered from the datasketches-java 6.2.0 bytecode; the
reference's C++ library uses the same math, so these ARE the bounds
the reference's `datasketch_theta_lower_bound`/`upper_bound` return).
The estimator model: each retained hash is a Bernoulli(theta) success
over the n distinct inputs; the bound on n given numSamples successes
is a binomial tail inversion, approximated by

- the Wilson-style "contClassic" continuity-corrected closed form for
  numSamples > 120,
- the same closed form with an *equivalent numSDev* from the
  committed EquivTables (`_bino_tables.py`, extracted from the jar by
  scripts/gen_bino_tables.py) when numSamples <= 120 and
  theta < numSamples/360,
- exact tail summation (specialNStar / specialNPrimeF) otherwise
  (small numSamples with large theta), and
- closed-form geometric tails for numSamples in {0, 1}.

Differentially tested against live datasketches-java over the full
branch matrix in tests/test_binomial_bounds.py.
"""

from __future__ import annotations

import math

from ._bino_tables import LB_EQUIV, UB_EQUIV

# P(Z > k) for k = 0..3 standard deviations (one-sided gaussian tail)
_DELTA_OF_NUM_SDEV = (
    0.5,
    0.15865531915860265,
    0.02275026189041357,
    0.0013498126861731796,
)


def _check_args(num_samples: int, theta: float, num_sdev: int) -> None:
    if num_sdev not in (1, 2, 3) or num_samples < 0:
        raise ValueError(
            "numSDev must only be 1,2, or 3 and numSamples must >= 0: "
            f"numSDev={num_sdev}, numSamples={num_samples}"
        )
    if not (0.0 < theta <= 1.0):
        raise ValueError(f"0.0 < theta <= 1.0: {theta}")


def _cont_classic_lb(num_samples_f: float, theta: float, num_sdev: float) -> float:
    n_hat = (num_samples_f - 0.5) / theta
    b = num_sdev * math.sqrt((1.0 - theta) / theta)
    d = 0.5 * b * math.sqrt(b * b + 4.0 * n_hat)
    center = n_hat + 0.5 * b * b
    return center - d


def _cont_classic_ub(num_samples_f: float, theta: float, num_sdev: float) -> float:
    n_hat = (num_samples_f + 0.5) / theta
    b = num_sdev * math.sqrt((1.0 - theta) / theta)
    d = 0.5 * b * math.sqrt(b * b + 4.0 * n_hat)
    center = n_hat + 0.5 * b * b
    return center + d


def _special_n_star(num_samples: int, p: float, delta: float) -> int:
    # smallest m with P[Binomial(m, p) >= num_samples] > delta, found by
    # summing the negative-binomial tail term-by-term
    q = 1.0 - p
    cur = tot = math.pow(p, float(num_samples))
    m = num_samples
    while tot <= delta:
        cur = (cur * q * m) / (m + 1 - num_samples)
        tot += cur
        m += 1
    return m - 1


def _special_n_prime_b(num_samples: int, p: float, delta: float) -> int:
    q = 1.0 - p
    one_minus_delta = 1.0 - delta
    cur = tot = math.pow(p, float(num_samples))
    m = num_samples
    while tot < one_minus_delta:
        cur = (cur * q * m) / (m + 1 - num_samples)
        tot += cur
        m += 1
    return m


def _special_n_prime_f(num_samples: int, p: float, delta: float) -> int:
    return _special_n_prime_b(num_samples + 1, p, delta)


def _approx_bino_lb(num_samples: int, theta: float, num_sdev: int) -> float:
    if theta == 1.0:
        return float(num_samples)
    if num_samples == 0:
        return 0.0
    if num_samples == 1:
        delta = _DELTA_OF_NUM_SDEV[num_sdev]
        return math.floor(math.log(1.0 - delta) / math.log(1.0 - theta))
    if num_samples > 120:
        return _cont_classic_lb(float(num_samples), theta, float(num_sdev)) - 0.5
    if theta > 0.99999:
        return float(num_samples)
    if theta < num_samples / 360.0:
        idx = 3 * num_samples + (num_sdev - 1)
        equiv = LB_EQUIV[idx]
        return _cont_classic_lb(float(num_samples), theta, equiv) - 0.5
    delta = _DELTA_OF_NUM_SDEV[num_sdev]
    return float(_special_n_star(num_samples, theta, delta))


def _approx_bino_ub(num_samples: int, theta: float, num_sdev: int) -> float:
    if theta == 1.0:
        return float(num_samples)
    if num_samples == 0:
        delta = _DELTA_OF_NUM_SDEV[num_sdev]
        return math.ceil(math.log(delta) / math.log(1.0 - theta))
    if num_samples > 120:
        return _cont_classic_ub(float(num_samples), theta, float(num_sdev)) + 0.5
    if theta > 0.99999:
        return float(num_samples + 1)
    if theta < num_samples / 360.0:
        idx = 3 * num_samples + (num_sdev - 1)
        equiv = UB_EQUIV[idx]
        return _cont_classic_ub(float(num_samples), theta, equiv) + 0.5
    delta = _DELTA_OF_NUM_SDEV[num_sdev]
    return float(_special_n_prime_f(num_samples, theta, delta))


def lower_bound(
    num_samples: int, theta: float, num_sdev: int, no_data_seen: bool = False
) -> float:
    """java BinomialBoundsN.getLowerBound — bound on the true distinct
    count given ``num_samples`` retained at sampling rate ``theta``."""
    if no_data_seen:
        return 0.0
    _check_args(num_samples, theta, num_sdev)
    lb = _approx_bino_lb(num_samples, theta, num_sdev)
    num_samples_f = float(num_samples)
    est = num_samples_f / theta
    return min(est, max(num_samples_f, lb))


def upper_bound(
    num_samples: int, theta: float, num_sdev: int, no_data_seen: bool = False
) -> float:
    """java BinomialBoundsN.getUpperBound."""
    if no_data_seen:
        return 0.0
    _check_args(num_samples, theta, num_sdev)
    ub = _approx_bino_ub(num_samples, theta, num_sdev)
    est = float(num_samples) / theta
    return max(est, ub)


# ---- BoundsOnBinomialProportions (org.apache.datasketches.common) ----
# The Bayesian binomial-proportion bounds the theta-family RATIO
# estimators use (B-over-A: jaccard, intersections over unions).
# Algorithm recovered from the 6.2.0 bytecode: Abramowitz & Stegun
# 26.5.22 for the general case, exact geometric tails at the k edges,
# and the A&S 7.1.27-style erf the delta conversion runs through.


def _erf_of_nonneg(x: float) -> float:
    c1, c3, c5 = 0.0705230784, 0.0092705272, 2.765672e-4
    c2, c4, c6 = 0.0422820123, 1.520143e-4, 4.30638e-5
    xx = x * x
    x3 = xx * x
    x4 = xx * xx
    x5 = xx * x3
    x6 = x3 * x3
    s = 1.0 + c1 * x + c2 * xx + c3 * x3 + c4 * x4 + c5 * x5 + c6 * x6
    s2 = s * s
    s4 = s2 * s2
    s8 = s4 * s4
    s16 = s8 * s8
    return 1.0 - 1.0 / s16


def erf(x: float) -> float:
    return -1.0 * _erf_of_nonneg(-x) if x < 0.0 else _erf_of_nonneg(x)


def normal_cdf(x: float) -> float:
    return 0.5 * (1.0 + erf(x / math.sqrt(2.0)))


def _delta_of_num_stdevs(kappa: float) -> float:
    return normal_cdf(-kappa)


def _as26522(a: float, b: float, sdev: float) -> float:
    b2m1 = 2.0 * b - 1.0
    a2m1 = 2.0 * a - 1.0
    big_d = (sdev * sdev - 3.0) / 6.0
    one_over_n = 1.0 / a2m1 + 1.0 / b2m1
    h = 2.0 / one_over_n
    w = sdev * math.sqrt(h + big_d) / h
    lam = 1.0 / b2m1 - 1.0 / a2m1
    # 0.8333333333333334 is java's 5.0/6.0 literal
    term = big_d + 0.8333333333333334 - 2.0 / (3.0 * h)
    arg = w - lam * term
    return a / (a + b * math.exp(2.0 * arg))


def _check_np(n: int, k: int) -> None:
    if n < 0:
        raise ValueError("N must be non-negative")
    if k < 0:
        raise ValueError("K must be non-negative")
    if k > n:
        raise ValueError("K cannot exceed N")


def approximate_lower_bound_on_p(n: int, k: int, num_stdevs: float) -> float:
    """java BoundsOnBinomialProportions.approximateLowerBoundOnP."""
    _check_np(n, k)
    if n == 0 or k == 0:
        return 0.0
    if k == 1:
        delta = _delta_of_num_stdevs(num_stdevs)
        return 1.0 - math.pow(1.0 - delta, 1.0 / n)
    if k == n:
        delta = _delta_of_num_stdevs(num_stdevs)
        return math.pow(delta, 1.0 / n)
    x = _as26522(float(n - k + 1), float(k), -1.0 * num_stdevs)
    return 1.0 - x


def approximate_upper_bound_on_p(n: int, k: int, num_stdevs: float) -> float:
    """java BoundsOnBinomialProportions.approximateUpperBoundOnP."""
    _check_np(n, k)
    if n == 0 or k == n:
        return 1.0
    if k == n - 1:
        delta = _delta_of_num_stdevs(num_stdevs)
        return math.pow(1.0 - delta, 1.0 / n)
    if k == 0:
        delta = _delta_of_num_stdevs(num_stdevs)
        return 1.0 - math.pow(delta, 1.0 / n)
    x = _as26522(float(n - k), float(k + 1), num_stdevs)
    return 1.0 - x


def estimate_unknown_p(n: int, k: int) -> float:
    _check_np(n, k)
    return 0.5 if n == 0 else k / n


# ---- BoundsOnRatiosInSampledSets (fixed 2 standard deviations) ----


def _hacky_adjuster(f: float) -> float:
    tmp = math.sqrt(1.0 - f)
    return tmp if f <= 0.5 else tmp + 0.01 * (f - 0.5)


def _check_ratio_inputs(a: int, b: int) -> None:
    if b > a or a < 0 or b < 0:
        raise ValueError(
            f"a must be >= b and neither a nor b can be < 0: a = {a}, b = {b}"
        )


def ratio_lower_bound(a: int, b: int, f: float) -> float:
    """java BoundsOnRatiosInSampledSets.getLowerBoundForBoverA —
    ``a`` items seen at inclusion probability ``f``, ``b`` of them in
    the subset; bound on the true |B|/|A|."""
    _check_ratio_inputs(a, b)
    if a == 0:
        return 0.0
    if f == 1.0:
        return b / a
    return approximate_lower_bound_on_p(a, b, 2.0 * _hacky_adjuster(f))


def ratio_upper_bound(a: int, b: int, f: float) -> float:
    """java BoundsOnRatiosInSampledSets.getUpperBoundForBoverA."""
    _check_ratio_inputs(a, b)
    if a == 0:
        return 1.0
    if f == 1.0:
        return b / a
    return approximate_upper_bound_on_p(a, b, 2.0 * _hacky_adjuster(f))


def ratio_estimate(a: int, b: int) -> float:
    """java BoundsOnRatiosInSampledSets.getEstimateOfBoverA."""
    _check_ratio_inputs(a, b)
    return 0.5 if a == 0 else b / a
