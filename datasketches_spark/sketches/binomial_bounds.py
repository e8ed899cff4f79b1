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
