"""Estimation-mode accuracy grid: family x k -> observed vs contracted
error, fixed seeds, sf1-scale streams (1M values per cell).

Single source of truth: tests/test_accuracy_bands.py::TestAccuracyGrid
asserts every cell; ``python scripts/accuracy_grid.py`` prints the
markdown table committed in docs/BASELINE_LOCAL.md.  Contracts come
from each family's published error theory (3-sigma where a variance
formula exists; the sketch's own hard guarantee where one exists —
FI/CMS; an empirical 2x-max band where the family publishes no
closed form — tdigest, weighted-sample totals), so a failing cell
means the implementation regressed, not that randomness wiggled.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _perm(n: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).permutation(n).astype(np.int64)


def _zipf_counts(n_items: int, total: int, seed: int) -> np.ndarray:
    """Deterministic zipf-ish frequency vector summing to ~total."""
    ranks = np.arange(1, n_items + 1, dtype=np.float64)
    w = 1.0 / ranks
    counts = np.maximum(1, (w / w.sum() * total).astype(np.int64))
    return counts


N = 1_000_000


# ---------------------------------------------------------------- cells
# each returns (observed, band, note); PASS iff observed <= band


def theta_cell(lg_k: int):
    from datasketches_spark.sketches import ThetaSketch

    sk = ThetaSketch(lg_k)
    sk.update_values(pd.Series(_perm(N, 100 + lg_k)))
    obs = abs(sk.get_estimate() / N - 1.0)
    return obs, 3.0 / math.sqrt(1 << lg_k), "KMV 3-sigma 3/sqrt(k)"


def hll_cell(lg_k: int):
    from datasketches_spark.sketches import HllSketch

    sk = HllSketch(lg_k)
    sk.update_values(pd.Series(_perm(N, 200 + lg_k)))
    obs = abs(sk.get_estimate() / N - 1.0)
    return obs, 3.0 * 1.04 / math.sqrt(1 << lg_k), "3-sigma 1.04/sqrt(m)"


def cpc_cell(lg_k: int):
    from datasketches_spark.sketches import CpcSketch

    sk = CpcSketch(lg_k)
    sk.update_values(pd.Series(_perm(N, 300 + lg_k)))
    obs = abs(sk.get_estimate() / N - 1.0)
    return obs, 3.0 * 0.7213 / math.sqrt(1 << lg_k), "ICON 3-sigma"


def aod_cell(lg_k: int):
    from datasketches_spark.sketches.tuple_aod import AodSketch

    rng = np.random.default_rng(400 + lg_k)
    sk = AodSketch(lg_k, 1)
    vals = rng.uniform(0.5, 1.5, size=N)
    sk.update_batch(pd.Series(np.arange(N, dtype=np.int64)), vals)
    key_err = abs(sk.get_estimate() / N - 1.0)
    sum_err = abs(sk.column_sums()[0] / vals.sum() - 1.0)
    return max(key_err, sum_err), 4.0 / math.sqrt(1 << lg_k), "keys+col-sum, 4-sigma"


def fdt_cell(lg_k: int):
    from datasketches_spark.sketches import FdtSketch

    n = 300_000
    sk = FdtSketch(lg_k)
    sk.update_tuples([(str(i), str(i % 10)) for i in range(n)])
    obs = abs(sk.get_estimate() / n - 1.0)
    return obs, 3.0 / math.sqrt(1 << lg_k), "theta-core 3-sigma"


def _rank_err_max(sk, n: int, qs=(0.1, 0.25, 0.5, 0.75, 0.9)) -> float:
    errs = []
    for q in qs:
        item = sk.get_quantile(q, True)
        errs.append(abs((item + 1) / n - q))
    return max(errs)


def kll_cell(k: int):
    from datasketches_spark.sketches import KllSketch

    sk = KllSketch(k)
    sk.update(_perm(N, 500 + k).astype(np.float64))
    band = 2.0 * sk.normalized_rank_error(True)
    return _rank_err_max(sk, N), band, "2x published NRE"


def _str_stream(seed: int) -> np.ndarray:
    # fixed-width decimal render: lexicographic == numeric order, so
    # the numeric rank-error harness applies to string items verbatim
    return np.array(
        [f"s{v:08d}" for v in _perm(N, seed)], dtype=object
    )


def _rank_err_max_str(sk, n: int, qs=(0.1, 0.25, 0.5, 0.75, 0.9)) -> float:
    return max(
        abs((int(sk.get_quantile(q, True)[1:]) + 1) / n - q) for q in qs
    )


def kll_items_cell(k: int):
    from datasketches_spark.sketches import KllItemsSketch

    sk = KllItemsSketch(k)
    sk.update(_str_stream(2100 + k))
    band = 2.0 * sk.normalized_rank_error(True)
    return _rank_err_max_str(sk, N), band, "2x published NRE (string items)"


def kll_items_merged_cell(k: int):
    from datasketches_spark.sketches import KllItemsSketch

    sk = _two_phase(
        KllItemsSketch, k, _str_stream(2200 + k), lambda s, c: s.update(c)
    )
    band = 2.0 * sk.normalized_rank_error(True)
    return _rank_err_max_str(sk, N), band, "2-phase, same band"


def quantiles_cell(k: int):
    from datasketches_spark.sketches import QuantilesSketch

    sk = QuantilesSketch(k)
    sk.update(_perm(N, 600 + k).astype(np.float64))
    band = 2.0 * sk.normalized_rank_error(True)
    return _rank_err_max(sk, N), band, "2x published NRE"


def req_cell(k: int):
    from datasketches_spark.sketches import ReqSketch

    sk = ReqSketch(k)
    sk.update(_perm(N, 700 + k).astype(np.float64))
    errs = []
    for q in (0.95, 0.99, 0.999):
        item = sk.get_quantile(q, True)
        errs.append(abs((item + 1) / N - q) / (1 - q))
    return max(errs), 0.035, "tail RELATIVE err (2.5x ~1%)"


def tdigest_cell(delta: int):
    from datasketches_spark.sketches import TDigestSketch

    sk = TDigestSketch(delta)
    sk.update(_perm(N, 800 + delta).astype(np.float64))
    errs = []
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        item = sk.get_quantile(q)
        errs.append(abs((item + 1) / N - q))
    # no closed-form contract published; empirical 2x measured max
    return max(errs), 0.02 if delta >= 100 else 0.04, "empirical 2x max"


def fi_cell(lg_k: int):
    from datasketches_spark.sketches import FrequentItemsSketch

    counts = _zipf_counts(2000, N, 900 + lg_k)
    sk = FrequentItemsSketch(lg_k)
    # round-robin interleave so heavy items race the purges honestly
    items = np.repeat(np.arange(counts.size), counts)
    items = items[np.random.default_rng(900 + lg_k).permutation(items.size)]
    sk.update_series(pd.Series(items.astype(str)))
    w = float(counts.sum())
    worst = 0.0
    for rank in range(5):  # the 5 heaviest must be tracked and bounded
        true = int(counts[rank])
        item = str(rank)
        lb, ub = sk.get_lower_bound(item), sk.get_upper_bound(item)
        assert lb <= true <= ub, (item, lb, true, ub)
        worst = max(worst, abs(sk.get_estimate(item) - true) / (sk.epsilon * w))
    return worst, 1.0, "|est-true| <= eps*W (hard)"


def cms_cell(lg_w: int):
    from datasketches_spark.sketches import CountMinSketch

    counts = _zipf_counts(5000, N, 1000 + lg_w)
    sk = CountMinSketch(lg_w, 5)
    items = np.repeat(np.arange(counts.size), counts)
    sk.update_series(pd.Series(items.astype(str)))
    w = float(counts.sum())
    worst = 0.0
    for rank in (0, 1, 2, 100, 1000):
        true = int(counts[rank])
        est = sk.get_estimate(str(rank))
        assert est >= true  # CMS never undercounts
        worst = max(worst, (est - true) / (sk.epsilon * w))
    return worst, 1.0, "overcount <= eps*W (w.h.p.)"


def bloom_cell(lg_m: int):
    from datasketches_spark.sketches import BloomFilterSketch

    n = 500_000
    sk = BloomFilterSketch(lg_m)
    sk.update_values(pd.Series(np.arange(n, dtype=np.int64)))
    probes = pd.Series(np.arange(n, 2 * n, dtype=np.int64))
    fpp = float(sk.contains_values(probes).mean())
    k, m = 6, 1 << lg_m
    theory = (1.0 - math.exp(-k * n / m)) ** k
    return fpp, 2.0 * theory, f"2x theoretical FPP ({theory:.4f})"


def bloomfilter_apache_cell(lg_m: int):
    from datasketches_spark.sketches import ApacheBloomFilter

    n = 500_000
    sk = ApacheBloomFilter(1 << lg_m, 6, 9001)
    sk.update_series(pd.Series(np.arange(n, dtype=np.int64)))
    probes = pd.Series(np.arange(n, 2 * n, dtype=np.int64))
    fpp = float(sk.query_series(probes).mean())
    k, m = 6, 1 << lg_m
    theory = (1.0 - math.exp(-k * n / m)) ** k
    return fpp, 2.0 * theory, f"2x theoretical FPP ({theory:.4f})"


def reservoir_cell(k: int):
    from datasketches_spark.sketches import ReservoirSampleSketch

    sk = ReservoirSampleSketch(k)
    sk._rng = np.random.default_rng(42)  # pin the sampler for the grid
    vals = _perm(N, 1100 + k)
    sk.update_series(pd.Series(vals))
    sample = np.array([float(x) for x in sk.get_items()])
    pop_mean, pop_sd = (N - 1) / 2.0, N / math.sqrt(12.0)
    z = abs(sample.mean() - pop_mean) / (pop_sd / math.sqrt(k))
    return z, 4.0, "uniformity z-score <= 4"


def varopt_cell(k: int):
    from datasketches_spark.sketches import ReservoirSampleSketch

    rng = np.random.default_rng(1200 + k)
    w = rng.uniform(0.1, 2.0, size=N)
    sk = ReservoirSampleSketch(k)
    sk._rng = np.random.default_rng(43)  # pin the sampler for the grid
    sk.update_series(pd.Series(np.arange(N, dtype=np.int64)), pd.Series(w))
    obs = abs(sk.total_weight_estimate() / w.sum() - 1.0)
    return obs, 5.0 / math.sqrt(k), "HT total, ~5-sigma"


def ebpps_cell(k: int):
    from datasketches_spark.sketches import EbppsSketch

    # two-point weights: P[include] proportional to weight, so the
    # weight-2 share of the sample must be 2/3 (binomial 4-sigma band)
    n = 200_000
    sk = EbppsSketch(k)
    sk._rng = np.random.default_rng(44)  # pin the sampler for the grid
    items = [f"a{i}" if i % 2 == 0 else f"b{i}" for i in range(n)]
    weights = [1.0 if i % 2 == 0 else 2.0 for i in range(n)]
    sk.update_series(pd.Series(items), pd.Series(weights))
    got = sk.get_full_items()
    share = sum(1 for it in got if it.startswith("b")) / len(got)
    p = 2.0 / 3.0
    z = abs(share - p) / math.sqrt(p * (1 - p) / len(got))
    return z, 4.0, "PPS share z-score <= 4"


# --------------------------------------------- merged-mode twin cells
#
# The distributed contract: the SAME band must hold when the stream is
# split into 8 partitions, each sketched independently, serialized
# (the blob that crosses the shuffle), deserialized, and merged — the
# exact shape of sketch_agg's two-phase plan.


def _two_phase(cls, ctor_arg, values, update, parts: int = 8):
    accs = []
    for chunk in np.array_split(values, parts):
        s = cls(ctor_arg)
        update(s, chunk)
        accs.append(s.serialize())
    out = cls.deserialize(accs[0])
    for blob in accs[1:]:
        out.merge(cls.deserialize(blob))
    return out


def theta_merged_cell(lg_k: int):
    from datasketches_spark.sketches import ThetaSketch

    sk = _two_phase(
        ThetaSketch, lg_k, _perm(N, 1400 + lg_k),
        lambda s, c: s.update_values(pd.Series(c)),
    )
    return abs(sk.get_estimate() / N - 1.0), 3.0 / math.sqrt(1 << lg_k), "2-phase, same band"


def hll_merged_cell(lg_k: int):
    from datasketches_spark.sketches import HllSketch

    sk = _two_phase(
        HllSketch, lg_k, _perm(N, 1500 + lg_k),
        lambda s, c: s.update_values(pd.Series(c)),
    )
    return abs(sk.get_estimate() / N - 1.0), 3.0 * 1.04 / math.sqrt(1 << lg_k), "2-phase, same band"


def cpc_merged_cell(lg_k: int):
    from datasketches_spark.sketches import CpcSketch

    sk = _two_phase(
        CpcSketch, lg_k, _perm(N, 1600 + lg_k),
        lambda s, c: s.update_values(pd.Series(c)),
    )
    return abs(sk.get_estimate() / N - 1.0), 3.0 * 0.7213 / math.sqrt(1 << lg_k), "2-phase, same band"


def kll_merged_cell(k: int):
    from datasketches_spark.sketches import KllSketch

    sk = _two_phase(
        KllSketch, k, _perm(N, 1700 + k).astype(np.float64),
        lambda s, c: s.update(c),
    )
    band = 2.0 * sk.normalized_rank_error(True)
    return _rank_err_max(sk, N), band, "2-phase, same band"


def req_merged_cell(k: int):
    from datasketches_spark.sketches import ReqSketch

    sk = _two_phase(
        ReqSketch, k, _perm(N, 1800 + k).astype(np.float64),
        lambda s, c: s.update(c),
    )
    errs = []
    for q in (0.95, 0.99, 0.999):
        item = sk.get_quantile(q, True)
        errs.append(abs((item + 1) / N - q) / (1 - q))
    return max(errs), 0.035, "2-phase, same band"


def tdigest_merged_cell(delta: int):
    from datasketches_spark.sketches import TDigestSketch

    sk = _two_phase(
        TDigestSketch, delta, _perm(N, 1900 + delta).astype(np.float64),
        lambda s, c: s.update(c),
    )
    errs = []
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        errs.append(abs((sk.get_quantile(q) + 1) / N - q))
    return max(errs), 0.02, "2-phase, same band"


def fi_merged_cell(lg_k: int):
    from datasketches_spark.sketches import FrequentItemsSketch

    counts = _zipf_counts(2000, N, 2000 + lg_k)
    items = np.repeat(np.arange(counts.size), counts)
    items = items[np.random.default_rng(2000 + lg_k).permutation(items.size)]
    sk = _two_phase(
        FrequentItemsSketch, lg_k, items,
        lambda s, c: s.update_series(pd.Series(c.astype(str))),
    )
    w = float(counts.sum())
    worst = 0.0
    for rank in range(5):
        true = int(counts[rank])
        lb, ub = sk.get_lower_bound(str(rank)), sk.get_upper_bound(str(rank))
        assert lb <= true <= ub, (rank, lb, true, ub)
        worst = max(worst, abs(sk.get_estimate(str(rank)) - true) / (sk.epsilon * w))
    # merged FI epsilon guarantee widens by the number of merged parts'
    # purge offsets in the worst case; 2x covers the 8-way split here
    return worst, 2.0, "2-phase, eps*W x2 (8-way merge)"


def stats_cell(_k: int):
    from datasketches_spark.sketches import StatsSketch

    rng = np.random.default_rng(1300)
    vals = rng.uniform(-1000, 1000, size=N)
    sk = StatsSketch()
    sk.update_series(pd.Series(vals))
    obs = abs(sk.get_sum() / vals.sum() - 1.0)
    assert sk.get_n() == N
    return obs, 1e-9, "exact (fp-sum tolerance)"


CELLS = [
    ("theta", "lg_k=10", lambda: theta_cell(10)),
    ("theta", "lg_k=12", lambda: theta_cell(12)),
    ("theta", "lg_k=14", lambda: theta_cell(14)),
    ("hll", "lg_k=10", lambda: hll_cell(10)),
    ("hll", "lg_k=12", lambda: hll_cell(12)),
    ("hll", "lg_k=14", lambda: hll_cell(14)),
    ("cpc", "lg_k=10", lambda: cpc_cell(10)),
    ("cpc", "lg_k=12", lambda: cpc_cell(12)),
    ("tuple_aod", "lg_k=12", lambda: aod_cell(12)),
    ("fdt", "lg_k=12", lambda: fdt_cell(12)),
    ("kll", "k=128", lambda: kll_cell(128)),
    ("kll", "k=200", lambda: kll_cell(200)),
    ("kll", "k=400", lambda: kll_cell(400)),
    ("quantiles", "k=128", lambda: quantiles_cell(128)),
    ("quantiles", "k=256", lambda: quantiles_cell(256)),
    ("req", "k=12", lambda: req_cell(12)),
    ("tdigest", "delta=100", lambda: tdigest_cell(100)),
    ("tdigest", "delta=200", lambda: tdigest_cell(200)),
    ("frequent_items", "lg_k=8", lambda: fi_cell(8)),
    ("frequent_items", "lg_k=10", lambda: fi_cell(10)),
    ("count_min", "lg_w=16", lambda: cms_cell(16)),
    # collision regime: 5000 items in a 1024-wide row actually exercises
    # the eps*W bound (the 2^16 cell measures ~0 by construction)
    ("count_min", "lg_w=10", lambda: cms_cell(10)),
    ("bloom", "lg_m=22", lambda: bloom_cell(22)),
    ("bloomfilter_apache", "lg_m=22", lambda: bloomfilter_apache_cell(22)),
    ("reservoir", "k=4096", lambda: reservoir_cell(4096)),
    ("reservoir_weighted", "k=4096", lambda: varopt_cell(4096)),
    ("ebpps", "k=4096", lambda: ebpps_cell(4096)),
    ("stats", "exact", lambda: stats_cell(0)),
    # merged-mode twins: same bands through the two-phase plan shape
    ("theta", "lg_k=12 merged x8", lambda: theta_merged_cell(12)),
    ("hll", "lg_k=12 merged x8", lambda: hll_merged_cell(12)),
    ("cpc", "lg_k=12 merged x8", lambda: cpc_merged_cell(12)),
    ("kll", "k=200 merged x8", lambda: kll_merged_cell(200)),
    ("kll_items", "k=200", lambda: kll_items_cell(200)),
    ("kll_items", "k=200 merged x8", lambda: kll_items_merged_cell(200)),
    ("req", "k=12 merged x8", lambda: req_merged_cell(12)),
    ("tdigest", "delta=100 merged x8", lambda: tdigest_merged_cell(100)),
    ("frequent_items", "lg_k=10 merged x8", lambda: fi_merged_cell(10)),
]


def run_grid():
    rows = []
    for family, params, fn in CELLS:
        obs, band, note = fn()
        rows.append((family, params, obs, band, note, obs <= band))
    return rows


if __name__ == "__main__":
    rows = run_grid()
    print("| family | params | observed | contract | basis | pass |")
    print("|---|---|---|---|---|---|")
    for family, params, obs, band, note, ok in rows:
        print(
            f"| {family} | {params} | {obs:.5f} | {band:.5f} | {note} |"
            f" {'PASS' if ok else 'FAIL'} |"
        )
    bad = [r for r in rows if not r[5]]
    raise SystemExit(1 if bad else 0)
