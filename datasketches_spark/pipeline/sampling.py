"""Deterministic weighted sampling without replacement (Efraimidis-
Spirakis A-ES) for training-data curation.

Training mixtures often want "k documents per shard, weighted by
length/quality" rather than the uniform reservoir in
:mod:`..sketches.reservoir`.  A-ES reduces weighted sampling without
replacement to a top-k: draw u ~ U(0,1) per row, score it
``key = u ** (1/w)``, and keep the k largest keys — the kept set has
exactly the weighted-sampling distribution (Efraimidis & Spirakis,
IPL 2006).

Determinism: u is the same engine-portable md5 unit hash as
:func:`..pipeline.split.unit_hash`, so the sampled SET is a pure
function of (id, salt) — reproducible across runs, engines (the
DuckDB oracle computes the identical keys), repartitioning, and
incremental ingest.

Scale: rank-limited windows are the one window shape Spark already
executes two-phase — the physical plan inserts ``WindowGroupLimit
[Partial]`` BEFORE the exchange (verified with
``.explain("formatted")``, Spark >= 3.5, rank-like function with a
``rn <= k`` filter and k under
``spark.sql.window.group.limit.threshold``, default 1000), so each
map task ships at most k rows per group and the per-group final task
sorts <= k * num_input_partitions survivors, not the whole shard.
:func:`grouped_topk` therefore declares the plain window by default;
the explicit hash-bucketed two-phase variant (``n_buckets=``) exists
for large k, where the pushdown threshold disables the partial limit
and the survivor set itself needs splitting.  Top-k of a union
equals top-k of the union of per-part top-ks, so both plans return
bit-identical rows.

Equivalent capability in the reference: none (its host engine would
run the single-task window); closest analog is the VarOpt sketch in
the wider Apache DataSketches library, which trades exactness for
one pass.  A-ES here is exact, two passes, and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .split import unit_hash, oracle_unit_hash_sql

_RN = "__ws_rn"
_BKT = "__ws_bkt"


def weighted_sample_key(id_col: Column | str, weight: Column | str, salt: str = "") -> Column:
    """A-ES key ``unit_hash(id, salt) ** (1/weight)`` — larger is
    "more sampled"; weight must be strictly positive."""
    w = F.col(weight) if isinstance(weight, str) else weight
    return F.pow(unit_hash(id_col, salt), F.lit(1.0) / w.cast("double"))


def oracle_weighted_key_sql(id_col: str, weight_col: str, salt: str = "") -> str:
    """The identical key in DuckDB SQL (for audits / the oracle gate)."""
    return f"pow({oracle_unit_hash_sql(id_col, salt)}, 1.0 / {weight_col})"


def grouped_topk(
    df: DataFrame,
    order_by: list[Column],
    k: int,
    by: list[str] | None = None,
    bucket_by: Column | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Exact top-k rows per ``by`` group under ``order_by`` (which must
    be a deterministic TOTAL order, e.g. key desc + id asc).

    Default: one rank-limited window — Spark's WindowGroupLimit
    pushdown makes this plan two-phase already (partial top-k before
    the shuffle; see module docstring), so no extra exchange is
    declared.  For k large enough to defeat the pushdown threshold,
    pass ``n_buckets``: phase 1 then ranks within (group,
    hash-bucket) — parallelism groups x n_buckets — and phase 2 ranks
    the <= k*n_buckets survivors per group.  ``bucket_by`` (any
    deterministic column, e.g. the id) makes bucketing data-derived;
    it defaults to a non-deterministic round-robin which is still
    exact but makes phase-1 row assignment run-dependent.
    """
    if k < 1:
        raise ValueError(f"k ({k}) must be >= 1")
    by = list(by or [])
    if n_buckets is not None:
        bucket = (
            F.pmod(F.xxhash64(bucket_by), F.lit(n_buckets))
            if bucket_by is not None
            else F.floor(F.rand() * n_buckets)
        )
        w1 = Window.partitionBy(*by, _BKT).orderBy(*order_by)
        df = (
            df.withColumn(_BKT, bucket)
            .withColumn(_RN, F.row_number().over(w1))
            .filter(F.col(_RN) <= k)
            .drop(_RN, _BKT)
        )
    w2 = Window.partitionBy(*by).orderBy(*order_by)
    return (
        df.withColumn(_RN, F.row_number().over(w2))
        .filter(F.col(_RN) <= k)
        .drop(_RN)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    salt: str = "",
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample (``df.sampleBy``'s
    contract, minus its non-portable per-partition RNG).

    A row survives iff ``unit_hash(id, salt) < fractions[stratum]``;
    strata absent from ``fractions`` get ``default`` (0.0 = dropped,
    1.0 = kept whole).  Membership is a pure function of (id, salt):
    stable under repartitioning and incremental ingest, joinable after
    the fact, and recomputable in any engine with md5 (the DuckDB
    oracle hash-matches a CASE over the same expression).  Nested
    samples compose: the survivor set at fraction f' < f is a subset
    of the one at f, so shrinking a stratum never resamples it.

    Scale: scan -> filter, a pure map stage — no shuffle, no Python,
    no fraction-table join (the CASE folds into whole-stage codegen).
    For fractions derived from a target mixture instead of given
    explicitly, use :func:`..pipeline.mixture.sample_to_mixture`.
    """
    if not fractions:
        raise ValueError("fractions must be a non-empty dict")
    for s, frac in {**fractions, "<default>": default}.items():
        if not 0.0 <= float(frac) <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], got {frac}")
    f_expr = F.lit(float(default))
    for s, frac in fractions.items():
        f_expr = F.when(F.col(strata_col) == s, F.lit(float(frac))).otherwise(f_expr)
    return df.filter(unit_hash(id_col, salt) < f_expr)


def oracle_stratified_keep_sql(
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    salt: str = "",
    default: float = 0.0,
) -> str:
    """The identical survival predicate in DuckDB SQL (for audits /
    the oracle gate) — a CASE over :func:`oracle_unit_hash_sql`."""
    cases = " ".join(
        f"WHEN '{s}' THEN {float(frac)!r}" for s, frac in fractions.items()
    )
    return (
        f"{oracle_unit_hash_sql(id_col, salt)} < "
        f"(CASE {strata_col} {cases} ELSE {float(default)!r} END)"
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    by: list[str] | None = None,
    salt: str = "",
    n_buckets: int | None = None,
) -> DataFrame:
    """k-row weighted sample without replacement per ``by`` group.

    Inclusion probability follows A-ES exactly; rows with NULL or
    non-positive weight are dropped (they are unsampleable).  The
    result is the input rows (no key column added), deterministic in
    (id, salt), and computed with :func:`grouped_topk` so no shard
    becomes a straggler task at scale (``n_buckets`` only needed for
    very large k; see there).
    """
    w = F.col(weight_col).cast("double")
    pos = df.filter(w.isNotNull() & (w > 0))
    key = weighted_sample_key(id_col, weight_col, salt)
    order = [key.desc(), F.col(id_col).asc()]
    return grouped_topk(
        pos, order, k, by=by, bucket_by=F.col(id_col), n_buckets=n_buckets
    )
