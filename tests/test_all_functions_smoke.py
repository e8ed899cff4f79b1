"""Execute every registered SQL function once against a live sketch.

The reference's sqllogictests touch each function at least once; this
is the equivalent blanket guarantee for our 90-function registry --
any function that cannot execute end-to-end fails here by name.
"""

import os

import pytest

import datasketches_spark as dss


@pytest.fixture(scope="module")
def ctx(spark):
    dss.register(spark)
    spark.range(1, 201).selectExpr(
        "CAST(id AS double) AS xd", "id AS xi", "CAST(id % 20 AS string) AS xs"
    ).createOrReplaceTempView("smoke_t")
    # one stored sketch per family
    sketches = spark.sql(
        """
        SELECT
          datasketch_theta(xi)               AS sk_theta,
          datasketch_kll(200, xd)            AS sk_kll,
          datasketch_kll_items(200, xs)      AS sk_kll_items,
          datasketch_quantiles(128, xd)      AS sk_quantiles,
          datasketch_req(12, xd)             AS sk_req,
          datasketch_tdigest(100, xd)        AS sk_tdigest,
          datasketch_hll(12, xi)             AS sk_hll,
          datasketch_cpc(12, xi)             AS sk_cpc,
          datasketch_frequent_items(xs)      AS sk_frequent_items,
          datasketch_bloom(12, xi)           AS sk_bloom,
          datasketch_bloomfilter(12, xi)     AS sk_bloomfilter,
          datasketch_reservoir(64, xs)       AS sk_reservoir,
          datasketch_cms(12, xs)             AS sk_cms,
          datasketch_ebpps(64, xs)           AS sk_ebpps,
          datasketch_stats(xd)               AS sk_stats,
          datasketch_aod(12, xi, array(xd, xd * 2)) AS sk_aod,
          datasketch_fdt(12, array(xs, CAST(xi % 3 AS STRING))) AS sk_fdt
        FROM smoke_t
        """
    )
    # materialize the one-row sketch frame ONCE (r15 suite-runtime
    # fix): the view is referenced by ~237 scalar smoke queries, and
    # uncached each one re-ran the whole 17-family aggregation
    sketches.cache().count()
    sketches.createOrReplaceTempView("smoke_sketches")
    yield spark
    sketches.unpersist()


def _args_for(name: str) -> str | None:
    """SQL argument list for each scalar, keyed by name suffix."""
    fam = None
    # the varopt wire fns operate on reservoir blobs (wire dialect)
    varopt_table = {
        "datasketch_varopt_to_wire": "sk_reservoir",
        "datasketch_varopt_to_wire_strings": "sk_reservoir",
        "datasketch_varopt_from_wire": (
            "datasketch_varopt_to_wire(sk_reservoir)"
        ),
    }
    if name in varopt_table:
        return varopt_table[name]
    for f in ("frequent_items", "quantiles", "tdigest", "theta", "kll_items", "kll", "req", "hll", "cpc", "bloomfilter", "bloom", "reservoir", "cms", "ebpps", "stats", "aod", "fdt"):
        if name.startswith(f"datasketch_{f}_"):
            fam = f
            suffix = name[len(f"datasketch_{f}_") :]
            break
    else:
        return None
    sk = f"sk_{fam}"
    table = {
        "is_empty": f"{sk}",
        "k": f"{sk}",
        "n": f"{sk}",
        "is_estimation_mode": f"{sk}",
        "num_retained": f"{sk}",
        "min_item": f"{sk}",
        "max_item": f"{sk}",
        "estimate": f"{sk}, 'x'" if fam in ("frequent_items", "cms") else f"{sk}",
        "width": f"{sk}",
        "depth": f"{sk}",
        "lower_bound": f"{sk}, 'x'" if fam == "frequent_items" else f"{sk}, 2",
        "upper_bound": f"{sk}, 'x'" if fam == "frequent_items" else f"{sk}, 2",
        "might_contain": f"{sk}, 42",
        "nonnull": f"{sk}",
        "null_count": f"{sk}",
        "min_num": f"{sk}",
        "max_num": f"{sk}",
        "min_str": f"{sk}",
        "max_str": f"{sk}",
        "sum": f"{sk}",
        "items": f"{sk}",
        "is_exact": f"{sk}",
        "num_bits": f"{sk}",
        "num_hashes": f"{sk}",
        "bits_set": f"{sk}",
        "current_fpp": f"{sk}",
        "rank": f"{sk}, 50.0" if fam == "tdigest" else f"{sk}, 50.0, true",
        "quantile": f"{sk}, 0.5" if fam == "tdigest" else f"{sk}, 0.5, true",
        "cdf": f"{sk}, array(50.0D, 150.0D)"
        if fam == "tdigest"
        else f"{sk}, array(50.0D, 150.0D), true",
        "pmf": f"{sk}, array(50.0D, 150.0D)"
        if fam == "tdigest"
        else f"{sk}, array(50.0D, 150.0D), true",
        "describe": f"{sk}, true"
        if fam == "tdigest"
        else (f"{sk}" if fam in ("theta", "bloom", "bloomfilter", "reservoir", "cms", "ebpps", "stats", "aod", "fdt") else f"{sk}, true, false"),
        "normalized_rank_error": f"{sk}, true",
        "total_weight": f"{sk}",
        "get_theta": f"{sk}",
        "get_seed": f"{sk}",
        "to_wire": f"{sk}",
        "from_wire": f"datasketch_{fam}_to_wire({sk})",
        # typed integer readers: DSKS frames pass through untouched
        # (the int-wire path itself is covered by the oracle gate +
        # test_kll_wire/test_quantiles_req_wire roundtrips)
        "from_wire_bigint": f"{sk}",
        "from_wire_integer": f"{sk}",
        "lg_config_k": f"{sk}",
        "is_compact": f"{sk}",
        "epsilon": f"{sk}",
        "num_active": f"{sk}",
        "get_frequent": f"{sk}, 'NO_FALSE_POSITIVES'",
        "union": f"{sk}, {sk}",
        "intersect": f"{sk}, {sk}",
        "a_not_b": f"{sk}, {sk}",
        "jaccard": f"{sk}, {sk}",
        "jaccard_bounds": f"{sk}, {sk}",
        "exactly_equal": f"{sk}, {sk}",
        "similarity_test": f"{sk}, {sk}, 0.5",
        "dissimilarity_test": f"{sk}, {sk}, 0.5",
        "ks": f"{sk}, {sk}",
        "sample_weights": f"{sk}",
        "total_weight_estimate": f"{sk}",
        "to_wire_strings": f"{sk}",
        "c": f"{sk}",
        "cumulative_weight": f"{sk}",
        "has_partial": f"{sk}",
        "psi": f"{sk}, {sk}, array(50.0D, 150.0D)",
        "theta": f"{sk}",
        "to_theta": f"{sk}",
        "seed": f"{sk}",
        "fill_percentage": f"{sk}",
        "num_values": f"{sk}",
        "column_sums": f"{sk}",
        "column_sums_retained": f"{sk}",
        "column_means": f"{sk}",
        "top_groups": f"{sk}, array(0), 3",
    }
    if fam == "kll_items":
        # string-typed item positions: rank takes a string probe,
        # cdf/pmf take ascending STRING split points ('12' < '5')
        table.update(
            {
                "rank": f"{sk}, '5', true",
                "cdf": f"{sk}, array('12', '5'), true",
                "pmf": f"{sk}, array('12', '5'), true",
            }
        )
    return table.get(suffix)


def test_every_scalar_executes(ctx):
    spark = ctx
    names = sorted(dss.build_scalar_registry().keys())
    failures = []
    mapped = []
    for name in names:
        args = _args_for(name)
        if args is None:
            failures.append((name, "no arg mapping in smoke test"))
        else:
            mapped.append((name, args))
    # Chunked execution (r15 suite-runtime fix): one SELECT evaluates
    # ~40 scalars at once over the cached one-row view — 6 jobs
    # instead of 237.  A failing chunk falls back to per-name queries
    # so the failure report still names the offender.
    chunk_size = 40
    for lo in range(0, len(mapped), chunk_size):
        chunk = mapped[lo : lo + chunk_size]
        sel = ", ".join(
            f"{name}({args}) AS c{i}" for i, (name, args) in enumerate(chunk)
        )
        try:
            row = spark.sql(f"SELECT {sel} FROM smoke_sketches").first()
            assert row is not None
        except Exception:  # noqa: BLE001
            for name, args in chunk:
                try:
                    row = spark.sql(
                        f"SELECT {name}({args}) AS r FROM smoke_sketches"
                    ).first()
                    assert row is not None
                except Exception as exc:  # noqa: BLE001
                    failures.append((name, str(exc).splitlines()[0][:160]))
    assert not failures, f"{len(failures)} scalar(s) failed: {failures}"


def test_every_aggregate_executes(ctx):
    spark = ctx
    names = sorted(dss.build_aggregate_registry().keys())
    two_arg_k = {
        "datasketch_quantiles": 128,
        "datasketch_kll": 200,
        "datasketch_kll_items": 200,
        "datasketch_req": 12,
        "datasketch_tdigest": 100,
        "datasketch_hll": 12,
        "datasketch_cpc": 12,
        "datasketch_theta_lgk": 12,
        "datasketch_frequent_items_lgk": 10,
        "datasketch_bloom": 12,
        "datasketch_bloomfilter": 12,
        "datasketch_reservoir": 64,
        "datasketch_cms": 12,
        "datasketch_ebpps": 64,
    }
    failures = []
    for name in names:
        try:
            if name in (
                "datasketch_hll_union",
                "datasketch_cpc_union",
                "datasketch_bloom_union_agg",
                "datasketch_bloomfilter_union_agg",
                "datasketch_reservoir_union_agg",
                "datasketch_cms_union_agg",
                "datasketch_ebpps_union_agg",
            ):
                fam = name.replace("datasketch_", "").replace("_union_agg", "").replace("_union", "")
                kk = 64 if fam in ("reservoir", "ebpps") else 12
                sql = f"SELECT {name}({kk}, sk_{fam}) FROM smoke_sketches"
            elif name == "datasketch_stats_union_agg":
                sql = f"SELECT {name}(sk_stats) FROM smoke_sketches"
            elif name in ("datasketch_reservoir_weighted", "datasketch_ebpps_weighted"):
                sql = f"SELECT {name}(64, xs, xd) FROM smoke_t"
            elif name == "datasketch_aod":
                sql = f"SELECT {name}(12, xi, array(xd, xd * 2)) FROM smoke_t"
            elif name == "datasketch_aod_union_agg":
                sql = f"SELECT {name}(sk_aod) FROM smoke_sketches"
            elif name == "datasketch_fdt":
                sql = f"SELECT {name}(12, array(xs, 'd')) FROM smoke_t"
            elif name == "datasketch_fdt_union_agg":
                sql = f"SELECT {name}(12, sk_fdt) FROM smoke_sketches"
            elif name in two_arg_k:
                col = "xs" if ("frequent" in name or "items" in name) else "xd" if name in (
                    "datasketch_kll", "datasketch_quantiles", "datasketch_req",
                    "datasketch_tdigest") else "xi"
                sql = f"SELECT {name}({two_arg_k[name]}, {col}) FROM smoke_t"
            else:
                col = "xs" if "frequent" in name else "xi"
                sql = f"SELECT {name}({col}) FROM smoke_t"
            assert spark.sql(sql).first() is not None
        except Exception as exc:  # noqa: BLE001
            failures.append((name, str(exc).splitlines()[0][:160]))
    assert not failures, f"{len(failures)} aggregate(s) failed: {failures}"


def test_functions_md_matches_live_registry(spark):
    """docs/FUNCTIONS.md is GENERATED (scripts/gen_functions_md.py, run
    by ci.sh) — its inventory lines must match the live registry
    name-for-name so the documented function count can never drift
    from what register(spark) actually installs."""
    import re
    from pathlib import Path

    dss.register(spark)  # registries parse DDL lazily against a session
    live = set(dss.build_aggregate_registry()) | set(dss.build_scalar_registry())
    doc = (Path(__file__).parent.parent / "docs" / "FUNCTIONS.md").read_text()
    doc_names = set(re.findall(r"^- `(datasketch_\w+)` \((?:AGG|SCALAR)\)", doc, re.M))
    assert doc_names == live, (
        f"doc-only: {sorted(doc_names - live)}; "
        f"unregistered-in-doc: {sorted(live - doc_names)} — "
        "re-run python scripts/gen_functions_md.py"
    )


def test_functions_md_counts_match_registry(spark):
    """docs/FUNCTIONS.md is generated (scripts/gen_functions_md.py);
    its committed total must match the live registry so the count can
    never drift again (r11 verdict doc-hygiene item)."""
    import re

    agg = dss.build_aggregate_registry()
    sca = dss.build_scalar_registry()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(repo, "docs", "FUNCTIONS.md")).read()
    m = re.search(
        r"\*\*Total: (\d+) registered functions\*\* "
        r"\((\d+) aggregates, (\d+) scalars\)",
        text,
    )
    assert m, "FUNCTIONS.md total line missing — regenerate it"
    assert (int(m[1]), int(m[2]), int(m[3])) == (
        len(agg) + len(sca),
        len(agg),
        len(sca),
    ), "docs/FUNCTIONS.md is stale — run python scripts/gen_functions_md.py"
    # README quotes the same total in two places; gate those too
    readme = open(os.path.join(repo, "README.md")).read()
    quoted = re.findall(r"(\d+) SQL functions", readme)
    assert quoted and all(
        int(q) == len(agg) + len(sca) for q in quoted
    ), f"README.md function counts stale: {quoted}"
