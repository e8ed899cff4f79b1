"""Signature-table MinHash workflow: the 100 TB dedup recipe as code.

Three claims, each asserted:
1. ROUTE EQUALITY — near-dup pairs through the stored signature table
   are row-identical to the direct in-plan route (same seeded
   signatures, same exact verify).
2. PLAN PURITY — with ``signatures=`` a stored table, the near-dup
   physical plan contains ZERO Python eval nodes (the mapInPandas
   signature pass ran once, at write time) and scans the signature
   parquet.
3. BUCKETED TABLE MODE — ``table=`` writes a catalog table bucketed by
   id whose self-join on id plans WITHOUT a shuffle exchange on the
   bucketed scans.
"""

import os

import pytest
from pyspark.sql import functions as F

from datasketches_spark.pipeline import dedup as D
from datasketches_spark.sources import read_table

SF = "/root/testdata/sf0.001"

_PY_NODES = (
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
)


def _docs(spark):
    return read_table(spark, SF, "documents").filter(F.col("doc_id") < 150)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sig_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sigs") / "minhash_sigs")
    D.write_minhash_signatures(_docs(spark), "doc_id", "text", path, buckets=4)
    return path


class TestRouteEquality:
    def test_lsh_verified_matches_direct(self, spark, sig_path):
        docs = _docs(spark)
        direct = D.lsh_verified_near_duplicates(
            docs, "doc_id", "text", threshold=0.8
        )
        via_table = D.lsh_verified_near_duplicates(
            docs, "doc_id", "text", threshold=0.8, signatures=sig_path
        )
        a = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in direct.collect()}
        b = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in via_table.collect()}
        spark.catalog.clearCache()
        assert a == b and len(a) > 0

    def test_estimated_route_matches_direct(self, spark, sig_path):
        docs = _docs(spark)
        direct = D.minhash_near_duplicates(docs, "doc_id", "text", threshold=0.8)
        via_table = D.minhash_near_duplicates(
            None, "doc_id", threshold=0.8, signatures=sig_path
        )
        a = {(r.id_a, r.id_b, round(r.est_jaccard, 9)) for r in direct.collect()}
        b = {(r.id_a, r.id_b, round(r.est_jaccard, 9)) for r in via_table.collect()}
        spark.catalog.clearCache()
        assert a == b

    def test_approx_facade_passthrough(self, spark, sig_path):
        import datasketches_spark as dss

        direct = dss.approx.near_duplicates(_docs(spark), "doc_id", "text")
        via = dss.approx.near_duplicates(
            None, "doc_id", "text", signatures=sig_path
        )
        a = {(r.id_a, r.id_b) for r in direct.collect()}
        b = {(r.id_a, r.id_b) for r in via.collect()}
        spark.catalog.clearCache()
        assert a == b

    def test_fuzzy_dedup_composes_with_table(self, spark, sig_path):
        """The one-call fuzzy dedup gives the identical kept set
        through the stored-signature route."""
        docs = _docs(spark)
        direct = {r.doc_id for r in D.fuzzy_dedup(
            docs, "doc_id", "text", keep_cols=["doc_id"]).collect()}
        via = {r.doc_id for r in D.fuzzy_dedup(
            docs, "doc_id", "text", keep_cols=["doc_id"],
            signatures=sig_path).collect()}
        spark.catalog.clearCache()
        assert direct == via and 0 < len(direct) <= docs.count()

    def test_stored_signatures_match_live(self, spark, sig_path):
        live = {
            r.doc_id: tuple(r.sig) if r.sig is not None else None
            for r in D.minhash_signatures(
                _docs(spark), "doc_id", "text"
            ).collect()
        }
        stored = {
            r.doc_id: tuple(r.sig) if r.sig is not None else None
            for r in D.read_minhash_signatures(spark, sig_path).collect()
        }
        assert live == stored


class TestPlanPurity:
    def test_table_route_has_no_python_nodes(self, spark, sig_path):
        docs = _docs(spark)
        via_table = D.lsh_verified_near_duplicates(
            docs, "doc_id", "text", threshold=0.8, signatures=sig_path
        )
        plan = _plan(via_table)
        offenders = [n for n in _PY_NODES if n in plan]
        assert offenders == [], offenders
        # and it actually reads the stored signatures
        assert os.path.basename(sig_path) in plan

    def test_direct_route_does_use_python(self, spark):
        # control: the claim above is meaningful because the direct
        # route's plan DOES carry the Python signature stage
        direct = D.lsh_verified_near_duplicates(
            _docs(spark), "doc_id", "text", threshold=0.8, persist=False
        )
        assert any(n in _plan(direct) for n in _PY_NODES)

    def test_estimated_table_route_pure_jvm(self, spark, sig_path):
        via_table = D.minhash_near_duplicates(
            None, "doc_id", threshold=0.8, signatures=sig_path
        )
        plan = _plan(via_table)
        assert not any(n in plan for n in _PY_NODES)


class TestBucketedTableMode:
    def test_bucket_metadata_and_bucket_join(self, spark, tmp_path):
        table = "dsks_test_sig_bucketed"
        path = str(tmp_path / "sig_bucketed")
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        try:
            D.write_minhash_signatures(
                _docs(spark), "doc_id", "text", path, buckets=4, table=table
            )
            cols = {
                r.col_name: r.data_type
                for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect()
            }
            assert cols.get("Num Buckets") == "4"
            assert "doc_id" in cols.get("Bucket Columns", "")
            # bucketed self-join on id: no Exchange feeds the sorted
            # bucket scans (the whole point of bucketBy at 100 TB)
            t = spark.table(table)
            # hint past the auto-broadcast (the toy table is tiny);
            # at scale this join IS a sort-merge join, and the bucket
            # metadata is what removes both exchanges from it
            j = t.alias("a").hint("merge").join(
                t.alias("b").withColumnRenamed("sig", "sig_b"), "doc_id"
            )
            plan = _plan(j)
            assert "Exchange hashpartitioning" not in plan
            assert "Bucketed: true" in plan
            # the table route resolves catalog names too
            rt = D.read_minhash_signatures(spark, table)
            assert rt.count() == _docs(spark).count()
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
