"""Reference-test-idiom ports (SURVEY.md §5): golden determinism,
mixed-K unions, windows over sketch aggregates, the Python column API.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

import datasketches_spark as dss
from datasketches_spark import api as ds
from datasketches_spark.sketches import (
    HllSketch,
    KllSketch,
    ThetaSketch,
)


@pytest.fixture(scope="module", autouse=True)
def _reg(spark):
    dss.register(spark)


class TestGoldenDeterminism:
    """Idiom 1: byte-exact outputs where deterministic
    (reference test/sql/datasketch_hll.test:14-27)."""

    def test_single_value_blob_stable(self, spark):
        df = spark.createDataFrame([Row(v=42)])
        b1 = df.agg(ds.theta_lgk(8, "v").alias("s")).first().s
        b2 = df.agg(ds.theta_lgk(8, "v").alias("s")).first().s
        assert bytes(b1) == bytes(b2)
        sk = ThetaSketch.deserialize(bytes(b1))
        assert sk.get_estimate() == 1.0 and sk.lg_k == 8

    def test_blob_roundtrip_through_table(self, spark, tmp_path):
        df = spark.range(1, 100).selectExpr("id AS v")
        blobs = df.agg(ds.hll(10, "v").alias("sketch"))
        path = str(tmp_path / "sketches")
        blobs.write.mode("overwrite").parquet(path)
        back = spark.read.parquet(path)
        est = back.selectExpr("datasketch_hll_estimate(sketch) AS e").first().e
        assert est == 99.0


class TestMixedK:
    """Idiom: union of different-K sketches degrades to coarser K
    (reference test/sql/datasketch_hll.test:224-234)."""

    def test_hll_mixed_k_union_sql(self, spark):
        spark.range(0, 20000).selectExpr("id AS v").createOrReplaceTempView("mk1")
        spark.range(10000, 30000).selectExpr("id AS v").createOrReplaceTempView("mk2")
        spark.sql(
            """
            SELECT s FROM (SELECT datasketch_hll(8, v) AS s FROM mk1)
            UNION ALL
            SELECT s FROM (SELECT datasketch_hll(14, v) AS s FROM mk2)
            """
        ).createOrReplaceTempView("mixed")
        row = spark.sql(
            "SELECT datasketch_hll_estimate(datasketch_hll_union(10, s)) AS est, "
            "datasketch_hll_lg_config_k(datasketch_hll_union(10, s)) AS lgk FROM mixed"
        ).first()
        assert row.est == pytest.approx(30000, rel=0.30)  # k=8 error regime
        assert row.lgk <= 10

    def test_kll_mixed_k_merge(self, spark):
        a = KllSketch(512, "float64")
        b = KllSketch(128, "float64")
        import numpy as np

        a.update(np.arange(0.0, 10000.0))
        b.update(np.arange(10000.0, 20000.0))
        a.merge(b)
        assert a.k == 128
        assert a.n == 20000


class TestWindowFunctions:
    """Sketch aggregates inside window frames (the reference gets this
    from DuckDB's generic window support; Spark gives it to pandas
    UDAFs over unbounded/growing frames)."""

    def test_cumulative_distinct_users(self, spark):
        df = spark.createDataFrame(
            [Row(day=d, user=u) for d, users in [(1, [1, 2]), (2, [2, 3]), (3, [4, 5])] for u in users]
        )
        w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        out = (
            df.withColumn("sk", ds.theta("user").over(w))
            .withColumn("cum_distinct", F.call_udf("datasketch_theta_estimate", F.col("sk")))
            .groupBy("day")
            .agg(F.max("cum_distinct").alias("cum_distinct"))
            .orderBy("day")
        )
        assert [r.cum_distinct for r in out.collect()] == [2.0, 3.0, 5.0]


class TestColumnApi:
    def test_groupby_agg_and_scalars(self, spark):
        df = spark.range(0, 1000).selectExpr("id % 4 AS g", "CAST(id AS double) AS x")
        out = (
            df.groupBy("g")
            .agg(ds.kll(1024, "x").alias("sk"))
            .select("g", ds.kll_n("sk").alias("n"), ds.kll_quantile("sk", 0.5, True).alias("med"))
            .orderBy("g")
        )
        rows = out.collect()
        assert all(r.n == 250 for r in rows)
        assert rows[0].med == pytest.approx(498.0, abs=4)

    def test_getattr_scalars(self, spark):
        df = spark.range(0, 10).selectExpr("id AS v")
        row = (
            df.agg(ds.frequent_items("v").alias("s"))
            .select(
                ds.frequent_items_total_weight("s").alias("tw"),
                ds.frequent_items_num_active("s").alias("na"),
            )
            .first()
        )
        assert row.tw == 10 and row.na == 10


class TestEdgeCasesSQL:
    """Idiom 5: NULL-skipping / extreme values
    (reference test/sql/datasketch_theta.test:159-191, 352-385)."""

    def test_null_skipping_counts(self, spark):
        spark.createDataFrame(
            [Row(v=1), Row(v=None), Row(v=2), Row(v=None), Row(v=3)], "v int"
        ).createOrReplaceTempView("with_nulls")
        row = spark.sql(
            "SELECT datasketch_theta_estimate(datasketch_theta(v)) AS est FROM with_nulls"
        ).first()
        assert row.est == 3.0

    def test_extreme_bigints(self, spark):
        vals = [9223372036854775807, 9223372036854775806, -9223372036854775808]
        spark.createDataFrame([Row(v=v) for v in vals + [vals[0]]], "v long").createOrReplaceTempView(
            "bigints"
        )
        row = spark.sql(
            "SELECT datasketch_theta_estimate(datasketch_theta(v)) AS est FROM bigints"
        ).first()
        assert row.est == 3.0

    def test_empty_table_generated_family_null(self, spark):
        # all-NULL input -> NULL blob (reference codegen/generated.cpp.j2:291-294);
        # zero-row input -> zero rows from Spark's global pandas UDAF (host
        # divergence: DuckDB materializes one NULL row for global aggregates)
        spark.range(0).selectExpr("CAST(id AS double) AS x").createOrReplaceTempView("empty_t")
        assert spark.sql("SELECT datasketch_kll(200, x) AS s FROM empty_t").first() is None
        spark.createDataFrame([(None,)], "x double").createOrReplaceTempView("null_t")
        row = spark.sql("SELECT datasketch_kll(200, x) AS s FROM null_t").first()
        assert row.s is None


class TestSketchIO:
    def test_metadata_roundtrip_and_validation(self, spark, tmp_path):
        from datasketches_spark import io as dio
        from datasketches_spark.aggregation import sketch_agg

        df = spark.range(0, 500).selectExpr("id % 3 AS g", "id AS v")
        sk = sketch_agg(df, "v", "theta", group_cols=["g"], k=12)
        path = str(tmp_path / "theta_table")
        dio.write_sketch_table(sk, path, "sketch", "theta", k=12)

        back = dio.read_sketch_table(spark, path)
        assert back.count() == 3
        info = dio.sketch_column_info(back, "sketch")
        assert info["family"] == "theta" and info["k"] == 12

    def test_validation_catches_family_mismatch(self, spark, tmp_path):
        from datasketches_spark import io as dio
        from datasketches_spark.aggregation import sketch_agg

        df = spark.range(0, 100).selectExpr("id AS v")
        sk = sketch_agg(df, "v", "hll", k=10)  # HLL blobs...
        path = str(tmp_path / "mislabeled")
        dio.write_sketch_table(sk, path, "sketch", "theta")  # ...tagged theta
        with pytest.raises(ValueError, match="family"):
            dio.read_sketch_table(spark, path)


class TestDescribeAndErrors:
    def test_describe_pattern(self, spark):
        # idiom 7: describe-string pattern matching (datasketch_hll.test:83-86)
        row = spark.sql(
            "SELECT datasketch_theta_describe(datasketch_theta(id)) AS d FROM range(100)"
        ).first()
        assert "Theta sketch summary" in row.d
        assert "num retained entries : 100" in row.d

    def test_describe_header_contract_all_families(self, spark):
        # the reference's own describe tests assert only the summary
        # header substring (LIKE '%HLL sketch summary%',
        # datasketch_hll.test:84); every family here keeps that exact
        # contract so ported grep-style SQL behaves identically --
        # body layout divergence is documented in docs/FUNCTIONS.md
        cases = [
            ("datasketch_hll_describe(datasketch_hll(12, id), true, false)",
             "HLL sketch summary"),
            ("datasketch_cpc_describe(datasketch_cpc(12, id), true, false)",
             "CPC sketch summary"),
            ("datasketch_theta_describe(datasketch_theta(id))",
             "Theta sketch summary"),
            ("datasketch_kll_describe(datasketch_kll(200, cast(id as double)), true, false)",
             "KLL sketch summary"),
            ("datasketch_quantiles_describe(datasketch_quantiles(128, cast(id as double)), true, false)",
             "Quantiles sketch summary"),
            ("datasketch_req_describe(datasketch_req(12, cast(id as double)), true, false)",
             "REQ sketch summary"),
            ("datasketch_tdigest_describe(datasketch_tdigest(100, cast(id as double)), true)",
             "t-Digest summary"),
            # (no datasketch_frequent_items_describe: the reference has
            # none either -- registry surfaces match 1:1)
        ]
        for expr, pat in cases:
            row = spark.sql(f"SELECT {expr} AS d FROM range(100)").first()
            assert pat in row.d, (expr, row.d[:120])

    def test_corrupt_blob_error_message(self, spark):
        with pytest.raises(Exception, match="Failed to deserialize"):
            spark.sql(
                "SELECT datasketch_kll_n(CAST('junk' AS BINARY))"
            ).collect()

    def test_string_input_rejected_binder_style(self, spark):
        """Quantile families bind numeric overloads only
        (codegen/generator.py:46-60): VARCHAR input must fail with the
        reference's binder-error wording, not a numpy cast error."""
        spark.sql("SELECT explode(array('a','b')) AS s").createOrReplaceTempView(
            "strvals"
        )
        for fam, k in [("kll", 200), ("quantiles", 128), ("req", 12), ("tdigest", 100)]:
            with pytest.raises(Exception, match="No function matches"):
                spark.sql(f"SELECT datasketch_{fam}({k}, s) FROM strvals").collect()

    def test_cube_rollup_compose(self, spark):
        # grouping-set machinery is host-provided (SURVEY §2.1); verify our
        # UDAFs plug into cube() like the reference's plug into DuckDB
        df = spark.range(0, 100).selectExpr("id % 2 AS a", "id % 5 AS b", "id AS v")
        out = (
            df.cube("a", "b")
            .agg(ds.theta("v").alias("sk"))
            .select("a", "b", ds.theta_estimate("sk").alias("est"))
        )
        rows = {(r.a, r.b): r.est for r in out.collect()}
        assert rows[(None, None)] == 100.0  # grand total
        assert rows[(0, None)] == 50.0
        assert rows[(0, 0)] == 10.0


class TestSources:
    def test_events_timestamp_handling(self, spark):
        """Spark 4.x reads TIMESTAMP(NANOS) parquet as TIMESTAMP_NTZ
        (micros); read_table derives tz-free ts_us/hour_bucket ints."""
        import datetime

        from datasketches_spark import sources

        ev = sources.read_table(spark, "/root/testdata/sf0.001", "events")
        row = ev.select("ts", "ts_us", "hour_bucket").first()
        td = row.ts - datetime.datetime(1970, 1, 1)
        us = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
        assert row.ts_us == us
        assert row.hour_bucket == row.ts_us // 3_600_000_000

    def test_load_star_schema(self, spark):
        from datasketches_spark import sources

        tables = sources.load_star_schema(spark, "/root/testdata/sf0.001")
        assert set(tables) == set(sources.TABLES)
        assert spark.sql("SELECT count(*) c FROM nation").first().c == 25


def test_blob_literal_roundtrip_sql(spark):
    """Reference idiom (test/sql/datasketch_hll.test:19-27): a serialized
    sketch fed back as a SQL BINARY literal queries identically."""
    import datasketches_spark as dss
    from datasketches_spark.sketches import ThetaSketch

    dss.register(spark)
    import numpy as np

    sk = ThetaSketch(12)
    sk.update_values(np.arange(7, dtype=np.int64))
    hexs = sk.serialize().hex().upper()
    row = spark.sql(
        f"SELECT datasketch_theta_estimate(X'{hexs}') AS est,"
        f" datasketch_theta_num_retained(X'{hexs}') AS nr"
    ).collect()[0]
    assert row["est"] == 7.0 and row["nr"] == 7
