"""Bucketed sketch tables: shuffle-free co-located merge."""

import pytest
from pyspark.sql import functions as F

import datasketches_spark.io as dio
from datasketches_spark import register
from datasketches_spark.aggregation import sketch_agg
from datasketches_spark.sketches import ThetaSketch


@pytest.fixture(autouse=True)
def _reg(spark):
    register(spark)
    yield
    for t in ("day1_sk", "day2_sk"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _day_sketches(spark, start, end):
    df = spark.range(start, end).select(
        (F.col("id") % 16).alias("g"), F.col("id").alias("user_id")
    )
    return sketch_agg(df, "user_id", "theta", group_cols=["g"], k=14)


class TestBucketedSketchTables:
    def test_merge_is_shuffle_free_and_correct(self, spark):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            day1 = _day_sketches(spark, 0, 4000)
            day2 = _day_sketches(spark, 2000, 6000)  # overlapping users
            dio.write_bucketed_sketch_table(
                day1, "day1_sk", ["g"], num_buckets=8, family="theta", k=14
            )
            dio.write_bucketed_sketch_table(
                day2, "day2_sk", ["g"], num_buckets=8, family="theta", k=14
            )
            merged = dio.merge_bucketed_sketch_tables(
                spark, "day1_sk", "day2_sk", ["g"], "datasketch_theta_union"
            )
            plan = merged._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan  # co-located: no shuffle

            out = merged.select(
                "g", F.expr("datasketch_theta_estimate(sketch)").alias("est")
            ).collect()
            # exact mode: each group holds 6000/16 = 375 distinct users
            assert len(out) == 16
            assert all(r["est"] == 375.0 for r in out)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_disjoint_groups_survive_outer_merge(self, spark):
        d1 = _day_sketches(spark, 0, 1600).filter(F.col("g") < 8)
        d2 = _day_sketches(spark, 0, 1600).filter(F.col("g") >= 8)
        dio.write_bucketed_sketch_table(d1, "day1_sk", ["g"], num_buckets=4)
        dio.write_bucketed_sketch_table(d2, "day2_sk", ["g"], num_buckets=4)
        merged = dio.merge_bucketed_sketch_tables(
            spark, "day1_sk", "day2_sk", ["g"], "datasketch_theta_union"
        )
        out = merged.select(
            "g", F.expr("datasketch_theta_estimate(sketch)").alias("est")
        ).collect()
        assert len(out) == 16
        assert all(r["est"] == 100.0 for r in out)


class TestWireTables:
    def test_wire_publish_is_foreign_readable(self, spark, tmp_path):
        """write_wire_table emits blobs a FOREIGN engine reads with no
        knowledge of this package: live datasketches-java heapifies a
        blob straight out of the parquet and answers the same
        estimate."""
        sk = _day_sketches(spark, 0, 3000)
        path = str(tmp_path / "theta_wire")
        dio.write_wire_table(sk, path, "sketch", "theta", k=14)
        raw = spark.read.parquet(path)
        row = raw.filter(F.col("g") == 3).first()
        jvm = spark.sparkContext._jvm
        jsk = jvm.org.apache.datasketches.theta.Sketches.wrapSketch(
            jvm.org.apache.datasketches.memory.Memory.wrap(
                bytearray(bytes(row["sketch"]))
            )
        )
        # group 3 holds ids 3, 19, 35, ... (exact mode)
        assert round(jsk.getEstimate()) == len(range(3, 3000, 16))

    def test_wire_roundtrip_through_read_wire_table(self, spark, tmp_path):
        sk = _day_sketches(spark, 0, 3000)
        want = {
            r["g"]: r["est"]
            for r in sk.selectExpr(
                "g", "CAST(round(datasketch_theta_estimate(sketch)) AS BIGINT) est"
            ).collect()
        }
        path = str(tmp_path / "theta_wire_rt")
        dio.write_wire_table(sk, path, "sketch", "theta", k=14)
        back = dio.read_wire_table(spark, path)
        info = dio.sketch_column_info(back, "sketch")
        assert info["family"] == "theta" and info["k"] == 14
        got = {
            r["g"]: r["est"]
            for r in back.selectExpr(
                "g", "CAST(round(datasketch_theta_estimate(sketch)) AS BIGINT) est"
            ).collect()
        }
        assert got == want

    def test_wire_family_validation(self, spark, tmp_path):
        sk = _day_sketches(spark, 0, 100)
        with pytest.raises(ValueError, match="wire format"):
            dio.write_wire_table(sk, str(tmp_path / "x"), "sketch", "bloom")
        # foreign table without metadata must demand a family
        path = str(tmp_path / "bare")
        sk.selectExpr(
            "g", "datasketch_theta_to_wire(sketch) AS sketch"
        ).write.parquet(path)
        with pytest.raises(ValueError, match="family"):
            dio.read_wire_table(spark, path)
        back = dio.read_wire_table(spark, path, family="theta")
        assert back.count() == 16

    def test_int64_wire_table_roundtrips_typed(self, spark, tmp_path):
        """Round-8 regression (review finding): an int64 KLL table must
        publish with its item dtype in metadata and re-ingest through
        the TYPED reader — the untyped from_wire would silently
        reinterpret 8-byte integer items as doubles (median of 0..999
        came back 2.46e-321 before the fix)."""
        from datasketches_spark.aggregation import sketch_agg

        df = spark.range(1000).selectExpr("id % 2 AS g", "id AS v")
        sk = sketch_agg(df, "v", "kll", group_cols=["g"], k=2048)
        path = str(tmp_path / "kll_int64_wire")
        dio.write_wire_table(sk, path, "sketch", "kll", k=2048)
        raw_info = dio.sketch_column_info(spark.read.parquet(path), "sketch")
        assert raw_info["dtype"] == "int64" and raw_info["wire"] is True
        back = dio.read_wire_table(spark, path)
        info = dio.sketch_column_info(back, "sketch")
        # ingested blobs are engine frames again: dtype carries
        # forward (re-publish stays typed), the wire flag must not
        assert info["dtype"] == "int64" and not info.get("wire")
        got = {
            r["g"]: r["med"]
            for r in back.selectExpr(
                "g", "CAST(datasketch_kll_quantile(sketch, 0.5D) AS BIGINT) med"
            ).collect()
        }
        assert 480 <= got[0] <= 520 and 480 <= got[1] <= 520
        # foreign int64 table (no metadata): caller names the dtype
        bare = str(tmp_path / "bare_int64")
        sk.selectExpr(
            "g", "datasketch_kll_to_wire(sketch) AS sketch"
        ).write.parquet(bare)
        back2 = dio.read_wire_table(spark, bare, family="kll", dtype="int64")
        got2 = {
            r["g"]: r["med"]
            for r in back2.selectExpr(
                "g", "CAST(datasketch_kll_quantile(sketch, 0.5D) AS BIGINT) med"
            ).collect()
        }
        assert got2 == got

    def test_wire_flag_guards_cross_format_misuse(self, spark, tmp_path):
        """A DSKS table must be rejected by read_wire_table EARLY (not
        fail row-by-row at action time), and a published wire table must
        refuse a second write_wire_table (double conversion)."""
        sk = _day_sketches(spark, 0, 100)
        dsks_path = str(tmp_path / "dsks")
        dio.write_sketch_table(sk, dsks_path, "sketch", "theta", k=14)
        with pytest.raises(ValueError, match="read_sketch_table"):
            dio.read_wire_table(spark, dsks_path)
        wire_path = str(tmp_path / "wire")
        dio.write_wire_table(sk, wire_path, "sketch", "theta", k=14)
        republished = spark.read.parquet(wire_path)
        with pytest.raises(ValueError, match="double-convert"):
            dio.write_wire_table(
                republished, str(tmp_path / "wire2"), "sketch", "theta"
            )


class TestRollup:
    def test_day_to_month_rollup_exact(self, spark, tmp_path):
        """rollup_sketch_table: per-day theta sketches roll up to
        months by blob merge only; exact mode makes the month
        estimates equal exact distinct counts, and the output is
        partitioned by the period (directory pruning)."""
        import os

        from datasketches_spark.aggregation import sketch_agg

        # 6 days across 2 months; user ids overlap across days within
        # a month (rollup must dedupe, not sum)
        rows = spark.range(6000).selectExpr(
            "concat('2026-0', cast(1 + (id % 2) as string), '-0',"
            " cast(1 + (id % 3) as string)) AS day",
            "id % 500 AS user_id",
        )
        daily = sketch_agg(rows, "user_id", "theta", group_cols=["day"], k=14)
        src = str(tmp_path / "daily")
        dio.write_sketch_table(daily, src, "sketch", "theta", k=14)
        dst = str(tmp_path / "monthly")
        dio.rollup_sketch_table(
            spark, src, dst, "theta", "substr(day, 1, 7)"
        )
        back = dio.read_sketch_table(spark, dst, "sketch")
        got = {
            r["period"]: r["est"]
            for r in back.selectExpr(
                "period",
                "CAST(round(datasketch_theta_estimate(sketch)) AS BIGINT) est",
            ).collect()
        }
        want = {
            r["m"]: r["c"]
            for r in rows.selectExpr("substr(day, 1, 7) AS m", "user_id")
            .groupBy("m")
            .agg(F.countDistinct("user_id").alias("c"))
            .collect()
        }
        assert got == want
        # partitioned layout: one directory per period
        dirs = sorted(
            d for d in os.listdir(dst) if d.startswith("period=")
        )
        assert dirs == ["period=2026-01", "period=2026-02"]
        # family mismatch fails loudly
        with pytest.raises(ValueError, match="tagged family"):
            dio.rollup_sketch_table(spark, src, dst, "kll", "substr(day, 1, 7)")


def test_string_sampling_wire_tables_roundtrip(spark, tmp_path):
    """dtype='string' on the sampling families routes publish through
    the ArrayOfStringsSerDe image (reservoir: generic
    ReservoirItemsSketch; varopt: string-serde VarOptItemsSketch) and
    read_wire_table's ingest auto-detects the framing."""
    import datasketches_spark as dss
    from datasketches_spark import io as dio
    from datasketches_spark.aggregation import sketch_agg

    dss.register(spark)
    df = spark.createDataFrame(
        [(i % 3, f"doc-{i}") for i in range(30)], "g INT, d STRING"
    )
    sk = sketch_agg(df, "d", "reservoir", group_cols=["g"], k=50)
    p1 = str(tmp_path / "res_str")
    dio.write_wire_table(sk, p1, "sketch", "reservoir", k=50, dtype="string")
    rows = (
        dio.read_wire_table(spark, p1)
        .selectExpr("g", "sort_array(datasketch_reservoir_items(sketch)) AS it")
        .collect()
    )
    for r in rows:
        assert sorted(r.it) == sorted(
            f"doc-{i}" for i in range(30) if i % 3 == r.g
        )

    wdf = spark.createDataFrame(
        [(f"doc-{i}", float(i + 1)) for i in range(10)], "d STRING, w DOUBLE"
    )
    wsk = sketch_agg(wdf, "d", "reservoir", k=50, weight_col="w")
    p2 = str(tmp_path / "vo_str")
    dio.write_wire_table(wsk, p2, "sketch", "varopt", k=50, dtype="string")
    got = (
        dio.read_wire_table(spark, p2)
        .selectExpr(
            "datasketch_reservoir_total_weight_estimate(sketch) AS tot"
        )
        .first()
    )
    assert got.tot == sum(range(1, 11))


def test_kll_items_wire_table_roundtrip(spark, tmp_path):
    """String-items KLL blobs publish as Apache KllItemsSketch wire
    tables and re-ingest losslessly (implicitly string-typed — no
    dtype routing)."""
    import datasketches_spark as dss

    dss.register(spark)
    from datasketches_spark.aggregation import sketch_agg

    df = spark.range(600).selectExpr(
        "id % 3 AS g", "format_string('v%04d', id) AS v"
    )
    sk = sketch_agg(df, "v", "kll_items", group_cols=["g"], k=1024)
    want = {
        r["g"]: (r["n"], r["med"])
        for r in sk.selectExpr(
            "g",
            "datasketch_kll_items_n(sketch) AS n",
            "datasketch_kll_items_quantile(sketch, 0.5) AS med",
        ).collect()
    }
    path = str(tmp_path / "ki_wire")
    dio.write_wire_table(sk, path, "sketch", "kll_items", k=1024)
    back = dio.read_wire_table(spark, path)
    info = dio.sketch_column_info(back, "sketch")
    assert info["family"] == "kll_items" and info["k"] == 1024
    got = {
        r["g"]: (r["n"], r["med"])
        for r in back.selectExpr(
            "g",
            "datasketch_kll_items_n(sketch) AS n",
            "datasketch_kll_items_quantile(sketch, 0.5) AS med",
        ).collect()
    }
    assert got == want
