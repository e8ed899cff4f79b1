"""Generate an sfN-equivalent dataset by key-shifted replication of
/root/testdata/sf0.1 — the 10x scaling fixture the growth-slope
measurement (scripts/bench_sf_slopes.py) runs against.

Replica i shifts every entity key by i * (its sf0.1 key range), so
cardinalities scale with the data exactly like TPC-H SF does:
10x lineitem rows -> 10x orders, 10x customers, 10x suppliers, 10x
distinct documents.  Dimension tables nation/region stay fixed (as in
TPC-H).  Output is written via Spark with enough output files that the
scan parallelizes (the committed sf0.1 fixture is ONE rowgroup, which
serializes every scan — see BASELINE_LOCAL.md round-8 notes).

Usage: python scripts/gen_scaled_sf.py [factor] [out_dir]
       (defaults: 10 /tmp/sf1)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# per-table key columns, each naming the ENTITY whose range defines
# its shift stride — FK columns must share the owning table's stride
# or replica joins dangle (max(o_custkey) < max(c_custkey) on standard
# TPC-H: a third of customers never order)
_SHIFTS = {
    "lineitem": {"l_orderkey": "order", "l_suppkey": "supp", "l_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "documents": {"doc_id": "doc"},
    "events": {"event_id": "event", "user_id": "user"},
    "embeddings": {"vec_id": "vec"},
}
# entity -> (owning table, key column) for the shared stride
_ENTITY_OWNER = {
    "order": ("orders", "o_orderkey"),
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "doc": ("documents", "doc_id"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "vec": ("embeddings", "vec_id"),
}
_COPY = ["nation", "region"]


def _entity_strides(spark: SparkSession) -> dict[str, int]:
    strides = {}
    for entity, (table, col) in _ENTITY_OWNER.items():
        mx = spark.read.parquet(f"{SRC}/{table}.parquet").agg(F.max(col)).collect()[0][0]
        strides[entity] = int(mx or 0) + 1
    return strides


def _scale(
    spark: SparkSession, table: str, factor: int, out: str, files: int,
    strides: dict[str, int],
) -> None:
    df = spark.read.parquet(f"{SRC}/{table}.parquet")
    shift_cols = {
        c: e for c, e in _SHIFTS.get(table, {}).items() if c in df.columns
    }
    parts = []
    for i in range(factor):
        rep = df
        for c, entity in shift_cols.items():
            rep = rep.withColumn(c, F.col(c) + F.lit(i * strides[entity]))
        parts.append(rep)
    allup: DataFrame = parts[0]
    for p in parts[1:]:
        allup = allup.unionByName(p)
    allup.repartition(files).write.mode("overwrite").parquet(f"{out}/{table}.parquet")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for t in _COPY:
        dst = f"{out}/{t}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        spark.read.parquet(f"{SRC}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(dst)
    strides = _entity_strides(spark)
    for t in _SHIFTS:
        files = 32 if t in ("lineitem", "orders", "events") else 8
        _scale(spark, t, factor, out, files, strides)
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
