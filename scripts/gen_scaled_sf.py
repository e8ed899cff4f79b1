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

# per-table key columns to shift by i * range; everything else copies
_SHIFTS = {
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}
_COPY = ["nation", "region"]


def _scale(spark: SparkSession, table: str, factor: int, out: str, files: int) -> None:
    df = spark.read.parquet(f"{SRC}/{table}.parquet")
    shift_cols = [c for c in _SHIFTS.get(table, []) if c in df.columns]
    ranges = {
        c: int(df.agg(F.max(c)).collect()[0][0] or 0) + 1 for c in shift_cols
    }
    parts = []
    for i in range(factor):
        rep = df
        for c in shift_cols:
            rep = rep.withColumn(c, F.col(c) + F.lit(i * ranges[c]))
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
    for t, _ in _SHIFTS.items():
        files = 32 if t in ("lineitem", "orders", "events") else 8
        _scale(spark, t, factor, out, files)
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
