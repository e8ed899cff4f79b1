"""Source helpers for the driver's test tables (and their quirks).

Scans/sources are host-delegated in the reference (SURVEY.md §2.1) and
in this engine -- ``spark.read.parquet`` etc. do the work and Catalyst
pushes filters/pruning into them.  This module only smooths real-world
format quirks:

- the ``events`` table stores TIMESTAMP(NANOS), which Spark refuses by
  default; :func:`read_table` flips the legacy nanos-as-long conf and
  exposes both raw nanos and a derived micro-precision timestamp;
- convenience loaders for the whole star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

NANOS_PER_HOUR = 3_600_000_000_000


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; events gets nanos handling + derived columns."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn(
            "ts_micros", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        ).withColumn(
            "hour_bucket", F.floor(F.col("ts") / F.lit(NANOS_PER_HOUR)).cast("long")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_star_schema(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register temp views (oracle-style naming)."""
    out = {}
    for t in TABLES:
        df = read_table(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        out[t] = df
    return out
