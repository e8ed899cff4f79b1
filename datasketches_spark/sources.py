"""Source helpers for the driver's test tables (and their quirks).

Scans/sources are host-delegated in the reference (SURVEY.md §2.1) and
in this engine -- ``spark.read.parquet`` etc. do the work and Catalyst
pushes filters/pruning into them.  This module only smooths real-world
format quirks:

- the ``events`` table stores TIMESTAMP(NANOS); Spark 4.x reads it as
  ``TIMESTAMP_NTZ`` truncated to microseconds.  :func:`read_table`
  derives timezone-free integer columns so downstream arithmetic
  (bucketing, gaps, as-of) never depends on the session timezone:
  ``ts_us`` (micros since epoch, BIGINT) and ``hour_bucket``
  (``floor(ts_us / 3.6e9)``, matching DuckDB ``floor(epoch(ts)/3600)``);
- convenience loaders for the whole star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

MICROS_PER_HOUR = 3_600_000_000

# timestampdiff on TIMESTAMP_NTZ is pure wall-clock arithmetic -- no
# session-timezone dependence, unlike unix_micros(cast(ts as timestamp)).
_TS_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; events gets derived timezone-free columns."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        return df.withColumn("ts_us", F.expr(_TS_US)).withColumn(
            "hour_bucket",
            F.floor(F.col("ts_us") / F.lit(MICROS_PER_HOUR)).cast("long"),
        )
    return df


def load_star_schema(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register temp views (oracle-style naming)."""
    out = {}
    for t in TABLES:
        df = read_table(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        out[t] = df
    return out
