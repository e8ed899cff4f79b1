"""Gap-based sessionization — pure Column algebra, no Python in the plan.

Behavioral/event data is a first-class training-data modality;
splitting a user's event stream into sessions (a new session starts
after `gap` of inactivity) is the standard preprocessing step.  The
whole operator is two window expressions over (user, ts):

  new_session = ts - lag(ts) > gap   (first event => new session)
  session_seq = running sum of new_session

Both stay inside Catalyst/WholeStageCodegen; the only shuffle is the
hash partition by user that any per-user computation needs, and the
same partitioning serves every window in the chain (Spark reuses the
Exchange).  At 100 TB: shuffle once by user, derive sessions, then
feed per-session aggregates or sketches without repartitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: int,
    session_col: str = "session_seq",
) -> DataFrame:
    """Add a per-user session sequence number (1-based).

    ``gap`` is in the units of ``ts_col`` (e.g. nanoseconds for raw
    nanos timestamps, seconds for unix epochs) — arithmetic, not
    calendar, so it is timezone-proof and works on any numeric or
    timestamp column that supports subtraction.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev: Column = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > F.lit(gap)), 1
    ).otherwise(0)
    cum = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(session_col, F.sum(new_session).over(cum))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: int,
) -> DataFrame:
    """Per-user session count + event count (one shuffle total)."""
    s = sessionize(df, user_col, ts_col, gap)
    return s.groupBy(user_col).agg(
        F.max("session_seq").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )
