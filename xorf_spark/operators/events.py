"""Event-stream operators: gap-based sessionization.

Two equivalent formulations, both shuffle-once-by-user:

- ``sessionize`` — the portable lag/cumsum formulation (window functions
  only), chosen for the oracle-checked query because its boundary rule
  (``gap > threshold`` starts a new session) is expressible identically in
  any SQL engine;
- ``sessionize_native`` — Spark's built-in ``session_window`` aggregate
  (Catalyst-native, streaming-capable); a test asserts both produce the
  same sessions on the test data.

Scale: both shuffle once on ``user_col`` (uniform id, no hot keys in the
shape hint) and sort within user partitions; the native variant also works
under Structured Streaming with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Assign a per-user 1-based ``session_idx``: a new session starts when
    the gap since the user's previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = gap_minutes * 60 * 1_000_000
    # microsecond-exact gap (unix_timestamp would truncate to seconds and
    # mis-classify sub-second boundary gaps)
    micros = lambda c: F.unix_micros(c.cast("timestamp"))
    new_session = F.when(
        prev.isNull()
        | ((micros(F.col(ts_col)) - micros(prev)) > gap_us),
        1).otherwise(0)
    return df.withColumn("session_idx", F.sum(new_session).over(w))


def session_stats(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """One row per (user, session): event count, start/end epoch seconds,
    duration seconds."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return (s.groupBy(user_col, "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(F.unix_timestamp(ts_col)).alias("start_epoch"),
                 F.max(F.unix_timestamp(ts_col)).alias("end_epoch"))
            .withColumn("duration_s",
                        F.col("end_epoch") - F.col("start_epoch")))


def sessionize_native(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      gap_minutes: int = 30) -> DataFrame:
    """Spark's Catalyst-native session window aggregate (also valid under
    Structured Streaming): one row per (user, session window)."""
    return (df.groupBy(
                F.col(user_col),
                F.session_window(F.col(ts_col), f"{gap_minutes} minutes"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(F.unix_timestamp(ts_col)).alias("start_epoch"),
                 F.max(F.unix_timestamp(ts_col)).alias("end_epoch")))
