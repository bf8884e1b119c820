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


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str = "user_id", direction: str = "backward",
              tolerance_seconds: float | None = None,
              suffix: str = "_r") -> DataFrame:
    """As-of join: for every left row, attach the nearest right row at or
    before (``backward``) / at or after (``forward``) its ``on`` timestamp
    within the same ``by`` key — the time-series / feature-store join.

    Spark-first plan: NO range join and NO per-row lookup. Both sides are
    tagged and unioned, shuffled ONCE on ``by``, and a running
    ``last(right_payload, ignorenulls=True)`` over
    ``orderBy(ts, side).rowsBetween(unboundedPreceding, current)`` fills
    each left row with the most recent right payload (forward = the same
    scan with ``ts`` descending). Cost is one shuffle + one in-partition
    sort regardless of match distances — a naive range join explodes with
    the time window, this does not. At equal timestamps the right row wins
    (sorts before the left row), matching ``l.ts >= r.ts`` semantics.

    ``tolerance_seconds`` nulls out matches farther than the given horizon
    (applied post-scan, so it changes results, not cost). Right columns
    come back suffixed; unmatched left rows keep them NULL.

    Scale notes: a hot ``by`` key serializes into one sorted task —
    as-of ordering cannot be salted without breaking semantics; bound hot
    keys upstream (sessionize first, or bucket by coarse time). All other
    keys parallelize embarrassingly.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rpay_fields = [c for c in right.columns if c != by]
    r2 = right.select(
        F.col(by).alias("_by"), F.col(on).alias("_ts"),
        F.struct(*[F.col(c).alias(c + suffix) for c in rpay_fields])
        .alias("_rpay"))
    l2 = left.select(
        F.col(by).alias("_by"), F.col(on).alias("_ts"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"))
    rpay_t = r2.schema["_rpay"].dataType
    lpay_t = l2.schema["_lpay"].dataType
    u = (l2.select("_by", "_ts", "_lpay",
                   F.lit(None).cast(rpay_t).alias("_rpay"),
                   F.lit(1).alias("_side"))
         .unionByName(
             r2.select("_by", "_ts",
                       F.lit(None).cast(lpay_t).alias("_lpay"),
                       "_rpay", F.lit(0).alias("_side"))))
    order = ([F.col("_ts").asc(), F.col("_side").asc()]
             if direction == "backward"
             else [F.col("_ts").desc(), F.col("_side").asc()])
    w = (Window.partitionBy("_by").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (u.withColumn("_match", F.last("_rpay", ignorenulls=True)
                           .over(w))
              .where(F.col("_side") == 1))
    if tolerance_seconds is not None:
        dist = F.abs(F.unix_micros(F.col("_ts").cast("timestamp"))
                     - F.unix_micros(F.col("_match." + on + suffix)
                                     .cast("timestamp"))) / 1e6
        filled = filled.withColumn(
            "_match", F.when(dist <= float(tolerance_seconds),
                             F.col("_match")))
    return filled.select(
        "_lpay.*",
        *[F.col("_match." + c + suffix).alias(c + suffix)
          for c in rpay_fields])
