"""Streaming mergeable-sketch aggregation: per-(group, event-time-window)
HyperLogLog distinct counts with ``applyInPandasWithState``.

The batch UDAF dataflow (``xorf_spark.sketches.dataflow``) folds partitions
and merges; the streaming twin folds *micro-batches* into per-group sketch
state. Because HLL state is a pure max-merge (order- and batching-invariant),
the running state after any prefix of the stream equals a batch build over
the same rows — the mergeability law is exactly what makes the operator
streamable with `update` semantics.

State model: one HLL payload per (group, window-start) key; each micro-batch
re-mixes the batch's keys into a fresh HLL and max-merges it into state —
per-row work is all vectorized numpy. Emits the running estimate per update.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sketches.kernels import make_sketch, sketch_from_bytes

_STATE_SCHEMA = StructType([StructField("payload", BinaryType(), True)])
_OUT_SCHEMA = StructType([
    StructField("group", StringType(), True),
    StructField("window_start", LongType(), False),
    StructField("n_rows", LongType(), False),
    StructField("distinct_est", DoubleType(), False),
])


_UNIT_MS = {"millisecond": 1, "second": 1000, "minute": 60_000,
            "hour": 3_600_000, "day": 86_400_000, "week": 604_800_000}


def _interval_ms(spec: str | int) -> int:
    """Milliseconds of a simple interval spec ('10 minutes', '1 hour', or a
    plain int of ms) — the subset of Spark's interval syntax these
    streaming helpers accept."""
    if isinstance(spec, int):
        return spec
    parts = spec.strip().split()
    if len(parts) != 2:
        raise ValueError(f"expected '<n> <unit>' interval, got {spec!r}")
    n, unit = parts
    unit = unit.rstrip("s").lower()
    if unit not in _UNIT_MS:
        raise ValueError(f"unsupported interval unit in {spec!r}")
    return int(n) * _UNIT_MS[unit]


# one summary-number definition for batch AND streaming — a new kind
# added in one place is automatically correct in the other
from ..sketches.dataflow import _headline  # noqa: E402,F401


def _make_fold_fn(kind: str, params: dict, retention=None,
                  evict_after_ms: int | None = None):
    def fold(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
             ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            (blob,) = state.get
            sk = sketch_from_bytes(blob)
        else:
            sk = make_sketch(kind, **params)
        n = 0
        for pdf in pdfs:
            import numpy as np

            keys = pdf["key"].to_numpy(np.int64).view(np.uint64)
            sk.add_hashes(keys)
            n += int(keys.size)
        state.update((sk.to_bytes(),))
        if evict_after_ms is not None:
            # event-time eviction: state dies once the WATERMARK (not the
            # wall clock) passes this window's end + the lateness allowance
            # — no late row can touch it after that, by the watermark
            # contract. Guard > current watermark (Spark requires it; an
            # equal value can occur when the closing batch's rows sit
            # exactly at the window edge).
            target = int(key[1]) * 1000 + evict_after_ms
            state.setTimeoutTimestamp(
                max(target, state.getCurrentWatermarkMs() + 1))
        elif retention is not None:
            # retention reaches here as int MILLISECONDS (converted at
            # wiring): pyspark's GroupState.setTimeoutDuration validates
            # int-only, so a "1 hour"-style string would crash the fold
            # executor-side — and in a stream every checkpoint replay
            # re-fails there (latent bug surfaced by the r4 null-ts test)
            state.setTimeoutDuration(retention)
        yield pd.DataFrame([{
            "group": key[0],
            "window_start": int(key[1]),
            "n_rows": n,
            "distinct_est": _headline(kind, sk),
        }])

    return fold


def stream_windowed_hll(stream_df: DataFrame, key_col: str,
                        group_col: str, ts_col: str = "ts",
                        window: str = "1 hour", p: int = 12,
                        retention: str | int | None = None) -> DataFrame:
    """Running approximate distinct-count per (group, event-time window).

    ``key_col`` must be a 64-bit key column (derive with ``xxhash64``).
    Emits one update row per touched (group, window) per micro-batch with
    the running HLL estimate — 2^p bytes of state per group-window instead
    of the unbounded exact-distinct set.

    On an unbounded stream with advancing event time, one 2^p-byte entry
    per (group, window) still accumulates forever; pass ``retention`` (a
    processing-time TTL per entry, e.g. ``"6 hours"`` — idle entries past it
    are evicted) to bound total state at
    active_group_windows × 2^p bytes. Default keeps every window alive
    (NoTimeout) for bounded group-window cardinality.
    """
    return stream_windowed_sketch(stream_df, key_col, group_col, "hll",
                                  {"p": p}, ts_col, window, retention)


def stream_windowed_sketch(stream_df: DataFrame, key_col: str,
                           group_col: str, kind: str = "hll",
                           params: dict | None = None, ts_col: str = "ts",
                           window: str = "1 hour",
                           retention: str | int | None = None,
                           watermark: str | None = None) -> DataFrame:
    """Generic keyed-sketch streaming window: any mergeable keyed sketch
    (``hll`` | ``cms`` | ``bloom`` | ``mg`` | ``theta``) folded per
    (group, event-time window) micro-batch by micro-batch. The
    ``distinct_est`` output column carries the kind's headline number
    (HLL/theta estimate / CMS total weight / Bloom keys added / MG weight
    folded — probe the running heavy-hitter state itself via the state
    bytes; the definition is shared with the batch dataflow's
    ``_headline``);
    the full running state rides the state store as the
    sketch's canonical bytes, so a snapshot at any micro-batch equals a
    batch build over the same prefix of the stream (merge-law invariance).

    Late-data policy — two mutually exclusive retention modes:

    * ``retention`` (processing-time TTL): entries idle longer than the
      TTL are evicted; any late row is still folded if it arrives before
      eviction. Simple, but eviction depends on the wall clock, not the
      data. Liveness note: with ProcessingTimeTimeout the engine keeps
      scheduling (empty) micro-batches to fire future timeouts, so the
      query never reports idle — ``processAllAvailable()`` blocks
      forever in this mode (poll the sink or use explicit triggers).
      Accepts ``"6 hours"``-style strings or int milliseconds (converted
      at wiring; pyspark's ``setTimeoutDuration`` is int-only).
    * ``watermark`` (event-time, production semantics): sets
      ``withWatermark(ts_col, watermark)`` and event-time timeouts. Rows
      later than the watermark are DROPPED before the state function (so a
      straggler cannot resurrect or skew a closed window), and each
      (group, window) entry is evicted once the watermark passes
      window end + the lateness allowance — state size tracks the number
      of windows still inside the lateness horizon, independent of
      processing speed.
    """
    params = dict(params or {})
    from ..sketches.kernels import KEYED_KINDS
    if kind not in KEYED_KINDS:
        # validate at WIRING time, like the batch twin
        # (sketches.partial_sketches): an unknown or valued kind (kll/
        # tdigest fold values, not hashed keys) would otherwise fail only
        # inside the executor after the shuffle — and in a stream, every
        # checkpoint replay re-fails there (r4 review finding)
        raise ValueError(
            f"kind={kind!r} is not a keyed sketch; expected one of "
            f"{KEYED_KINDS}")
    if retention is not None and watermark is not None:
        raise ValueError("pass either retention (processing-time TTL) or "
                         "watermark (event-time), not both")
    src = stream_df
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    # NULL keys carry no membership/count information and a null-bearing
    # long batch reaches pandas as float64, corrupting 64-bit keys —
    # filter them stream-side (matches SQL aggregate null semantics)
    cols = [F.col(key_col).alias("key"),
            F.col(group_col).cast("string").alias("group"),
            F.unix_timestamp(F.window(F.col(ts_col), window).start)
            .alias("window_start")]
    if watermark is not None:
        # the event-time attribute must reach the stateful operator's input
        # for Spark to drop late rows against the watermark; fold() only
        # reads pdf["key"], so the extra column is inert data
        cols.append(F.col(ts_col))
    # null TIMESTAMPS are dropped too: window(NULL).start is NULL, and a
    # (group, NULL) state key reaches the fold's int(key[1]) as None —
    # in retention/NoTimeout mode (no watermark to shed the row) that
    # TypeError poison-pills the query: every checkpoint replay re-fails
    # on the same row (r4 review finding). A null event time identifies
    # no window, matching SQL aggregate null semantics.
    bucketed = (src.where(F.col(key_col).isNotNull()
                          & F.col(ts_col).isNotNull())
                .select(*cols))
    if watermark is not None:
        timeout = GroupStateTimeout.EventTimeTimeout
        evict_after_ms = _interval_ms(window) + _interval_ms(watermark)
    else:
        timeout = (GroupStateTimeout.ProcessingTimeTimeout
                   if retention is not None else GroupStateTimeout.NoTimeout)
        evict_after_ms = None
        if retention is not None:
            # to int ms HERE: setTimeoutDuration is int-only in pyspark,
            # and a wiring-time conversion also validates the spec before
            # the stream starts
            retention = _interval_ms(retention)
    return (bucketed.groupBy("group", "window_start")
            .applyInPandasWithState(
                _make_fold_fn(kind, params, retention, evict_after_ms),
                _OUT_SCHEMA, _STATE_SCHEMA,
                outputMode="update",
                timeoutConf=timeout))
