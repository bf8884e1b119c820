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


def _headline(kind: str, sk) -> float:
    if kind == "hll":
        return float(sk.estimate())
    if kind == "cms":
        return float(sk.total)
    if kind == "bloom":
        return float(sk.n_added)
    return float(sk.n)  # mg: total weight folded so far


def _make_fold_fn(kind: str, params: dict, retention=None):
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
        if retention is not None:
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
                           retention: str | int | None = None) -> DataFrame:
    """Generic keyed-sketch streaming window: any mergeable keyed sketch
    (``hll`` | ``cms`` | ``bloom`` | ``mg``) folded per (group, event-time
    window) micro-batch by micro-batch. The ``distinct_est`` output column
    carries the kind's headline number (HLL estimate / CMS total weight /
    Bloom keys added / MG weight folded — probe the running heavy-hitter
    state itself via the state bytes);
    the full running state rides the state store as the
    sketch's canonical bytes, so a snapshot at any micro-batch equals a
    batch build over the same prefix of the stream (merge-law invariance).
    """
    params = dict(params or {})
    # NULL keys carry no membership/count information and a null-bearing
    # long batch reaches pandas as float64, corrupting 64-bit keys —
    # filter them stream-side (matches SQL aggregate null semantics)
    bucketed = stream_df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(group_col).cast("string").alias("group"),
        F.unix_timestamp(F.window(F.col(ts_col), window).start)
        .alias("window_start"))
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if retention is not None else GroupStateTimeout.NoTimeout)
    return (bucketed.groupBy("group", "window_start")
            .applyInPandasWithState(
                _make_fold_fn(kind, params, retention), _OUT_SCHEMA,
                _STATE_SCHEMA,
                outputMode="update",
                timeoutConf=timeout))
