"""Custom stateful streaming operator: exact first-occurrence dedup with
``applyInPandasWithState`` (arbitrary stateful processing).

Composes with the membership filter: ``stream_dedup_filter`` (approximate,
stateless, zero state) in front of this exact operator shrinks the state
store to only keys the history filter *accepted* — the standard
filter-then-exact cascade, now in streaming form.

State model: one state entry per key-prefix group (``n_buckets`` groups),
each holding the set of 64-bit keys already seen in that bucket (stored as a
packed little-endian binary blob, decoded to a numpy array per micro-batch —
no per-row Python). Grouping by key prefix bounds the per-group state and
spreads it across partitions exactly like the build-side sharding.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType([StructField("seen", BinaryType(), True)])
_OUT_SCHEMA = StructType([
    StructField("key", LongType(), False),
    StructField("bucket", LongType(), False),
])


def _make_dedup_fn(retention):
    def dedup(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
              ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            (blob,) = state.get
            seen = np.frombuffer(blob, dtype=np.int64) if blob else \
                np.empty(0, dtype=np.int64)
        else:
            seen = np.empty(0, dtype=np.int64)
        out = []
        any_fresh = False
        for pdf in pdfs:
            keys = pdf["key"].to_numpy(np.int64)
            # first occurrence within the batch AND not in state
            uniq, first_idx = np.unique(keys, return_index=True)
            fresh_mask = ~np.isin(uniq, seen, assume_unique=False)
            fresh = uniq[fresh_mask]
            if fresh.size:
                any_fresh = True
                out.append(pd.DataFrame({
                    "key": fresh,
                    "bucket": np.full(fresh.size, key[0], dtype=np.int64),
                }))
                seen = np.concatenate([seen, fresh])
        # only rewrite the blob when the batch actually added keys — an
        # all-duplicate micro-batch must not pay O(|state|) store I/O
        if any_fresh or not state.exists:
            state.update((np.sort(seen).tobytes(),))
        if retention is not None:
            state.setTimeoutDuration(retention)
        if out:
            yield from out

    return dedup


def stream_exact_dedup(stream_df: DataFrame, key_col: str = "key",
                       n_buckets: int = 64,
                       retention: str | int | None = None) -> DataFrame:
    """Emit each distinct key exactly once across the whole stream
    (first occurrence wins), spread over ``n_buckets`` state entries by
    uniform hash prefix.

    State growth law: total state is 8 bytes × (distinct keys so far),
    split evenly across buckets (uniform prefixes), and a bucket's blob is
    rewritten only on micro-batches that add fresh keys to it. Size
    ``n_buckets`` ≈ expected_distinct_keys × 8B / 64MB so each entry stays
    well under the state-store value limit; for truly unbounded key streams
    set ``retention`` (processing-time TTL per bucket, e.g. ``"24 hours"``)
    to trade exactness-forever for bounded state, or put
    ``stream_dedup_filter`` in front to shrink what reaches this operator.
    At cluster scale, run on a RocksDB state store
    (``spark.sql.streaming.stateStore.providerClass``) so state spills off
    heap.
    """
    p = n_buckets.bit_length() - 1
    if 1 << p != n_buckets:
        raise ValueError("n_buckets must be a power of two")
    # NULL keys are dropped stream-side: they identify nothing, and a
    # null-bearing long batch reaches pandas as float64, corrupting every
    # 64-bit key in it
    bucketed = stream_df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.shiftrightunsigned(F.col(key_col), 64 - p).cast("long")
        .alias("bucket"))
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if retention is not None else GroupStateTimeout.NoTimeout)
    return (bucketed.groupBy("bucket")
            .applyInPandasWithState(
                _make_dedup_fn(retention), _OUT_SCHEMA, _STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))
