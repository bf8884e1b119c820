"""Filter-quality analysis: fingerprint zero-density.

Port of the reference's analysis tooling (analysis/src/zeroes.rs:15-39 +
analysis/plot_zeroes): sliding-window density of zero fingerprints across the
array. Uniformly-random-looking fingerprints (low, flat zero density ≈ 1/2^w
for width w) indicate a healthy build; spikes reveal clustering. Runs
distributed over the shard table (one Arrow batch per shard row).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_FP_DTYPES = {"8": np.uint8, "16": np.uint16, "32": np.uint32}

ZERO_DENSITY_SCHEMA = ("shard_id int, kind string, num_slots long, "
                       "n_zero long, zero_frac double, "
                       "win_zero_min double, win_zero_max double")


def fingerprint_zero_density(shard_df: DataFrame,
                             window: int = 4096) -> DataFrame:
    """Per-shard zero-fingerprint statistics: global zero fraction and the
    min/max zero fraction over sliding windows of ``window`` slots
    (stride = window; mirrors the reference's windowed scan)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                width = "".join(ch for ch in row["kind"] if ch.isdigit())
                fps = np.frombuffer(row["fingerprints"],
                                    dtype=_FP_DTYPES[width])
                zeros = fps == 0
                n = fps.size
                if n == 0:
                    continue
                w = min(window, n)
                n_win = n // w
                trimmed = zeros[: n_win * w].reshape(n_win, w)
                frac = trimmed.mean(axis=1)
                out.append({
                    "shard_id": int(row["shard_id"]),
                    "kind": row["kind"],
                    "num_slots": int(n),
                    "n_zero": int(zeros.sum()),
                    "zero_frac": float(zeros.mean()),
                    "win_zero_min": float(frac.min()),
                    "win_zero_max": float(frac.max()),
                })
            yield pd.DataFrame(out, columns=[
                "shard_id", "kind", "num_slots", "n_zero", "zero_frac",
                "win_zero_min", "win_zero_max"])

    return (shard_df.select("shard_id", "kind", "fingerprints")
            .mapInPandas(run, ZERO_DENSITY_SCHEMA))
