"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def reserve_temp_cols(df: DataFrame, *names: str) -> None:
    """Fail loudly when a caller frame already carries one of the
    operator's internal temp column names.

    Operators project scratch columns (``__sh``, ``__w``, …) onto the
    caller's frame and drop them on the way out; a pre-existing column
    with the same name would be silently overwritten AND removed from
    the output (r4 review finding). The ``__``-prefixed namespace is
    therefore reserved — rename the conflicting input column.
    """
    hit = [n for n in names if n in df.columns]
    if hit:
        raise ValueError(
            f"input frame carries reserved temp column(s) {hit}: the "
            f"'__'-prefixed namespace is operator scratch (it would be "
            f"overwritten and dropped) — rename the column(s) first")
