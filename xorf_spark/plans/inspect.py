"""Physical-plan inspection helpers: capture ``explain`` output and assert
plan properties that matter at 100 TB (pushdown reached the scan, a build has
exactly one exchange, joins broadcast where expected)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the formatted plan (counted
    from the numbered detail headers, excluding reuse)."""
    plan = explain_str(df, "formatted")
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.MULTILINE))


def assert_single_shuffle(df: DataFrame) -> None:
    """Assert the build plan has exactly one Exchange (the shard
    repartition) — regression guard against re-introducing a dedup shuffle."""
    n = count_exchanges(df)
    if n != 1:
        raise AssertionError(
            f"expected exactly 1 Exchange in the build plan, found {n}:\n"
            f"{explain_str(df, 'formatted')}")


def pushed_filters(df: DataFrame) -> str:
    """Return the PushedFilters/ReadSchema lines of the scan (empty if the
    source is not a file scan)."""
    plan = explain_str(df, "formatted")
    return "\n".join(line for line in plan.splitlines()
                     if "PushedFilters" in line or "ReadSchema" in line)
