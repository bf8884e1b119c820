"""Bucketed-table layout: the amortized co-located join.

At 100 TB a fact-fact join (lineitem ⋈ orders on the order key) shuffles
BOTH sides on every run — the single most expensive recurring cost of a
join-heavy pipeline. Writing each side once as a bucketed (+ sorted)
parquet table moves that shuffle into the write: the bucketed scan
reports ``hashpartitioning(key, n_buckets)`` as its output partitioning,
so ``EnsureRequirements`` inserts NO Exchange under every later
equi-join or aggregation keyed on the bucket columns. One write
amortizes across every downstream consumer — the classic layout
investment for tables joined daily. (A per-task Sort remains in
sort-merge joins: since SPARK-28595 the scan does not propagate
bucket-file ordering unless the legacy flag is set and every bucket is
a single file — sorting a co-located bucket is cheap; the shuffle was
the cost.)

Mechanics worth knowing at scale:

- Both join sides must agree on the bucket count for a shuffle-free
  plan (Spark ≥3.1 can coalesce mismatched counts when one divides the
  other; matching them exactly is the portable contract).
- ``bucketBy`` requires ``saveAsTable`` — bucket metadata lives in the
  session catalog, not the parquet footers. We register an EXTERNAL
  table (explicit ``path``) so no Hive metastore or warehouse dir is
  needed; the default in-memory catalog suffices.
- Each writer task emits one file per bucket it holds; repartition the
  frame by the bucket keys first (done here) so every bucket is written
  by exactly one task — otherwise tasks × buckets small files.
- A query only benefits when it keys on a PREFIX-equal set of the
  bucket columns; anything else shuffles as usual.

Reference: the reference engine is single-node and has no layout
tier — this module is part of the Spark-native scale surface
(SURVEY.md §4.2), not a ported operator.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.inspect import count_exchanges


def write_bucketed(df: DataFrame, table: str, keys: str | Sequence[str],
                   n_buckets: int, path: str, sort: bool = True,
                   mode: str = "overwrite") -> DataFrame:
    """Write ``df`` as a bucketed external parquet table and return the
    catalog-backed frame reading it.

    ``sort=True`` additionally sorts rows by ``keys`` inside each bucket
    file (run-length-friendly pages, min/max skipping); the plan-level
    Sort in a sort-merge join remains — see the module docstring.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    writer = (df.repartition(n_buckets, *[F.col(k) for k in keys])
              .write.format("parquet").mode(mode)
              .bucketBy(n_buckets, *keys))
    if sort:
        writer = writer.sortBy(*keys)
    writer.option("path", path).saveAsTable(table)
    return df.sparkSession.table(table)


def drop_bucketed(spark: SparkSession, *tables: str) -> None:
    """Drop the catalog entries (EXTERNAL tables — files are untouched)."""
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def bucketed_join(left: DataFrame, right: DataFrame,
                  on: str | Sequence[str], how: str = "inner",
                  require_shuffle_free: bool = False) -> DataFrame:
    """Equi-join two (ideally co-bucketed) frames with a sort-merge hint —
    the broadcast planner would otherwise mask the co-location on small
    inputs, making "is the layout actually shuffle-free?" untestable.

    ``require_shuffle_free=True`` raises if the planned join still
    contains an Exchange (wrong bucket counts, non-bucket join keys, a
    non-catalog frame…) instead of silently paying the shuffle — use it
    in pipelines that DEPEND on the layout, e.g. an hourly join whose SLA
    assumed no shuffle.
    """
    joined = left.hint("merge").join(right, on, how)
    if require_shuffle_free:
        n = count_exchanges(joined)
        if n:
            raise AssertionError(
                f"bucketed_join planned {n} Exchange(s); both sides must "
                "be catalog-registered tables bucketed on the join keys "
                "with equal bucket counts")
    return joined


def is_shuffle_free(df: DataFrame) -> bool:
    """True when the planned frame contains no shuffle Exchange."""
    return count_exchanges(df) == 0
