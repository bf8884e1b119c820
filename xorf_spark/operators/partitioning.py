"""Sketch-driven range partitioning: quantile boundaries from a mergeable
quantile sketch (KLL / t-digest), then bucket assignment + physical
repartitioning by value range.

Why not just ``df.repartitionByRange``? Spark's native range partitioner
re-samples per job, so two jobs (or a job and its restart) see *different*
boundaries. Boundaries derived from a mergeable sketch are

- deterministic for a given input (KLL's compaction coin is the seeded
  splitmix64 schedule, t-digest is deterministic),
- persistable (the sketch bytes ride a parquet row) and mergeable across
  tables/days — N jobs can share ONE partitioning, making range-bucketed
  joins co-partitioned with no re-shuffle,
- cheap at 100 TB: one shuffle-free ``sketch_agg`` pass (KB-sized partials)
  instead of a sample collect per consumer job.

Bucket assignment = ``searchsorted(bounds, v, side="right")``: bucket 0 is
``v < bounds[0]``, bucket len(bounds) is ``v >= bounds[-1]``, NULLs and
NaNs go to bucket -1 (SQL nulls-first convention; a NaN has no place on
the real line). Two equivalent implementations:
a Catalyst fold over a literal boundary array (whole-stage codegen, O(B)
per row — right answer for B ≤ a few hundred) and a broadcast pandas UDF
doing vectorized binary search (O(log B), for wide bucket counts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sketches import sketch_agg

#: switch from the Catalyst fold to the pandas binary-search UDF above this
#: boundary count (fold is O(B) per row but codegen'd; measured crossover
#: is a few hundred)
CATALYST_MAX_BOUNDS = 256


def quantile_boundaries(df: DataFrame, col: str, n_buckets: int,
                        kind: str = "kll",
                        params: dict | None = None) -> list[float]:
    """Boundary values splitting ``col`` into ``n_buckets`` near-equal-mass
    ranges, from one shuffle-free sketch pass. Returns ≤ n_buckets - 1
    strictly increasing floats (duplicates from heavy ties are collapsed,
    so extreme skew yields fewer, fatter buckets rather than empty ones).

    With KLL(k=400) each bucket's true mass is within 1/n_buckets ± 2·0.025
    (rank error on both edges); t-digest (delta=300) is tighter in the
    tails."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if kind not in ("kll", "tdigest"):
        raise ValueError("quantile boundaries need a valued sketch "
                         "(kll | tdigest)")
    params = params or ({"k": 400} if kind == "kll" else {"delta": 300})
    vals = df.select(F.col(col).cast("double").alias("v"))
    sk = sketch_agg(vals, "v", kind, params)
    if sk.n == 0:
        return []
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = np.unique(np.asarray(sk.quantiles(qs), dtype=np.float64))
    return [float(b) for b in bounds]


def bucket_expr(col: str, bounds: list[float]) -> Column:
    """Catalyst bucket assignment: count of boundaries ≤ value (== numpy
    ``searchsorted(side="right")``), NULL and NaN → -1 (a NaN has no
    place on the real line; Spark's comparison semantics would otherwise
    rank it above every bound while the UDF path cannot even distinguish
    it from NULL — both paths agree on -1 instead). Pure
    whole-stage-codegen fold over a literal array — no python in the row
    path."""
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    v = F.col(col).cast("double")
    counted = F.aggregate(
        arr, F.lit(0),
        lambda acc, b: acc + F.when(v >= b, 1).otherwise(0))
    return (F.when(v.isNull() | F.isnan(v), F.lit(-1))
            .otherwise(counted).cast("int"))


def bucket_udf(spark: SparkSession, bounds: list[float]):
    """Broadcast + vectorized binary-search bucket assignment for wide
    boundary lists (O(log B) per row, Arrow-batched), NULL and NaN → -1
    (matching ``bucket_expr`` — the pandas boundary conflates the two
    anyway)."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(
        np.asarray(bounds, dtype=np.float64))

    @pandas_udf("int")
    def _bucket(v: pd.Series) -> pd.Series:
        arr = v.to_numpy(np.float64, na_value=np.nan)
        out = np.searchsorted(bc.value, arr, side="right").astype(np.int32)
        mask = np.isnan(arr)
        if not mask.any():
            return pd.Series(out)
        res = pd.Series(out, dtype="Int32")
        res[mask] = -1
        return res

    return _bucket


def with_range_bucket(df: DataFrame, col: str, bounds: list[float],
                      bucket_col: str = "bucket") -> DataFrame:
    """Append the range-bucket id column, picking the Catalyst fold or the
    binary-search UDF by boundary count."""
    if len(bounds) <= CATALYST_MAX_BOUNDS:
        b = bucket_expr(col, bounds)
    else:
        b = bucket_udf(df.sparkSession, bounds)(F.col(col).cast("double"))
    return df.withColumn(bucket_col, b)


def repartition_by_quantiles(df: DataFrame, col: str, n_buckets: int,
                             bounds: list[float] | None = None,
                             kind: str = "kll",
                             params: dict | None = None,
                             bucket_col: str = "bucket") -> DataFrame:
    """Physically range-partition ``df`` on ``col`` into near-equal-mass
    buckets: sketch boundaries (unless given), assign bucket ids, then
    ``repartitionByRange`` on the int id — output partitions hold
    contiguous, non-overlapping bucket ranges (≈1:1 when masses are
    balanced; Spark's range partitioner samples the id column, so exact
    1:1 is not contractual), which is what sorted writes and co-range
    work need. Pass the ``bounds`` from one table to partition another
    identically — that cross-table determinism is what the native
    sampling-based ``repartitionByRange(col)`` cannot give."""
    if bounds is None:
        bounds = quantile_boundaries(df, col, n_buckets, kind, params)
    out = with_range_bucket(df, col, bounds, bucket_col)
    return out.repartitionByRange(max(len(bounds) + 1, 1),
                                  F.col(bucket_col))
