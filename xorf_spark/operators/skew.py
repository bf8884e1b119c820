"""Explicit skew handling: salted exact aggregation and salted hot-key
joins.

The north rule calls for partitioning / shuffle / skew handled explicitly.
The build dataflow already defuses doc-length/source skew with hash-prefix
sharding, and the LSH/ngram paths cap hot buckets; these two operators are
the reusable versions of the remaining classic skew patterns:

- ``salted_distinct_count`` — COUNT(DISTINCT x) GROUP BY k is the one
  common aggregate Spark's map-side partial aggregation does NOT fix: all
  distinct values of a hot group funnel into one reduce task's hash set.
  Salting by ``hash(x) % n_salt`` splits that set into n_salt disjoint
  slices (each distinct value lands in exactly ONE slice, so summing slice
  counts is exact) built on n_salt tasks in parallel.

- ``salted_join`` — a hot join key sends every matching row to one reduce
  task. Replicating the (smaller) right side ``n_salt``× and scattering
  left rows across salts spreads the hot key over n_salt tasks. Exact for
  inner/left/left-semi joins (an unmatched left row still appears exactly
  once; right rows match only the salt slice a left row carries). Spark's
  AQE skew-join split handles sort-merge cases adaptively; explicit
  salting also covers broadcast-ineligible hot keys and gives a
  deterministic plan shape.

Both are pure Catalyst (no python in the row path) and their results are
bit-identical to the unsalted equivalents — asserted by the oracle query
and tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(df: DataFrame, group_cols: list[str], col: str,
                          n_salt: int = 64,
                          out_col: str | None = None) -> DataFrame:
    """Exact distinct count per group, hot-group-proof: two-level
    aggregation salted by ``xxhash64(col) % n_salt``."""
    out_col = out_col or f"n_distinct_{col}"
    salt = F.pmod(F.xxhash64(col), F.lit(n_salt))
    sliced = (df.groupBy(*group_cols, salt.alias("__salt"))
              .agg(F.countDistinct(col).alias("__slice")))
    return (sliced.groupBy(*group_cols)
            .agg(F.sum("__slice").cast("long").alias(out_col)))


def salted_join(left: DataFrame, right: DataFrame, on: str | list[str],
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the right side replicated ``n_salt``× and left rows
    scattered across salts — a hot key spreads over n_salt reduce tasks.
    Right side grows n_salt×, so use on a dimension-sized right and only
    when the key histogram is hot enough to beat AQE's own skew split."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            "salted_join is exact only for inner/left-type joins; "
            f"got how={how!r} (right rows are replicated n_salt times)")
    keys = [on] if isinstance(on, str) else list(on)
    r = right.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("__salt"))
    l = left.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int"))
    return l.join(r, keys + ["__salt"], how).drop("__salt")
