"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship filter-semi-join on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data pipeline operators, backed by
``xorf_spark.queries.registry()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from xorf_spark import queries as Q  # noqa: E402

from xorf_spark.dataflow import ship_package as _ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BinaryFuse8 membership
    semi-join (filter pre-pass + exact backstop) of lineitem against
    high-value orders, aggregated per return flag."""
    _ship_package(spark)
    return Q.q_bfuse8_semijoin(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, (fn, _sql) in Q.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in Q.registry().items()
            if sql is not None}
