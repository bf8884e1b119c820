import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def _distinct_u64(n: int, seed: int) -> np.ndarray:
    """Exactly n distinct uniform u64 keys (mirrors reference test fixtures,
    e.g. src/xor8.rs:118-129, but guaranteed distinct per src/lib.rs:42-44)."""
    rng = np.random.default_rng(seed)
    keys = np.unique(rng.integers(0, 2**64, int(n * 1.01) + 16, dtype=np.uint64))
    assert keys.size >= n
    return keys[:n]


@pytest.fixture(scope="session")
def keys_1m() -> np.ndarray:
    return _distinct_u64(1_000_000, seed=7)


@pytest.fixture(scope="session")
def probes_1m(keys_1m) -> np.ndarray:
    rng = np.random.default_rng(8)
    fresh = rng.integers(0, 2**64, 1_100_000, dtype=np.uint64)
    fresh = np.setdiff1d(fresh, keys_1m)[:1_000_000]
    assert fresh.size == 1_000_000
    return fresh


@pytest.fixture(scope="session")
def spark():
    """local[*] session shared by all Spark tests."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("xorf-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.path.join(SF_ROOT, "sf0.001")
