"""Catalog-aware table loading: the production input is an Iceberg table of
pre-tokenized sequences (north star: ``(doc_id, tokens, n_tok, source)`` at
~10^12 rows); this sandbox has no Iceberg runtime jars (verified — no
``iceberg-spark-runtime`` in pyspark/jars), so tests and benchmarks read the
driver-generated parquet. ``load_table`` gives callers one entry point that
does the right thing in both worlds:

- ``"catalog.db.tbl"``        → ``spark.read.table`` (Iceberg/Hive/Unity —
  any configured catalog; predicate pushdown, partition pruning, and hidden
  partitioning all come from the catalog's DataSourceV2 implementation);
- ``"/path/dir_or_file"``     → parquet scan of the path.

Iceberg-specific reads (time travel, incremental) pass straight through as
DataFrameReader options when the runtime is present — they are plain
``option()`` calls, nothing here needs the Iceberg API at import time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True if the Iceberg Spark runtime is on the JVM classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions")
        return True
    except Exception:
        return False


def load_table(spark: SparkSession, ref: str,
               snapshot_id: int | None = None,
               as_of_timestamp: int | None = None) -> DataFrame:
    """Load a table by catalog name or filesystem path.

    ``snapshot_id`` / ``as_of_timestamp`` (epoch millis) request Iceberg
    time travel; they require a catalog table ref and the Iceberg runtime,
    and raise a clear error otherwise rather than silently reading HEAD.
    """
    is_path = ref.startswith("/") or ref.startswith("file:") or \
        ref.endswith(".parquet")
    if snapshot_id is not None or as_of_timestamp is not None:
        if is_path:
            raise ValueError(
                "time travel needs a catalog table ref, not a parquet path")
        if not iceberg_available(spark):
            raise RuntimeError(
                "snapshot_id/as_of_timestamp require the Iceberg Spark "
                "runtime on the classpath (absent in this sandbox)")
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", str(as_of_timestamp))
        return reader.table(ref)
    if is_path:
        return spark.read.parquet(ref)
    return spark.read.table(ref)
