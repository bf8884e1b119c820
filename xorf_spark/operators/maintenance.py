"""Table maintenance: small-files compaction.

Small files are the silent killer of 100 TB parquet tables: driver-side
listing blows up, every file costs an open/footer round-trip, and tiny row
groups gut min/max pruning and vectorized scan efficiency. Streaming
sinks, per-shard writers (this repo's own staged build included) and
incremental appends all produce them.

``compact_parquet`` rewrites a fragmented dataset into ~``target_file_mb``
files, sized from the dataset's REAL on-disk bytes (Hadoop
``ContentSummary``, so it works on HDFS/S3A exactly like on local disk):

- unsorted: ``coalesce(n)`` when shrinking the file count — a narrow
  dependency that avoids a shuffle entirely; ``repartition(n)`` only when
  the dataset must grow its parallelism;
- ``sort_cols``: ``repartitionByRange + sortWithinPartitions`` so every
  output file covers a tight key range — min/max footer stats then let
  later scans prune whole files (the poor man's Z-order for one key).

Rows are preserved exactly (asserted in tests); the operation is a pure
rewrite into ``dst`` — callers swap directories atomically themselves
(rename/catalog pointer), which is the same contract Iceberg's
rewrite-data-files action exposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """On-disk byte size of a dataset directory via the Hadoop FS API
    (portable across file://, hdfs://, s3a://)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return int(fs.getContentSummary(hpath).getLength())


def plan_file_count(total_bytes: int, target_file_mb: int = 256) -> int:
    """Output file count for a compaction: ceil(bytes / target), ≥ 1."""
    target = max(int(target_file_mb), 1) << 20
    return max(1, -(-int(total_bytes) // target))


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_file_mb: int = 256,
                    sort_cols: list[str] | None = None) -> dict:
    """Rewrite the parquet dataset at ``src`` into ``dst`` with
    ~``target_file_mb`` output files. Returns a metrics dict
    ``{files_before, files_after, bytes, n_files_planned}``."""
    df = spark.read.parquet(src)
    files_before = len(df.inputFiles())
    n_files = plan_file_count(dataset_bytes(spark, src), target_file_mb)
    if sort_cols:
        out: DataFrame = (df.repartitionByRange(n_files, *sort_cols)
                          .sortWithinPartitions(*sort_cols))
    elif n_files < df.rdd.getNumPartitions():
        out = df.coalesce(n_files)     # narrow — no shuffle
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    files_after = len(spark.read.parquet(dst).inputFiles())
    return {"files_before": files_before, "files_after": files_after,
            "bytes": dataset_bytes(spark, dst),
            "n_files_planned": n_files}
