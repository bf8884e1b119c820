"""Streaming filter maintenance: keep a queryable membership filter of
every key the stream has ever delivered, refreshed per micro-batch group
via ``foreachBatch`` — the streaming completion of the batch build
(reference semantics: a filter is built once over a key set; a stream's
key set only grows, so the operator periodically rebuilds over the
accumulated distinct keys).

Layout under ``table_path``::

    keys/                  append-only distinct-per-batch key log (parquet)
    v3/, v7/, ...          immutable shard tables (one per refresh;
                           version = the batch id that triggered it)
    _LATEST                text file holding the current version dir name

The swap is ATOMIC at the pointer level: a new version directory is fully
written by the checkpoint-resumable builder before ``_LATEST`` is
rewritten, so a reader loading via :func:`load_latest_filter_table`
always sees a complete table — either the old or the new version, never
a half-built one. Old versions are pruned after the pointer moves
(keep the newest ``keep_versions``).

Scale notes: the key log is distinct-per-batch only (exact global
distinct happens in the builder's single shuffle), appends are pure JVM
parquet writes, and each rebuild is the staged production build when
``stage_dir`` is passed. Rebuild cost grows with total distinct keys —
choose ``refresh_every`` so rebuild time amortizes over the interval, or
route keys through per-window filters if the universe is unbounded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dataflow import FilterTable, build_filter_table


def _fs(table_path: str):
    """(filesystem, base_path) via pyarrow.fs — local paths AND object
    stores (s3://, hdfs://). All pointer/prune I/O here runs on the
    DRIVER (foreachBatch callbacks execute driver-side), so no worker
    needs filesystem credentials beyond what the writes already use."""
    from pyarrow import fs as pafs

    fsys, base = pafs.FileSystem.from_uri(table_path)
    return fsys, base.rstrip("/")


def _pointer_path(base: str) -> str:
    return f"{base}/_LATEST"


def latest_version(table_path: str) -> str | None:
    """Current version directory name (e.g. ``"v7"``), or None before the
    first refresh."""
    fsys, base = _fs(table_path)
    try:
        with fsys.open_input_stream(_pointer_path(base)) as fh:
            return fh.read().decode().strip() or None
    except (FileNotFoundError, OSError):
        return None


def load_latest_filter_table(spark: SparkSession, table_path: str,
                             **kw) -> FilterTable:
    """Load the newest complete filter table under ``table_path``."""
    v = latest_version(table_path)
    if v is None:
        raise FileNotFoundError(
            f"no completed filter version under {table_path} "
            f"(stream not refreshed yet)")
    shard_df = spark.read.parquet(os.path.join(table_path, v))
    return FilterTable.from_df(shard_df, **kw)


def stream_filter_refresh(stream_df: DataFrame, table_path: str,
                          key_col: str = "key", kind: str = "bfuse8",
                          n_shards: int = 16, refresh_every: int = 1,
                          stage_dir: str | None = None,
                          keep_versions: int = 2):
    """``writeStream``-able sink maintaining the ever-seen-keys filter.

    Returns a ``DataStreamWriter`` (caller adds ``.option("checkpoint..")``
    / ``.start()``). Each micro-batch appends its distinct non-null keys
    to the key log; every ``refresh_every`` batches the whole log is
    rebuilt into a fresh immutable version directory and ``_LATEST`` is
    swapped. Query the current filter any time with
    :func:`load_latest_filter_table` — zero false negatives over every
    key delivered up to the last refresh (the filter contract).
    """
    keys_path = os.path.join(table_path, "keys")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        (batch_df.select(F.col(key_col).alias("key"))
         .where(F.col(key_col).isNotNull()).distinct()
         .write.mode("append")
         .option("compression", "none")
         .option("parquet.enable.dictionary", "false")
         .parquet(keys_path))
        if batch_id % refresh_every != refresh_every - 1:
            return
        version = f"v{batch_id}"
        all_keys = spark.read.parquet(keys_path)
        build_filter_table(
            all_keys, os.path.join(table_path, version), kind=kind,
            n_shards=n_shards, key_col="key",
            stage_dir=(os.path.join(stage_dir, version)
                       if stage_dir else None))
        # pointer swap AFTER the version is fully committed: readers see
        # old-or-new, never half-built. A whole-object overwrite of the
        # tiny pointer is the atomic unit on both POSIX (single write)
        # and object stores (PUT replaces atomically).
        fsys, base = _fs(table_path)
        with fsys.open_output_stream(_pointer_path(base)) as fh:
            fh.write(version.encode())
        # prune superseded versions (pointer already moved)
        import re

        from pyarrow import fs as pafs
        vs = sorted(
            (info.base_name for info in fsys.get_file_info(
                pafs.FileSelector(base))
             if info.type == pafs.FileType.Directory
             and re.fullmatch(r"v\d+", info.base_name)),
            key=lambda d: int(d[1:]))
        for stale in vs[:-keep_versions]:
            fsys.delete_dir_contents(f"{base}/{stale}")
            fsys.delete_dir(f"{base}/{stale}")

    return stream_df.writeStream.foreachBatch(process).outputMode("update")
