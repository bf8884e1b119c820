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
rewritten (written to a temp name then renamed — a single rename on
POSIX; on object stores the final PUT replaces the object atomically),
so a reader loading via :func:`load_latest_filter_table` always sees a
complete table — either the old or the new version, never a half-built
or half-written one. Pruning keeps the version the pointer names plus
its predecessor, never trusting version-number ordering (batch ids
restart at 0 after a checkpoint reset).

Scale notes: the key log holds per-batch-distinct rows, so it grows with
total delivered (not distinct) keys across batches; the rebuild runs one
global ``distinct()`` so the FILTER is always sized by true distinct
keys. For streams that re-deliver heavily, compact the log offline
(rewrite ``keys/`` from any version's key set) — the immutable versions
are never invalidated by log maintenance. Each rebuild is the staged
production build when ``stage_dir`` is passed; its per-version spill is
deleted after the build.
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
    first refresh. Real I/O errors (auth, network) propagate — only
    not-found means "no version yet"."""
    fsys, base = _fs(table_path)
    try:
        with fsys.open_input_stream(_pointer_path(base)) as fh:
            return fh.read().decode().strip() or None
    except FileNotFoundError:
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
                          stage_dir: str | None = None):
    """``writeStream``-able sink maintaining the ever-seen-keys filter.

    Returns a ``DataStreamWriter`` (caller adds ``.option("checkpoint..")``
    / ``.start()``). Each micro-batch appends its distinct non-null keys
    to the key log; every ``refresh_every`` batches the whole log is
    globally de-duplicated and rebuilt into a fresh immutable version
    directory, then ``_LATEST`` is swapped. Query the current filter any
    time with :func:`load_latest_filter_table` — zero false negatives
    over every key delivered up to the last refresh (the filter
    contract). The current version and its predecessor are retained;
    older version dirs (and the build's staging spill) are deleted.
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
        # global distinct: per-batch distinct still re-delivers keys
        # across batches, and the builder sizes arrays by RAW row count —
        # without this the filter would grow with total delivered keys
        all_keys = spark.read.parquet(keys_path).distinct()
        version_stage = (os.path.join(stage_dir, version)
                         if stage_dir else None)
        build_filter_table(
            all_keys, os.path.join(table_path, version), kind=kind,
            n_shards=n_shards, key_col="key", stage_dir=version_stage)
        if version_stage is not None:
            sfs, sbase = _fs(version_stage)
            sfs.delete_dir(sbase)
        # pointer swap AFTER the version is fully committed: write to a
        # temp name, then rename over _LATEST — a single atomic rename on
        # POSIX (open_output_stream on the final path would truncate
        # in place, leaving a window where readers see an empty pointer);
        # on object stores the copy's PUT replaces atomically.
        prev = latest_version(table_path)
        fsys, base = _fs(table_path)
        tmp = _pointer_path(base) + f".tmp-{batch_id}"
        with fsys.open_output_stream(tmp) as fh:
            fh.write(version.encode())
        fsys.move(tmp, _pointer_path(base))
        # prune: keep the version the pointer NAMES plus its predecessor.
        # Never trust version-number ordering — after a checkpoint reset
        # batch ids restart at 0, and "keep the numerically largest"
        # would delete the dir _LATEST was just pointed at.
        import re

        from pyarrow import fs as pafs
        keep = {version, prev}
        for info in fsys.get_file_info(pafs.FileSelector(base)):
            name = info.base_name
            if (info.type == pafs.FileType.Directory
                    and re.fullmatch(r"v\d+", name) and name not in keep):
                fsys.delete_dir(f"{base}/{name}")

    return stream_df.writeStream.foreachBatch(process).outputMode("update")
