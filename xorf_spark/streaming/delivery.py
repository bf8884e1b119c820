"""Streaming training-shard delivery: append curated rows to a sharded
parquet delivery with exactly-once manifest accounting.

Composes the batch sink (`operators/sink.py`) with the crash-safety
patterns of `filter_refresh`:

- Every micro-batch lands in its OWN immutable directory
  ``batches/b{batch_id}/__xorf_shard=N/`` — a replayed batch overwrites
  its own directory (idempotent by construction) instead of appending
  duplicates into shared shard files.
- The manifest is updated only AFTER the batch directory is fully
  written, via temp-file + atomic rename; it records the committed batch
  ids, so a replay of an already-committed batch is a no-op and a crash
  between data-write and manifest-write is healed by the replay
  (overwrite same dir, then commit the manifest).
- Per-shard totals merge associatively (``rows`` add, ``xor64`` XORs —
  the same order-independent checksum as the batch sink), so the
  manifest never needs to re-read earlier batches.

``n_shards`` is FIXED for the delivery's lifetime (streaming cannot know
the final row count; a stable assignment is also what makes downstream
``diff_training_shards``-style incremental consumers possible).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sink import (_SHARD_COL, _fs, _hash_sql, _per_shard_totals,
                              _row_hash)

MANIFEST_NAME = "_MANIFEST.json"


def _manifest_path(base: str) -> str:
    return f"{base}/{MANIFEST_NAME}"


def read_stream_manifest(path: str) -> dict | None:
    from pyarrow import fs as pafs

    fsys, base = _fs(path)
    info = fsys.get_file_info(_manifest_path(base))
    if info.type == pafs.FileType.NotFound:
        return None
    with fsys.open_input_stream(_manifest_path(base)) as fh:
        return json.loads(fh.read().decode("utf-8"))


def _write_manifest_atomic(path: str, manifest: dict, tag) -> None:
    fsys, base = _fs(path)
    tmp = _manifest_path(base) + f".tmp-{tag}"
    with fsys.open_output_stream(tmp) as fh:
        fh.write(json.dumps(manifest, indent=1, sort_keys=True)
                 .encode("utf-8"))
    fsys.move(tmp, _manifest_path(base))


def make_batch_processor(path: str, n_shards: int, columns: list[str],
                         key_col: str | None = None, seed: int = 17):
    """The ``foreachBatch`` callback, exposed for direct driving (replay
    tests, manual backfills of a specific batch id)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        manifest = read_stream_manifest(path)
        if manifest is None:
            manifest = {"n_rows": 0, "n_shards": int(n_shards),
                        "seed": int(seed), "key_col": key_col,
                        "columns": columns, "batches": [], "shards": {}}
        if batch_id in manifest["batches"]:
            return  # replay of a fully-committed batch: no-op
        key = (F.xxhash64(F.col(key_col), F.lit(seed)) if key_col
               else _row_hash(batch_df, seed))
        sharded = batch_df.withColumn(
            _SHARD_COL, F.pmod(key, F.lit(int(n_shards))))
        # immutable per-batch dir; overwrite heals a crashed replay
        batch_dir = f"{path}/batches/b{batch_id}"
        (sharded.repartition(int(n_shards), _SHARD_COL)
         .write.mode("overwrite")
         .partitionBy(_SHARD_COL)
         .parquet(batch_dir))
        # totals from the WRITTEN files (same contract as the batch sink:
        # the manifest certifies the delivered bytes). An EMPTY batch
        # writes no partition dirs, so schema inference fails with
        # AnalysisException — the only error accepted, and only after
        # confirming the batch really was empty; a transient FS error
        # must propagate (the bug class of r3 verdict finding #1).
        from pyspark.errors import AnalysisException
        try:
            back = (batch_df.sparkSession.read.parquet(batch_dir)
                    .select(*columns, _SHARD_COL))
            per = _per_shard_totals(back, columns, seed)
        except AnalysisException:
            if not batch_df.isEmpty():
                raise
            per = {}
        for s, (rows, xor64) in per.items():
            cur = manifest["shards"].get(s, {"rows": 0, "xor64": 0})
            manifest["shards"][s] = {"rows": cur["rows"] + rows,
                                     "xor64": cur["xor64"] ^ xor64}
            manifest["n_rows"] += rows
        manifest["batches"] = sorted(manifest["batches"] + [batch_id])
        _write_manifest_atomic(path, manifest, batch_id)

    return process


def stream_training_shards(stream_df: DataFrame, path: str, n_shards: int,
                           key_col: str | None = None, seed: int = 17):
    """``writeStream``-ready sink: call ``.start()`` (or trigger
    ``availableNow``) on the returned writer. Columns are fixed at wiring
    time from the stream schema."""
    process = make_batch_processor(path, n_shards, list(stream_df.columns),
                                   key_col=key_col, seed=seed)
    return stream_df.writeStream.foreachBatch(process).outputMode("append")


def verify_streamed_delivery(spark: SparkSession, path: str) -> dict:
    """Re-aggregate the COMMITTED batch dirs and compare against the
    manifest (uncommitted batch dirs — a crash between data write and
    manifest commit — are ignored, exactly as the replay will overwrite
    them)."""
    manifest = read_stream_manifest(path)
    if manifest is None:
        return {"ok": False, "mismatched_shards": ["<no manifest>"],
                "manifest": None}
    if not manifest["batches"]:
        return {"ok": not manifest["shards"], "mismatched_shards": [],
                "manifest": manifest}
    from functools import reduce

    # one read per committed batch dir (each infers its own shard
    # partition column) — a glob with basePath would trip partition
    # discovery over the non-key-value `b{N}` level
    parts = [spark.read.parquet(f"{path}/batches/b{b}")
             .select(*manifest["columns"], _SHARD_COL)
             for b in manifest["batches"]]
    df = reduce(DataFrame.unionByName, parts)
    per = {str(int(r[_SHARD_COL])): (int(r["rows"]), int(r["xor64"] or 0))
           for r in (df.groupBy(_SHARD_COL)
                     .agg(F.count(F.lit(1)).alias("rows"),
                          F.expr(f"bit_xor({_hash_sql(df.drop(_SHARD_COL), manifest['seed'])})")
                          .alias("xor64"))
                     .collect())}
    want = {s: (m["rows"], m["xor64"])
            for s, m in manifest["shards"].items()}
    bad = sorted({s for s in set(per) | set(want)
                  if per.get(s) != want.get(s)}, key=int)
    return {"ok": not bad, "mismatched_shards": bad, "manifest": manifest}
