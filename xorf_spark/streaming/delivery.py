"""Streaming training-shard delivery: append curated rows to a sharded
parquet delivery with exactly-once manifest accounting.

Composes the batch sink (`operators/sink.py`) with the crash-safety
patterns of `filter_refresh`:

- Every micro-batch lands in its OWN immutable directory
  ``batches/<dir>/__xorf_shard=N/`` — a replayed batch overwrites
  its own directory (idempotent by construction) instead of appending
  duplicates into shared shard files.
- The manifest is updated only AFTER the batch directory is fully
  written, via temp-file + atomic rename; it records the committed
  batches, so a replay of an already-committed batch is a no-op and a
  crash between data-write and manifest-write is healed by the replay
  (overwrite same dir, then commit the manifest).
- Per-shard totals merge associatively (``rows`` add, ``sum64`` adds
  mod 2**64 — the same order-independent multiset checksum as the batch
  sink; see sink.py for why a hash SUM and not a bit-XOR), so the
  manifest never needs to re-read earlier batches.

Batch ids are only unique WITHIN one checkpoint lineage: a stream
restarted with a fresh (or lost) checkpoint replays ids from 0 with NEW
data. Keying the replay guard on the bare batch id would silently drop
that data (the same stale-identity bug class as filter_refresh's version
names, r3 advice #1). The guard therefore stores a content fingerprint
(row count + order-independent sum64) per committed batch and a manifest
``generation``: a batch id that is already committed *with the same
fingerprint* is a genuine replay (no-op); the same id with a DIFFERENT
fingerprint is a new checkpoint lineage — the generation is bumped and
the new lineage's batches land in fresh ``b{id}g{gen}`` directories,
appending to the delivery instead of vanishing. (Identical content
re-delivered from a fresh checkpoint is indistinguishable from a replay
and treated as one — which is also the correct dedup outcome. The
fingerprint is a SUM of row hashes mod 2**64, not a bit-XOR: XOR folds
every even-multiplicity row to 0, so two entirely different
duplicate-pair batches would share fingerprint (2N, 0) and the second
lineage's data would be silently dropped — duplicate-heavy pre-dedup
streams hit that naturally, not adversarially. Under the sum only the
2^-64 accidental collision remains.)

``n_shards`` is FIXED for the delivery's lifetime (streaming cannot know
the final row count; a stable assignment is also what makes downstream
``diff_training_shards``-style incremental consumers possible).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sink import (MANIFEST_NAME, _SHARD_COL, _combine64, _fs,
                              _move_replace, _per_shard_totals,
                              _read_with_fallback, _row_hash, _sum_aggs)

#: streaming-manifest format version. 2 = dict batch entries with
#: (generation, fingerprint) replay guards and sum-mod-2**64 shard
#: checksums. The pre-r4 layout (bare-int batch ids, bit-XOR ``xor64``
#: shard checksums) carried no version field; it is detected by shape.
STREAM_MANIFEST_FORMAT = 2


def _manifest_path(base: str) -> str:
    return f"{base}/{MANIFEST_NAME}"


def _check_manifest_format(manifest: dict, path: str) -> dict:
    """Loud, actionable refusal on a manifest this code cannot extend —
    instead of the opaque TypeError/KeyError a shape mismatch would
    produce deep inside replay accounting (r4 advice #3)."""
    # every manifest this code writes carries "format" from birth, so a
    # missing key IS the legacy layout — shape detection alone misses an
    # EMPTY pre-v2 manifest (no batches / no xor64 shard entries), which
    # would otherwise be silently adopted and extended in place as v2
    legacy = ("format" not in manifest
              or any(not isinstance(b, dict)
                     for b in manifest.get("batches", []))
              or any(isinstance(s, dict) and "xor64" in s
                     for s in manifest.get("shards", {}).values()))
    if legacy:
        raise ValueError(
            f"delivery manifest at {path!r} uses the legacy pre-v2 layout "
            f"(bare-int batch entries / xor64 shard checksums); its replay "
            f"guards are incompatible with this version — re-deliver to a "
            f"fresh path (or verify the old delivery with the code that "
            f"wrote it)")
    fmt = int(manifest["format"])
    if fmt != STREAM_MANIFEST_FORMAT:
        raise ValueError(
            f"delivery manifest at {path!r} has format {fmt}; this build "
            f"reads format {STREAM_MANIFEST_FORMAT} — upgrade the library "
            f"or re-deliver to a fresh path")
    return manifest


def read_stream_manifest(path: str) -> dict | None:
    fsys, base = _fs(path)
    # fallback covers the rename-aside window of a crashed manifest swap
    # on rename-refusing filesystems (see sink._move_replace): the aside
    # copy is the previous committed manifest, which the replay then
    # extends — committed batches are never orphaned
    raw = _read_with_fallback(fsys, _manifest_path(base))
    if raw is None:
        return None
    return _check_manifest_format(json.loads(raw.decode("utf-8")), path)


def _write_manifest_atomic(path: str, manifest: dict, tag) -> None:
    fsys, base = _fs(path)
    tmp = _manifest_path(base) + f".tmp-{tag}"
    with fsys.open_output_stream(tmp) as fh:
        fh.write(json.dumps(manifest, indent=1, sort_keys=True)
                 .encode("utf-8"))
    # replace-aware: HDFS rename refuses an existing destination, which
    # would crash every manifest update after the first
    _move_replace(fsys, tmp, _manifest_path(base))


def _frame_fingerprint(df: DataFrame, columns: list[str],
                       seed: int) -> tuple[int, int]:
    """(row count, order-independent sum64 over all rows) — one
    partial-agg pass; equals the mod-2**64 sum of the per-shard totals."""
    d = df.select(*columns)
    r = d.agg(F.count(F.lit(1)).alias("rows"),
              *_sum_aggs(d, seed)).collect()[0]
    return int(r["rows"]), _combine64(r["__sum_hi"], r["__sum_lo"])


def make_batch_processor(path: str, n_shards: int, columns: list[str],
                         key_col: str | None = None, seed: int = 17,
                         key_def: str | None = None):
    """The ``foreachBatch`` callback, exposed for direct driving (replay
    tests, manual backfills of a specific batch id).

    ``key_def`` names the upstream DERIVATION of the delivered rows (e.g.
    a shingle/key-definition tag) — the same resume-under-changed-
    derivation guard as ``build_filter_table`` (r4 verdict item 8): a
    restarted stream whose upstream definition changed would otherwise
    silently append rows of a different universe to the same delivery.
    Stamped into the manifest and checked with the other wiring args."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators._util import reserve_temp_cols

        # a stream re-ingesting a prior delivery without dropping the
        # partition column would have its '__xorf_shard' silently
        # overwritten by the new assignment — and the manifest checksums
        # would certify the overwritten values (r4 review finding)
        reserve_temp_cols(batch_df, _SHARD_COL)
        manifest = read_stream_manifest(path)
        if manifest is None:
            manifest = {"format": STREAM_MANIFEST_FORMAT, "n_rows": 0,
                        "n_shards": int(n_shards),
                        "seed": int(seed), "key_col": key_col,
                        "key_def": key_def,
                        "columns": columns, "generation": 0,
                        "batches": [], "shards": {}}
        else:
            # wiring args must match the delivery they extend: a restart
            # with a changed seed re-fingerprints a genuine replay as a
            # "new lineage" and silently appends the batch a second time;
            # a changed n_shards mixes two assignment functions in one
            # delivery (r4 review finding — the loud-refusal twin of
            # build_filter_table's key_def check); a changed key_def
            # appends rows derived under a DIFFERENT upstream definition
            want = {"n_shards": int(n_shards), "seed": int(seed),
                    "key_col": key_col, "key_def": key_def,
                    "columns": list(columns)}
            got = {k: manifest.get(k) for k in want}
            if got != want:
                raise ValueError(
                    f"delivery at {path!r} was written with {got}, but "
                    f"this stream is wired with {want} — exactly-once "
                    f"accounting and shard assignment both key on these; "
                    f"re-wire to match or deliver to a fresh path")
        gen = int(manifest.get("generation", 0))
        prior = next((b for b in manifest["batches"]
                      if b["batch_id"] == batch_id
                      and b["generation"] == gen), None)
        if prior is not None:
            # same id, current lineage: genuine replay, or a fresh
            # checkpoint restarting at 0 with new data — fingerprint
            # decides (see module docstring)
            rows, sum64 = _frame_fingerprint(batch_df, columns, seed)
            if (rows, sum64) == (prior["rows"], prior["sum64"]):
                return  # committed replay: no-op
            gen += 1  # new lineage; persisted with this batch's commit
            manifest["generation"] = gen
        dirname = f"b{batch_id}" if gen == 0 else f"b{batch_id}g{gen}"
        # immutable per-batch dir; overwrite heals a crashed replay (the
        # generation bump is recomputed deterministically on replay, so a
        # crash before the manifest commit lands in the same dir)
        key = (F.xxhash64(F.col(key_col), F.lit(seed)) if key_col
               else _row_hash(batch_df, seed))
        sharded = batch_df.withColumn(
            _SHARD_COL, F.pmod(key, F.lit(int(n_shards))))
        batch_dir = f"{path}/batches/{dirname}"
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
        batch_rows, batch_sum = 0, 0
        for s, (rows, sum64) in per.items():
            cur = manifest["shards"].get(s, {"rows": 0, "sum64": 0})
            manifest["shards"][s] = {
                "rows": cur["rows"] + rows,
                "sum64": (cur["sum64"] + sum64) % (1 << 64)}
            manifest["n_rows"] += rows
            batch_rows += rows
            batch_sum = (batch_sum + sum64) % (1 << 64)
        manifest["batches"] = sorted(
            manifest["batches"] + [{"batch_id": int(batch_id),
                                    "generation": gen, "dir": dirname,
                                    "rows": batch_rows,
                                    "sum64": batch_sum}],
            key=lambda b: (b["generation"], b["batch_id"]))
        _write_manifest_atomic(path, manifest, dirname)

    return process


def stream_training_shards(stream_df: DataFrame, path: str, n_shards: int,
                           key_col: str | None = None, seed: int = 17,
                           key_def: str | None = None):
    """``writeStream``-ready sink: call ``.start()`` (or trigger
    ``availableNow``) on the returned writer. Columns are fixed at wiring
    time from the stream schema; ``key_def`` (optional) stamps the
    upstream derivation into the manifest (see make_batch_processor)."""
    process = make_batch_processor(path, n_shards, list(stream_df.columns),
                                   key_col=key_col, seed=seed,
                                   key_def=key_def)
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
    # discovery over the non-key-value batch-dir level. A committed
    # EMPTY batch (rows=0 — every row of a trigger filtered upstream)
    # has a dir holding only _SUCCESS: reading it would fail schema
    # inference, and it contributes nothing — skip it, mirroring the
    # writer's empty-batch guard.
    parts = [spark.read.parquet(f"{path}/batches/{b['dir']}")
             .select(*manifest["columns"], _SHARD_COL)
             for b in manifest["batches"] if b["rows"]]
    per = ({} if not parts else _per_shard_totals(
        reduce(DataFrame.unionByName, parts), manifest["columns"],
        manifest["seed"]))
    want = {s: (m["rows"], m["sum64"])
            for s, m in manifest["shards"].items()}
    bad = sorted({s for s in set(per) | set(want)
                  if per.get(s) != want.get(s)}, key=int)
    return {"ok": not bad, "mismatched_shards": bad, "manifest": manifest}
