"""Streaming filter maintenance: keep a queryable membership filter of
every key the stream has ever delivered, refreshed per micro-batch group
via ``foreachBatch`` — the streaming completion of the batch build
(reference semantics: a filter is built once over a key set; a stream's
key set only grows, so the operator periodically rebuilds over the
accumulated distinct keys).

Layout under ``table_path``::

    keys/                  append-only distinct-per-batch key log (parquet)
    g0b0/, g1b3/, ...      immutable shard tables (one per refresh;
                           name = monotonic GENERATION + triggering batch)
    _LATEST                text file: current version dir name, then the
                           predecessor's, whitespace-separated

Version names carry a monotonic **generation** read from the current
pointer (gen = pointer's gen + 1), NOT the raw batch id: batch ids
restart at 0 after a checkpoint reset, and a batch-id-derived name could
collide with a retained COMPLETE old version dir — the rebuild's
resume pass would then see every shard 'done' and swap the pointer to a
STALE table, silently violating the zero-false-negative contract (r3
advisory). With generations, a fresh rebuild can only ever reuse a dir
name left by a crashed replay of the SAME batch in the SAME incarnation
— exactly the case checkpoint-resume is built for — and never the
pointer's current target.

The swap is ATOMIC at the pointer level: a new version directory is fully
written by the checkpoint-resumable builder before ``_LATEST`` is
rewritten (written to a temp name then renamed — a single rename on
POSIX; on object stores the final PUT replaces the object atomically),
so a reader loading via :func:`load_latest_filter_table` always sees a
complete table — either the old or the new version, never a half-built
or half-written one. Pruning keeps the two versions the pointer itself
records (current + predecessor), so a crash-after-swap replay can never
delete the directory a concurrent reader loaded via the pre-crash
pointer.

Scale notes: the key log holds per-batch-distinct rows, so it grows with
total delivered (not distinct) keys across batches; the rebuild runs one
global ``distinct()`` so the FILTER is always sized by true distinct
keys. For streams that re-deliver heavily, :func:`compact_key_log`
rewrites the log to its distinct set — crash-safe, append-concurrent-
safe; schedule it between refreshes (see its docstring); the immutable
versions are never invalidated by log maintenance. Each rebuild is the staged
production build when ``stage_dir`` is passed; its per-version spill is
deleted after the build.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dataflow import (FilterTable, _write_keydef, build_filter_table,
                        shard_id_col)
# shared (filesystem, base) resolver + replace-aware rename: all
# pointer/prune I/O here runs on the DRIVER (foreachBatch callbacks
# execute driver-side), so no worker needs filesystem credentials
# beyond what the writes already use
from ..operators.sink import _fs, _move_replace, _read_with_fallback


def _pointer_path(base: str) -> str:
    return f"{base}/_LATEST"


def pointer_versions(table_path: str) -> tuple[str | None, str | None]:
    """``(current, predecessor)`` version dir names as recorded in the
    pointer file, or Nones before the first refresh / for a pre-r4
    single-name pointer. Real I/O errors (auth, network) propagate —
    only not-found means "no version yet"."""
    fsys, base = _fs(table_path)
    # fallback reads the rename-aside copy a crashed pointer swap may
    # have left on rename-refusing filesystems (sink._move_replace):
    # the previous committed pointer — never a torn or missing one
    raw = _read_with_fallback(fsys, _pointer_path(base))
    if raw is None:
        return None, None
    toks = raw.decode().split()
    return (toks[0] if toks else None,
            toks[1] if len(toks) > 1 else None)


def latest_version(table_path: str) -> str | None:
    """Current version directory name (e.g. ``"g2b7"``), or None before
    the first refresh."""
    return pointer_versions(table_path)[0]


def _generation(version: str | None) -> int:
    """Monotonic generation parsed from a version dir name; -1 for no /
    legacy (``v7``-style) pointers so the next generation starts at 0."""
    import re

    m = re.fullmatch(r"g(\d+)b\d+", version or "")
    return int(m.group(1)) if m else -1


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


def compact_key_log(spark: SparkSession, table_path: str) -> int:
    """Compact the append-only ``keys/`` log to its distinct key set.
    Returns the number of log files removed.

    The log grows with total *delivered* keys across batches (per-batch
    distinct only); for heavily re-delivering streams this rewrites it to
    the true distinct set. Crash-safe, and safe against concurrent
    micro-batch APPENDS, by construction:

    1. list the current log files;
    2. read exactly THOSE files, ``distinct()``, append the result as new
       files into the same directory (new part files get unique names —
       nothing is overwritten, and a concurrent micro-batch append is
       untouched because deletion below only targets the pre-listed set);
    3. delete the listed old files.

    Every crash window leaves the directory a SUPERSET of the distinct
    key set (duplicates at worst), and the rebuild path runs a global
    ``distinct()`` anyway — so the filter's zero-false-negative contract
    can never be violated by a failed compaction.

    Concurrency caveat: a REBUILD that is scanning the log while step 3
    deletes files it listed will fail that batch with missing-file errors
    (an availability hiccup, never a silent-FN one — restarting the
    stream replays the batch against the compacted log). Schedule
    compaction between refreshes, e.g. from the same ``foreachBatch``
    driver thread on batches where no rebuild runs."""
    from pyarrow import fs as pafs

    keys_path = os.path.join(table_path, "keys")
    fsys, base = _fs(keys_path)
    old = [f.path for f in fsys.get_file_info(pafs.FileSelector(base))
           if f.is_file and f.base_name.endswith(".parquet")]
    if not old:
        return 0
    # pyarrow strips the URI scheme AND authority from listed paths;
    # re-attach the full scheme://authority prefix so spark resolves them
    # against the right filesystem (s3://bucket, hdfs://nn:8020) instead
    # of the cluster default FS — scheme alone ('hdfs:///path') would
    # still hit fs.defaultFS
    prefix = ""
    if "://" in keys_path:
        if not keys_path.endswith(base):
            raise ValueError(
                f"cannot split {keys_path!r} into authority + {base!r}")
        prefix = keys_path[:len(keys_path) - len(base)]
    spark_paths = [prefix + p for p in old]
    (spark.read.parquet(*spark_paths).distinct()
     .write.mode("append")
     .option("compression", "none")
     .option("parquet.enable.dictionary", "false")
     .parquet(keys_path))
    for p in old:
        fsys.delete_file(p)
    return len(old)


#: Per-version sidecar recording the sharding a version was built under —
#: the guard that makes incremental reuse refuse across n_shards/kind
#: changes (same shard_id value under a different prefix length covers a
#: DIFFERENT key range; a coincidental count match there would reuse a
#: wrong shard and violate zero-false-negatives).
REFRESH_META_FILE = "_XORF_REFRESH"


def _refresh_meta_path(table_path: str, version: str) -> tuple:
    fsys, base = _fs(table_path)
    return fsys, f"{base}/{version}/{REFRESH_META_FILE}"


def _write_refresh_meta(table_path: str, version: str, n_shards: int,
                        kind: str) -> None:
    import json

    fsys, p = _refresh_meta_path(table_path, version)
    with fsys.open_output_stream(p) as fh:
        fh.write(json.dumps({"n_shards": int(n_shards),
                             "kind": kind}).encode())


def _read_refresh_meta(table_path: str, version: str) -> dict | None:
    import json

    from pyarrow import fs as pafs

    fsys, p = _refresh_meta_path(table_path, version)
    if fsys.get_file_info(p).type == pafs.FileType.NotFound:
        return None
    with fsys.open_input_stream(p) as fh:
        return json.loads(fh.read().decode())


def _copy_unchanged_shards(spark: SparkSession, table_path: str,
                           prev: str, version_dir: str, all_keys: DataFrame,
                           n_shards: int, kind: str,
                           key_def: str | None) -> int:
    """Incremental-rebuild fast path (VERDICT r5 item 5): the key log only
    GROWS, so a shard whose current distinct key count equals the previous
    version's ``n_keys`` holds exactly the same key set — its row can be
    copied instead of rebuilt (builds are deterministic per key set, so
    the copied row is byte-identical to a rebuild). Shards with new keys
    are left for the builder, whose resume pass treats the copied shards
    as done. Returns the number of shards reused; 0 disables the fast
    path (missing/incompatible sidecar, unreadable prev version, crash
    replay with a partially-written new version — the full rebuild is
    always the correct fallback)."""
    from pyspark.errors import AnalysisException

    import os as _os

    meta = _read_refresh_meta(table_path, prev)
    if (meta is None or meta.get("n_shards") != n_shards
            or meta.get("kind") != kind):
        return 0
    try:
        prev_rows = spark.read.parquet(_os.path.join(table_path, prev))
    except AnalysisException:
        return 0
    try:
        if spark.read.parquet(version_dir).limit(1).take(1):
            # crash replay of this very version: the builder's own
            # resume handles partially-built dirs; re-copying here
            # would append duplicate shard rows
            return 0
    except AnalysisException:
        pass
    # ONE counting pass decides everything (the caller persists
    # ``all_keys``, so the builder reuses the same materialization —
    # without that, each extra action re-ran the global distinct and the
    # fast path cost more than the rebuild it saved; first A/B round in
    # BENCH/ROUND6_NOTES.md). Gate: uniform-hashed keys spread g new
    # distinct keys so the untouched-shard fraction is e^(-g/S) — past
    # g ≈ 4S (<2% reusable) skip the copy I/O outright.
    prev_keys = {int(r["shard_id"]): int(r["n_keys"])
                 for r in prev_rows.select("shard_id", "n_keys").collect()}
    cnts = {int(r["shard_id"]): int(r["cnt"]) for r in
            (all_keys
             .groupBy(shard_id_col("key", n_shards).alias("shard_id"))
             .agg(F.count(F.lit(1)).alias("cnt")).collect())}
    growth = sum(cnts.values()) - sum(prev_keys.values())
    if growth < 0 or growth >= 4 * n_shards:
        return 0
    unchanged = [sid for sid, n in prev_keys.items()
                 if cnts.get(sid) == n]
    if not unchanged:
        return 0
    if key_def is not None:
        # stamp BEFORE the data append, same order as build_filter_table
        _write_keydef(version_dir, key_def)
    (prev_rows.where(F.col("shard_id").isin(unchanged))
     .write.mode("append").parquet(version_dir))
    return len(unchanged)


def stream_filter_refresh(stream_df: DataFrame, table_path: str,
                          key_col: str = "key", kind: str = "bfuse8",
                          n_shards: int = 16, refresh_every: int = 1,
                          stage_dir: str | None = None,
                          key_def: str | None = None,
                          incremental: bool = False):
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

    ``key_def`` (optional) names the definition of the key column the
    caller derives upstream (see ``dataflow.build_filter_table``): each
    rebuilt version is stamped with it, so a crashed rebuild resumed by
    a NEWER deployment with a changed key derivation fails loudly
    instead of mixing key definitions within one version dir.

    ``incremental`` (default False — measured net-negative at bench
    scale, see below) reuses the previous version's shard rows for
    shards whose key set is provably unchanged: the key log only grows,
    so per-shard distinct-count equality with the stored ``n_keys``
    implies set equality, and builds are deterministic per key set, so
    the resulting table is byte-identical to a full rebuild (equality
    pinned in tests/test_filter_refresh.py). Reuse is guarded by a
    per-version ``_XORF_REFRESH`` sidecar recording (n_shards, kind) —
    same shard_id under a different prefix length covers a different
    key range, so a coincidental count match would otherwise reuse a
    wrong shard — and a low-rate gate (growth < 4×n_shards: uniformly
    hashed keys leave ~e^(-g/S) of shards untouched, so past that
    nothing is reusable anyway). WHY it is off by default: the rebuild
    must still scan the whole key log (global distinct for counts and
    sizing) and this library's shard kernels are fast, so at 7M keys
    the full rebuild (2.0-3.4s trigger) beats the incremental path
    (4.1-6.6s: persist + counting pass + copy + resume bookkeeping)
    even at 20-key churn — A/B in scripts/ab_incremental_refresh.py,
    BENCH/ROUND6_NOTES.md. Opt in only where per-shard construction
    dominates the trigger (much larger shards, wider fingerprints, or
    expensive storage between the stages).
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
        prev, _ = pointer_versions(table_path)
        if prev is not None and prev.endswith(f"b{batch_id}"):
            # crash between the pointer swap and Spark's checkpoint
            # commit: the pointer's CURRENT version was built by this
            # very batch, and the rebuild is deterministic from the
            # global key log — skip it if the log still holds exactly
            # the keys that build saw (one distinct-count pass vs a
            # full rebuild; r4 review finding). The key log only grows,
            # so equality is exact, never coincidence: a checkpoint
            # RESET whose colliding batch id delivered genuinely new
            # keys raises the count and the rebuild proceeds.
            from pyspark.errors import AnalysisException
            try:
                built = (spark.read.parquet(
                    os.path.join(table_path, prev))
                    .agg(F.sum("n_keys")).collect()[0][0])
            except AnalysisException:
                built = None  # version dir unreadable: rebuild
            if built is not None and int(built) == (
                    spark.read.parquet(keys_path).distinct().count()):
                return
        # generation = current pointer's + 1: never collides with ANY
        # retained dir across checkpoint resets (batch ids restart at 0;
        # a name collision with a COMPLETE old dir would make the
        # builder's resume pass see every shard done and swap the pointer
        # onto a stale table). The only reusable name is this same
        # (generation, batch) pair — a crashed replay of this very batch,
        # which is the checkpoint-resume case the builder exists for.
        version = f"g{_generation(prev) + 1}b{batch_id}"
        # global distinct: per-batch distinct still re-delivers keys
        # across batches, and the builder sizes arrays by RAW row count —
        # without this the filter would grow with total delivered keys
        all_keys = spark.read.parquet(keys_path).distinct()
        version_dir = os.path.join(table_path, version)
        use_incr = incremental and prev is not None
        if use_incr:
            # one materialization shared by the counting pass AND the
            # rebuild — without it every extra action re-runs the global
            # distinct and the fast path costs more than it saves
            all_keys = all_keys.persist()
        try:
            if use_incr:
                _copy_unchanged_shards(spark, table_path, prev,
                                       version_dir, all_keys, n_shards,
                                       kind, key_def)
            version_stage = (os.path.join(stage_dir, version)
                             if stage_dir else None)
            build_filter_table(
                all_keys, version_dir, kind=kind,
                n_shards=n_shards, key_col="key", stage_dir=version_stage,
                key_def=key_def)
        finally:
            if use_incr:
                all_keys.unpersist()
        _write_refresh_meta(table_path, version, n_shards, kind)
        if version_stage is not None:
            sfs, sbase = _fs(version_stage)
            sfs.delete_dir(sbase)
        # pointer swap AFTER the version is fully committed: write to a
        # temp name, then rename over _LATEST — a single atomic rename on
        # POSIX (open_output_stream on the final path would truncate
        # in place, leaving a window where readers see an empty pointer);
        # on object stores the copy's PUT replaces atomically. The
        # pointer records current AND predecessor, so pruning never has
        # to infer the predecessor from directory listings.
        fsys, base = _fs(table_path)
        tmp = _pointer_path(base) + f".tmp-{batch_id}"
        content = f"{version} {prev}" if prev else version
        with fsys.open_output_stream(tmp) as fh:
            fh.write(content.encode())
        # replace-aware: HDFS rename refuses an existing destination,
        # which would crash the second and every later refresh there
        _move_replace(fsys, tmp, _pointer_path(base))
        # prune: keep exactly the versions the pointer records (current +
        # predecessor). Never trust version-number ordering, and never a
        # listing-derived predecessor: on a crash-after-swap replay the
        # pointer already names this version, and a guessed predecessor
        # could delete the dir a concurrent reader is still probing.
        import re

        from pyarrow import fs as pafs
        keep = {version, prev}
        for info in fsys.get_file_info(pafs.FileSelector(base)):
            name = info.base_name
            if (info.type == pafs.FileType.Directory
                    and re.fullmatch(r"v\d+|g\d+b\d+", name)
                    and name not in keep):
                fsys.delete_dir(f"{base}/{name}")

    return stream_df.writeStream.foreachBatch(process).outputMode("update")
