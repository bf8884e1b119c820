"""Training-data delivery sink: deterministic, size-targeted parquet shards
with a tamper-evident manifest.

The last step of a curation pipeline is handing a dataset to a trainer:
fixed-size shards whose membership is a pure function of the data (rerunning
the pipeline reproduces byte-comparable shard assignment — no
``rand()``-based shuffling), plus a manifest recording per-shard row counts
and order-independent 64-bit checksums so a trainer (or a later pipeline
run) can verify integrity without re-reading the source.

Scale shape (100 TB): one full pass writes the shards (single shuffle on the
deterministic shard id) and one aggregation pass computes the manifest
(partial-agg count + wrapping sum of row hashes per shard — KB-sized result
rows; the driver only ever holds the manifest, never data). Verification
reads ONLY the delivered shards, aggregates the same two values per shard,
and compares — a cheap scan with no shuffle beyond the per-shard partial
aggregation.

Checksum choice: the order-independent fold is a SUM of per-row hashes mod
2**64, NOT a bit-XOR. XOR self-cancels even multiplicities — two copies of
the same row fold to 0, so swapping one duplicate pair for another (or a
whole batch of duplicate pairs for a different one) would keep the checksum
fixed, which is exactly the blind spot a duplicate-heavy pre-dedup delivery
would hit naturally. Under the sum, k copies contribute k·h: only the
2^-64-probability accidental collision remains. The sum runs as two LONG
sums over the hash's 32-bit halves (codegen-friendly — measured faster
than both bit_xor and a decimal(20,0) sum) recombined mod 2**64
driver-side; congruence mod 2**64 survives even a wrapped long sum, and
ANSI mode would raise (loudly, never silently wrong) only past ~2.1e9
rows in one shard — three decades above the size-targeted shard design.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_MANIFEST.json"
_SHARD_COL = "__xorf_shard"


def _fs(path: str):
    """(filesystem, base) via pyarrow.fs — local paths and object stores.
    Manifest I/O runs driver-side only."""
    from pyarrow import fs as pafs

    fsys, base = pafs.FileSystem.from_uri(path)
    return fsys, base.rstrip("/")


def _move_replace(fsys, src: str, dst: str) -> None:
    """``fsys.move`` that tolerates an existing destination.

    POSIX rename and S3 copy-PUT replace atomically, but HDFS rename
    REFUSES an existing destination (r4 review finding — the second
    pointer/manifest swap would crash the stream there). The fallback
    renames the stale destination ASIDE (``dst`` → ``dst.old``) before
    moving ``src`` in, then best-effort-deletes the aside copy. A plain
    delete-then-move would permanently lose the committed destination if
    the process dies between the two calls (r4 advice #1 — for the
    streaming manifest that orphans every committed batch, and
    ``verify_streamed_delivery`` would then certify a FRESH truncated
    manifest as ok). With rename-aside, every crash point leaves either
    ``dst`` or ``dst.old`` holding a complete committed value, and
    :func:`_read_with_fallback` recovers from the aside copy.
    """
    try:
        fsys.move(src, dst)
    except OSError:
        from pyarrow import fs as pafs

        if fsys.get_file_info(dst).type == pafs.FileType.NotFound:
            raise  # move failed for some other reason — surface it
        old = dst + ".old"
        if fsys.get_file_info(old).type != pafs.FileType.NotFound:
            fsys.delete_file(old)  # stale aside from an earlier fallback
        fsys.move(dst, old)
        fsys.move(src, dst)
        try:
            fsys.delete_file(old)  # cleanup only once dst is committed
        except OSError:
            pass  # harmless: next fallback (or reader preference) handles it


def _read_with_fallback(fsys, path: str) -> bytes | None:
    """Read ``path``; when missing, fall back to the ``path + ".old"``
    aside copy a crashed :func:`_move_replace` may have left (the
    previous committed value). Returns None when neither exists.

    ONLY not-found conditions are treated as "missing": a genuine I/O
    failure (auth, throttling, network) propagates. Swallowing it would
    convert a transient S3 503 into "no manifest yet" — and the callers
    then *reinitialize* (fresh manifest over a committed one,
    pointer-less refresh pruning live version dirs), which is exactly
    the silent-loss class this module exists to prevent. A not-found on
    ``open`` after a successful stat is the benign race with a
    concurrent swap/cleanup; the outer pass retries the pair once so a
    reader overlapping a fallback swap still lands on a committed copy.
    "None" is returned only when NO stat ever saw a candidate: if stat
    observed a file but every open raced away, something held a
    committed value moments ago — reporting "missing" would trigger the
    same reinitialize-over-committed-state hazard, so that raises too.
    """
    from pyarrow import fs as pafs

    saw_stat_hit = False
    for _attempt in range(2):
        for cand in (path, path + ".old"):
            if fsys.get_file_info(cand).type != pafs.FileType.NotFound:
                saw_stat_hit = True
                try:
                    with fsys.open_input_stream(cand) as fh:
                        return fh.read()
                except FileNotFoundError:
                    # raced a concurrent swap/cleanup between stat and
                    # open — try the other candidate / second pass
                    continue
        if not saw_stat_hit:
            return None  # genuinely absent — skip the retry pass
    raise OSError(
        f"{path!r}: stat observed a committed copy but every open raced "
        f"a concurrent swap/cleanup (4 attempts across both candidates) "
        f"— refusing to report it missing; retry the read")


def _row_hash(df: DataFrame, seed: int):
    """Order-independent per-row 64-bit hash over ALL columns.

    ``xxhash64`` skips NULL arguments entirely (a NULL hashes like a
    missing column), so rows differing only in *which* column is NULL
    would collide; the null mask is appended as an explicit argument to
    disambiguate."""
    cols = [F.col(c) for c in df.columns]
    null_mask = F.concat_ws(
        "", *[F.col(c).isNull().cast("int").cast("string")
              for c in df.columns])
    return F.xxhash64(*cols, null_mask, F.lit(seed))


def write_training_shards(df: DataFrame, path: str,
                          rows_per_shard: int = 1_000_000,
                          key_col: str | None = None,
                          seed: int = 17) -> dict:
    """Write ``df`` as ``shard=N/`` parquet dirs plus a ``_MANIFEST.json``.

    Shard assignment is ``pmod(xxhash64(key, seed), n_shards)`` — a pure
    function of the data (``key_col`` when given, else every column), so
    reruns reproduce the same membership and the hash uniformity gives
    each shard ~``rows_per_shard`` rows regardless of input skew or
    partitioning. Returns the manifest dict.

    The manifest is aggregated from the WRITTEN files (not the input
    plan): a read-back of the delivered parquet is cheaper than a third
    pass over the source, and the checksums then certify the actual
    bytes on storage from the moment of delivery — a write that was
    corrupted or truncated in flight can never produce a manifest that
    "verifies". The aggregation is a partial-agg ``groupBy(shard)``
    whose result is one KB-sized row per shard (driver holds the
    manifest only).
    """
    from ._util import reserve_temp_cols

    # re-ingesting a prior delivery without dropping its partition
    # column would silently re-assign (and then certify) the overwrite
    reserve_temp_cols(df, _SHARD_COL)
    n_rows = df.count()
    n_shards = max(1, math.ceil(n_rows / max(1, int(rows_per_shard))))
    key = (F.xxhash64(F.col(key_col), F.lit(seed)) if key_col
           else _row_hash(df, seed))
    sharded = df.withColumn(_SHARD_COL, F.pmod(key, F.lit(n_shards)))
    (sharded.repartition(n_shards, _SHARD_COL)
     .write.mode("overwrite")
     .partitionBy(_SHARD_COL).parquet(path))
    if n_rows:
        back = (df.sparkSession.read.parquet(path)
                .select(*df.columns, _SHARD_COL))
        per = _per_shard_totals(back, list(df.columns), seed)
    else:
        per = {}
    manifest = {
        "n_rows": int(n_rows),
        "n_shards": int(n_shards),
        "rows_per_shard": int(rows_per_shard),
        "seed": int(seed),
        "key_col": key_col,
        "columns": list(df.columns),
        "shards": {s: {"rows": r, "sum64": x} for s, (r, x) in per.items()},
    }
    fsys, base = _fs(path)
    with fsys.open_output_stream(f"{base}/{MANIFEST_NAME}") as fh:
        fh.write(json.dumps(manifest, indent=1, sort_keys=True)
                 .encode("utf-8"))
    return manifest


def _hash_sql(df: DataFrame, seed: int) -> str:
    """SQL form of :func:`_row_hash` (the sum fold needs an expr aggregate)."""
    cols = ", ".join(f"`{c}`" for c in df.columns)
    mask = ", ".join(
        f"cast(cast((`{c}` is null) as int) as string)" for c in df.columns)
    return f"xxhash64({cols}, concat_ws('', {mask}), {seed})"


def _sum_aggs(df: DataFrame, seed: int) -> list:
    """Order-independent multiset checksum, as two LONG sum aggregates
    over the row hash's unsigned 32-bit halves (see module docstring for
    why a sum and not bit_xor, and why halves and not decimal).
    Recombine with :func:`_combine64`."""
    h = _hash_sql(df, seed)
    return [F.expr(f"sum(shiftrightunsigned({h}, 32))").alias("__sum_hi"),
            F.expr(f"sum({h} & 4294967295)").alias("__sum_lo")]


def _combine64(hi, lo) -> int:
    """(sum_hi, sum_lo) -> sum of unsigned row hashes mod 2**64. The
    congruence holds even if either long sum wrapped (a ≡ a mod 2**64)."""
    if hi is None:  # empty group
        return 0
    return ((int(hi) << 32) + int(lo)) % (1 << 64)


def _per_shard_totals(df_with_shard: DataFrame, data_cols: list[str],
                      seed: int) -> dict:
    """``{shard: (rows, sum64)}`` via one partial-agg scan — the shared
    accounting kernel of write, verify, and the streaming delivery."""
    hash_src = df_with_shard.select(*data_cols)
    return {str(int(r[_SHARD_COL])): (int(r["rows"]),
                                      _combine64(r["__sum_hi"],
                                                 r["__sum_lo"]))
            for r in (df_with_shard.groupBy(_SHARD_COL)
                      .agg(F.count(F.lit(1)).alias("rows"),
                           *_sum_aggs(hash_src, seed))
                      .collect())}


def read_manifest(path: str) -> dict:
    fsys, base = _fs(path)
    with fsys.open_input_stream(f"{base}/{MANIFEST_NAME}") as fh:
        return json.loads(fh.read().decode("utf-8"))


def verify_training_shards(spark: SparkSession, path: str) -> dict:
    """Re-aggregate the delivered shards and compare against the manifest.

    Returns ``{"ok": bool, "mismatched_shards": [...], "manifest": ...}``.
    Reads only the delivered parquet (never the source): per-shard count +
    hash sum, one partial-agg scan. A missing shard dir, a dropped/extra
    row, or any changed value flips ``ok``.
    """
    manifest = read_manifest(path)
    from pyspark.errors import AnalysisException
    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        # an empty delivery writes no partition dirs at all — valid iff
        # the manifest promised zero shards
        return {"ok": not manifest["shards"], "mismatched_shards":
                sorted(manifest["shards"], key=int), "manifest": manifest}
    data_cols = [c for c in manifest["columns"] if c in df.columns]
    if set(data_cols) != set(manifest["columns"]) or _SHARD_COL not in df.columns:
        return {"ok": False, "mismatched_shards": ["<schema>"],
                "manifest": manifest}
    view = df.select(*data_cols, _SHARD_COL)
    per = _per_shard_totals(view, data_cols, manifest["seed"])
    want = {s: (m["rows"], m["sum64"])
            for s, m in manifest["shards"].items()}
    bad = sorted({s for s in set(per) | set(want)
                  if per.get(s) != want.get(s)}, key=int)
    return {"ok": not bad, "mismatched_shards": bad, "manifest": manifest}


def diff_training_shards(spark: SparkSession, old_path: str,
                         new_path: str) -> dict:
    """Manifest-driven delivery diff: which shards changed, and the exact
    added/removed rows — reading ONLY the changed shards.

    The per-shard (rows, sum64) pairs localize every change: unchanged
    shards are skipped entirely (at 100 TB with a stable ``key_col``, an
    edit touching 0.1% of keys reads ~0.1% of either delivery — two KB
    manifests decide the rest). Row-level changes inside the changed
    shards are recovered as a MULTISET diff: per row-hash, the excess
    copies on either side are reported (old has X twice, new has X once
    → one removed X), so duplicate-multiplicity changes — realistic in a
    delivery whose dedup is thresholded — are visible, not swallowed by
    a set anti-join. Identical rows always land in the same shard, so
    the multiset compare never needs the unchanged shards.

    Returns ``{"changed_shards", "added_shards", "removed_shards",
    "added_rows": DataFrame, "removed_rows": DataFrame}`` (the DataFrames
    are lazy; rows carry the delivery's data columns).

    Both deliveries must share seed and columns (the row hash — and with
    ``key_col`` the shard assignment — is parameterized by them). If the
    deliveries have different ``n_shards`` (the corpus grew past the next
    ``rows_per_shard`` boundary) the assignment function itself differs, so
    most shards read as changed and the diff degrades to a full
    two-delivery comparison — still exact, just not incremental; pin
    ``n_shards`` by delivering at a stable ``rows_per_shard`` ×
    corpus-size granularity when incrementality matters.
    """
    mo, mn = read_manifest(old_path), read_manifest(new_path)
    for field in ("seed", "columns", "key_col", "rows_per_shard"):
        if mo[field] != mn[field]:
            raise ValueError(
                f"deliveries differ in {field}: {mo[field]!r} vs "
                f"{mn[field]!r} — re-deliver with matching parameters "
                f"before diffing")
    old_s, new_s = mo["shards"], mn["shards"]
    added_shards = sorted(set(new_s) - set(old_s), key=int)
    removed_shards = sorted(set(old_s) - set(new_s), key=int)
    changed = sorted(
        (s for s in set(old_s) & set(new_s)
         if (old_s[s]["rows"], old_s[s]["sum64"])
         != (new_s[s]["rows"], new_s[s]["sum64"])), key=int)

    cols = mo["columns"]
    if not old_s and not new_s:  # two empty deliveries: nothing to read
        return {"changed_shards": [], "added_shards": [],
                "removed_shards": [], "added_rows": None,
                "removed_rows": None}
    schema = (spark.read.parquet(new_path if new_s else old_path)
              .select(*cols).schema)

    def load(path, shards):
        dirs = [f"{path}/{_SHARD_COL}={s}" for s in shards]
        if not dirs:
            return spark.createDataFrame([], schema)
        return spark.read.parquet(*dirs).select(*cols)

    old_changed = load(old_path, changed + removed_shards)
    new_changed = load(new_path, changed + added_shards)
    h = "__xorf_rh"
    oh = old_changed.withColumn(h, _row_hash(old_changed, mo["seed"]))
    nh = new_changed.withColumn(h, _row_hash(new_changed, mo["seed"]))

    def _excess(side, other_counts, cnt_col):
        # multiset difference: keep the copies of each row beyond the
        # other side's count of that row (identical copies are
        # interchangeable — row_number picks which ones survive). The
        # window partitions on the row hash; its width is one row's
        # duplicate multiplicity, not a shard.
        from pyspark.sql import Window
        rn = "__xorf_rn"
        w = Window.partitionBy(h).orderBy(F.lit(1))
        return (side.withColumn(rn, F.row_number().over(w))
                .join(other_counts, h, "left")
                .where(F.col(rn) > F.coalesce(F.col(cnt_col), F.lit(0)))
                .drop(h, rn, cnt_col))

    oc = oh.groupBy(h).agg(F.count(F.lit(1)).alias("__xorf_oc"))
    nc = nh.groupBy(h).agg(F.count(F.lit(1)).alias("__xorf_nc"))
    return {
        "changed_shards": changed,
        "added_shards": added_shards,
        "removed_shards": removed_shards,
        "added_rows": _excess(nh, oc, "__xorf_oc"),
        "removed_rows": _excess(oh, nc, "__xorf_nc"),
    }
