"""Distributed mergeable-sketch aggregation: the UDAF dataflow.

Shape of the computation (the classic partial-aggregate / merge tree that
Spark's own ``TypedImperativeAggregate`` uses, re-expressed as DataFrame
stages so the sketch state can be numpy + Arrow):

1. **partial**: ``mapInArrow`` folds each *input partition* into one sketch —
   zero shuffle, the map-side combine. One output row per non-empty
   partition: ``(part_id, kind, payload, n_rows, build_secs)``.
2. **merge**: a fan-in tree of ``groupBy(part_id % g).applyInPandas`` merge
   stages. With 100k input partitions on a 1000-executor cluster the tree is
   2 levels of tiny (KB-MB) payload shuffles; locally it is a single stage.
3. **final**: the 1-row result is collected and deserialized; or kept as a
   table row for persistence.

Merge laws (tested in tests/test_sketches.py): HLL/CMS/Bloom state is
bit-identical regardless of partitioning or merge order (max/sum/or);
KLL/t-digest agree within their published error bounds.

Checkpoint-resumable variant (north-star requirement, same discipline as the
filter shard table in ``xorf_spark.dataflow.build_filter_table``):
``build_sketch_table`` buckets rows by a hash of the sketched column, builds
one partial per bucket (input-sorted ⇒ deterministic bytes), appends to a
parquet lineage table, and a restarted job anti-joins the committed bucket
ids — the merged final sketch is identical to an uninterrupted run.
"""

from __future__ import annotations

import math
import time
from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .kernels import KEYED_KINDS, SKETCH_KINDS, make_sketch, sketch_from_bytes
from ..dataflow import null_safe_udf

#: One row per partial sketch (per input partition, or per bucket in the
#: resumable path). ``payload`` is the self-describing serialized sketch.
PARTIAL_SCHEMA = StructType([
    StructField("part_id", IntegerType(), False),
    StructField("kind", StringType(), False),
    StructField("payload", BinaryType(), False),
    StructField("n_rows", LongType(), False),
    StructField("build_secs", DoubleType(), False),
])

_PA_PARTIAL = pa.schema([
    ("part_id", pa.int32()), ("kind", pa.string()), ("payload", pa.binary()),
    ("n_rows", pa.int64()), ("build_secs", pa.float64()),
])


def _feed(sk, kind: str, arr: np.ndarray, weights=None):
    if kind in KEYED_KINDS:
        if kind in ("cms", "mg") and weights is not None:
            sk.add_hashes(arr, weights)
        else:
            sk.add_hashes(arr)
    else:
        sk.add(arr)


def _partial_row(pid: int, kind: str, sk, n: int, t0: float) -> dict:
    return {"part_id": pid, "kind": kind, "payload": sk.to_bytes(),
            "n_rows": n, "build_secs": time.time() - t0}


def _check_kind(kind: str) -> None:
    """Driver-side wiring check, shared by every entry point: an unknown
    kind must raise HERE, not as an executor task failure after a full
    shuffle (r4 review finding — build_sketch_table/grouped_sketch were
    deferring to make_sketch inside the worker)."""
    if kind not in SKETCH_KINDS:
        raise ValueError(
            f"unknown sketch kind {kind!r}; one of {SKETCH_KINDS}")


def partial_sketches(df: DataFrame, col: str, kind: str,
                     params: dict | None = None,
                     weight_col: str | None = None) -> DataFrame:
    """One sketch per input partition via ``mapInArrow`` — the shuffle-free
    map-side combine. Column pruning happens before the python stage (only
    ``col`` [+ ``weight_col``] cross the Arrow boundary)."""
    _check_kind(kind)
    params = dict(params or {})
    cols = [F.col(col).alias("v")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("w"))
    proj = df.select(*cols)
    has_w = weight_col is not None

    def fold(batches):
        from pyspark import TaskContext

        t0 = time.time()
        sk = make_sketch(kind, **params)
        n = 0
        for b in batches:
            tb = pa.table(b).drop_null()
            arr = tb.column("v").combine_chunks().to_numpy(
                zero_copy_only=False)
            w = (tb.column("w").combine_chunks().to_numpy(
                zero_copy_only=False) if has_w else None)
            if arr.size == 0:
                continue
            _feed(sk, kind, arr, w)
            n += int(arr.size)
        if n == 0:
            return
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        row = _partial_row(pid, kind, sk, n, t0)
        yield pa.RecordBatch.from_pydict(
            {k: [v] for k, v in row.items()}, schema=_PA_PARTIAL)

    return proj.mapInArrow(fold, PARTIAL_SCHEMA)


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    t0 = time.time()
    sk = None
    # deterministic merge order (payload bytes for valued sketches depend on
    # it; keyed sketches are order-independent anyway)
    pdf = pdf.sort_values("part_id", kind="stable")
    for payload in pdf["payload"]:
        s = sketch_from_bytes(payload)
        sk = s if sk is None else sk.merge(s)
    row = _partial_row(int(pdf["part_id"].iloc[0]), str(pdf["kind"].iloc[0]),
                       sk, int(pdf["n_rows"].sum()), t0)
    row["build_secs"] += float(pdf["build_secs"].max())
    return pd.DataFrame([row])


def tree_merge(partials: DataFrame, n_parts: int,
               fanout: int = 64) -> DataFrame:
    """Fan-in merge tree over partial rows → a single-row DataFrame.

    ``n_parts`` is an upper bound on the partial count (e.g. the input's
    partition count) — it only sizes the tree, so an over-estimate is safe
    and costs no extra Spark job."""
    df = partials
    n = max(int(n_parts), 1)
    while n > 1:
        n_groups = max(1, math.ceil(n / fanout))
        df = (df.withColumn(
                  "part_id",
                  F.pmod(F.col("part_id"), F.lit(n_groups)).cast("int"))
              .repartition(n_groups, "part_id")
              .groupBy("part_id")
              .applyInPandas(_merge_group, PARTIAL_SCHEMA))
        n = n_groups
    return df


def sketch_agg(df: DataFrame, col: str, kind: str,
               params: dict | None = None, weight_col: str | None = None,
               fanout: int = 64, driver_merge_threshold: int = 1024):
    """Full aggregation: partial per partition → merge → sketch object.

    Partial rows are KB-sized, so up to ``driver_merge_threshold`` of them
    are collected and merged driver-side — one Spark stage, no shuffle
    (exactly how Spark's own TypedImperativeAggregate finishes on a single
    reducer). Beyond that (100k-partition cluster scans) a fan-in tree of
    ``applyInPandas`` merge stages keeps every fan-in ≤ ``fanout``.

    Returns the deserialized sketch (empty sketch if ``df`` has no rows)."""
    partials = partial_sketches(df, col, kind, params, weight_col)
    n_parts = df.rdd.getNumPartitions()
    if n_parts > driver_merge_threshold:
        partials = tree_merge(partials, n_parts, fanout)
    rows = sorted(partials.collect(), key=lambda r: r["part_id"])
    if not rows:
        return make_sketch(kind, **dict(params or {}))
    sk = sketch_from_bytes(rows[0]["payload"])
    for r in rows[1:]:
        sk = sk.merge(sketch_from_bytes(r["payload"]))
    return sk


def sketch_agg_staged(df: DataFrame, col: str, kind: str, stage_dir: str,
                      params: dict | None = None,
                      weight_col: str | None = None,
                      fanout: int = 64, driver_merge_threshold: int = 1024):
    """Staged twin of :func:`sketch_agg`, same trade as the staged filter
    build (``dataflow.build_filter_df_staged``): the JVM→python Arrow feed
    of the raw column is the measured bottleneck of the one-shot
    aggregation (the numpy kernels fold ~10x faster than the feed
    delivers), so stage the projected column to parquet pure-JVM-side (NO
    shuffle — each input partition writes its own file) and fold sketch
    partials in python tasks that each read THEIR OWN file with pyarrow.
    Keyed sketches (hll/cms/bloom/mg) produce byte-identical state to
    ``sketch_agg`` under any partitioning (merge law); valued sketches
    (tdigest/kll) stay within their published bounds (state is
    batching-dependent there, exactly as with any repartition).

    ``stage_dir`` is a transient spill (shared filesystem or object store
    on a cluster); caller owns cleanup."""
    from ..dataflow import _make_stage_lister

    _check_kind(kind)
    params = dict(params or {})
    spark = df.sparkSession
    cols = [F.col(col).alias("v")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("w"))
    proj = _drop_null_keys(df.select(*cols), "v", kind)
    if weight_col is not None:
        # match the one-shot path's per-batch drop_null(): a row with a
        # NULL weight is dropped entirely (otherwise the worker would
        # read w as float64-with-NaN and diverge from sketch_agg)
        proj = proj.where(F.col("w").isNotNull())
    (proj.write.mode("overwrite")
     # uniform 64-bit keys are incompressible (see dataflow._stage_keys);
     # page CRCs off for the transient spill, same trade as there
     .option("compression", "none")
     .option("parquet.enable.dictionary", "false")
     .option("parquet.page.write-checksum.enabled", "false")
     .parquet(stage_dir))

    from pyarrow import fs as _pafs
    fsys, base = _pafs.FileSystem.from_uri(stage_dir)
    files = sorted(f.path for f in fsys.get_file_info(
        _pafs.FileSelector(base.rstrip("/")))
        if f.is_file and f.path.endswith(".parquet"))
    if not files:
        return make_sketch(kind, **params)
    tasks = spark.createDataFrame(
        [(i, p) for i, p in enumerate(files)],
        "part_id int, path string").repartition(len(files), "part_id")
    has_w = weight_col is not None
    keyed = kind in KEYED_KINDS

    def fold_files(batches):
        import pyarrow.parquet as _pq
        from pyarrow import fs as _pafs2

        for pdf in batches:
            for pid, path in zip(pdf["part_id"], pdf["path"]):
                t0 = time.time()
                fsys2, p2 = _pafs2.FileSystem.from_uri(path)
                tbl = _pq.read_table(p2, filesystem=fsys2)
                if not keyed:
                    tbl = tbl.drop_null()
                arr_col = tbl.column("v").combine_chunks()
                if keyed:
                    arr = arr_col.to_numpy(
                        zero_copy_only=False).astype(
                            np.int64, copy=False).view(np.uint64)
                else:
                    arr = arr_col.to_numpy(
                        zero_copy_only=False).astype(np.float64, copy=False)
                w = (tbl.column("w").combine_chunks().to_numpy(
                    zero_copy_only=False) if has_w else None)
                sk = make_sketch(kind, **params)
                if arr.size:
                    _feed(sk, kind, arr, w)
                yield pd.DataFrame(
                    [_partial_row(int(pid), kind, sk, int(arr.size), t0)])

    partials = tasks.mapInPandas(fold_files, PARTIAL_SCHEMA)
    if len(files) > driver_merge_threshold:
        partials = tree_merge(partials, len(files), fanout)
    rows = sorted(partials.collect(), key=lambda r: r["part_id"])
    sk = sketch_from_bytes(rows[0]["payload"])
    for r in rows[1:]:
        sk = sk.merge(sketch_from_bytes(r["payload"]))
    return sk


# ---------------------------------------------------------------------------
# Grouped sketches (sketch per key — applyInPandas per group)
# ---------------------------------------------------------------------------

def _headline(kind: str, sk) -> float:
    """The kind's one-number summary. Shared with streaming
    (sketch_window imports THIS function) so a new kind can never be
    wired into one dataflow and silently crash the other — the r4 review
    caught exactly that divergence when theta landed."""
    if kind in ("hll", "theta"):
        return float(sk.estimate())
    if kind == "cms":
        return float(sk.total)
    if kind == "bloom":
        return float(sk.n_added)
    return float(sk.n)   # mg / kll / tdigest: total weight fed


def _col_to_arr(vals: pd.Series, kind: str) -> np.ndarray:
    if kind in KEYED_KINDS:
        # Arrow hands a long column containing ANY null to pandas as float64,
        # and float64 cannot represent all 64-bit keys (low bits lost ⇒
        # silent false negatives for Bloom, diverged HLL/CMS state). The
        # public entry points filter nulls DataFrame-side before the pandas
        # boundary (_drop_null_keys); anything non-integer arriving here is a
        # contract violation we refuse rather than corrupt.
        if not np.issubdtype(vals.dtype, np.integer):
            raise TypeError(
                f"keyed sketch ({kind}) input column must reach the worker "
                f"as int64, got dtype={vals.dtype}. A long column with "
                "nulls converts to float64 and would corrupt 64-bit keys — "
                "filter nulls before sketching (the built-in entry points "
                "do this automatically).")
        return vals.to_numpy(np.int64).view(np.uint64)
    return vals.dropna().to_numpy(np.float64)


def _drop_null_keys(df: DataFrame, col: str, kind: str) -> DataFrame:
    """Keyed sketches: drop null keys DataFrame-side (JVM filter) so the
    pandas boundary never sees a nullable long → float64 conversion. Matches
    the Arrow path (partial_sketches), which drop_null()s per batch."""
    if kind in KEYED_KINDS:
        return df.where(F.col(col).isNotNull())
    return df


def grouped_sketch(df: DataFrame, group_cols: list[str], col: str, kind: str,
                   params: dict | None = None,
                   two_phase: bool = False) -> DataFrame:
    """One sketch per group. Output keeps the group columns and adds
    ``(payload, n_rows, estimate)`` where ``estimate`` is the kind's headline
    number (HLL → distinct estimate; CMS → total weight; Bloom → keys added;
    KLL/t-digest → item count).

    ``two_phase=False`` (default): ``groupBy(keys).applyInPandas`` — one
    pandas frame per group. Right when groups fit in a worker.

    ``two_phase=True`` — the scale path for hot groups: a ``mapInPandas``
    map-side combine folds each input partition's rows into per-group
    partial sketches (no group ever materializes whole), then only KB-sized
    payloads shuffle into a per-group merge. Keyed-sketch output state is
    byte-identical to the single-phase build (max/sum/or merges)."""
    params = dict(params or {})
    _check_kind(kind)
    df = _drop_null_keys(df, col, kind)
    key_fields = [df.schema[c] for c in group_cols]
    out_schema = StructType(key_fields + [
        StructField("payload", BinaryType(), False),
        StructField("n_rows", LongType(), False),
        StructField("estimate", DoubleType(), False),
    ])

    if not two_phase:
        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            sk = make_sketch(kind, **params)
            arr = _col_to_arr(pdf[col], kind)
            _feed(sk, kind, arr)
            head = {c: pdf[c].iloc[0] for c in group_cols}
            return pd.DataFrame([{**head, "payload": sk.to_bytes(),
                                  "n_rows": int(arr.size),
                                  "estimate": _headline(kind, sk)}])

        return df.groupBy(*group_cols).applyInPandas(build, out_schema)

    partial_schema = StructType(key_fields + [
        StructField("payload", BinaryType(), False),
        StructField("n_rows", LongType(), False),
    ])

    def combine(pdfs):
        sketches: dict = {}
        counts: dict = {}
        for pdf in pdfs:
            for key, sub in pdf.groupby(group_cols, dropna=False,
                                        sort=False):
                if not isinstance(key, tuple):
                    key = (key,)
                arr = _col_to_arr(sub[col], kind)
                sk = sketches.get(key)
                if sk is None:
                    sk = sketches[key] = make_sketch(kind, **params)
                    counts[key] = 0
                _feed(sk, kind, arr)
                counts[key] += int(arr.size)
        if sketches:
            yield pd.DataFrame([
                {**dict(zip(group_cols, key)), "payload": sk.to_bytes(),
                 "n_rows": counts[key]}
                for key, sk in sketches.items()])

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("n_rows", kind="stable")
        sk = None
        for payload in pdf["payload"]:
            s = sketch_from_bytes(payload)
            sk = s if sk is None else sk.merge(s)
        head = {c: pdf[c].iloc[0] for c in group_cols}
        return pd.DataFrame([{**head, "payload": sk.to_bytes(),
                              "n_rows": int(pdf["n_rows"].sum()),
                              "estimate": _headline(kind, sk)}])

    partials = df.mapInPandas(combine, partial_schema)
    return partials.groupBy(*group_cols).applyInPandas(merge, out_schema)


# ---------------------------------------------------------------------------
# Checkpoint-resumable sketch table (per-bucket lineage)
# ---------------------------------------------------------------------------

def bucket_col(col: str, kind: str, n_buckets: int):
    """Deterministic bucket id for a sketched column. Keyed sketches bucket by
    the top bits of the (already uniform) 64-bit key — same hash-prefix
    discipline as the filter shard table; valued sketches bucket by
    ``pmod(xxhash64(value), n))``."""
    p = int(math.log2(n_buckets))
    if 1 << p != n_buckets:
        raise ValueError("n_buckets must be a power of two")
    if kind in KEYED_KINDS:
        if p == 0:
            return F.lit(0).cast("int")
        return F.shiftrightunsigned(F.col(col), 64 - p).cast("int")
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")


def _bucket_build_fn(kind: str, params: dict, col: str):
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        sk = make_sketch(kind, **params)
        arr = _col_to_arr(pdf[col], kind)
        # input-sorted ⇒ payload bytes are a pure function of bucket content,
        # so a resumed build is byte-identical to an uninterrupted one
        _feed(sk, kind, np.sort(arr))
        pid = int(pdf["__bucket"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame([_partial_row(pid, kind, sk, int(arr.size), t0)])

    return build


def _sketch_table_stamp(kind: str, params: dict, n_buckets: int,
                        key_def: str | None) -> str:
    """Canonical wiring+derivation tag stamped on a sketch lineage table.

    Covers BOTH hazards a resume can silently mix (r4 verdict item 8,
    same class as ``build_filter_table``'s ``_XORF_KEYDEF``):

    - ``key_def``: the upstream definition of the sketched column (e.g.
      ``shingle_key_def(8)``) — resuming after the derivation changed
      would merge sketches of two different universes into one estimate;
    - the wiring itself (kind/params/n_buckets): a resumed build with a
      different ``n_buckets`` reinterprets committed ``part_id``s as a
      DIFFERENT hash range, so the skip-done filter drops live data; a
      changed ``params`` (e.g. HLL p) makes partials unmergeable or, for
      additive sketches, silently wrong.
    """
    import json as _json

    return _json.dumps(
        {"kind": kind, "params": {k: params[k] for k in sorted(params)},
         "n_buckets": int(n_buckets), "key_def": key_def},
        sort_keys=True)


def build_sketch_table(df: DataFrame, col: str, kind: str, path: str,
                       params: dict | None = None, n_buckets: int = 16,
                       resume: bool = True,
                       key_def: str | None = None) -> DataFrame:
    """Checkpoint-resumable sketch build: one partial per hash bucket,
    appended to a parquet lineage table ``(part_id, kind, payload, n_rows,
    build_secs)``. Restarts skip committed buckets.

    The resume listing catches ONLY ``AnalysisException`` (path-not-found
    = genuinely no table yet). A transient FS/auth error must propagate:
    swallowing it would read as "no table", rebuild every bucket and
    append duplicates — and while HLL/Bloom merges are idempotent, CMS /
    MG / KLL / t-digest merges are ADDITIVE, so duplicated partials would
    silently double their mass (the r3 verdict's double-count finding;
    same class as the ``_stage_keys`` fix). ``sketch_from_table`` also
    dedupes ``part_id`` on read as a belt-and-braces backstop.

    The table is stamped with a ``_XORF_KEYDEF`` sidecar holding the full
    wiring tag (:func:`_sketch_table_stamp`); any append — resumed or not
    — refuses on mismatch, and an unstamped non-empty table refuses ANY
    append (unverifiable — unlike the filter table there is no
    "declared nothing" case, because kind/params/n_buckets are always
    declared and a mismatch in any of them corrupts the merge). Shares
    ``dataflow._guard_stamped_append`` with ``build_filter_table``."""
    from ..dataflow import _guard_stamped_append, _write_keydef

    params = dict(params or {})
    _check_kind(kind)
    spark = df.sparkSession
    done: set[int] = set()
    table_seen = False
    if resume:
        try:
            done = {r.part_id for r in spark.read.parquet(path)
                    .select("part_id").distinct().collect()}
            table_seen = True
        except AnalysisException:
            done = set()
    stamp = _sketch_table_stamp(kind, params, n_buckets, key_def)
    # shared guard with build_filter_table (one implementation for both
    # table types); probe_always because the stamp covers kind/params/
    # n_buckets too, so existence matters even with key_def=None
    if _guard_stamped_append(
            path, stamp, key_def, resume, table_seen,
            lambda: spark.read.parquet(path).limit(1).take(1),
            lambda existing: (
                f"sketch-table wiring mismatch appending to {path!r}: "
                f"table was built under {existing}, this build derives "
                f"{stamp}. Mixed wirings corrupt the merged estimate "
                f"(changed n_buckets reinterprets committed part_ids; "
                f"changed params break the merge law; changed key_def "
                f"merges two different key universes) — rebuild at a "
                f"fresh path."),
            lambda: (
                f"sketch table at {path!r} has no wiring stamp (built "
                f"before versioning); cannot prove its kind/params/"
                f"n_buckets/key_def match this build's {stamp}, and a "
                f"mismatched append silently corrupts the merged "
                f"estimate. Rebuild at a fresh path."),
            probe_always=True, refuse_unstamped_always=True):
        # fresh table: stamp BEFORE the data append (a crash in between
        # leaves a stamped empty table that resumes cleanly). A legacy
        # non-empty table is left UNSTAMPED — stamping it now would
        # certify a wiring history this build cannot verify.
        _write_keydef(path, stamp)
    bucketed = _drop_null_keys(
        df.select(F.col(col).alias(col)), col, kind).withColumn(
        "__bucket", bucket_col(col, kind, n_buckets))
    if done:
        bucketed = bucketed.where(~F.col("__bucket").isin(list(done)))
    partials = (bucketed.repartition(n_buckets, "__bucket")
                .groupBy("__bucket")
                .applyInPandas(_bucket_build_fn(kind, params, col),
                               PARTIAL_SCHEMA))
    if done:
        partials = partials.where(~F.col("part_id").isin(list(done)))
    partials.write.mode("append").parquet(path)
    return spark.read.parquet(path)


def sketch_from_table(spark: SparkSession, path: str):
    """Merge a persisted partial-sketch table into one sketch object
    (deterministic part_id order).

    Keeps exactly ONE row per ``part_id``: bucket builds are deterministic
    (input-sorted feed), so any duplicate rows a crashed-and-replayed
    append left behind are byte-identical copies — merging them anyway
    would double the mass of the additive sketches (CMS/MG/KLL/t-digest)
    and break their published error laws."""
    rows = sorted(spark.read.parquet(path).collect(),
                  key=lambda r: r.part_id)
    sk = None
    seen: set[int] = set()
    for r in rows:
        if r.part_id in seen:
            continue
        seen.add(r.part_id)
        s = sketch_from_bytes(r.payload)
        sk = s if sk is None else sk.merge(s)
    return sk


# ---------------------------------------------------------------------------
# Probe-side UDFs (broadcast sketch → vectorized pandas UDF)
# ---------------------------------------------------------------------------

#: Worker-side deserialized-sketch cache. Bounded (LRU): a long-lived
#: executor that keeps creating probe UDFs (e.g. rebuilding a t-digest per
#: training batch) must not accumulate dead sketches forever.
_SKETCH_CACHE: "OrderedDict[str, object]" = OrderedDict()
_SKETCH_CACHE_MAX = 32


def _cached(tag: str, bc):
    # keyed by a per-UDF uuid, NOT id(bc): python ids are reused after GC,
    # so an id key could hand one query's UDF another query's sketch
    sk = _SKETCH_CACHE.get(tag)
    if sk is None:
        sk = sketch_from_bytes(bc.value)
        _SKETCH_CACHE[tag] = sk
        while len(_SKETCH_CACHE) > _SKETCH_CACHE_MAX:
            _SKETCH_CACHE.popitem(last=False)
    else:
        _SKETCH_CACHE.move_to_end(tag)
    return sk


def _probe_keys(keys: pd.Series) -> np.ndarray:
    """uint64 view of a probe-key batch. The null-safe wrappers guarantee
    the batch is non-nullable int64; a float64 arrival means a nullable
    long column reached pandas directly, where its 64-bit keys have
    ALREADY lost low bits — refuse rather than return corrupt answers."""
    if not np.issubdtype(keys.dtype, np.integer):
        raise TypeError(
            f"sketch probe received a {keys.dtype} batch: nullable long "
            "columns lose 64-bit key precision at the Arrow→pandas "
            "boundary. Probe through the null-safe wrapper these "
            "factories return, or filter NULL keys first.")
    return keys.to_numpy(np.int64).view(np.uint64)


def cms_estimate_udf(spark: SparkSession, cms):
    """``long key -> long`` estimated count (never under the true count)."""
    import uuid

    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(cms.to_bytes())
    tag = uuid.uuid4().hex

    @pandas_udf("long")
    def _est(keys: pd.Series) -> pd.Series:
        sk = _cached(tag, bc)
        return pd.Series(sk.estimate_hashes(_probe_keys(keys)))

    return null_safe_udf(_est, "long")


def mg_estimate_udf(spark: SparkSession, mg):
    """``long key -> long`` Misra-Gries lower-bound count (0 for untracked
    keys; ``true ≤ est + mg.dsub``). Dual of the CMS probe — CMS never
    under-counts, MG never over-counts — and shares its broadcast/cache
    plumbing: the probe body only calls ``estimate_hashes`` on the
    deserialized sketch, which both kinds implement."""
    return cms_estimate_udf(spark, mg)


def tdigest_cdf_udf(spark: SparkSession, td):
    """``double value -> double`` estimated rank (fraction of the sketched
    distribution ≤ value). The training-data filtering primitive: train a
    t-digest over e.g. document lengths, then keep rows between chosen
    percentiles with a WHERE clause — no global sort, no second pass."""
    import uuid

    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(td.to_bytes())
    tag = uuid.uuid4().hex

    @pandas_udf("double")
    def _cdf(vals: pd.Series) -> pd.Series:
        sk = _cached(tag, bc)
        return pd.Series(sk.cdf(vals.to_numpy(np.float64)))

    # doubles lose nothing at the pandas boundary (NULL arrives as NaN),
    # but SQL semantics say f(NULL) IS NULL, not NaN — same wrapper,
    # double input (the default long cast would truncate fractions)
    return null_safe_udf(_cdf, "double", in_type="double")


def bloom_contains_udf(spark: SparkSession, bloom):
    """``long key -> boolean`` membership (zero false negatives)."""
    import uuid

    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(bloom.to_bytes())
    tag = uuid.uuid4().hex

    @pandas_udf("boolean")
    def _contains(keys: pd.Series) -> pd.Series:
        sk = _cached(tag, bc)
        return pd.Series(sk.contains_hashes(_probe_keys(keys)))

    return null_safe_udf(_contains, "boolean")
