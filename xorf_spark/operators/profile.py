"""One-pass sketch table profiling: per-column distinct estimate (HLL),
quantiles (KLL, numeric columns), heavy values (Misra-Gries) and exact
null/min/max — all folded in a SINGLE ``mapInArrow`` scan of the table.

The 100 TB story: profiling with exact operators costs one shuffle per
statistic per column (``countDistinct`` + ``percentile`` + ``GROUP BY``
each scan or exchange the data again); this pass reads the table once,
keeps one small sketch set per (partition, column) in the worker, and
ships only KB-sized partial rows to the driver, where the mergeable-
sketch laws (`sketches/kernels.py`) make the fold exact w.r.t. each
sketch's published bound. Column pruning still applies — only the
profiled columns cross the Arrow boundary, pre-hashed JVM-side
(``xxhash64``) so no raw string ever needs hashing in Python.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
)

from ..sketches.kernels import make_sketch, sketch_from_bytes

_NUMERIC = (ByteType, ShortType, IntegerType, LongType, FloatType,
            DoubleType)

#: one row per (input partition, profiled column)
PARTIAL_SCHEMA = ("column string, n_vals long, n_nulls long, "
                  "hll binary, mg binary, kll binary, "
                  "vmin double, vmax double")

FINAL_SCHEMA = ("column string, is_numeric boolean, n_vals long, "
                "n_nulls long, distinct_est double, top_value_est double, "
                "p50 double, p95 double, vmin double, vmax double")


def profile_partials(df: DataFrame, columns: list[str] | None = None,
                     hll_p: int = 13, kll_k: int = 256,
                     mg_k: int = 64) -> DataFrame:
    """The distributed half: one partial-profile row per (partition,
    column). Numeric columns additionally carry a KLL sketch and exact
    min/max; every column carries HLL (distinct over non-null values),
    MG (heavy values, hashed) and exact null counts."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns or fields)
    numeric = {c: isinstance(fields[c], _NUMERIC) for c in cols}
    proj = []
    for i, c in enumerate(cols):
        # xxhash64(NULL) returns the seed, not NULL — gate it so nulls
        # are excluded from the sketches and counted separately
        proj.append(F.when(F.col(c).isNotNull(), F.xxhash64(F.col(c)))
                    .alias(f"h{i}"))
        if numeric[c]:
            proj.append(F.col(c).cast("double").alias(f"v{i}"))

    def fold(batches):
        t0 = time.time()  # noqa: F841  (kept for symmetry/debugging)
        acc = {c: {"hll": make_sketch("hll", p=hll_p),
                   "mg": make_sketch("mg", k=mg_k),
                   "kll": make_sketch("kll", k=kll_k) if numeric[c]
                   else None,
                   "n": 0, "nulls": 0, "vmin": None, "vmax": None}
               for c in cols}
        seen = False
        for b in batches:
            seen = True
            tb = pa.table(b)
            for i, c in enumerate(cols):
                a = acc[c]
                hcol = tb.column(f"h{i}")
                a["nulls"] += hcol.null_count
                h = hcol.drop_null().combine_chunks().to_numpy(
                    zero_copy_only=False)
                if h.size:
                    a["n"] += int(h.size)
                    a["hll"].add_hashes(h)
                    a["mg"].add_hashes(h)
                if numeric[c]:
                    v = (tb.column(f"v{i}").drop_null().combine_chunks()
                         .to_numpy(zero_copy_only=False))
                    if v.size:
                        a["kll"].add(v)
                        lo, hi = float(np.min(v)), float(np.max(v))
                        a["vmin"] = lo if a["vmin"] is None \
                            else min(a["vmin"], lo)
                        a["vmax"] = hi if a["vmax"] is None \
                            else max(a["vmax"], hi)
        if not seen:
            return
        out = {"column": [], "n_vals": [], "n_nulls": [], "hll": [],
               "mg": [], "kll": [], "vmin": [], "vmax": []}
        for c in cols:
            a = acc[c]
            out["column"].append(c)
            out["n_vals"].append(a["n"])
            out["n_nulls"].append(a["nulls"])
            out["hll"].append(a["hll"].to_bytes())
            out["mg"].append(a["mg"].to_bytes())
            out["kll"].append(a["kll"].to_bytes() if a["kll"] else None)
            out["vmin"].append(a["vmin"])
            out["vmax"].append(a["vmax"])
        yield pa.RecordBatch.from_pydict(out)

    return df.select(*proj).mapInArrow(fold, PARTIAL_SCHEMA)


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  hll_p: int = 13, kll_k: int = 256,
                  mg_k: int = 64) -> DataFrame:
    """One-pass table profile. Returns one row per column:
    ``(column, is_numeric, n_vals, n_nulls, distinct_est, top_value_est,
    p50, p95, vmin, vmax)`` — exact fields (counts, min/max) are exact;
    sketched fields carry their kernels' published bounds. The driver
    merge handles KB-sized partials only (#partitions × #columns rows)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns or fields)
    numeric = {c: isinstance(fields[c], _NUMERIC) for c in cols}
    rows = profile_partials(df, cols, hll_p, kll_k, mg_k).collect()
    merged: dict[str, dict] = {}
    for r in rows:
        m = merged.setdefault(r.column, {
            "n": 0, "nulls": 0, "hll": None, "mg": None, "kll": None,
            "vmin": None, "vmax": None})
        m["n"] += r.n_vals
        m["nulls"] += r.n_nulls
        for key, payload in (("hll", r.hll), ("mg", r.mg), ("kll", r.kll)):
            if payload is None:
                continue
            sk = sketch_from_bytes(payload)
            m[key] = sk if m[key] is None else m[key].merge(sk)
        if r.vmin is not None:
            m["vmin"] = r.vmin if m["vmin"] is None \
                else min(m["vmin"], r.vmin)
        if r.vmax is not None:
            m["vmax"] = r.vmax if m["vmax"] is None \
                else max(m["vmax"], r.vmax)
    out = []
    for c in cols:
        m = merged.get(c)
        if m is None:   # empty input frame: no partial rows at all
            m = {"n": 0, "nulls": 0, "hll": None, "mg": None, "kll": None,
                 "vmin": None, "vmax": None}
        top = (float(np.max(m["mg"].counts)) if m["mg"] is not None
               and m["mg"].counts.size else 0.0)
        if m["kll"] is not None and m["n"] > 0:
            p50, p95 = (float(x) for x in m["kll"].quantiles([0.5, 0.95]))
        else:
            p50 = p95 = None
        out.append((c, numeric[c], m["n"], m["nulls"],
                    float(m["hll"].estimate()) if m["hll"] else 0.0,
                    top, p50, p95, m["vmin"], m["vmax"]))
    return df.sparkSession.createDataFrame(out, FINAL_SCHEMA)
