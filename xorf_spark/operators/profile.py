"""One-pass sketch table profiling: per-column distinct estimate (HLL),
quantiles (KLL, numeric columns), heavy values (Misra-Gries) and exact
null/min/max — all folded in a SINGLE ``mapInArrow`` scan of the table.

The 100 TB story: profiling with exact operators costs one shuffle per
statistic per column (``countDistinct`` + ``percentile`` + ``GROUP BY``
each scan or exchange the data again); this pass reads the table once,
keeps one small sketch set per (partition, column) in the worker, and
reduces the partials DISTRIBUTED — a ``groupBy(column)`` merge task per
column consumes the KB-sized partial rows, so the driver only ever
collects one row per column (never #partitions × #columns sketch
payloads). Column pruning still applies — only the profiled columns
cross the Arrow boundary, pre-hashed JVM-side (``xxhash64``) so no raw
string ever needs hashing in Python.

Semantics notes:

- NaN counts as a *value* for ``n_vals`` / the distinct estimate (SQL
  ``count`` semantics) but is excluded from min/max and quantiles (the
  order statistics, matching ``min``/``max``/``percentile`` in SQL
  engines) — and the result is partitioning-invariant either way.
- Integer columns report EXACT ``ivmin``/``ivmax`` (int64 — beyond
  double's 2⁵³ integer range the ``vmin``/``vmax`` doubles are the
  nearest representable, so use the integer fields for id/key columns);
  float columns report exact ``vmin``/``vmax`` doubles. Quantiles feed
  through float64 and are approximate by KLL's published rank bound
  regardless.
"""

from __future__ import annotations

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

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)
_NUMERIC = _INTEGRAL + (FloatType, DoubleType)

#: one row per (input partition, profiled column) — and, after the
#: distributed reduce, one row per column
PARTIAL_SCHEMA = ("column string, n_vals long, n_nulls long, "
                  "hll binary, mg binary, kll binary, "
                  "vmin double, vmax double, ivmin long, ivmax long")

FINAL_SCHEMA = ("column string, is_numeric boolean, n_vals long, "
                "n_nulls long, distinct_est double, top_value_est double, "
                "p50 double, p95 double, vmin double, vmax double, "
                "ivmin long, ivmax long")


def _acc_min(cur, lo):
    return lo if cur is None else min(cur, lo)


def _acc_max(cur, hi):
    return hi if cur is None else max(cur, hi)


def profile_partials(df: DataFrame, columns: list[str] | None = None,
                     hll_p: int = 13, kll_k: int = 256,
                     mg_k: int = 64) -> DataFrame:
    """The map half: one partial-profile row per (partition, column).
    Numeric columns additionally carry a KLL sketch and exact min/max;
    every column carries HLL (distinct over non-null values), MG (heavy
    values, hashed) and exact null counts."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns or fields)
    numeric = {c: isinstance(fields[c], _NUMERIC) for c in cols}
    integral = {c: isinstance(fields[c], _INTEGRAL) for c in cols}
    proj = []
    for i, c in enumerate(cols):
        # xxhash64(NULL) returns the seed, not NULL — gate it so nulls
        # are excluded from the sketches and counted separately
        proj.append(F.when(F.col(c).isNotNull(), F.xxhash64(F.col(c)))
                    .alias(f"h{i}"))
        if numeric[c]:
            # integers stay integers (exact min/max beyond double's 2^53
            # integer range); floats normalize to double
            v = F.col(c) if integral[c] else F.col(c).cast("double")
            proj.append(v.alias(f"v{i}"))

    def fold(batches):
        acc = {c: {"hll": make_sketch("hll", p=hll_p),
                   "mg": make_sketch("mg", k=mg_k),
                   "kll": make_sketch("kll", k=kll_k) if numeric[c]
                   else None,
                   "n": 0, "nulls": 0, "vmin": None, "vmax": None,
                   "ivmin": None, "ivmax": None}
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
                    if integral[c]:
                        v = v.astype(np.int64, copy=False)
                        if v.size:
                            a["ivmin"] = _acc_min(a["ivmin"],
                                                  int(v.min()))
                            a["ivmax"] = _acc_max(a["ivmax"],
                                                  int(v.max()))
                            a["kll"].add(v.astype(np.float64))
                    else:
                        # NaN is a value for counts but not an order
                        # statistic; np.min would propagate it (and a
                        # python min/max merge of NaN is order-dependent)
                        v = v[~np.isnan(v)]
                        if v.size:
                            a["vmin"] = _acc_min(a["vmin"],
                                                 float(np.min(v)))
                            a["vmax"] = _acc_max(a["vmax"],
                                                 float(np.max(v)))
                            a["kll"].add(v)
        if not seen:
            return
        out = {"column": [], "n_vals": [], "n_nulls": [], "hll": [],
               "mg": [], "kll": [], "vmin": [], "vmax": [],
               "ivmin": [], "ivmax": []}
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
            out["ivmin"].append(a["ivmin"])
            out["ivmax"].append(a["ivmax"])
        yield pa.RecordBatch.from_pydict(out)

    return df.select(*proj).mapInArrow(fold, PARTIAL_SCHEMA)


def _merge_partials(tb: pa.Table) -> pa.Table:
    """Distributed reduce: fold all of one column's partial rows into a
    single partial row (runs as one task per column — the driver never
    sees more than one row per column). Arrow in/out, NOT pandas: a
    partial row with a null ``ivmin``/``ivmax`` (a partition whose
    integral column was all NULL) would coerce the whole pandas column
    to float64, rounding exact int64 min/max beyond 2⁵³ — the precise
    case the module contract promises to keep exact."""
    hll = mg = kll = None
    n = nulls = 0
    vmin = vmax = ivmin = ivmax = None
    for r in tb.to_pylist():   # exact python ints, None for nulls
        n += r["n_vals"]
        nulls += r["n_nulls"]
        for name, payload in (("hll", r["hll"]), ("mg", r["mg"]),
                              ("kll", r["kll"])):
            if payload is None:
                continue
            sk = sketch_from_bytes(payload)
            if name == "hll":
                hll = sk if hll is None else hll.merge(sk)
            elif name == "mg":
                mg = sk if mg is None else mg.merge(sk)
            else:
                kll = sk if kll is None else kll.merge(sk)
        if r["vmin"] is not None:
            vmin = _acc_min(vmin, float(r["vmin"]))
        if r["vmax"] is not None:
            vmax = _acc_max(vmax, float(r["vmax"]))
        if r["ivmin"] is not None:
            ivmin = _acc_min(ivmin, int(r["ivmin"]))
        if r["ivmax"] is not None:
            ivmax = _acc_max(ivmax, int(r["ivmax"]))
    return pa.Table.from_pylist([{
        "column": tb.column("column")[0].as_py(),
        "n_vals": n, "n_nulls": nulls,
        "hll": hll.to_bytes() if hll else None,
        "mg": mg.to_bytes() if mg else None,
        "kll": kll.to_bytes() if kll else None,
        "vmin": vmin, "vmax": vmax, "ivmin": ivmin, "ivmax": ivmax}],
        schema=tb.schema)


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  hll_p: int = 13, kll_k: int = 256,
                  mg_k: int = 64) -> DataFrame:
    """One-pass table profile. Returns one row per column:
    ``(column, is_numeric, n_vals, n_nulls, distinct_est, top_value_est,
    p50, p95, vmin, vmax, ivmin, ivmax)`` — exact fields (counts,
    min/max) are exact (integer min/max carried as int64); sketched
    fields carry their kernels' published bounds."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns or fields)
    numeric = {c: isinstance(fields[c], _NUMERIC) for c in cols}
    merged = (profile_partials(df, cols, hll_p, kll_k, mg_k)
              .groupBy("column")
              .applyInArrow(_merge_partials, PARTIAL_SCHEMA)
              .collect())
    by_col = {r.column: r for r in merged}
    out = []
    for c in cols:
        r = by_col.get(c)
        if r is None:   # empty input frame: no partial rows at all
            out.append((c, numeric[c], 0, 0, 0.0, 0.0,
                        None, None, None, None, None, None))
            continue
        hll = sketch_from_bytes(r.hll) if r.hll is not None else None
        mg = sketch_from_bytes(r.mg) if r.mg is not None else None
        kll = sketch_from_bytes(r.kll) if r.kll is not None else None
        top = (float(np.max(mg.counts)) if mg is not None
               and mg.counts.size else 0.0)
        # gate on KLL's OWN count: NaN-only numeric columns have hashed
        # values (n_vals > 0) but an empty KLL, and quantiles of an
        # empty sketch must be None, not NaN
        if kll is not None and kll.n > 0:
            p50, p95 = (float(x) for x in kll.quantiles([0.5, 0.95]))
        else:
            p50 = p95 = None
        vmin, vmax = r.vmin, r.vmax
        if vmin is None and r.ivmin is not None:
            vmin, vmax = float(r.ivmin), float(r.ivmax)
        out.append((c, numeric[c], r.n_vals, r.n_nulls,
                    float(hll.estimate()) if hll else 0.0,
                    top, p50, p95, vmin, vmax, r.ivmin, r.ivmax))
    return df.sparkSession.createDataFrame(out, FINAL_SCHEMA)
