"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 on Spark AND its oracle_sql() on DuckDB, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]

Set CHECK_JSON=<path> to also append one JSON line
{"sf_dir": ..., "results": {name: {"status": "pass|fail|rows-only",
"rows": N, "secs": s}}} — scripts/run_full_check.sh merges these into
the committed CHECK_r{N}.json artifact.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from xorf_spark.queries import TABLES  # noqa: E402


def normalize(rows, cols):
    """Type-aware normalization mirroring the driver: values keep their
    python type (so an int64 on one side vs a str on the other FAILS, it is
    not hidden by str()); floats round to 6dp; column order is by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, bool):
                v = ("bool", v)
            elif isinstance(v, float):
                v = ("float", round(v, 6))
            elif isinstance(v, int):
                v = ("int", v)
            elif isinstance(v, (list, tuple)):
                v = ("list", str(v))
            elif v is None:
                v = ("null", "")
            else:
                v = (type(v).__name__, str(v))
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName("oracle-check")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    results = {}

    def record(name, status, rows, secs):
        results[name] = {"status": status, "rows": rows,
                         "secs": round(secs, 2)}

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error {type(exc).__name__}: {exc}")
            n_fail += 1
            record(name, "fail", 0, time.time() - t0)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(rows)} rows ({dt:.1f}s)")
            n_rowsonly += 1
            record(name, "rows-only", len(rows), dt)
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error {exc}")
            n_fail += 1
            record(name, "fail", len(rows), dt)
            continue
        if sorted(cols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(cols)} != {sorted(ocols)}")
            n_fail += 1
            record(name, "fail", len(rows), dt)
            continue
        a = normalize(rows, cols)
        b = normalize(orows, ocols)
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount {len(a)} != {len(b)}")
            n_fail += 1
            record(name, "fail", len(a), dt)
        elif a != b:
            bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
            n_fail += 1
            record(name, "fail", len(a), dt)
        else:
            print(f"PASS {name}: {len(a)} rows ({dt:.1f}s)")
            n_pass += 1
            record(name, "pass", len(a), dt)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    out_json = os.environ.get("CHECK_JSON")
    if out_json:
        with open(out_json, "a") as fh:
            fh.write(json.dumps({"sf_dir": sf_dir, "results": results})
                     + "\n")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
