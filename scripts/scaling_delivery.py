"""Two-cluster-size scaling evidence for the delivery sink: run
write_training_shards + verify_training_shards on the SAME input at
local[2] (N) and local[8] (4N), fresh JVM per level, best-of-2, and print
throughput at both plus efficiency = (rate_4N / rate_N) / 4.

2 vs 8 is the linear-hardware regime on this box (BENCH/BASELINE.md: at
8→32 every memory-bound kernel hits the measured single-socket DRAM
ceiling that separate N→4N machines do not share).

Usage: python scripts/scaling_delivery.py [n_rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, os.environ["XORF_REPO"])
from pyspark.sql import SparkSession, functions as F
from xorf_spark.operators import sink

cpus = int(os.environ["XORF_CPUS"])
n_rows = int(os.environ["XORF_ROWS"])
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.driver.memory", "40g")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(n_rows).select(
    F.format_string("doc-%012d", "id").alias("doc_id"),
    F.xxhash64("id").alias("key"),
    F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1000)).alias("meta"))
best_w = best_v = float("inf")
for _ in range(2):
    p = tempfile.mkdtemp(prefix=f"xorf_scale_sink_{cpus}_")
    t0 = time.time()
    m = sink.write_training_shards(df, p, rows_per_shard=n_rows // 16,
                                   key_col="doc_id")
    best_w = min(best_w, time.time() - t0)
    t0 = time.time()
    v = sink.verify_training_shards(spark, p)
    best_v = min(best_v, time.time() - t0)
    assert v["ok"] and m["n_shards"] == 16
print(json.dumps({"cpus": cpus, "write_secs": best_w,
                  "verify_secs": best_v}))
"""


def run(cpus: int, n_rows: int) -> dict:
    env = dict(os.environ, XORF_REPO=REPO, XORF_CPUS=str(cpus),
               XORF_ROWS=str(n_rows))
    out = subprocess.run([sys.executable, "-c", WORKER], env=env,
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    lo, hi = run(2, n_rows), run(8, n_rows)
    for job in ("write", "verify"):
        r2 = n_rows / lo[f"{job}_secs"]
        r8 = n_rows / hi[f"{job}_secs"]
        eff = (r8 / r2) / 4
        print(f"{job}: local[2] {lo[f'{job}_secs']:.2f}s = {r2:,.0f} rows/s"
              f" | local[8] {hi[f'{job}_secs']:.2f}s = {r8:,.0f} rows/s"
              f" | speedup {r8 / r2:.2f}x | efficiency {eff:.2f}")


if __name__ == "__main__":
    main()
