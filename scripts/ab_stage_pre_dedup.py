"""A/B: per-batch np.unique pre-dedup inside the staged spill writer
(VERDICT-r4 item 7) vs the unmodified staged build.

Interleaved best-of-N in ONE process (session-ordering artifacts have
flipped verdicts twice — see .claude/skills/verify). Two corpora:

- dup-factor 1.0: the bench token corpus's measured regime (53.9M raw =
  53.9M distinct shingles) — pre-dedup has nothing to remove;
- dup-factor 4.0: each key delivered 4x (near-duplicate-heavy web-crawl
  shape) — pre-dedup shrinks the spill ~4x before the parquet encode.

Usage: python scripts/ab_stage_pre_dedup.py [n_distinct] [repeats]
Prints one JSON line; record in BENCH/ROUND5_NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

N_DISTINCT = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from xorf_spark import dataflow as D
    D.ship_package(spark)

    def corpus(dup_factor: int):
        base = spark.range(N_DISTINCT).select(F.xxhash64("id").alias("key"))
        if dup_factor == 1:
            return base
        return spark.range(N_DISTINCT * dup_factor).select(
            F.xxhash64(F.col("id") % N_DISTINCT).alias("key"))

    # warm up JIT/shuffle/python-worker paths (uncounted)
    D.build_filter_df_staged(
        corpus(1).limit(2_000_000), tempfile.mkdtemp(prefix="ab_warm_"),
        kind="bfuse8", n_shards=32).agg(F.sum("n_keys")).collect()

    def run(keys, pre_dedup: bool):
        d = tempfile.mkdtemp(prefix="ab_stage_")
        t0 = time.time()
        total = (D.build_filter_df_staged(keys, d, kind="bfuse8",
                                          n_shards=128, pre_dedup=pre_dedup)
                 .agg(F.sum("n_keys")).collect()[0][0])
        secs = time.time() - t0
        size = sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(d) for f in fs)
        shutil.rmtree(d, ignore_errors=True)
        return secs, int(total), size

    out = {"n_distinct": N_DISTINCT, "repeats": REPEATS, "cpus": CPUS,
           "loadavg_1m": round(os.getloadavg()[0], 2)}
    for dup in (1, 4):
        keys = corpus(dup)
        best = {"A_no_dedup": float("inf"), "B_pre_dedup": float("inf")}
        meta = {}
        for _ in range(REPEATS):          # interleaved A,B,A,B,...
            for name, flag in (("A_no_dedup", False), ("B_pre_dedup", True)):
                secs, total, size = run(keys, flag)
                if secs < best[name]:
                    best[name] = secs
                    meta[name] = {"secs": round(secs, 2), "built_keys": total,
                                  "spill_bytes": size}
        meta["delta_pct"] = round(
            100 * (best["B_pre_dedup"] - best["A_no_dedup"])
            / best["A_no_dedup"], 1)
        out[f"dup_factor_{dup}"] = meta
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
