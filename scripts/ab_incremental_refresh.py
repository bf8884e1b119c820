"""A/B: incremental vs full filter refresh (VERDICT r5 item 5).

Two churn regimes against a 7M-key table (n_shards=32):
- trickle: 20 new distinct keys (the low-rate case the fast path is
  for — growth < 4*n_shards, so unchanged shards are provably reusable);
- flood: 1% new keys (70k) — uniform hashing touches every shard, the
  growth gate must bail after ONE scalar count so the overhead vs a
  plain full rebuild stays ~a single agg.

Membership byte-identity is pinned in tests/test_filter_refresh.py::
test_incremental_refresh_reuses_unchanged_shards.

Usage: python scripts/ab_incremental_refresh.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 7_000_000


def run(incremental: bool, churn_keys: int, tag: str) -> float:
    from pyspark.sql import SparkSession, functions as F

    from xorf_spark.dataflow import ship_package
    from xorf_spark.streaming.filter_refresh import stream_filter_refresh

    spark = (SparkSession.builder.master("local[32]")
             .appName(f"ab-incr-{tag}-{incremental}")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                     "1048576")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    work = tempfile.mkdtemp(prefix="ab_incr_")
    src = os.path.join(work, "in")
    (spark.range(0, N).select(F.xxhash64("id").alias("key"))
     .repartition(1).write.parquet(f"{src}/b1"))
    stream = (spark.readStream.schema("key long")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    q = (stream_filter_refresh(stream, os.path.join(work, "ftab"),
                               n_shards=32, refresh_every=1,
                               incremental=incremental)
         .option("checkpointLocation", os.path.join(work, "ck")).start())
    q.processAllAvailable()
    (spark.range(N, N + churn_keys).select(F.xxhash64("id").alias("key"))
     .repartition(1).write.parquet(f"{src}/b2"))
    t0 = time.time()
    q.processAllAvailable()
    trigger2 = time.time() - t0
    durs = [json.loads(p.json)["durationMs"].get("triggerExecution")
            for p in q.recentProgress]
    q.stop()
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print(f"{tag} incremental={incremental}: refresh-2 wall "
          f"{trigger2:.2f}s  triggers(ms) {durs[-3:]}", flush=True)
    return trigger2


def main():
    for rep in range(2):
        run(True, 20, "trickle")
        run(False, 20, "trickle")
    run(True, int(N * 0.01), "flood")
    run(False, int(N * 0.01), "flood")


if __name__ == "__main__":
    main()
