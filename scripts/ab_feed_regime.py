"""Isolate the local-mode JVM->python Arrow feed cost and the 'post-shuffle
python-feed slowdown' regime (BENCH/BASELINE.md "Reading these numbers").

Measures, in ONE session (mirroring bench.py's conf):
  1. jvm_only       spark.range->xxhash64->noop  (no python)
  2. null_fold      mapInArrow consuming batches, yielding 1 row/partition
                    (pure feed cost, no kernel)
  3. hll_fold       partial_sketches collect (feed + kernel)
each x3, FIRST in the clean regime, then AFTER a sharded filter build
(the regime trigger), x3 again. Python worker PIDs are sampled around
each phase to detect worker churn (a dead worker pool would re-pay
fork+numpy-import per task and look exactly like a 'slow feed').

Usage: python scripts/ab_feed_regime.py [n_keys]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker_pids() -> set[int]:
    out = subprocess.run(["ps", "-eo", "pid,cmd"], capture_output=True,
                         text=True).stdout
    pids = set()
    for line in out.splitlines():
        if "pyspark.daemon" in line or "pyspark.worker" in line:
            try:
                pids.add(int(line.split()[0]))
            except ValueError:
                pass
    return pids


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from xorf_spark import dataflow as D
    from xorf_spark import sketches as S

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-feed-regime")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1048576")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    D.ship_package(spark)

    keys = spark.range(n_keys).select(F.xxhash64("id").alias("key"))

    def null_fold(batches):
        import pyarrow as _pa
        n = 0
        for b in batches:
            n += b.num_rows
        yield _pa.record_batch([_pa.array([n], type=_pa.int64())], ["n"])

    def t(name, fn, n=3):
        for i in range(n):
            t0 = time.time()
            fn()
            print(f"  {name}[{i}]: {time.time() - t0:.3f}s", flush=True)

    def phase(tag):
        print(f"== {tag} == workers before: {len(worker_pids())}")
        p0 = worker_pids()
        t("jvm_only", lambda: keys.write.format("noop")
          .mode("overwrite").save())
        t("null_fold", lambda: keys.mapInArrow(null_fold, "n long")
          .agg(F.sum("n")).collect())
        t("hll_fold", lambda: S.sketch_agg(keys, "key", "hll",
                                           {"p": 14}).estimate())
        p1 = worker_pids()
        print(f"  workers after: {len(p1)}; churned: "
              f"{len(p1 - p0)} new / {len(p0 - p1)} gone", flush=True)

    phase("clean regime")
    print("== trigger: sharded build (shuffle -> python) ==")
    t0 = time.time()
    D.build_filter_df(keys, kind="bfuse8", n_shards=128).agg(
        F.sum("n_keys")).collect()
    print(f"  build: {time.time() - t0:.3f}s")
    phase("post-shuffle regime")
    spark.stop()


if __name__ == "__main__":
    main()
