"""Interleaved A/B: MinHash per-permutation inner loop.

A: transform(__sh, h -> xxhash64(h, i)) |> array_min   (allocates an
   intermediate long array per (row, permutation) before the min scan)
B: aggregate(__sh, MAX_LONG, (acc, h) -> least(acc, xxhash64(h, i)))
   (allocation-free fold)

Both produce identical signatures (same hash stream, same min).
Interleaved best-of-N in ONE process per the repo's A/B protocol
(session ordering and co-tenant load hit both variants equally).

Usage: python scripts/ab_minhash_inner.py [n_docs] [num_perm] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_LONG = 9223372036854775807


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    num_perm = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from xorf_spark import dataflow as D
    from xorf_spark.functions import shingle_hashes_sql
    from xorf_spark.sources import docs_tokens

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    D.ship_package(spark)

    docs = (docs_tokens(spark, n_docs, partitions=64)
            .select("doc_id", "tokens")
            .withColumn("__sh", F.expr(shingle_hashes_sql("tokens", 3)))
            .localCheckpoint(eager=True))  # pin synthesis out of the A/B

    sig_a = (f"transform(sequence(0, {num_perm - 1}), "
             f"i -> array_min(transform(__sh, h -> xxhash64(h, i))))")
    sig_b = (f"transform(sequence(0, {num_perm - 1}), "
             f"i -> aggregate(__sh, {MAX_LONG}L, "
             f"(acc, h) -> least(acc, xxhash64(h, i))))")

    def run(sig_sql):
        t0 = time.time()
        # overflow-safe force-evaluation reducer (sum of longs would
        # overflow under ANSI)
        out = (docs.withColumn("sig", F.expr(sig_sql))
               .agg(F.avg(F.xxhash64("sig"))).collect()[0][0])
        return time.time() - t0, out

    best = {"A_transform_array_min": float("inf"),
            "B_aggregate_least": float("inf")}
    checks = set()
    for r in range(rounds):
        for name, sql in (("A_transform_array_min", sig_a),
                          ("B_aggregate_least", sig_b)):
            secs, chk = run(sql)
            best[name] = min(best[name], secs)
            checks.add(round(chk, 6))
            print(f"round {r} {name}: {secs:.2f}s (check {chk:.1f})",
                  flush=True)
    assert len(checks) == 1, f"variants disagree: {checks}"
    print({k: round(v, 2) for k, v in best.items()})


if __name__ == "__main__":
    main()
