"""Stage-by-stage wall-clock breakdown of the bench token pipeline:
synthesis (docs_tokens) -> shingle derivation (shingle_keys) -> staged
spill write -> per-shard python build. Each stage forced with a cheap
count/agg in sequence, then the full pipeline for comparison.

Usage: python scripts/profile_token_pipeline.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from xorf_spark import dataflow as D
    from xorf_spark.sources import docs_tokens

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    D.ship_package(spark)

    def t(name, fn):
        t0 = time.time()
        out = fn()
        print(f"{name}: {time.time() - t0:.2f}s  ({out})", flush=True)
        return out

    # warmup JVM
    spark.range(1_000_000).agg(F.sum("id")).collect()

    tok = docs_tokens(spark, n_docs, partitions=64)
    t("synthesis only (count tokens)",
      lambda: tok.agg(F.sum(F.size("tokens"))).collect()[0][0])
    sk = D.shingle_keys(tok, k=8).select("key")
    t("synthesis + derivation (avg key)",
      lambda: sk.agg(F.avg(F.xxhash64("key"))).collect()[0][0])
    stage_dir = tempfile.mkdtemp(prefix="xorf_prof_stage_")
    t("synthesis + derivation + spill write",
      lambda: D._stage_keys(sk, stage_dir, 128) and "ok")
    t("full staged pipeline (fresh spill)",
      lambda: D.build_filter_df_staged(
          sk, tempfile.mkdtemp(prefix="xorf_prof_stage2_"), kind="bfuse8",
          n_shards=128).agg(F.sum("n_keys")).collect()[0][0])


if __name__ == "__main__":
    main()
