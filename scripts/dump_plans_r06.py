"""Dump ``explain("formatted")`` for the bench-facing declared queries
into plans/r06/<name>_<tag>.txt so the round-6 optimization claims are
plan-checkable. Run twice: once from the round-start tree (tag=before)
and once from the optimized tree (tag=after); the expectation this round
is NO shape change on declared queries (the optimizations are runtime
conf + kernel + spill-stage level), which the pair of dumps proves.

Usage: python scripts/dump_plans_r06.py <repo_root> <tag> <out_dir> [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

ROOT = sys.argv[1]
TAG = sys.argv[2]
OUT = sys.argv[3]
SF = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"
sys.path.insert(0, ROOT)

QUERIES = [
    "bfuse8_semijoin", "decontaminate", "curation_pipeline",
    "ngram_jaccard_pairs", "tfidf_top_terms", "asof_join",
    "ann_cosine_topk", "dedup_exact", "media_decode_jpeg",
    "table_profile",
]


def main():
    from pyspark.sql import SparkSession

    from xorf_spark import dataflow as D
    from xorf_spark.queries import registry

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    D.ship_package(spark)
    os.makedirs(OUT, exist_ok=True)
    reg = registry()
    for name in QUERIES:
        fn, _sql = reg[name]
        df = fn(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"dumped {name}_{TAG}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
