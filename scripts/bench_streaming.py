"""Throughput + state-growth bench for the streaming operators (VERDICT-r3
item 6): stream_exact_dedup, stream_windowed_sketch, stream_filter_refresh.

Feeds a file-source stream (one parquet feed file per micro-batch,
``maxFilesPerTrigger=1`` — the repo's deterministic-batch pattern), runs
with ``Trigger.AvailableNow``, and reports rows/s end-to-end plus the
per-batch state rows/bytes curve from the query's progress events.

Usage:  python scripts/bench_streaming.py [rows_per_batch] [n_batches]
Prints one JSON line; prepend results to BENCH/STREAMING.md by hand.
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

ROWS_PER_BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")
#: comma-separated subset of {dedup,hll,refresh} — bench.py drives the
#: dedup+refresh pair as its first-class streaming rows (VERDICT r4 #6)
OPS = set(os.environ.get("XORF_STREAM_OPS", "dedup,hll,refresh").split(","))


def make_spark():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-streaming")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        # same Arrow batching as bench.py's main session: the state
        # writer's per-10k-row chunk turnover cost ~20% of the dedup row
        # (A/B in BENCH/ROUND6_NOTES.md)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1048576")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # library runtime defaults (Arrow feed byte-cap sentinel) + worker
    # importability without relying on the driver's PYTHONPATH
    from xorf_spark.dataflow import ship_package
    ship_package(spark)
    return spark


def write_feed(spark, feed_dir: str, dup_frac: float = 0.25) -> int:
    """N_BATCHES parquet files of ROWS_PER_BATCH keys each; ``dup_frac``
    of each batch's keys repeat keys from earlier batches (the dedup /
    ever-seen-filter workload shape). Returns total rows fed."""
    total = 0
    for b in range(N_BATCHES):
        fresh = int(ROWS_PER_BATCH * (1 - dup_frac)) if b else ROWS_PER_BATCH
        dup = ROWS_PER_BATCH - fresh
        base = b * ROWS_PER_BATCH
        df = spark.range(base, base + fresh)
        if dup and b:
            df = df.union(spark.range(0, dup))  # re-deliver old ids
        (df.select(F.xxhash64("id").alias("key"))
         .repartition(1)
         .write.mode("append").parquet(feed_dir))
        total += fresh + dup
    return total


def run_stream(df_out, checkpoint: str, sink=None, mode="append"):
    """Start with AvailableNow, await, return (wall_s, progress list)."""
    t0 = time.time()
    if sink is None:
        counted = {"n": 0}

        def count_batch(bdf, _bid):
            counted["n"] += bdf.count()

        q = (df_out.writeStream.foreachBatch(count_batch)
             .outputMode(mode)
             .option("checkpointLocation", checkpoint)
             .trigger(availableNow=True).start())
    else:
        q = (sink.option("checkpointLocation", checkpoint)
             .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    return wall, [json.loads(p.json) for p in q.recentProgress]


def state_curve(progress):
    out = []
    for p in progress:
        for so in p.get("stateOperators", []):
            out.append({
                "batch": p["batchId"],
                "state_rows": so.get("numRowsTotal"),
                "state_bytes": so.get("memoryUsedBytes"),
            })
    return out


def main():
    spark = make_spark()
    work = tempfile.mkdtemp(prefix="xorf_stream_bench_")
    results = {}
    try:
        feed = os.path.join(work, "feed")
        total_rows = write_feed(spark, feed)
        schema = spark.read.parquet(feed).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(feed))

        # 1) stateful exact dedup (applyInPandasWithState, 64 buckets)
        if "dedup" in OPS:
            from xorf_spark.streaming.stateful_dedup import stream_exact_dedup
            out = stream_exact_dedup(stream, key_col="key", n_buckets=64)
            wall, prog = run_stream(out, os.path.join(work, "ck_dedup"))
            results["stream_exact_dedup"] = {
                "wall_s": round(wall, 2),
                "rows_per_s": round(total_rows / wall),
                "state_curve": state_curve(prog),
            }

        # 2) windowed HLL sketch (event-time watermark)
        if "hll" in OPS:
            from xorf_spark.streaming.sketch_window import stream_windowed_sketch
            ts_stream = (stream
                         .withColumn("ts", F.timestamp_millis(
                             F.lit(1_700_000_000_000)
                             + (F.shiftrightunsigned("key", 40))))
                         .withColumn("grp", F.pmod(F.col("key"), F.lit(8))))
            out = stream_windowed_sketch(
                ts_stream, key_col="key", group_col="grp", ts_col="ts",
                window="1 hour", watermark="0 seconds", kind="hll",
                params={"p": 12})
            wall, prog = run_stream(out, os.path.join(work, "ck_hll"),
                                    mode="update")
            results["stream_windowed_hll"] = {
                "wall_s": round(wall, 2),
                "rows_per_s": round(total_rows / wall),
                "state_curve": state_curve(prog),
            }

        # 3) filter refresh: foreachBatch key-log append + one full rebuild
        if "refresh" in OPS:
            from xorf_spark.streaming.filter_refresh import (
                load_latest_filter_table, stream_filter_refresh)
            tbl = os.path.join(work, "ftable")
            sink = stream_filter_refresh(
                stream, tbl, key_col="key", kind="bfuse8", n_shards=32,
                refresh_every=N_BATCHES)
            wall, _ = run_stream(None, os.path.join(work, "ck_refresh"),
                                 sink=sink)
            ft = load_latest_filter_table(spark, tbl)
            results["stream_filter_refresh"] = {
                "wall_s": round(wall, 2),
                "rows_per_s": round(total_rows / wall),
                "n_batches": N_BATCHES,
                "rebuilds": 1,
                "filter_keys": ft.n_keys if hasattr(ft, "n_keys") else None,
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    print(json.dumps({
        "rows_per_batch": ROWS_PER_BATCH,
        "n_batches": N_BATCHES,
        "total_rows": total_rows,
        "cpus": CPUS,
        "results": results,
    }))


if __name__ == "__main__":
    main()
