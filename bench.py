"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "queries": {...}, "sf": ...}

Headline numbers (BASELINE.md target):
- bfuse8/xor8 distributed build throughput (keys/sec) over 32M distinct keys
- broadcast-probe throughput (lookups/sec) over 32M probes
- flagship filter-semi-join + token-pipeline (shingle → dedup → build) at
  $SPARK_GRAFT_SF_DIR

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     XORF_BENCH_KEYS (default 32_000_000),
     XORF_BENCH_REPEATS (default 3, best-of),
     XORF_BENCH_MAX_LOAD (default 4.0 — start gate: wait for the 1-min
       loadavg to fall below this before measuring; co-tenant load on the
       shared sandbox has produced unfalsifiable +50% rows, VERDICT r4 #1),
     XORF_BENCH_LOAD_WAIT_SEC (default 240 — max seconds the gate waits;
       after that the run proceeds and the exceedance is stamped),
     XORF_BENCH_STREAMING (default 1 — run the streaming-throughput rows
       in a fresh-JVM subprocess; 0 skips them),
     XORF_BENCH_MAX_COTENANT (default 0.25 — per-ROW gate: before each
       measurement the harness sleeps ~0.7s with its own JVM idle and
       reads /proc/stat; any CPU busy in that window is foreign load.
       Above this fraction of cores it waits for the burst to pass),
     XORF_BENCH_ROW_WAIT_SEC (default 90 — max seconds any single row's
       co-tenant gate waits; then the row proceeds, exceedance stamped).

Measurement-hygiene contract (VERDICT r4 what's-wrong #1): the printed
JSON stamps the 1-min loadavg at start/end, PER QUERY at each
measurement's start, the per-query co-tenant fraction (busy+steal,
sampled self-idle, so it separates foreign load from our own trailing
work — 1-min loadavg alone cannot), the hypervisor STEAL fraction
across each row's whole wall time (the one contention channel
measurable while our own run saturates the vCPUs — this sandbox is a
Firecracker microVM, so a neighbor VM hogging the physical cores is
invisible to in-VM busy accounting), every repeat's wall time, and the
best-of repeat count — a regression on an unchanged code path is
falsifiable from the artifact alone. Round-5 preview runs demonstrated
both failure modes: a start-only loadavg gate of 0.02 followed by
10-500% row inflation, then a run with clean per-row busy stamps whose
python-feed rows were 3-10x inflated by a sustained mid-row wave.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_keys = int(os.environ.get("XORF_BENCH_KEYS", str(32_000_000)))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # ---- load gate: don't start measuring into a co-tenant burst ---------
    max_load = float(os.environ.get("XORF_BENCH_MAX_LOAD", "4.0"))
    wait_budget = float(os.environ.get("XORF_BENCH_LOAD_WAIT_SEC", "240"))
    gate_waited = 0.0
    while os.getloadavg()[0] > max_load and gate_waited < wait_budget:
        print(f"[bench] loadavg {os.getloadavg()[0]:.2f} > {max_load} — "
              f"waiting ({gate_waited:.0f}/{wait_budget:.0f}s)",
              file=sys.stderr)
        time.sleep(15)
        gate_waited += 15
    load_start = round(os.getloadavg()[0], 2)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from xorf_spark import dataflow as D
    from xorf_spark import queries as Q
    from xorf_spark.sources import docs_tokens

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("xorf-bench")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1048576")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    D.ship_package(spark)  # workers import xorf_spark regardless of cwd

    timings: dict[str, float] = {}
    loads: dict[str, float] = {}  # 1-min loadavg at each row's measurement
    cotenant: dict[str, float] = {}  # foreign busy+steal fraction at row start

    def _cpu_times():
        with open("/proc/stat") as fh:
            parts = fh.readline().split()[1:]
        vals = [int(x) for x in parts]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle+iowait
        steal = vals[7] if len(vals) > 7 else 0  # hypervisor steal
        return idle, steal, sum(vals)

    def _cotenant_cpu(sample_s: float = 0.7) -> float:
        """Fraction of ALL cores busy while THIS process sleeps.

        Our Spark JVM runs no job during the sample, so busy CPU in the
        window is co-tenant load (± a few % of JVM/GC background
        threads). Unlike the 1-min loadavg this is not contaminated by
        our own just-finished 32-thread stage — loadavg decays over
        minutes, /proc/stat deltas are instantaneous.

        Returns (busy_frac, steal_frac): busy catches in-VM co-tenants,
        steal catches HYPERVISOR-level contention (this sandbox is a
        Firecracker microVM — another VM hogging the physical cores is
        invisible to in-VM busy accounting but shows up as steal).
        """
        try:
            i0, s0, t0 = _cpu_times()
            time.sleep(sample_s)
            i1, s1, t1 = _cpu_times()
        except OSError:  # no /proc (non-Linux) — gate disarms, stamp 0
            return 0.0, 0.0
        dt = t1 - t0
        if dt <= 0:
            return 0.0, 0.0
        steal = round((s1 - s0) / dt, 3)
        return round(1.0 - (i1 - i0) / dt - steal, 3), steal

    max_cotenant = float(os.environ.get("XORF_BENCH_MAX_COTENANT", "0.25"))
    row_wait = float(os.environ.get("XORF_BENCH_ROW_WAIT_SEC", "90"))
    steal_during: dict[str, float] = {}  # hypervisor steal DURING the row

    def _row_gate(name: str):
        """Stamp loadavg + co-tenant CPU for a row; wait out foreign
        bursts (bounded) so the measurement starts on honest cores."""
        loads[name] = round(os.getloadavg()[0], 2)
        b, s = _cotenant_cpu()
        waited = 0.0
        while (b + s) > max_cotenant and waited < row_wait:
            time.sleep(10)
            waited += 10
            b, s = _cotenant_cpu()
        cotenant[name] = round(b + s, 3)

    def _stamp_steal(name: str, fn):
        """Run fn stamping the steal fraction across its whole wall time —
        the one contention channel measurable WHILE we saturate the vCPUs
        (a start-of-row sample cannot see a wave that arrives mid-row)."""
        try:
            _, s0, t0 = _cpu_times()
        except OSError:
            return fn()
        try:
            return fn()
        finally:
            _, s1, t1 = _cpu_times()
            if t1 > t0:
                steal_during[name] = round((s1 - s0) / (t1 - t0), 3)


    n_shards = 128
    repeats = int(os.environ.get("XORF_BENCH_REPEATS", "3"))
    keys = spark.range(n_keys).select(F.xxhash64("id").alias("key"))

    def best_of(fn, n=repeats):
        times, out = [], None
        for _ in range(n):
            t0 = time.time()
            out = fn()
            times.append(round(time.time() - t0, 3))
        return times, out

    repeat_overrides: dict[str, int] = {}
    repeat_times: dict[str, list] = {}  # EVERY repeat's wall time

    def bench(name: str, fn, n=repeats):
        """best-of-n measurement stamped with the loadavg and co-tenant
        CPU fraction it started at (gated on the latter), every repeat's
        wall time, and the steal fraction across the whole row."""
        _row_gate(name)
        if n != repeats:
            repeat_overrides[name] = n
        times, out = _stamp_steal(name, lambda: best_of(fn, n))
        timings[name] = round(min(times), 3)
        repeat_times[name] = times
        return out

    # --- mergeable sketch UDAFs (north rule) ---------------------------------
    # Measured FIRST: once any python stage has consumed a *shuffled* input in
    # this JVM (e.g. the sharded filter build), every later python-feed stage
    # in the same local-mode JVM runs ~6x slower (measured, Spark 4.1 —
    # a JVM-global artifact of mixing runner input paths; per-executor JVMs on
    # a real cluster don't interleave unrelated stages like this). Sketch
    # aggregation is shuffle-free, so its clean-regime number is the honest
    # capability figure.
    from xorf_spark import sketches as S

    bench("sketch_hll",
          lambda: S.sketch_agg(keys, "key", "hll", {"p": 14}).estimate())
    hll_rate = n_keys / timings["sketch_hll"]

    # staged twin (parquet spill + file-reading python tasks — no Arrow
    # feed of the raw column; byte-identical state by the merge law)
    def hll_staged():
        d = tempfile.mkdtemp(prefix="xorf_skhll_stage_")
        try:
            return S.sketch_agg_staged(keys, "key", "hll", d,
                                       {"p": 14}).estimate()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    bench("sketch_hll_staged", hll_staged)
    hll_staged_rate = n_keys / timings["sketch_hll_staged"]

    bench("sketch_theta",
          lambda: S.sketch_agg(keys, "key", "theta", {"k": 4096}).estimate())
    theta_rate = n_keys / timings["sketch_theta"]

    vals = spark.range(n_keys // 4).select(
        (F.col("id") % 1_000_000).cast("double").alias("v"))
    bench("sketch_tdigest",
          lambda: S.sketch_agg(vals, "v", "tdigest",
                               {"delta": 300}).quantile(0.5))
    tdigest_rate = (n_keys // 4) / timings["sketch_tdigest"]

    # --- clean-regime probe: driver-built table (no python shuffle stage has
    # run yet), so this is probe capability uncontaminated by the JVM-global
    # python-feed slowdown that the builds below trigger (see sketch note).
    import numpy as np

    from xorf_spark import build as B

    _pk = (np.arange(1, 8_000_001, dtype=np.uint64)
           * np.uint64(0x9E3779B97F4A7C15))
    _r = B.build_binary_fuse(_pk, 8)
    _row = {"shard_id": 0, "kind": "bfuse8",
            "seed": int(np.uint64(_r.seed).view(np.int64)),
            "segment_length": _r.params["segment_length"],
            "segment_length_mask": _r.params["segment_length_mask"],
            "segment_count_length": _r.params["segment_count_length"],
            "fingerprints": _r.fingerprints.tobytes(),
            "n_keys": 8_000_000, "block_length": None}
    _table = D.FilterTable({0: _row}, 1)
    _probes = spark.range(n_keys).select(F.xxhash64("id").alias("key"))
    # Untimed warm-up (same precedent as the builds / staged probe): the
    # first where_member call pays whole-stage-codegen JIT + the filter
    # broadcast; measured x6 decay 8.4->2.7->1.4->1.1s, steady ~1.1-1.3s.
    _table.where_member(_probes, "key").count()
    bench("probe_bfuse8_clean",
          lambda: _table.where_member(_probes, "key").count())
    probe_clean_rate = n_keys / timings["probe_bfuse8_clean"]

    # Warm up JVM JIT, shuffle paths and python workers with an uncounted
    # build (steady-state measurement; first-ever job pays one-time C2/JIT
    # compilation that a long-running cluster job never sees again).
    warm = spark.range(8_000_000).select(F.xxhash64("id").alias("key"))
    D.build_filter_df(warm, kind="bfuse8", n_shards=64).count()
    D.build_filter_df(warm, kind="bfuse8", n_shards=64).count()

    # --- distributed build throughput (the metric); best-of-2 to damp
    # noisy-neighbor variance on the shared sandbox -------------------------
    total_keys = bench(
        "build_bfuse8",
        lambda: D.build_filter_df(keys, kind="bfuse8", n_shards=n_shards)
        .agg(F.sum("n_keys")).collect()[0][0])
    bfuse_build_rate = total_keys / timings["build_bfuse8"]

    xor_keys = bench(
        "build_xor8",
        lambda: D.build_filter_df(keys, kind="xor8", n_shards=n_shards)
        .agg(F.sum("n_keys")).collect()[0][0])
    xor_build_rate = xor_keys / timings["build_xor8"]

    # staged build: JVM shuffle → parquet stage, then a shuffle-free python
    # stage reading its own shard files (decouples the Arrow feed; at
    # cluster scale the materialization barrier also buys elastic retry)
    stage_dir = tempfile.mkdtemp(prefix="xorf_stage_")
    staged_keys = bench(
        "build_bfuse8_staged",
        lambda: D.build_filter_df_staged(keys, stage_dir, kind="bfuse8",
                                         n_shards=n_shards)
        .agg(F.sum("n_keys")).collect()[0][0])
    staged_build_rate = staged_keys / timings["build_bfuse8_staged"]

    # --- probe throughput ----------------------------------------------------
    shard_bf = D.build_filter_df(keys, kind="bfuse8", n_shards=n_shards).cache()
    shard_bf.count()
    table = D.FilterTable.from_df(shard_bf, n_shards=n_shards)
    probes = spark.range(n_keys).select(
        F.xxhash64(F.col("id") + 999_000_000).alias("key"))
    # Best-of-5 for the two post-build probe rows: they run inside the
    # JVM python-feed regime (see the sketch note), whose onset noise
    # produced a 1.29-1.75s spread ACROSS otherwise-clean runs; more
    # samples within one run shrink the official row's variance.
    n_acc = bench("probe_bfuse8",
                  lambda: table.where_member(probes, "key").count(),
                  n=max(repeats, 5))
    probe_rate = n_keys / timings["probe_bfuse8"]
    fpp = n_acc / n_keys  # probes disjoint from build keys w.h.p.

    # staged bulk probe (no JVM->python key feed; the 0.88-scaling path).
    # One untimed warm-up first, mirroring the builds' warm-up above: the
    # first probe_staged call in a context ships the fingerprint files to
    # executors and faults their pages into cache; measured x5 decay
    # 10.0->9.0->7.6->4.2->4.1s shows best-of-3 alone still lands on the
    # warm-up slope, not the ~4.1s steady state a long-running job sees.
    warm_pdir = tempfile.mkdtemp(prefix="xorf_pstage_warm_")
    D.probe_staged(probes, table, warm_pdir).agg(F.sum("n_probes")).collect()
    shutil.rmtree(warm_pdir, ignore_errors=True)
    pstage_dir = tempfile.mkdtemp(prefix="xorf_pstage_")
    bench("probe_bfuse8_staged",
          lambda: D.probe_staged(probes, table, pstage_dir)
          .agg(F.sum("n_probes")).collect()[0][0],
          n=max(repeats, 5))
    probe_staged_rate = n_keys / timings["probe_bfuse8_staged"]
    shard_bf.unpersist()

    # --- sf-table queries (best-of-repeats: the first run of a query pays
    # one-time whole-stage-codegen compilation — seconds for the big nested
    # array lambdas — that a steady-state workload never sees again) -------
    bench("flagship_semijoin",
          lambda: Q.q_bfuse8_semijoin(spark, sf_dir).collect())
    bench("ngram_jaccard_pairs",
          lambda: Q.q_ngram_jaccard_pairs(spark, sf_dir).collect())
    bench("ann_cosine_topk",
          lambda: Q.q_ann_cosine_topk(spark, sf_dir).collect())
    bench("asof_join", lambda: Q.q_asof_join(spark, sf_dir).collect())
    bench("decontaminate",
          lambda: Q.q_decontaminate(spark, sf_dir).collect())
    bench("tfidf_top_terms",
          lambda: Q.q_tfidf_top_terms(spark, sf_dir).collect())
    bench("curation_pipeline",
          lambda: Q.q_curation_pipeline(spark, sf_dir).collect())

    # MinHash-LSH end-to-end on synthetic token docs: signatures
    # (num_perm=64, two-stage base-hash path) → banded LSH candidate
    # pairs → count. 20k docs ≈ 13.5M shingles; exercises the operator
    # family the gated portable-md5 query cannot (it is capped at 4
    # permutations for oracle parity). 2% of docs get a near-dup twin
    # (first token dropped, shifted id) so the bucket self-join half of
    # the path runs against real candidates, not empty buckets.
    from xorf_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    base_docs = docs_tokens(spark, 20_000, partitions=64).select(
        "doc_id", "tokens")
    twins = (base_docs.where(F.xxhash64("doc_id") % 50 == 0)
             .select(F.concat("doc_id", F.lit("~twin")).alias("doc_id"),
                     F.slice("tokens", 2, F.size("tokens")).alias("tokens")))
    mh_docs = base_docs.unionByName(twins)

    def minhash_lsh():
        sigs = minhash_signatures(mh_docs, num_perm=64, shingle=3)
        return lsh_candidate_pairs(sigs).count()

    n_cand = bench("minhash_lsh_20k_docs", minhash_lsh)

    # token pipeline end-to-end: synthesize 100k docs → 8-token shingle keys →
    # exact dedup → sharded bfuse8 build
    def token_pipeline():
        tok = docs_tokens(spark, 100_000, partitions=64)
        sk = D.shingle_keys(tok, k=8).select("key")
        shard = D.build_filter_df_staged(
            sk, tempfile.mkdtemp(prefix="xorf_tok_stage_"), kind="bfuse8",
            n_shards=n_shards)
        return shard.agg(F.sum("n_keys")).collect()[0][0]

    # best-of-2 (was single-shot through r4): the most expensive row is
    # also the one a mid-run co-tenant burst distorts worst (+502% in the
    # r5 preview); two tries under the row gate bound that exposure.
    shingle_keys_built = bench("token_pipeline_100k_docs", token_pipeline,
                               n=min(2, repeats))
    shingle_rate = shingle_keys_built / timings["token_pipeline_100k_docs"]

    # --- streaming throughput rows (VERDICT r4 item 6) ---------------------
    # A fresh-JVM subprocess, after the main session stops: streaming's
    # applyInPandasWithState numbers would otherwise be contaminated by
    # this JVM's python-feed slowdown regime (see sketch note above), and
    # two concurrent 32-thread JVMs would corrupt each other's wall times.
    spark.stop()
    stream_derived: dict[str, int] = {}
    if os.environ.get("XORF_BENCH_STREAMING", "1") != "0":
        repo_dir = os.path.dirname(os.path.abspath(__file__))
        rows_pb = max(200_000, n_keys // 8)
        n_batches = 2
        _row_gate("streaming")
        env = dict(os.environ, PYTHONPATH=repo_dir,
                   XORF_STREAM_OPS="dedup,refresh",
                   SPARK_GRAFT_CPUS=str(cpus))
        try:
            out = subprocess.run(
                [sys.executable,
                 os.path.join(repo_dir, "scripts", "bench_streaming.py"),
                 str(rows_pb), str(n_batches)],
                capture_output=True, text=True, timeout=1500, env=env)
            line = out.stdout.strip().splitlines()[-1]  # ONE json line
            sres = json.loads(line)["results"]
            dd, fr = sres["stream_exact_dedup"], sres["stream_filter_refresh"]
            timings["stream_exact_dedup"] = float(dd["wall_s"])
            timings["filter_refresh"] = float(fr["wall_s"])
            stream_derived = {
                "stream_dedup_rows_per_sec": int(dd["rows_per_s"]),
                "filter_refresh_rows_per_sec": int(fr["rows_per_s"]),
                "filter_refresh_rebuilt_keys": int(fr["filter_keys"] or 0),
                "stream_rows_fed": int(rows_pb * n_batches),
            }
        except Exception as e:  # noqa: BLE001 — bench must still print
            print(f"[bench] streaming rows skipped: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "bfuse8_build_keys_per_sec",
        "value": round(bfuse_build_rate),
        "unit": "keys/sec",
        "sf": sf,
        "cpus": cpus,
        "n_keys": int(total_keys),
        "repeats": repeats,
        "loadavg_1m": {"start": load_start,
                       "end": round(os.getloadavg()[0], 2),
                       "gate_max": max_load,
                       "gate_waited_sec": round(gate_waited)},
        "loadavg_per_query": loads,
        "cotenant_cpu_per_query": cotenant,
        "cotenant_gate": {"max": max_cotenant, "row_wait_sec": row_wait},
        "repeats_per_query": repeat_overrides,
        "repeat_times_per_query": repeat_times,
        "steal_frac_per_query": steal_during,
        "queries": timings,
        "derived": {
            **stream_derived,
            "xor8_build_keys_per_sec": round(xor_build_rate),
            "bfuse8_staged_build_keys_per_sec": round(staged_build_rate),
            "bfuse8_probe_lookups_per_sec": round(probe_rate),
            "bfuse8_probe_staged_lookups_per_sec": round(probe_staged_rate),
            "bfuse8_probe_clean_lookups_per_sec": round(probe_clean_rate),
            "bfuse8_measured_fpp": fpp,
            "token_pipeline_shingle_keys_per_sec": round(shingle_rate),
            "token_pipeline_distinct_shingles": int(shingle_keys_built),
            "hll_agg_keys_per_sec": round(hll_rate),
            "hll_agg_staged_keys_per_sec": round(hll_staged_rate),
            "theta_agg_keys_per_sec": round(theta_rate),
            "tdigest_agg_values_per_sec": round(tdigest_rate),
            "minhash_lsh_docs_per_sec": round(
                20_000 / timings["minhash_lsh_20k_docs"]),
            "minhash_lsh_candidate_pairs": int(n_cand),
        },
    }))


if __name__ == "__main__":
    main()
