"""Phase-level probe for the xor8 vs bfuse8 2→8 scaling gap (VERDICT r1 #8).

Times each construction phase (hash+sort, bincount, xor-scatter, peel,
reverse-assign) for both families, Spark-free, at P concurrent processes
(barrier-synced so they contend for DRAM exactly like concurrent Spark
tasks). Per-phase inflation P=2 → P=8 pinpoints which memory pattern stops
scaling.

Usage: python scripts/xor_scaling_probe.py [n_keys] [procs ...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from xorf_spark import build as B  # noqa: E402
from xorf_spark import kernels as K  # noqa: E402


def phase_times(n: int, seed_base: int) -> dict[str, float]:
    rng = np.random.default_rng(seed_base)
    keys = rng.integers(0, 2**64, n, dtype=np.uint64)
    out: dict[str, float] = {}

    # --- xor family phases
    layout = K.xor_layout(n)
    cap, bl = layout["capacity"], layout["block_length"]
    t0 = time.perf_counter()
    hashes = B._sort_by_low32(K.mix(keys, 12345))
    out["xor_hash_sort"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    g0, g1, g2 = K.xor_h012(hashes, bl)
    out["xor_h012"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    counts = B._count3(cap, g0, g1, g2)
    out["xor_bincount"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    masks = np.zeros(cap, dtype=np.uint64)
    np.bitwise_xor.at(masks, g0, hashes)
    np.bitwise_xor.at(masks, g1, hashes)
    np.bitwise_xor.at(masks, g2, hashes)
    out["xor_scatter"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    B._peel(counts, masks, lambda uh: K.xor_h012(uh, bl), n)
    out["xor_peel"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    B.build_xor(keys, 8, check_distinct=False)
    out["xor_total"] = time.perf_counter() - t0

    # --- bfuse family phases
    layout = K.bfuse_layout(n)
    sl, slm, scl = (layout["segment_length"], layout["segment_length_mask"],
                    layout["segment_count_length"])
    alen = layout["array_len"]
    t0 = time.perf_counter()
    hashes = np.sort(K.mix(keys, 12345))
    out["bf_hash_sort"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    i0, i1, i2 = K.bfuse_hash_of_hash(hashes, sl, slm, scl)
    out["bf_h012"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    counts = B._count3(alen, i0, i1, i2)
    out["bf_bincount"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    hxor = np.zeros(alen, dtype=np.uint64)
    np.bitwise_xor.at(hxor, i0, hashes)
    np.bitwise_xor.at(hxor, i1, hashes)
    np.bitwise_xor.at(hxor, i2, hashes)
    posxor = np.zeros(alen, dtype=np.uint8)
    np.bitwise_xor.at(posxor, i1, np.uint8(1))
    np.bitwise_xor.at(posxor, i2, np.uint8(2))
    out["bf_scatter"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    B._peel(counts, hxor, lambda uh: K.bfuse_hash_of_hash(uh, sl, slm, scl),
            n, posxor=posxor)
    out["bf_peel"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    B.build_binary_fuse(keys, 8)
    out["bf_total"] = time.perf_counter() - t0
    return out


def _worker(n, seed, barrier, q):
    barrier.wait()
    q.put(phase_times(n, seed))


def run_at(procs: int, n: int) -> dict[str, float]:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(procs)
    q = ctx.Queue()
    ps = [ctx.Process(target=_worker, args=(n, 1000 + i, barrier, q))
          for i in range(procs)]
    for p in ps:
        p.start()
    results = [q.get() for _ in ps]
    for p in ps:
        p.join()
    # median across workers
    return {k: float(np.median([r[k] for r in results]))
            for k in results[0]}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    procs = [int(x) for x in sys.argv[2:]] or [1, 2, 8]
    report = {"n_keys": n}
    for p in procs:
        report[f"p{p}"] = run_at(p, n)
    base = report.get("p2") or report[f"p{procs[0]}"]
    ref = report.get("p8") or report[f"p{procs[-1]}"]
    print(json.dumps(report, indent=2))
    print("\nphase                inflation p2->p8")
    for k in sorted(base):
        print(f"{k:20s} {ref[k] / base[k]:6.2f}x")


if __name__ == "__main__":
    main()
