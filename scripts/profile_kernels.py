"""Pure-numpy micro-profiles of the per-shard build/probe/sketch kernels
(no Spark): stage-by-stage wall-clock for the bfuse/xor constructions at
the bench shard size, plus the HLL/theta partial-fold kernels at the
bench Arrow-batch size. Run on a quiet box; this is the denominator for
deciding whether a bench row is feed-bound or kernel-bound (guide §1.2:
fix the distributed shape first, then per-task work).

Usage: python scripts/profile_kernels.py [n_keys_per_shard]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xorf_spark import build as B  # noqa: E402
from xorf_spark import kernels as K  # noqa: E402


def t(name, fn, n=5):
    times = []
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    print(f"{name}: best {min(times)*1e3:.1f}ms  (x{n})", flush=True)
    return out


def profile_bfuse(n):
    print(f"--- bfuse8 kernel, n={n} ---")
    keys = (np.arange(1, n + 1, dtype=np.uint64)
            * np.uint64(0x9E3779B97F4A7C15))
    t("full build_binary_fuse", lambda: B.build_binary_fuse(keys, 8), n=3)

    layout = K.bfuse_layout(n)
    sl, slm, scl = (layout["segment_length"], layout["segment_length_mask"],
                    layout["segment_count_length"])
    array_len = layout["array_len"]
    _, seed = K.splitmix64(1)

    t("mix", lambda: K.mix(keys, seed))
    h = K.mix(keys, seed)
    t("sort(mix)", lambda: np.sort(h))
    hashes = np.sort(h)
    t("hash_of_hash", lambda: K.bfuse_hash_of_hash(hashes, sl, slm, scl))
    i0, i1, i2 = K.bfuse_hash_of_hash(hashes, sl, slm, scl)

    def count3():
        c = np.bincount(i0, minlength=array_len)
        c += np.bincount(i1, minlength=array_len)
        c += np.bincount(i2, minlength=array_len)
        return c.astype(np.int32)

    t("count3 (3x bincount)", count3)

    def pop_xor_at():
        hxor = np.zeros(array_len, dtype=np.uint64)
        np.bitwise_xor.at(hxor, i0, hashes)
        np.bitwise_xor.at(hxor, i1, hashes)
        np.bitwise_xor.at(hxor, i2, hashes)
        posxor = np.zeros(array_len, dtype=np.uint8)
        np.bitwise_xor.at(posxor, i1, np.uint8(1))
        np.bitwise_xor.at(posxor, i2, np.uint8(2))
        return hxor, posxor

    t("initial population (5x ufunc.at)", pop_xor_at)

    counts = count3()
    hxor, posxor = pop_xor_at()

    def peel():
        return B._peel(
            counts.copy(), hxor.copy(),
            lambda uh: K.bfuse_hash_of_hash(uh, sl, slm, scl),
            n, posxor=posxor.copy())

    t("peel (rounds)", peel, n=3)
    rounds, total = peel()
    print(f"  rounds={len(rounds)} total={total}")

    def assign():
        F_ = np.random.default_rng(0xC0FFEE).integers(
            0, 256, size=array_len, dtype=np.uint8)
        for uh, _sel, fnd, j0, j1, j2 in reversed(rounds):
            h012 = np.stack((j0, j1, j2, j0, j1))
            cols5 = np.arange(uh.size)
            fnd64 = fnd.astype(np.int64)
            assigned = h012[fnd64, cols5]
            o1 = h012[fnd64 + 1, cols5]
            o2 = h012[fnd64 + 2, cols5]
            F_[assigned] = K.fingerprint(uh, np.uint8) ^ F_[o1] ^ F_[o2]
        return F_

    t("assignment (reverse rounds)", assign, n=3)

    probes = keys + np.uint64(7)
    r = B.build_binary_fuse(keys, 8)
    t("contains_binary_fuse", lambda: B.contains_binary_fuse(
        probes, r.seed, r.params["segment_length"],
        r.params["segment_length_mask"], r.params["segment_count_length"],
        r.fingerprints))


def profile_xor(n):
    print(f"--- xor8 kernel, n={n} ---")
    keys = (np.arange(1, n + 1, dtype=np.uint64)
            * np.uint64(0x9E3779B97F4A7C15))
    t("full build_xor", lambda: B.build_xor(keys, 8, check_distinct=False),
      n=3)
    layout = K.xor_layout(n)
    capacity, bl = layout["capacity"], layout["block_length"]
    _, seed = K.splitmix64(1)
    t("_sort_by_low32(mix)", lambda: B._sort_by_low32(K.mix(keys, seed)))
    hashes = B._sort_by_low32(K.mix(keys, seed))
    t("xor_h012", lambda: K.xor_h012(hashes, bl))
    g0, g1, g2 = K.xor_h012(hashes, bl)

    def pop():
        masks = np.zeros(capacity, dtype=np.uint64)
        np.bitwise_xor.at(masks, g0, hashes)
        np.bitwise_xor.at(masks, g1, hashes)
        np.bitwise_xor.at(masks, g2, hashes)
        return masks

    t("initial population (3x ufunc.at)", pop)


def profile_sketch(batch):
    print(f"--- sketch kernels, batch={batch} ---")
    from xorf_spark.sketches import kernels as SK

    keys = np.random.default_rng(7).integers(
        0, 1 << 63, size=batch, dtype=np.int64)
    hll = SK.HyperLogLog(p=14)
    t("hll.add_hashes", lambda: hll.add_hashes(keys))
    th = SK.Theta(k=4096)
    t("theta.add_hashes cold", lambda: SK.Theta(k=4096).add_hashes(keys), n=3)
    th.add_hashes(keys)
    t("theta.add_hashes warm", lambda: th.add_hashes(keys))
    td = SK.TDigest(delta=300)
    vals = (keys % 1_000_000).astype(np.float64)
    t("tdigest.add", lambda: td.add(vals), n=3)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    profile_bfuse(n)
    profile_xor(n)
    profile_sketch(1_048_576)
