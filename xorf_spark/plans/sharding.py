"""Shard planning: sizing math and the worker memory model for distributed
filter builds.

The binary fuse build's peak scratch per shard (vectorized kernel):

    hashes        8 B/key
    i0/i1/i2     24 B/key      (int64 index views)
    counts        8 B/slot     (bincount int64)
    hxor          8 B/slot
    posxor        1 B/slot
    fingerprints  fp_bytes/slot

with slots ≈ 1.125 × keys ⇒ ≈ 52 B/key for bfuse8 — so a 16 M-key shard
peaks near ~0.9 GB and a 4 M-key shard near ~220 MB. Smaller shards are also
*faster* per key (construction arrays fit higher in the cache hierarchy), so
the default target leans small; at 10^12-key scale raise the target to bound
task count instead.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

BYTES_PER_KEY = {  # peak scratch, see module docstring
    "bfuse8": 52, "bfuse16": 53, "bfuse32": 56,
    "xor8": 60, "xor16": 62, "xor32": 66,   # capacity 1.23n, 3 blocks
    "fuse8": 58, "fuse16": 60, "fuse32": 64,
}


@dataclass
class ShardPlan:
    n_keys: int
    kind: str
    n_shards: int
    keys_per_shard: float
    peak_bytes_per_task: int
    filter_bytes_total: int
    broadcastable: bool          # fits a sane broadcast (< 1 GiB)?

    def describe(self) -> str:
        return (f"{self.kind}: {self.n_keys:,} keys → {self.n_shards} shards "
                f"(~{self.keys_per_shard:,.0f} keys/shard, "
                f"~{self.peak_bytes_per_task / 2**20:,.0f} MiB peak/task, "
                f"filter {self.filter_bytes_total / 2**20:,.0f} MiB total, "
                f"probe path: "
                f"{'broadcast' if self.broadcastable else 'cogrouped'})")


def shard_plan(n_keys: int, kind: str = "bfuse8",
               target_keys_per_shard: int = 4_000_000,
               max_shards: int = 1 << 20,
               broadcast_limit: int = 1 << 30) -> ShardPlan:
    """Choose a power-of-two shard count for ``n_keys`` and report the
    memory/probe-path consequences. Deterministic, driver-side."""
    want = max(1, -(-n_keys // target_keys_per_shard))
    n_shards = 1 << min(max(0, (want - 1).bit_length()),
                        int(math.log2(max_shards)))
    kps = n_keys / n_shards if n_shards else 0
    fp_bytes = int(kind.replace("bfuse", "").replace("fuse", "")
                   .replace("xor", "")) // 8
    overhead = 1.23 if kind.startswith("xor") else (
        1.14 if kind.startswith("fuse") else 1.125)
    filter_total = int(n_keys * overhead * fp_bytes)
    return ShardPlan(
        n_keys=n_keys, kind=kind, n_shards=n_shards, keys_per_shard=kps,
        peak_bytes_per_task=int(kps * BYTES_PER_KEY.get(kind, 60)),
        filter_bytes_total=filter_total,
        broadcastable=filter_total < broadcast_limit,
    )
