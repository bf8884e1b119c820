"""Mergeable sketch kernels: HyperLogLog, Count-Min, Bloom, KLL, t-digest.

The north star extends the reference's static-filter family (ayazhafiz/xorf)
with the classic mergeable-sketch toolbox, built from the published papers —
NOT ported from any implementation:

- HyperLogLog      — Flajolet, Fusy, Gandouet, Meunier (2007), with the
                     linear-counting small-range correction.
- Count-Min        — Cormode, Muthukrishnan (2005): d×w counters,
                     point query = min over rows, ``est ≥ true`` always and
                     ``est ≤ true + (e/w)·N`` w.p. ≥ 1 - e^-d.
- Bloom            — Bloom (1970) with Kirsch-Mitzenmacher double hashing.
- KLL              — Karnin, Lang, Liberty (2016): quantiles with rank error
                     O(1/k); compaction coin driven by the same deterministic
                     splitmix64 schedule the reference uses for seed retries
                     (reference src/splitmix64.rs:12-18).
- t-digest         — Dunning, Ertl (2019 merging variant) with the k1
                     (arcsine) scale function; clustering is the fully
                     vectorized floor-of-scale-function grouping.
- Misra-Gries      — Misra, Gries (1982) frequent items, in the batched
                     mergeable formulation of Agarwal et al., "Mergeable
                     Summaries" (TODS 2013): undercount ≤ n/(k+1), no
                     false-negative heavy hitters above that threshold.

Shared contracts (the "mergeable UDAF" laws the Spark layer and tests rely on):

- every sketch has ``merge(other) -> self``, associative and commutative
  (bit-exact for the keyed sketches HLL/CMS/Bloom — max/sum/or of state —
  and within the published error bound for KLL/t-digest);
- ``to_bytes()/from_bytes()`` round-trips exactly (binary payloads stored in
  parquet / shipped through Arrow, mirroring the filter shard table's DMA
  layout discipline, reference src/lib.rs:139-154);
- all hot paths are vectorized numpy over uint64/float64 arrays — no per-row
  Python anywhere.

Keyed sketches (HLL/CMS/Bloom) consume **64-bit hashed keys** (uint64) —
the Spark layer derives them with ``xxhash64`` exactly like the filter
dataflow's HashProxy role (reference src/hash_proxy.rs:124-138); per-row
independence across CMS rows / Bloom probes comes from re-mixing with the
murmur3 finalizer (reference src/murmur3.rs:30-37). Valued sketches
(KLL/t-digest) consume float64 values directly.
"""

from __future__ import annotations

import json
import math
import struct

import numpy as np

from ..kernels import MASK64, U64, mix64, splitmix64

__all__ = [
    "HyperLogLog", "CountMin", "Bloom", "KLL", "TDigest", "MisraGries",
    "make_sketch", "sketch_from_bytes", "SKETCH_KINDS",
]

_MAGIC = b"XSK1"


def _bit_length64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (0 → 0), via the float64
    exponent field instead of log2 — ~7× faster and branch-free.

    uint64→float64 conversion rounds to nearest, so a value just below 2**k
    can round up and report exponent k; the shift/compare afterwards corrects
    that exactly, making the result bit-exact for all 2**64 inputs."""
    f = x.astype(np.float64)
    exp = ((f.view(np.uint64) >> U64(52)) & U64(0x7FF)).astype(np.int64) - 1023
    nz = x > 0
    exp[~nz] = -1
    e = np.clip(exp, 0, 63).astype(np.uint64)
    # exp == 64 only when a value ≥ 2**63 rounded up to 2**64 — always over
    over = ((x < (U64(1) << e)) | (exp > 63)) & nz
    return exp - over + 1


def _as_u64(keys: np.ndarray) -> np.ndarray:
    keys = np.ascontiguousarray(keys)
    if keys.dtype == np.int64:
        return keys.view(np.uint64)
    return keys.astype(np.uint64, copy=False)


def _row_seeds(n: int, salt: int) -> list[int]:
    """Deterministic per-row hash seeds from the splitmix64 schedule."""
    state, seeds = (salt & MASK64) or 1, []
    for _ in range(n):
        state, z = splitmix64(state)
        seeds.append(z)
    return seeds


def _pack(kind: str, params: dict, arrays: list[np.ndarray]) -> bytes:
    head = json.dumps({"kind": kind, **params}, sort_keys=True).encode()
    out = [_MAGIC, struct.pack("<I", len(head)), head]
    for a in arrays:
        b = np.ascontiguousarray(a).tobytes()
        out.append(struct.pack("<Q", len(b)))
        out.append(b)
    return b"".join(out)


def _unpack(data: bytes) -> tuple[dict, list[bytes]]:
    if data[:4] != _MAGIC:
        raise ValueError("not a sketch payload (bad magic)")
    (hlen,) = struct.unpack_from("<I", data, 4)
    head = json.loads(data[8:8 + hlen].decode())
    pos, bufs = 8 + hlen, []
    while pos < len(data):
        (blen,) = struct.unpack_from("<Q", data, pos)
        pos += 8
        bufs.append(data[pos:pos + blen])
        pos += blen
    return head, bufs


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

# α_m constants from Flajolet et al. (2007), Fig. 3
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


class HyperLogLog:
    """Dense HLL over 2**p uint8 registers. Merge = elementwise max, which is
    exactly associative/commutative and independent of insertion order or
    partitioning — distributed state is byte-identical to a local build."""

    KIND = "hll"

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError("hll precision p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_hashes(self, keys: np.ndarray) -> "HyperLogLog":
        h = _as_u64(keys)
        if h.size == 0:
            return self
        idx = (h >> U64(64 - self.p)).astype(np.int64)
        tail_bits = 64 - self.p
        tail = h & U64((1 << tail_bits) - 1)
        rho = (tail_bits + 1 - _bit_length64(tail)).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError(f"hll precision mismatch: {self.p} vs {other.p}")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = _HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))
        inv_sum = float(np.ldexp(1.0, -self.registers.astype(np.int64)).sum())
        e = alpha * m * m / inv_sum
        zeros = int(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * m and zeros:          # linear-counting small range
            e = m * math.log(m / zeros)
        return e

    def union(self, other: "HyperLogLog") -> "HyperLogLog":
        """Non-mutating union (register-wise max — lossless, the same law
        ``merge`` applies in place)."""
        return HyperLogLog(p=self.p,
                           registers=self.registers.copy()).merge(other)

    @staticmethod
    def intersection_estimate(a: "HyperLogLog", b: "HyperLogLog") -> float:
        """Inclusion-exclusion intersection estimate
        ``|A| + |B| - |A∪B|``. Unlike union, this is NOT lossless: the
        error is additive in the three estimates, so it scales with the
        UNION size (σ ≲ 1.04/√m · (|A|+|B|+|A∪B|)) — a small
        intersection of two large sets is noisy. Callers needing tight
        small-intersection bounds should key a Bloom/filter probe
        instead; this is the standard cheap overlap/Jaccard estimator."""
        return a.estimate() + b.estimate() - a.union(b).estimate()

    def rel_error(self) -> float:
        """Standard error 1.04/sqrt(m) (Flajolet et al. 2007, Thm. 1)."""
        return 1.04 / math.sqrt(self.m)

    def to_bytes(self) -> bytes:
        return _pack(self.KIND, {"p": self.p}, [self.registers])

    @classmethod
    def _from(cls, head: dict, bufs: list[bytes]) -> "HyperLogLog":
        regs = np.frombuffer(bufs[0], dtype=np.uint8).copy()
        return cls(p=head["p"], registers=regs)


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

class CountMin:
    """d×w int64 counters; ``update`` scatters weights into one cell per row
    via independent re-mixes of the key; merge = elementwise sum (exact)."""

    KIND = "cms"

    def __init__(self, width: int = 16384, depth: int = 5, salt: int = 1,
                 counts: np.ndarray | None = None, total: int = 0):
        self.width = int(width)
        self.depth = int(depth)
        self.salt = int(salt)
        self.counts = (counts if counts is not None
                       else np.zeros((depth, width), dtype=np.int64))
        self.total = int(total)
        self._seeds = _row_seeds(depth, salt)

    def _indices(self, h: np.ndarray, row: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            hr = mix64(h + U64(self._seeds[row]))
            # Lemire multiply-shift on the top 32 bits (same range-reduction
            # the reference uses, src/prelude/mod.rs:57-64)
            return (((hr >> U64(32)) * U64(self.width)) >> U64(32)).view(np.int64)

    def add_hashes(self, keys: np.ndarray,
                   weights: np.ndarray | None = None) -> "CountMin":
        h = _as_u64(keys)
        if h.size == 0:
            return self
        w = (np.ones(h.size, dtype=np.int64) if weights is None
             else weights.astype(np.int64, copy=False))
        if weights is not None and (w < 0).any():
            # the "never under" min-sketch law (Thm. 1) assumes cash-
            # register updates; a negative weight silently voids it
            raise ValueError("count-min requires non-negative weights")
        for r in range(self.depth):
            np.add.at(self.counts[r], self._indices(h, r), w)
        self.total += int(w.sum())
        return self

    def estimate_hashes(self, keys: np.ndarray) -> np.ndarray:
        h = _as_u64(keys)
        est = np.full(h.size, np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(self.depth):
            np.minimum(est, self.counts[r][self._indices(h, r)], out=est)
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        if (other.width, other.depth, other.salt) != (self.width, self.depth,
                                                      self.salt):
            raise ValueError("count-min geometry/salt mismatch")
        self.counts += other.counts
        self.total += other.total
        return self

    def eps(self) -> float:
        """Overestimate bound factor: est ≤ true + eps·N w.p. ≥ 1 - e^-depth
        (Cormode & Muthukrishnan 2005, Thm. 1)."""
        return math.e / self.width

    def to_bytes(self) -> bytes:
        return _pack(self.KIND, {"width": self.width, "depth": self.depth,
                                 "salt": self.salt, "total": self.total},
                     [self.counts])

    @classmethod
    def _from(cls, head: dict, bufs: list[bytes]) -> "CountMin":
        counts = np.frombuffer(bufs[0], dtype=np.int64).reshape(
            head["depth"], head["width"]).copy()
        return cls(width=head["width"], depth=head["depth"], salt=head["salt"],
                   counts=counts, total=head["total"])


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------

class Bloom:
    """Bit array in uint64 words; k probes via double hashing
    (h1 + i·h2, Kirsch & Mitzenmacher 2006). Merge = bitwise OR (exact).
    The mutable/mergeable counterpart of the static xor/binary-fuse family —
    ~1.44·log2(1/fpp) bits/key vs the reference's ~1.13·log2(1/fpp)
    (reference README.md:30-41 comparison table)."""

    KIND = "bloom"

    def __init__(self, n_bits: int, k: int, salt: int = 1,
                 words: np.ndarray | None = None, n_added: int = 0):
        n_bits = int(n_bits)
        if n_bits <= 0 or k <= 0:
            raise ValueError("bloom needs n_bits > 0 and k > 0")
        self.n_bits = ((n_bits + 63) // 64) * 64
        self.k = int(k)
        self.salt = int(salt)
        self.words = (words if words is not None
                      else np.zeros(self.n_bits // 64, dtype=np.uint64))
        self.n_added = int(n_added)
        self._seed2 = _row_seeds(1, salt ^ 0xB100F)[0]

    @classmethod
    def for_capacity(cls, n: int, fpp: float = 0.01, salt: int = 1) -> "Bloom":
        n = max(int(n), 1)
        m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
        k = max(1, round(m / n * math.log(2)))
        return cls(n_bits=m, k=k, salt=salt)

    def _probe_indices(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(k, n) word and bit index arrays for a key batch."""
        with np.errstate(over="ignore"):
            h1 = mix64(h + U64(self.salt & MASK64))
            h2 = mix64(h + U64(self._seed2)) | U64(1)
            ks = np.arange(self.k, dtype=np.uint64)[:, None]
            idx = (h1[None, :] + ks * h2[None, :]) % U64(self.n_bits)
        return (idx >> U64(6)).view(np.int64), idx & U64(63)

    def add_hashes(self, keys: np.ndarray) -> "Bloom":
        h = _as_u64(keys)
        if h.size == 0:
            return self
        word, bit = self._probe_indices(h)
        np.bitwise_or.at(self.words, word.ravel(),
                         U64(1) << bit.ravel().astype(np.uint64))
        self.n_added += h.size
        return self

    def contains_hashes(self, keys: np.ndarray) -> np.ndarray:
        h = _as_u64(keys)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        word, bit = self._probe_indices(h)
        hit = (self.words[word] >> bit.astype(np.uint64)) & U64(1)
        return hit.all(axis=0)

    def merge(self, other: "Bloom") -> "Bloom":
        if (other.n_bits, other.k, other.salt) != (self.n_bits, self.k,
                                                   self.salt):
            raise ValueError("bloom geometry/salt mismatch")
        np.bitwise_or(self.words, other.words, out=self.words)
        self.n_added += other.n_added
        return self

    def fill_ratio(self) -> float:
        ones = int(np.unpackbits(self.words.view(np.uint8)).sum())
        return ones / self.n_bits

    def expected_fpp(self) -> float:
        """(fill_ratio)^k — the standard occupancy-based estimate."""
        return self.fill_ratio() ** self.k

    def to_bytes(self) -> bytes:
        return _pack(self.KIND, {"n_bits": self.n_bits, "k": self.k,
                                 "salt": self.salt, "n_added": self.n_added},
                     [self.words])

    @classmethod
    def _from(cls, head: dict, bufs: list[bytes]) -> "Bloom":
        words = np.frombuffer(bufs[0], dtype=np.uint64).copy()
        return cls(n_bits=head["n_bits"], k=head["k"], salt=head["salt"],
                   words=words, n_added=head["n_added"])


# ---------------------------------------------------------------------------
# KLL quantile sketch
# ---------------------------------------------------------------------------

class KLL:
    """KLL quantile sketch (Karnin-Lang-Liberty 2016) over float64 values.

    ``levels[h]`` holds items of weight 2**h. A compaction sorts an over-full
    level and promotes every other item (offset chosen by a deterministic
    splitmix64 coin — reproducible builds, same discipline as the reference's
    seed schedule). Rank error is O(1/k); with the default k=400 the measured
    error is well under 1%. Merge = level-wise concat + compress: associative
    and commutative within the same bound.
    """

    KIND = "kll"
    _C = 2.0 / 3.0

    def __init__(self, k: int = 400, levels: list[np.ndarray] | None = None,
                 n: int = 0, coin_state: int = 1):
        if k < 8:
            raise ValueError("kll k must be >= 8")
        self.k = int(k)
        self.levels = levels if levels is not None else [
            np.empty(0, dtype=np.float64)]
        self.n = int(n)
        self.coin_state = int(coin_state)

    def _cap(self, h: int) -> int:
        """Capacity of level h (0 = weight-1 level) when there are H levels."""
        depth = len(self.levels) - 1 - h
        return max(int(math.ceil(self.k * (self._C ** depth))), 2)

    def _coin(self) -> int:
        self.coin_state, z = splitmix64(self.coin_state)
        return int(z & 1)

    def add(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        return self._compress()

    def _compress(self) -> "KLL":
        while True:
            over = next((h for h in range(len(self.levels))
                         if self.levels[h].size > self._cap(h)), None)
            if over is None:
                return self
            arr = np.sort(self.levels[over])
            keep = np.empty(0, dtype=np.float64)
            if arr.size % 2 == 1:
                # canonical KLL odd-size rule: retain one item at this level
                # (random end) and compact only the even remainder, so total
                # retained weight equals n EXACTLY instead of drifting by one
                # weight unit per odd compaction
                if self._coin():
                    keep, arr = arr[:1], arr[1:]
                else:
                    keep, arr = arr[-1:], arr[:-1]
            kept = arr[self._coin()::2]
            self.levels[over] = keep
            if over + 1 == len(self.levels):
                self.levels.append(kept)
            else:
                self.levels[over + 1] = np.concatenate(
                    [self.levels[over + 1], kept])

    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("kll k mismatch")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, arr in enumerate(other.levels):
            if arr.size:
                self.levels[h] = np.concatenate([self.levels[h], arr])
        self.n += other.n
        self.coin_state = (self.coin_state ^ other.coin_state) or 1
        return self._compress()

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = [a for a in self.levels if a.size]
        wts = [np.full(a.size, 1 << h, dtype=np.int64)
               for h, a in enumerate(self.levels) if a.size]
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank(self, x: float) -> float:
        """Estimated fraction of items ≤ x."""
        v, w = self._weighted()
        if v.size == 0:
            return 0.0
        return float(w[v <= x].sum()) / self.n

    def quantiles(self, qs) -> np.ndarray:
        v, w = self._weighted()
        if v.size == 0:
            return np.full(len(qs), np.nan)
        cum = np.cumsum(w)
        targets = np.asarray(qs, dtype=np.float64) * self.n
        idx = np.minimum(np.searchsorted(cum, targets, side="left"),
                         v.size - 1)
        return v[idx]

    def to_bytes(self) -> bytes:
        lens = [int(a.size) for a in self.levels]
        flat = (np.concatenate([a for a in self.levels if a.size])
                if any(lens) else np.empty(0, dtype=np.float64))
        return _pack(self.KIND, {"k": self.k, "n": self.n,
                                 "coin_state": self.coin_state, "lens": lens},
                     [flat])

    @classmethod
    def _from(cls, head: dict, bufs: list[bytes]) -> "KLL":
        flat = np.frombuffer(bufs[0], dtype=np.float64)
        levels, pos = [], 0
        for ln in head["lens"]:
            levels.append(flat[pos:pos + ln].copy())
            pos += ln
        return cls(k=head["k"], levels=levels, n=head["n"],
                   coin_state=head["coin_state"])


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------

class TDigest:
    """Merging t-digest (Dunning & Ertl) with the k1 arcsine scale function.

    Compression is one vectorized pass: sort incoming (mean, weight) points,
    map each midpoint quantile through k1(q) = δ/(2π)·asin(2q-1), and group
    points sharing ``floor(k1)`` with ``np.add.reduceat`` — no per-centroid
    Python loop. Tail centroids stay near weight 1, giving the signature
    ~O(δ⁻²·q(1-q)) rank error at the extremes.
    """

    KIND = "tdigest"

    def __init__(self, delta: int = 300, means: np.ndarray | None = None,
                 weights: np.ndarray | None = None,
                 vmin: float = math.inf, vmax: float = -math.inf):
        if delta < 20:
            raise ValueError("tdigest delta must be >= 20")
        self.delta = int(delta)
        self.means = (means if means is not None
                      else np.empty(0, dtype=np.float64))
        self.weights = (weights if weights is not None
                        else np.empty(0, dtype=np.float64))
        self.vmin = float(vmin)
        self.vmax = float(vmax)

    @property
    def n(self) -> float:
        return float(self.weights.sum())

    def _k1(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2 * math.pi) * np.arcsin(
            np.clip(2 * q - 1, -1.0, 1.0))

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        m, w = means[order], weights[order]
        total = w.sum()
        if total <= 0:
            self.means = np.empty(0)
            self.weights = np.empty(0)
            return
        qmid = (np.cumsum(w) - 0.5 * w) / total
        cluster = np.floor(self._k1(qmid)).astype(np.int64)
        starts = np.flatnonzero(np.concatenate(
            [[True], cluster[1:] != cluster[:-1]]))
        wsum = np.add.reduceat(w, starts)
        msum = np.add.reduceat(w * m, starts)
        self.means = msum / wsum
        self.weights = wsum

    def add(self, values: np.ndarray,
            weights: np.ndarray | None = None) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        keep = ~np.isnan(v)
        v = v[keep]
        if v.size == 0:
            return self
        w = (np.ones(v.size) if weights is None
             else np.asarray(weights, dtype=np.float64)[keep])
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._compress(np.concatenate([self.means, v]),
                       np.concatenate([self.weights, w]))
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.delta != self.delta:
            raise ValueError("tdigest delta mismatch")
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._compress(np.concatenate([self.means, other.means]),
                       np.concatenate([self.weights, other.weights]))
        return self

    def quantile(self, q: float) -> float:
        return float(self.quantiles([q])[0])

    def quantiles(self, qs) -> np.ndarray:
        if self.weights.size == 0:
            return np.full(len(qs), np.nan)
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - 0.5 * self.weights
        xs = np.concatenate([[0.0], cum, [total]])
        ys = np.concatenate([[self.vmin], self.means, [self.vmax]])
        return np.interp(np.asarray(qs, dtype=np.float64) * total, xs, ys)

    def cdf(self, xs) -> np.ndarray:
        """Estimated rank (fraction ≤ x) by inverse interpolation."""
        if self.weights.size == 0:
            return np.full(len(np.atleast_1d(xs)), np.nan)
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - 0.5 * self.weights
        gx = np.concatenate([[self.vmin], self.means, [self.vmax]])
        gy = np.concatenate([[0.0], cum, [total]])
        return np.interp(np.asarray(xs, dtype=np.float64), gx, gy) / total

    def to_bytes(self) -> bytes:
        return _pack(self.KIND,
                     {"delta": self.delta, "vmin": self.vmin,
                      "vmax": self.vmax},
                     [self.means, self.weights])

    @classmethod
    def _from(cls, head: dict, bufs: list[bytes]) -> "TDigest":
        means = np.frombuffer(bufs[0], dtype=np.float64).copy()
        weights = np.frombuffer(bufs[1], dtype=np.float64).copy()
        return cls(delta=head["delta"], means=means, weights=weights,
                   vmin=head["vmin"], vmax=head["vmax"])


# ---------------------------------------------------------------------------
# Misra-Gries (heavy hitters / frequent items)
# ---------------------------------------------------------------------------

class Theta:
    """Bottom-k / KMV theta sketch over 64-bit hashed keys (Bar-Yossef et
    al. 2002 KMV; Dasgupta, Lang, Rhodes, Thaler 2016 — the DataSketches
    theta family): retain the ``k`` smallest DISTINCT hash values;
    treating hashes as uniform samples of (0,1], θ = the k-th order
    statistic and the distinct estimate is (k-1)/θ (exact below k).

    Merge = multiset union of the retained sets trimmed back to the k
    smallest — associative, commutative, idempotent, and a pure function
    of the underlying key set, so distributed state is byte-identical to
    a local build under any partitioning/fold order (same law the tests
    pin for HLL).

    Why alongside HLL: theta sketches support SET OPERATIONS with error
    that scales with the RESULT size — ``intersection_estimate`` counts
    retained sample overlap below min(θ_a, θ_b) — where HLL's
    inclusion-exclusion error scales with the UNION size and drowns
    small intersections. ``rel_error`` = 1/sqrt(k-2) (KMV unbiased
    estimator's coefficient of variation)."""

    KIND = "theta"

    def __init__(self, k: int = 4096, keys: np.ndarray | None = None):
        if k < 16:
            raise ValueError("theta sketch needs k >= 16")
        self.k = k
        # normalize to the class invariant every method assumes
        # (sorted-distinct, ≤ k): a caller-supplied unsorted/oversized
        # array would make keys[k-1] not the k-th order statistic and
        # silently corrupt the estimator and the saturation pre-filter.
        # No-op (cheap) for the _from fast path, which is already
        # sorted-distinct-trimmed.
        self.keys = (np.unique(np.asarray(keys, dtype=np.uint64))[:k]
                     if keys is not None
                     else np.empty(0, dtype=np.uint64))

    def _trim(self, merged: np.ndarray) -> "Theta":
        merged = np.unique(merged)           # sorted + distinct
        self.keys = merged[:self.k]
        return self

    def add_hashes(self, keys: np.ndarray) -> "Theta":
        h = _as_u64(keys)
        if self.keys.size >= self.k:
            # saturated: anything ≥ the current k-th smallest either
            # duplicates it or cannot displace anything — dropping it
            # before the sort is a pure no-op on the retained SET (state
            # stays byte-identical), and turns the per-batch cost into
            # O(batch) once the sketch is warm
            h = h[h < self.keys[self.k - 1]]
        if h.size == 0:
            return self
        return self._trim(np.concatenate([self.keys, h]))

    def merge(self, other: "Theta") -> "Theta":
        if other.k != self.k:
            raise ValueError(f"theta k mismatch: {self.k} vs {other.k}")
        return self._trim(np.concatenate([self.keys, other.keys]))

    def _theta(self) -> float:
        """k-th order statistic mapped to (0, 1] (hash h represents the
        uniform draw (h+1)/2^64, so θ > 0 even for h = 0)."""
        return (float(self.keys[self.k - 1]) + 1.0) / 2.0 ** 64

    def theta(self) -> float:
        """Effective sampling probability: 1.0 while everything is
        retained (exact regime), else the k-th order statistic."""
        return self._theta() if self.keys.size >= self.k else 1.0

    def estimate(self) -> float:
        if self.keys.size < self.k:          # everything retained: exact
            return float(self.keys.size)
        return (self.k - 1) / self._theta()

    def union(self, other: "Theta") -> "Theta":
        return Theta(k=self.k, keys=self.keys.copy()).merge(other)

    @staticmethod
    def intersection_estimate(a: "Theta", b: "Theta") -> float:
        """Direct sample-overlap intersection: both retained sets are
        uniform samples of their key sets below their θ; below
        θ = min(θ_a, θ_b) a hash is retained by BOTH sketches iff it is
        in both key sets, so |A∩B| ≈ |overlap below θ| / θ. Error scales
        with the intersection, not the union (the HLL caveat)."""
        if a.k != b.k:
            raise ValueError(f"theta k mismatch: {a.k} vs {b.k}")
        # integer cut (hash h represents draw (h+1)/2^64): float θ·2^64
        # would be off by ~2^10 ulps at the top of the range
        ca = int(a.keys[a.k - 1]) + 1 if a.keys.size >= a.k else 1 << 64
        cb = int(b.keys[b.k - 1]) + 1 if b.keys.size >= b.k else 1 << 64
        cut = min(ca, cb)
        theta = cut / 2.0 ** 64
        if cut < 1 << 64:
            c64 = np.uint64(cut)
            av, bv = a.keys[a.keys < c64], b.keys[b.keys < c64]
        else:
            av, bv = a.keys, b.keys
        return float(np.intersect1d(av, bv).size) / theta

    def rel_error(self) -> float:
        return 1.0 / math.sqrt(self.k - 2)

    def to_bytes(self) -> bytes:
        return _pack(self.KIND, {"k": self.k}, [self.keys])

    @classmethod
    def _from(cls, head: dict, bufs: list[bytes]) -> "Theta":
        keys = np.frombuffer(bufs[0], dtype=np.uint64).copy()
        return cls(k=head["k"], keys=keys)


class MisraGries:
    """Misra-Gries frequent-items summary over 64-bit keys — batched,
    weighted, and mergeable (SpaceSaving-equivalent).

    Built from the published batched/mergeable formulation: Misra & Gries
    (1982) generalized counters; Agarwal, Cormode, Huang, Phillips, Wei, Yi,
    "Mergeable Summaries" (TODS 2013) §3 — summing two MG(k) counter sets
    and subtracting the (k+1)-th largest combined count (dropping
    non-positive counters) is an MG(k) summary of the concatenated input.
    A batch add is that same merge, with the batch's exact per-key totals
    playing the second summary (a zero-error summary of itself).

    Guarantees (``n`` = total added weight, ``D = dsub`` = cumulative
    subtracted decrement):

    - ``counter(x) ≤ true(x) ≤ counter(x) + D`` for every key x (absent
      keys read 0) — each compaction subtracts exactly ``m`` from any
      surviving key and at most ``m`` from any dropped one;
    - ``D ≤ n/(k+1)``: every compaction removes ≥ (k+1)·m counter mass
      (≥ k+1 counters sit at or above the (k+1)-th largest value m), total
      mass added is n and mass never goes negative;
    - hence every key with ``true(x) > n/(k+1)`` is still tracked — a
      heavy-hitters query at threshold φ > 1/(k+1) has no false negatives;
    - with ≤ k distinct keys no compaction ever runs: counts exact, D = 0.

    Merge is associative/commutative *within the bound* but NOT byte-exact
    (where compactions land depends on merge order), so ``mg`` does not
    join the byte-identical merge-law test that HLL/CMS/Bloom satisfy.

    Consumes int64/uint64 keys like the other keyed sketches, but identity
    matters for reporting: feed raw integral ids (e.g. token ids) or a
    portable hash the caller can join back to the item.
    """

    KIND = "mg"

    def __init__(self, k: int = 256, keys: np.ndarray | None = None,
                 counts: np.ndarray | None = None, n: int = 0,
                 dsub: int = 0):
        if int(k) < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.keys = keys if keys is not None else np.empty(0, dtype=np.uint64)
        self.counts = (counts if counts is not None
                       else np.empty(0, dtype=np.int64))
        self.n = int(n)
        self.dsub = int(dsub)

    def _combine(self, keys: np.ndarray, counts: np.ndarray) -> None:
        """Union-sum the (key, count) sets, then one MG compaction if over
        capacity. ``self.keys`` stays sorted ascending (np.unique output),
        which estimate_hashes' searchsorted relies on."""
        allk = np.concatenate([self.keys, keys])
        allc = np.concatenate([self.counts, counts])
        uk, inv = np.unique(allk, return_inverse=True)
        uc = np.zeros(uk.size, dtype=np.int64)
        np.add.at(uc, inv, allc)
        if uk.size > self.k:
            m = int(np.partition(uc, uk.size - self.k - 1)
                    [uk.size - self.k - 1])
            uc = uc - m
            keep = uc > 0
            uk, uc = uk[keep], uc[keep]
            self.dsub += m
        self.keys, self.counts = uk, uc

    def add_hashes(self, keys: np.ndarray,
                   weights: np.ndarray | None = None) -> "MisraGries":
        h = _as_u64(keys)
        if h.size == 0:
            return self
        uk, inv = np.unique(h, return_inverse=True)
        if weights is None:
            uw = np.bincount(inv, minlength=uk.size).astype(np.int64)
            self.n += int(h.size)
        else:
            w = np.asarray(weights).astype(np.int64, copy=False)
            if (w < 0).any():
                # the n/(k+1) decrement bound assumes monotone mass
                raise ValueError(
                    "misra-gries requires non-negative weights")
            uw = np.zeros(uk.size, dtype=np.int64)
            np.add.at(uw, inv, w)
            self.n += int(w.sum())
        self._combine(uk, uw)
        return self

    def estimate_hashes(self, keys: np.ndarray) -> np.ndarray:
        """Lower-bound counts (0 for untracked keys); true ≤ est + dsub."""
        h = _as_u64(keys)
        if self.keys.size == 0:
            return np.zeros(h.size, dtype=np.int64)
        pos = np.searchsorted(self.keys, h).clip(0, self.keys.size - 1)
        hit = self.keys[pos] == h
        return np.where(hit, self.counts[pos], 0)

    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.k != self.k:
            raise ValueError("misra-gries capacity (k) mismatch")
        self.n += other.n
        self.dsub += other.dsub
        self._combine(other.keys, other.counts)
        return self

    def topk(self, j: int | None = None):
        """``(keys, count_lo, count_hi)`` arrays ordered by count desc then
        key asc (deterministic ties); ``count_lo ≤ true ≤ count_hi``."""
        order = np.lexsort((self.keys, -self.counts))
        if j is not None:
            order = order[:j]
        lo = self.counts[order]
        return self.keys[order], lo, lo + self.dsub

    def error_bound(self) -> float:
        """Published bound on the undercount: ``dsub ≤ n/(k+1)``."""
        return self.n / (self.k + 1)

    def to_bytes(self) -> bytes:
        return _pack(self.KIND, {"k": self.k, "n": self.n, "dsub": self.dsub},
                     [self.keys, self.counts])

    @classmethod
    def _from(cls, head: dict, bufs: list[bytes]) -> "MisraGries":
        keys = np.frombuffer(bufs[0], dtype=np.uint64).copy()
        counts = np.frombuffer(bufs[1], dtype=np.int64).copy()
        return cls(k=head["k"], keys=keys, counts=counts, n=head["n"],
                   dsub=head["dsub"])


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

_CLASSES = {c.KIND: c for c in (HyperLogLog, CountMin, Bloom, KLL, TDigest,
                                MisraGries, Theta)}
SKETCH_KINDS = tuple(_CLASSES)
#: kinds that consume 64-bit hashed keys (vs float64 values)
KEYED_KINDS = ("hll", "cms", "bloom", "mg", "theta")


def make_sketch(kind: str, **params):
    if kind not in _CLASSES:
        raise ValueError(f"unknown sketch kind {kind!r}; one of {SKETCH_KINDS}")
    return _CLASSES[kind](**params)


def sketch_from_bytes(data: bytes):
    """Parse a sketch state blob (``to_bytes`` output).

    Error contract: a corrupt/truncated blob raises ``ValueError``.
    Corruption fuzzing escaped raw ``struct.error``/``KeyError``/
    ``IndexError`` from the per-kind parsers; this boundary normalizes
    them — the lineage-table and streaming readers treat ValueError as
    "corrupt partial, fail the read loudly", never as state."""
    try:
        head, bufs = _unpack(bytes(data))
        kind = head.pop("kind")
        return _CLASSES[kind]._from(head, bufs)
    except (struct.error, KeyError, IndexError, OverflowError,
            UnicodeDecodeError) as e:
        raise ValueError(
            f"corrupt sketch payload ({type(e).__name__}: {e})") from e
