"""Property-based tests (hypothesis) for the filter family — the reference's
core contract quantified over arbitrary key sets instead of fixed fixtures:
zero false negatives always (src/lib.rs:117-119), DMA round-trips preserve
probe semantics, and duplicate handling matches each family's documented
behavior (xor/fuse pre-dedup; bfuse detect-and-drop, src/prelude/bfuse.rs:200-215).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xorf_spark import filters as X

key_arrays = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1),
    min_size=1, max_size=400, unique=True,
).map(lambda xs: np.array(xs, dtype=np.uint64))

# edge-heavy pool: 0, MAX, dense low ints, powers of two
edge_arrays = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=64),
        st.sampled_from([0, 1, 2**32 - 1, 2**32, 2**63, 2**64 - 1]),
        st.builds(lambda e: 2**e, st.integers(min_value=0, max_value=63)),
    ),
    min_size=1, max_size=120, unique=True,
).map(lambda xs: np.array(xs, dtype=np.uint64))


@pytest.mark.parametrize("cls", [X.Xor8, X.Xor16, X.Xor32,
                                 X.BinaryFuse8, X.BinaryFuse16,
                                 X.BinaryFuse32])
@settings(max_examples=30, deadline=None)
@given(keys=st.one_of(key_arrays, edge_arrays))
def test_zero_false_negatives_property(cls, keys):
    filt = cls.from_keys(keys)
    assert np.asarray(filt.contains(keys)).all()


@pytest.mark.parametrize("cls", [X.Xor8, X.BinaryFuse8, X.BinaryFuse16])
@settings(max_examples=15, deadline=None)
@given(keys=key_arrays)
def test_dma_roundtrip_property(cls, keys):
    filt = cls.from_keys(keys)
    desc, fps = filt.to_dma()
    back = cls.from_dma(desc, fps)
    assert np.asarray(back.contains(keys)).all()
    rng = np.random.default_rng(7)
    fresh = rng.integers(0, 2**64, 2000, dtype=np.uint64)
    assert np.array_equal(np.asarray(back.contains(fresh)),
                          np.asarray(filt.contains(fresh)))


@settings(max_examples=15, deadline=None)
@given(keys=st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                     min_size=1, max_size=200)
       .map(lambda xs: np.array(xs, dtype=np.uint64)))
def test_bfuse_duplicate_drop_property(keys):
    """BinaryFuse accepts duplicate keys (detect-and-drop) and still has
    zero FN on the distinct set."""
    dup = np.concatenate([keys, keys[: max(1, keys.size // 2)]])
    filt = X.BinaryFuse8.from_keys(dup)
    assert np.asarray(filt.contains(np.unique(keys))).all()


@settings(max_examples=10, deadline=None)
@given(words=st.lists(st.text(min_size=0, max_size=40), min_size=1,
                      max_size=150, unique=True))
def test_hash_proxy_strings_property(words):
    proxy = X.HashProxy.from_keys(words)
    assert np.asarray(proxy.contains(words)).all()


@pytest.mark.parametrize("cls", [X.Xor8, X.Xor32, X.BinaryFuse8,
                                 X.BinaryFuse16, X.Fuse16])
def test_json_serde_roundtrip(cls):
    """The serde-feature role: whole-struct to_json/from_json preserves all
    probe verdicts (member + fresh) for every family."""
    from xorf_spark.filters import filter_from_json, filter_to_json

    rng = np.random.default_rng(21)
    n = 300_000 if cls.KIND.startswith("fuse") else 5_000
    keys = rng.integers(0, 2**64, n, dtype=np.uint64)
    filt = cls.from_keys(np.unique(keys))
    back = filter_from_json(filter_to_json(filt))
    assert type(back) is cls
    sub = np.unique(keys)[:50_000]
    assert np.asarray(back.contains(sub)).all()
    fresh = rng.integers(0, 2**64, 20_000, dtype=np.uint64)
    assert np.array_equal(np.asarray(back.contains(fresh)),
                          np.asarray(filt.contains(fresh)))


def test_from_dma_corruption_fuzz_contract():
    """DMA deserialization error contract (same protocol as the codec
    fuzzes): corrupted descriptors/fingerprint blobs either still parse
    (entropy changed — probes just return different bits) or refuse
    with ValueError. A pre-fix 6000-trial fuzz escaped struct.error on
    truncated descriptors and out-of-bounds IndexError from contains()
    when a corrupt layout field exceeded the fingerprint array."""
    import numpy as np

    from xorf_spark import filters as FL

    rng = np.random.default_rng(3)
    small = (np.arange(1, 5001, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))
    # the deprecated fuse family needs a dense key set to construct
    big = (np.arange(1, 200_001, dtype=np.uint64)
           * np.uint64(0x9E3779B97F4A7C15))
    probe = small[:64]
    cases = [(FL.BinaryFuse8, FL.BinaryFuse8.from_keys(small)),
             (FL.Xor8, FL.Xor8.from_keys(small)),
             (FL.Fuse8, FL.Fuse8.from_keys(big))]
    for cls, obj in cases:
        desc, fps = obj.to_dma()
        assert cls.from_dma(desc, fps).contains(probe).all()
        for trial in range(400):
            d, p = bytearray(desc), bytearray(fps)
            tgt = d if trial % 2 else p
            op = trial % 3
            if op == 0:
                tgt2 = tgt[:int(rng.integers(0, len(tgt)))]
            elif op == 1:
                tgt[int(rng.integers(0, len(tgt)))] = int(
                    rng.integers(0, 256))
                tgt2 = tgt
            else:
                i = int(rng.integers(0, max(1, len(tgt) - 1)))
                del tgt[i:i + int(rng.integers(1, 8))]
                tgt2 = tgt
            dd, pp = ((bytes(tgt2), bytes(p)) if trial % 2
                      else (bytes(d), bytes(tgt2)))
            try:
                cls.from_dma(dd, pp).contains(probe)
            except ValueError:
                pass
