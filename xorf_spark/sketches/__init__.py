"""Mergeable sketch library: HLL, Count-Min, Bloom, KLL, t-digest, theta
(bottom-k/KMV) and Misra-Gries heavy hitters as distributed Spark UDAF-style aggregations
(north-star extension of the reference filter family)."""

from .dataflow import (
    PARTIAL_SCHEMA,
    bloom_contains_udf,
    tdigest_cdf_udf,
    build_sketch_table,
    cms_estimate_udf,
    grouped_sketch,
    mg_estimate_udf,
    partial_sketches,
    sketch_agg,
    sketch_agg_staged,
    sketch_from_table,
    tree_merge,
)
from .kernels import (
    KEYED_KINDS,
    KLL,
    SKETCH_KINDS,
    Bloom,
    CountMin,
    HyperLogLog,
    MisraGries,
    TDigest,
    Theta,
    make_sketch,
    sketch_from_bytes,
)

__all__ = [
    "Bloom", "CountMin", "HyperLogLog", "KLL", "TDigest", "MisraGries", "Theta",
    "KEYED_KINDS", "SKETCH_KINDS", "PARTIAL_SCHEMA",
    "make_sketch", "sketch_from_bytes",
    "partial_sketches", "tree_merge", "sketch_agg", "sketch_agg_staged", "grouped_sketch",
    "build_sketch_table", "sketch_from_table",
    "cms_estimate_udf", "bloom_contains_udf", "tdigest_cdf_udf",
    "mg_estimate_udf",
]
