"""Similarity search over embedding columns (``array<float>``).

- ``brute_force_topk`` — exact cosine top-k via broadcast cross join +
  Catalyst array lambdas (the correctness baseline; scales as
  O(|queries|·|corpus|) with the corpus fully distributed).
- ``lsh_topk`` — random-hyperplane (SimHash) LSH bucketing as the scale
  path: candidates only where signatures share a bucket in ≥1 of L tables,
  then exact rerank of candidates. All JVM expressions; hyperplanes are
  deterministic literals.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * "
        "cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)")


def _cosine(a: str, b: str):
    dot = F.expr(_DOT.format(a=a, b=b))
    na = F.sqrt(F.expr(_DOT.format(a=a, b=a)))
    nb = F.sqrt(F.expr(_DOT.format(a=b, b=b)))
    return dot / (na * nb)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     ) -> DataFrame:
    """Exact cosine top-k: broadcast the queries against the distributed
    corpus (one scan, no shuffle until the per-query top-k aggregation)."""
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"))
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("ne"))
    pairs = (c.crossJoin(F.broadcast(q))
             .where(F.col("qid") != F.col("nid"))
             .select("qid", "nid", _cosine("qe", "ne").alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def _hyperplanes(dim: int, n_planes: int, table: int, seed: int = 13
                 ) -> list[list[float]]:
    rng = np.random.default_rng(seed + 1000 * table)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def _signature(vec_col: str, planes: list[list[float]]):
    """Bit signature: sign of the projection on each hyperplane, packed into
    a long — pure Catalyst expressions over literal plane arrays."""
    bits = []
    for i, p in enumerate(planes):
        arr = "array(" + ", ".join(f"{x}D" for x in p) + ")"
        proj = _DOT.format(a=vec_col, b=arr)
        bits.append(f"(CASE WHEN ({proj}) > 0 THEN shiftleft(1L, {i}) "
                    f"ELSE 0L END)")
    return F.expr(" | ".join(bits))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 12, n_tables: int = 4, dim: int | None = None,
             seed: int = 13) -> DataFrame:
    """Approximate cosine top-k: L independent random-hyperplane tables;
    candidates share a full signature bucket in at least one table; exact
    cosine rerank of candidates. Probabilistic recall (tunable via
    n_planes/n_tables); every returned pair's cosine is exact."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("ne"))
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"))
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, t, seed)
        cb = c.select("nid", "ne", _signature("ne", planes).alias("sig"))
        qb = q.select("qid", "qe", _signature("qe", planes).alias("sig"))
        hit = (cb.join(F.broadcast(qb), "sig")
               .where(F.col("qid") != F.col("nid"))
               .select("qid", "qe", "nid", "ne"))
        cand = hit if cand is None else cand.unionByName(hit)
    pairs = (cand.distinct()
             .select("qid", "nid", _cosine("qe", "ne").alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def embedding_neardup_pairs(corpus: DataFrame, threshold: float = 0.9,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            n_planes: int = 10, n_tables: int = 6,
                            seed: int = 13) -> DataFrame:
    """Embedding-cosine near-dup candidates via LSH self-join + exact
    verification (≥ threshold). The scale path for embedding dedup."""
    dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("e"))
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, t, seed)
        cb = c.select("id", "e", _signature("e", planes).alias("sig"))
        a, b = cb.alias("a"), cb.alias("b")
        hit = (a.join(b, "sig").where(F.col("a.id") < F.col("b.id"))
               .select(F.col("a.id").alias("id_a"), F.col("a.e").alias("e_a"),
                       F.col("b.id").alias("id_b"), F.col("b.e").alias("e_b")))
        cand = hit if cand is None else cand.unionByName(hit)
    return (cand.distinct()
            .select("id_a", "id_b", _cosine("e_a", "e_b").alias("cosine"))
            .where(F.col("cosine") >= threshold))
