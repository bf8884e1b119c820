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
import pandas as pd
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the classic alternative scale path to LSH
# ---------------------------------------------------------------------------
#
# Train: spherical k-means on a deterministic hash-ordered sample collected
# to the driver (IVF training is sample-based by design — ~10^4-10^6 training
# vectors regardless of corpus size, so this step is scale-independent).
# Assign: broadcast the small centroid matrix into an Arrow-batched pandas
# UDF (one matmul per batch — no per-row Python). Search: queries probe their
# ``nprobe`` nearest lists; candidates co-locate by a shuffle on list_id
# (each task sees only its lists' vectors), exact cosine rerank, top-k.


def ivf_train(corpus: DataFrame, n_lists: int = 16,
              id_col: str = "vec_id", vec_col: str = "embedding",
              sample_size: int = 20_000, iters: int = 8,
              seed: int = 13) -> np.ndarray:
    """Spherical k-means centroids (unit-norm, cosine geometry) trained on
    the ``sample_size`` corpus rows with the smallest ``xxhash64(id)`` — a
    deterministic uniform sample fetched with TakeOrdered (no full sort)."""
    rows = (corpus.select(F.col(vec_col).alias("e"),
                          F.xxhash64(F.col(id_col)).alias("h"))
            .orderBy("h").limit(sample_size).collect())
    X = np.array([r["e"] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n_lists = min(n_lists, X.shape[0])  # tiny corpora: one list per vector
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(X.shape[0], size=n_lists, replace=False)].copy()
    for _ in range(iters):
        sims = X @ cent.T
        assign = np.argmax(sims, axis=1)
        for j in range(n_lists):
            members = X[assign == j]
            if members.size == 0:  # reseed dead list to the worst-served point
                cent[j] = X[np.argmin(sims.max(axis=1))]
            else:
                c = members.sum(axis=0)
                cent[j] = c / max(np.linalg.norm(c), 1e-12)
    return cent


def _assign_udf(centroids: np.ndarray, nprobe: int):
    """pandas UDF: embedding -> array of the nprobe nearest list ids
    (cosine), one matmul per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    cent = np.ascontiguousarray(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def _assign(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ cent.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return _assign


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding",
               out_col: str = "list_id") -> DataFrame:
    """Corpus-side assignment: each vector to its single nearest list."""
    udf = _assign_udf(centroids, 1)
    return df.withColumn(out_col, udf(F.col(vec_col)).getItem(0))


def ivf_candidate_pairs(corpus: DataFrame, queries: DataFrame,
                        centroids: np.ndarray, nprobe: int = 4,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """The IVF probe stage without the final ranking: each query expands to
    its ``nprobe`` nearest lists, candidates co-locate by list_id, and
    every surviving (query, neighbor) pair carries its exact cosine. With
    ``nprobe == n_lists`` every corpus row is a candidate exactly once
    (each corpus vector lives in one list), so the pair set equals the
    brute-force cross join."""
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("nid"),
                      F.col(vec_col).alias("ne")), centroids, "ne")
    q = queries.select(F.col(id_col).alias("qid"),
                       F.col(vec_col).alias("qe"))
    qp = q.withColumn("list_id", F.explode(
        _assign_udf(centroids, nprobe)(F.col("qe"))))
    return (c.join(F.broadcast(qp), "list_id")
            .where(F.col("qid") != F.col("nid"))
            .select("qid", "nid", _cosine("qe", "ne").alias("cosine")))


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: np.ndarray,
             k: int = 10, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k through the IVF index: each query probes its
    ``nprobe`` nearest lists, candidates co-locate by list_id, exact rerank.
    Returned cosines are exact; recall grows with nprobe (nprobe == n_lists
    degenerates to exact brute force)."""
    pairs = ivf_candidate_pairs(corpus, queries, centroids, nprobe,
                                id_col, vec_col)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def embedding_neardup_pairs(corpus: DataFrame, threshold: float = 0.9,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            n_planes: int = 10, n_tables: int = 6,
                            seed: int = 13,
                            max_bucket: int | None = None,
                            pin: bool = True) -> DataFrame:
    """Embedding-cosine near-dup candidates via LSH self-join + exact
    verification (≥ threshold). The scale path for embedding dedup.

    Plan shape: ALL tables' signatures are computed in one Catalyst
    projection and exploded into ``(id, bucket_key)`` rows (bucket key =
    table id in the high bits | sig bits), so candidate generation is ONE
    self-join on the bucket key — not one join per table (the r3 form
    unioned ``n_tables`` separate self-joins, each with its own shuffle).
    Only ids travel through the explode and join; embeddings are
    re-attached to the surviving distinct pairs for the exact-cosine
    verify, keyed by the (uniform) id.

    ``max_bucket`` drops degenerate buckets (a boilerplate cluster all
    hashing together) before the quadratic bucket join — same declared
    skew control as ``lsh_candidate_pairs``; a dropped bucket is an
    all-near-dups cluster better collapsed by exact dedup upstream. The
    default is OCCUPANCY-RELATIVE with an absolute ceiling —
    ``max(1024, min(16 × n/2^n_planes, 32768))``: 16× the average bucket
    so only genuinely degenerate buckets are dropped (an absolute-only
    default would silently filter EVERY bucket — total recall loss —
    once normal occupancy outgrew it), while the ceiling bounds the
    bucket join's quadratic worst case (a near-threshold boilerplate
    cluster costs ≤ max_bucket² ≈ 1e9 comparisons per bucket, spread
    across tasks). The default path runs one extra ``count()`` over the
    corpus; pass an explicit int to skip it or to re-tune the trade.

    ``pin`` (default True) lazily ``localCheckpoint``s the exploded
    ``(id, bucket_key)`` frame — ~16 bytes × ``n_tables`` per vector —
    before fan-out: it feeds four plan branches (bucket-size aggregate,
    size filter, both self-join sides), and without pinning each branch
    recomputes every table's hyperplane signature AND re-scans the
    corpus (AQE stage boundaries defeat ReuseExchange — the same plan
    bug measured 2× in ``lsh_candidate_pairs``). Lazy: no job runs at
    call time; blocks are freed on GC; see ``lsh_candidate_pairs`` for
    the non-replicated-storage tradeoff. Pass ``pin=False`` only when
    the caller has already persisted the corpus projection."""
    head = corpus.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError(
            "embedding_neardup_pairs: empty corpus or null first "
            f"embedding (cannot infer dim from {head!r})")
    dim = len(head[0])
    if max_bucket is None:
        n_rows = corpus.count()
        max_bucket = max(1024,
                         min(16 * -(-n_rows // (1 << n_planes)), 32_768))
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("e"))
    keys = [_signature("e", _hyperplanes(dim, n_planes, t, seed))
            + F.lit(t << n_planes) for t in range(n_tables)]
    keyed = c.select("id", F.explode(F.array(*keys)).alias("bkey"))
    if pin:
        keyed = keyed.localCheckpoint(eager=False)
    sizes = (keyed.groupBy("bkey")
             .agg(F.count(F.lit(1)).alias("n"))
             .where(F.col("n").between(2, max_bucket)))
    small = keyed.join(sizes.select("bkey"), "bkey")
    a, b = small.alias("a"), small.alias("b")
    cand = (a.join(b, "bkey").where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())
    ea = c.select(F.col("id").alias("id_a"), F.col("e").alias("e_a"))
    eb = c.select(F.col("id").alias("id_b"), F.col("e").alias("e_b"))
    return (cand.join(ea, "id_a").join(eb, "id_b")
            .select("id_a", "id_b", _cosine("e_a", "e_b").alias("cosine"))
            .where(F.col("cosine") >= threshold))


def embedding_neardup_ivf(corpus: DataFrame, centroids: np.ndarray,
                          threshold: float = 0.9, nprobe: int = 1,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          max_list: int = 32_768,
                          pin: bool = True) -> DataFrame:
    """SemDeDup-style cluster-scoped embedding near-dup: assign every
    vector to its ``nprobe`` nearest spherical-k-means lists
    (:func:`ivf_train` centroids), generate pairs only WITHIN a shared
    list, verify with the exact cosine (``>= threshold``).

    The IVF twin of :func:`embedding_neardup_pairs` (random-hyperplane
    LSH): k-means lists follow the DATA's density (tight semantic
    clusters land whole in one list, which is exactly where near-dups
    live — the SemDeDup observation), while hyperplane buckets are
    data-oblivious. ``nprobe=1`` is the classic SemDeDup regime and
    misses pairs straddling a list boundary; raising ``nprobe`` trades
    join fan-out for recall (a pair is a candidate iff the two vectors
    SHARE at least one of their nprobe lists).

    Scale shape: one broadcast-matmul assignment pass (KB centroids), a
    self-join co-located on list_id, exact verify on the surviving
    pairs. The assignment frame is pinned by default (lazy
    ``localCheckpoint``, same rationale and tradeoffs as
    ``embedding_neardup_pairs``): it feeds the oversize check AND both
    self-join sides, and without the pin each branch re-runs the
    pandas-UDF matmul over the whole corpus. Pass ``pin=False`` when the
    caller already persisted/checkpointed the projection or cannot
    accept non-replicated checkpoint storage under executor loss —
    mirroring the sibling operators' opt-out.
    ``max_list`` refuses degenerate lists (a list holding half
    the corpus makes the within-list join quadratic in corpus size —
    retrain with more lists instead); candidates stay bounded by
    ``max_list`` × rows.
    """
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("e"))
    assigned = c.select(
        "id", F.explode(_assign_udf(centroids, nprobe)(F.col("e")))
        .alias("list_id"))
    if pin:
        assigned = assigned.localCheckpoint(eager=False)
    sizes = (assigned.groupBy("list_id")
             .agg(F.count(F.lit(1)).alias("n")))
    oversize = [int(r["list_id"]) for r in
                sizes.where(F.col("n") > max_list).collect()]
    if oversize:
        raise ValueError(
            f"IVF lists {oversize} exceed max_list={max_list} vectors — "
            f"the within-list join would be quadratic in corpus size; "
            f"retrain with more lists (ivf_train n_lists) or raise "
            f"max_list deliberately")
    a, b = assigned.alias("a"), assigned.alias("b")
    cand = (a.join(b, "list_id").where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())
    ea = c.select(F.col("id").alias("id_a"), F.col("e").alias("e_a"))
    eb = c.select(F.col("id").alias("id_b"), F.col("e").alias("e_b"))
    return (cand.join(ea, "id_a").join(eb, "id_b")
            .select("id_a", "id_b", _cosine("e_a", "e_b").alias("cosine"))
            .where(F.col("cosine") >= threshold))
