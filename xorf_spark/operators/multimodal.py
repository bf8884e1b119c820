"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
with decode / feature-extraction / frame-sampling as Arrow-batched
``mapInPandas`` stages.

The image/audio/video codec libraries are not available in this container, so
the decode kernels are STUBBED: ``fake=True`` (default) produces
deterministic hash-derived features with the real schema, batch shape and
partitioning; ``fake=False`` raises ``NotImplementedError`` at the exact
point a codec call would happen. Everything Spark-side — schemas, the
mapInPandas iterator protocol, Arrow batching, partition-level parallelism —
is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal row: payload + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("payload", BinaryType(), False),    # opaque encoded bytes
    StructField("meta", StructType([
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("codec", StringType(), True),
    ]), True),
])

FEATURE_DIM = 32

FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("features", ArrayType(FloatType()), False),
])


def media_from_documents(df: DataFrame, kind: str = "image") -> DataFrame:
    """Adapt the test ``documents`` table into the multimodal shape (text
    bytes standing in for encoded media payloads)."""
    return df.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("stub").alias("codec"),
        ).alias("meta"))


def _fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic per-payload pseudo-features (blake2b-seeded), standing
    in for a real decode→embed kernel. Vectorized per Arrow batch."""
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, p in enumerate(payloads):
        seed = int.from_bytes(
            hashlib.blake2b(bytes(p), digest_size=8).digest(), "little")
        out[i] = np.random.default_rng(seed).standard_normal(FEATURE_DIM)
    return out


def extract_features(df: DataFrame, fake: bool = True,
                     batch_size_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract each payload via ``mapInPandas``.

    Real decode is stubbed (no codec libs in this container): ``fake=False``
    raises NotImplementedError where e.g. ``PIL.Image.open(io.BytesIO(p))``
    would run. The Arrow batch shape, schema and partition parallelism are
    the production plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires codec libraries (PIL/av/"
                    "torchaudio) not present in this environment")
            feats = _fake_features(pdf["payload"])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "features": list(feats),
            })

    return df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10, fake: bool = True
                 ) -> DataFrame:
    """Sample every ``every_n``-th frame of video payloads. Stubbed decode:
    fake mode derives a deterministic frame count from the payload bytes and
    emits (media_id, frame_idx, frame_bytes) rows — the real kernel would
    demux with e.g. ``av.open`` at the marked point."""
    out_schema = StructType([
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame demux requires av/ffmpeg, absent here")
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = (len(payload) % 97) + every_n  # deterministic stub
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(bytes(payload[:16]) + fi.to_bytes(4, "little"))
            yield pd.DataFrame(
                {"media_id": ids,
                 "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame": frames})

    return df.mapInPandas(run, out_schema)
