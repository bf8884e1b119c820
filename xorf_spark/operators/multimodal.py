"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
with decode / feature-extraction / frame-sampling as Arrow-batched
``mapInPandas`` stages.

Decode status (no PIL/ffmpeg/soundfile in this container — verified by
import probe, see COVERAGE.md):

- ``fake=False`` does REAL decode for the formats ``operators/codecs.py``
  implements from the stdlib: PNG / BMP / PPM images and 16-bit PCM WAV
  audio, followed by real (deterministic, numpy) feature extraction.
- lossy/container formats (JPEG, MP4) and video demux raise
  ``NotImplementedError`` at the sniff point — those genuinely require
  external codec libraries.
- ``fake=True`` (default) keeps the original hash-derived stand-in features
  with identical schema/batch shape, for payloads that are not real media
  (e.g. text bytes standing in for payloads in the driver query).
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
    DoubleType,
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


def image_features(arr: np.ndarray) -> np.ndarray:
    """Deterministic 32-dim feature vector from a decoded uint8 image:
    4×4 gray thumbnail block-means (16) + per-channel mean/std (6) +
    shape descriptors (2) + 8-bin gray histogram density."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    rgb = arr[:, :, :3] if c >= 3 else np.repeat(arr[:, :, :1], 3, axis=2)
    gray = rgb.mean(axis=2)
    yb = (np.arange(5) * h) // 4
    xb = (np.arange(5) * w) // 4
    thumb = np.array([[gray[yb[i]:max(yb[i + 1], yb[i] + 1),
                            xb[j]:max(xb[j + 1], xb[j] + 1)].mean()
                       for j in range(4)] for i in range(4)], np.float64)
    hist = np.histogram(gray, bins=8, range=(0, 256))[0] / gray.size
    out = np.concatenate([
        thumb.ravel() / 255.0,
        rgb.reshape(-1, 3).mean(axis=0) / 255.0,
        rgb.reshape(-1, 3).std(axis=0) / 255.0,
        [np.log2(float(h) * w) / 32.0, min(h / w, 4.0) / 4.0],
        hist,
    ])
    return out.astype(np.float32)


def audio_features(x: np.ndarray, sr: int) -> np.ndarray:
    """Deterministic 32-dim feature vector from decoded PCM samples:
    rms/zcr/peak/duration/rate (5) + 27 log-spaced rFFT band energies."""
    if x.ndim > 1:
        x = x.mean(axis=1)
    xf = x.astype(np.float64) / 32768.0
    n = max(xf.size, 1)
    rms = float(np.sqrt(np.mean(xf * xf))) if xf.size else 0.0
    zcr = float(np.mean(np.signbit(xf[1:]) != np.signbit(xf[:-1]))) if xf.size > 1 else 0.0
    peak = float(np.abs(xf).max()) if xf.size else 0.0
    spec = np.abs(np.fft.rfft(xf))
    edges = np.unique(np.geomspace(1, max(spec.size - 1, 2), 28).astype(int))
    bands = np.add.reduceat(spec * spec, edges[:-1])
    bands = np.log1p(bands / n)
    bands = np.pad(bands, (0, 27 - bands.size))[:27]
    head = np.array([rms, zcr, peak, np.log1p(n / sr), sr / 48000.0])
    return np.concatenate([head, bands]).astype(np.float32)


def _real_features(kind: str, payload: bytes) -> np.ndarray:
    from . import codecs

    if kind == "image":
        return image_features(codecs.decode_image(payload))
    if kind == "audio":
        x, sr = codecs.decode_wav(payload)
        return audio_features(x, sr)
    raise NotImplementedError(
        f"real decode for kind={kind!r} requires external codec libraries "
        "(video demux needs av/ffmpeg, absent here)")


def extract_features(df: DataFrame, fake: bool = True,
                     batch_size_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract each payload via ``mapInPandas``.

    ``fake=False`` decodes for real via ``operators/codecs.py`` (stdlib PNG/
    BMP/PPM/WAV) and computes deterministic numpy features; unsupported
    formats raise ``NotImplementedError`` at the sniff point. The Arrow batch
    shape, schema and partition parallelism are identical in both modes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = list(_fake_features(pdf["payload"]))
            else:
                feats = [_real_features(k, bytes(p))
                         for k, p in zip(pdf["kind"], pdf["payload"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "features": feats,
            })

    return df.mapInPandas(run, FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic REAL media synthesis + decode stats (oracle-checkable)
# ---------------------------------------------------------------------------
#
# Payload parameters are closed-form functions of doc_id, so a SQL oracle can
# compute the expected decode results exactly — proving the decode path
# (zlib inflate + PNG unfilter / WAV PCM framing) reconstructs bit-exact
# pixel/sample values, not just plumbing.

def _image_params(doc_id: int) -> tuple[int, int, int, int, int]:
    h = 16 + doc_id % 17
    w = 16 + doc_id % 13
    c1 = doc_id % 256
    c2 = (doc_id * 7) % 256
    filter_type = doc_id % 5  # cycle all 5 PNG filters across the corpus
    return h, w, c1, c2, filter_type


def _audio_params(doc_id: int) -> tuple[int, int, int, int]:
    amp = 1000 + doc_id % 20000
    period = 2 * (1 + doc_id % 31)
    n = period * (4096 // period)   # whole periods => exact closed forms
    sr = 8000 + (doc_id % 5) * 1000
    return amp, period, n, sr


def synth_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One REAL grayscale PNG per row: two-tone image (top half c1, bottom
    c2), encoded with a doc_id-cycled PNG filter type so decode exercises
    every unfilter branch."""
    from . import codecs

    out_schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                h, w, c1, c2, ft = _image_params(int(d))
                arr = np.full((h, w), c2, np.uint8)
                arr[: h // 2] = c1
                payloads.append(codecs.encode_png(arr, filter_type=ft))
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"),
                                "kind": "image", "payload": payloads})

    return df.select(id_col).mapInPandas(run, out_schema)


def _jpeg_params(d: int) -> tuple[int, int, int, int]:
    """Closed-form two-tone JPEG geometry for doc_id ``d`` — mirrored
    literally by ORACLE_MEDIA_DECODE_JPEG. Heights are multiples of 16 so
    the tone boundary falls on an 8-pixel block row: every 8x8 block is
    UNIFORM, and at quality 75 (luma DC quant step exactly 8) a uniform
    block round-trips with zero loss (operators/jpeg.py docstring)."""
    h = 16 * (1 + d % 2)
    w = 8 * (1 + d % 3)
    return h, w, d % 256, (d * 7) % 256


def synth_jpegs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One REAL baseline JPEG per row: two-tone grayscale (top half c1,
    bottom c2, both halves whole 8x8 block rows), encoded by the pure-
    numpy baseline encoder at quality 75. Decode through the full JPEG
    path (markers → Huffman → dequant → IDCT) is pixel-exact for this
    geometry, so the SQL oracle can recompute every stat in closed form."""
    from .jpeg import encode_jpeg

    out_schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                h, w, c1, c2 = _jpeg_params(int(d))
                arr = np.full((h, w), c2, np.uint8)
                arr[: h // 2] = c1
                payloads.append(encode_jpeg(arr, quality=75))
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"),
                                "kind": "image", "payload": payloads})

    return df.select(id_col).mapInPandas(run, out_schema)


def synth_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One REAL 16-bit PCM WAV per row: square wave of amplitude ``amp`` and
    whole-period length, so RMS and zero-crossing counts have exact closed
    forms."""
    from . import codecs

    out_schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                amp, period, n, sr = _audio_params(int(d))
                i = np.arange(n)
                x = np.where((i // (period // 2)) % 2 == 0, amp, -amp
                             ).astype(np.int16)
                payloads.append(codecs.encode_wav(x, sr))
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"),
                                "kind": "audio", "payload": payloads})

    return df.select(id_col).mapInPandas(run, out_schema)


IMAGE_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("mean_val", DoubleType(), False),
])

AUDIO_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("n_samples", LongType(), False),
    StructField("sample_rate", IntegerType(), False),
    StructField("rms", DoubleType(), False),
    StructField("n_sign_changes", LongType(), False),
])


def image_stats(media_df: DataFrame) -> DataFrame:
    """REAL decode → (width, height, exact pixel mean) per image payload."""
    from . import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                arr = codecs.decode_image(bytes(p))
                h, w = arr.shape[:2]
                rows.append((int(d), w, h, float(arr.mean())))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height",
                                              "mean_val"])

    return media_df.mapInPandas(run, IMAGE_STATS_SCHEMA)


def audio_stats(media_df: DataFrame) -> DataFrame:
    """REAL decode → (n_samples, rate, exact RMS, sign changes) per WAV."""
    from . import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                x, sr = codecs.decode_wav(bytes(p))
                xf = x.astype(np.float64) / 32768.0
                rms = float(np.sqrt(np.mean(xf * xf)))
                changes = int(np.count_nonzero(np.sign(x[1:]) != np.sign(x[:-1])))
                rows.append((int(d), int(x.size), int(sr), rms, changes))
            yield pd.DataFrame(rows, columns=["doc_id", "n_samples",
                                              "sample_rate", "rms",
                                              "n_sign_changes"])

    return media_df.mapInPandas(run, AUDIO_STATS_SCHEMA)


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
