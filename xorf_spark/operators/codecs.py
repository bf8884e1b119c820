"""Pure-stdlib media codecs (numpy + zlib + struct + wave) so the multimodal
operators can do REAL decode in this container — no PIL/ffmpeg/soundfile
needed for the lossless formats a pipeline actually controls:

- PNG  (bit depth 8; gray / gray+alpha / RGB / RGBA; all 5 filter types;
  non-interlaced) — full unfilter + zlib inflate per the PNG spec.
- BMP  (24-bit uncompressed bottom-up) and PPM (binary P6).
- WAV  (PCM 16-bit via the stdlib ``wave`` module).

Encoders for PNG/WAV exist so tests and the synthetic media table can
round-trip real payloads deterministically.

Baseline JPEG is implemented from the public spec in pure numpy
(``operators/jpeg.py`` — marker parse, Huffman, dequant, IDCT,
YCbCr→RGB) and routed here at the sniff step. Progressive JPEG and
container formats (MP4, ...) genuinely require external codec libraries
and raise ``NotImplementedError``.
"""

from __future__ import annotations

import struct
import wave
import zlib
from io import BytesIO

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_boundary(kind: str, *extra):
    """Decorator normalizing corrupt-input escapes to ``ValueError``.

    Corruption fuzzing (same protocol as ``test_jpeg_corruption_fuzz``)
    escaped raw ``zlib.error``/``struct.error``/``IndexError`` from the
    image paths and stdlib ``wave``'s ``wave.Error``/``EOFError``/bare
    ``RuntimeError`` (a seek past a corrupt chunk) from the audio path.
    The public decode contract is: corrupt input → ``ValueError``,
    unsupported-but-valid shape → ``NotImplementedError``.
    """
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(payload, *a, **k):
            try:
                return fn(payload, *a, **k)
            except (IndexError, KeyError, OverflowError, struct.error,
                    zlib.error, *extra) as e:
                raise ValueError(
                    f"corrupt {kind} stream ({type(e).__name__}: {e})"
                ) from e
        return wrapped
    return deco


def sniff_format(payload: bytes) -> str:
    """Best-effort container sniff from magic bytes."""
    if payload[:8] == _PNG_MAGIC:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos:pos + stride], dtype=np.uint8)
        pos += stride
        if ft == 0:  # None
            cur = line.copy()
        elif ft == 1:  # Sub: prefix-sum per byte-offset class, mod 256
            cur = np.empty(stride, dtype=np.uint8)
            for r in range(bpp):
                np.cumsum(line[r::bpp], dtype=np.uint8, out=cur[r::bpp])
        elif ft == 2:  # Up
            cur = line + prev
        elif ft == 3:  # Average (sequential: references reconstructed left)
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth (sequential)
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur
        prev = out[y]
    return out


@_decode_boundary("PNG")
def decode_png(payload: bytes) -> np.ndarray:
    """PNG → uint8 array of shape (h, w) for grayscale or (h, w, c)."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    ihdr = None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
        raise NotImplementedError(
            f"PNG variant unsupported (depth={depth}, color={color_type}, "
            f"interlace={interlace}) — only 8-bit non-interlaced")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    # size check BEFORE allocating (height, stride): a corrupt IHDR can
    # claim billions of rows — a valid stream always inflates to exactly
    # height filter bytes + height*stride samples, so this both rejects
    # the corruption and bounds the unfilter loop by the real data size
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG data size mismatch: IHDR claims {width}x{height}x"
            f"{channels} but IDAT inflates to {len(raw)} bytes")
    arr = _unfilter(raw, height, stride, channels)
    arr = arr.reshape(height, width, channels)
    return arr[:, :, 0] if channels == 1 else arr


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w) or (h, w, {2,3,4}) → PNG bytes, every row filtered with
    ``filter_type`` (0..4 — forward filtering references RAW neighbors, so it
    vectorizes; decoders must invert it, which exercises the unfilter path).
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = arr.reshape(h, w * c).astype(np.int16)
    left = np.zeros_like(flat)
    left[:, c:] = flat[:, :-c]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    ul = np.zeros_like(flat)
    ul[1:, c:] = flat[:-1, :-c]
    if filter_type == 0:
        filt = flat
    elif filter_type == 1:
        filt = flat - left
    elif filter_type == 2:
        filt = flat - up
    elif filter_type == 3:
        filt = flat - ((left + up) >> 1)
    elif filter_type == 4:
        p = left + up - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, up, ul))
        filt = flat - pred
    else:
        raise ValueError("filter_type must be 0..4")
    rows = np.concatenate(
        [np.full((h, 1), filter_type, np.uint8),
         (filt & 0xFF).astype(np.uint8)], axis=1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(rows.tobytes()))
            + _chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP / PPM
# ---------------------------------------------------------------------------


@_decode_boundary("BMP")
def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → uint8 (h, w, 3) RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", payload[10:14])
    w, h = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # 4-byte row padding
    rows = np.frombuffer(
        payload, np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    rows = rows[::-1] if flip else rows
    return rows[:, :, ::-1].copy()  # BGR → RGB


@_decode_boundary("PPM")
def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) → uint8 (h, w, 3)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: P6 <w> <h> <maxval> then a single whitespace byte before data
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment line
            while payload[pos] != 0x0A:  # IndexError at end → boundary
                pos += 1
            continue
        start = pos
        # bound the scan: past-the-end slicing yields b"" (never raises),
        # so an unterminated token would otherwise spin forever
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        if pos == start or pos >= len(payload):
            raise ValueError("truncated PPM header")
        fields.append(payload[start:pos])
    pos += 1  # the single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM")
    return np.frombuffer(payload, np.uint8, count=h * w * 3,
                         offset=pos).reshape(h, w, 3).copy()


def decode_image(payload: bytes) -> np.ndarray:
    fmt = sniff_format(bytes(payload))
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "jpeg":
        # baseline sequential DCT in pure numpy (operators/jpeg.py);
        # progressive/arithmetic still raise NotImplementedError there
        from .jpeg import decode_jpeg
        return decode_jpeg(payload)
    raise NotImplementedError(
        f"image format {fmt!r} needs external codec libraries "
        "(ffmpeg/container demuxers) not present in this environment")


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


@_decode_boundary("WAV", wave.Error, EOFError, RuntimeError)
def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (int16 array of shape (n,) or (n, channels), sample_rate)."""
    with wave.open(BytesIO(bytes(payload)), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV")
        sr = wf.getframerate()
        ch = wf.getnchannels()
        frames = wf.readframes(wf.getnframes())
    x = np.frombuffer(frames, dtype="<i2")
    if ch > 1:
        x = x.reshape(-1, ch)
    return x, sr


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    samples = np.ascontiguousarray(samples, dtype="<i2")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()
