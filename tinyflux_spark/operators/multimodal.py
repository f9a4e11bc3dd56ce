"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery here is real and tested — schema, partition-
preserving ``mapInPandas`` operators with Arrow batch transfer, UDF
signatures, batch shapes. Two decode modes ship:

* :func:`media_decode` — a REAL codec path built on the standard
  library: PNG (zlib inflate + bpp-aware scanline unfiltering for all
  five PNG filter types, every 8-bit color type — grayscale, RGB,
  palette/PLTE, gray+alpha, RGBA) and WAV (RIFF parse via the ``wave``
  module). No third-party imaging/audio package exists in this
  environment, so the container formats exercised are the
  stdlib-codable ones; JPEG/MP4 decode would drop into the same
  dispatcher.
* ``_stub_decode`` — the deterministic md5-fold fake, kept as the
  oracle-replayable mode (``decode=None, strict=False``) for pipelines
  that need a SQL-replayable signal without real bytes.

At scale: media rows are large (MBs); operators keep ``bytes`` out of
shuffles — feature extraction projects to small vectors *before* any
wide transformation, and batch sizes are row-count based so Arrow
batches stay within executor memory.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField(
            "meta", T.MapType(T.StringType(), T.StringType(), True), True
        ),
    ]
)

FEATURE_DIM = 16


def _stub_decode(data: bytes, kind: str) -> np.ndarray:
    """Deterministic fake 'decode', chosen to be SQL-replayable so the
    correctness oracle can hash-match the whole mapInPandas pipeline:
    sample ``j`` is the first 8 hex chars of ``md5("{j}:{data.hex()}")``
    scaled to [0, 1). Each sample is exact in double (32-bit int /
     2^32), and the 4-samples-per-feature pooling sums 4 doubles
    sequentially in both engines, so DuckDB replays it bit-identically.
    STUB — replace with PIL/ffmpeg/librosa decode."""
    hx = (data or b"").hex()
    return np.array(
        [
            int(hashlib.md5(f"{j}:{hx}".encode()).hexdigest()[:8], 16)
            / 4294967296.0
            for j in range(4 * FEATURE_DIM)
        ]
    )


# ---------------------------------------------------------------------
# Real stdlib codecs: PNG (8-bit, all five color types) and WAV
# (PCM int16 mono).
# ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


# channels per PNG color type: gray, RGB, palette-index, gray+alpha,
# RGB+alpha
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(pixels, filter_type: int = 0, palette=None) -> bytes:
    """Encode 8-bit pixels as a real PNG (signature, IHDR, [PLTE], one
    zlib IDAT, IEND — readable by any viewer).

    Shape selects the color type: (h, w) → grayscale (ctype 0) or —
    with ``palette``, a list/array of (r, g, b) rows — palette indices
    (ctype 3, PLTE chunk); (h, w, 2) → gray+alpha (4); (h, w, 3) → RGB
    (2); (h, w, 4) → RGBA (6). ``filter_type`` applies PNG scanline
    filter 0 (None), 1 (Sub, bpp-offset left neighbor) or 2 (Up) to
    every row — the encoded stream differs but decodes to the same
    pixels, which the round-trip tests use to exercise the decoder's
    unfiltering paths."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        ctype = 3 if palette is not None else 0
        bpp = 1
        flat = px
    elif px.ndim == 3:
        h, w, bpp = px.shape
        if bpp not in (2, 3, 4):
            raise ValueError(
                "3-D pixels must have 2 (gray+alpha), 3 (RGB) or 4 "
                "(RGBA) channels; got shape "
                f"{px.shape} (a single-channel image is (h, w))"
            )
        if palette is not None:
            raise ValueError(
                "palette applies to (h, w) index arrays only; got a "
                f"{bpp}-channel image"
            )
        ctype = {2: 4, 3: 2, 4: 6}[bpp]
        flat = px.reshape(h, w * bpp)
    else:
        raise ValueError("pixels must be (h, w) or (h, w, channels)")
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for r in range(h):
        row = flat[r]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub: delta vs left neighbor, bpp back
            left = np.concatenate(
                (np.zeros(bpp, dtype=np.uint8), row[:-bpp])
            )
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up: delta vs row above
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        else:
            raise ValueError("encoder supports filter types 0, 1, 2")
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    chunks = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if ctype == 3:
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
            raise ValueError("palette must be (<=256, 3) uint8")
        chunks += _png_chunk(b"PLTE", pal.tobytes())
    return (
        chunks
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to a uint8 array: chunk walk, zlib inflate,
    per-scanline unfiltering for all five PNG filter types
    (None/Sub/Up/Average/Paeth) at the color type's byte depth, and
    PLTE lookup for palette images.

    Supports every 8-bit color type — 0 grayscale → (h, w); 3 palette
    → (h, w, 3) after PLTE expansion; 2 RGB / 4 gray+alpha / 6 RGBA →
    (h, w, channels). Filters predict from the byte ``bpp`` positions
    left (the per-channel left neighbor), per the PNG spec. Interlaced
    (Adam7) and non-8-bit depths are rejected loudly."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    ctype = None
    idat = bytearray()
    plte = None
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 8 + length > len(data):
            raise ValueError("truncated PNG chunk body")
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            if len(body) < 13:
                raise ValueError("truncated PNG IHDR chunk")
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if depth != 8:
                raise ValueError("decoder supports 8-bit channels only")
            if ctype not in _PNG_CHANNELS:
                raise ValueError(f"unknown PNG color type {ctype}")
            if interlace:
                raise ValueError("decoder does not support Adam7")
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ctype is None:
        raise ValueError("PNG signature present but no IHDR chunk")
    if not idat:
        raise ValueError("PNG has no IDAT data")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    bpp = _PNG_CHANNELS[ctype]
    rb = w * bpp  # row bytes
    out = np.zeros((h, rb), dtype=np.uint8)
    stride = rb + 1
    if len(raw) < h * stride:
        raise ValueError("truncated PNG pixel data")
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        ft, scan = line[0], np.frombuffer(line[1:], dtype=np.uint8).copy()
        up = out[r - 1] if r else np.zeros(rb, dtype=np.uint8)
        if ft == 0:
            out[r] = scan
        elif ft == 1:  # Sub
            for c in range(rb):
                left = int(out[r, c - bpp]) if c >= bpp else 0
                out[r, c] = (int(scan[c]) + left) & 0xFF
        elif ft == 2:  # Up
            out[r] = (scan.astype(np.int16) + up).astype(np.uint8)
        elif ft == 3:  # Average
            for c in range(rb):
                left = int(out[r, c - bpp]) if c >= bpp else 0
                out[r, c] = (int(scan[c]) + (left + int(up[c])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for c in range(rb):
                a = int(out[r, c - bpp]) if c >= bpp else 0
                b = int(up[c])
                cc = int(out[r - 1, c - bpp]) if r and c >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                out[r, c] = (int(scan[c]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
    if ctype == 0:
        return out
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE chunk")
        if out.max(initial=0) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[out]  # (h, w) indices -> (h, w, 3)
    return out.reshape(h, w, bpp)


def encode_wav(samples, rate: int = 8000) -> bytes:
    """Encode int16 samples as a real mono PCM WAV via the stdlib
    ``wave`` module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            np.asarray(samples, dtype="<i2").tobytes()
        )
    return buf.getvalue()


def decode_wav(data: bytes) -> np.ndarray:
    """Decode a PCM WAV to its int16 samples (mono; first channel)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("decoder supports 16-bit PCM only")
        frames = wf.readframes(wf.getnframes())
        arr = np.frombuffer(frames, dtype="<i2")
        if wf.getnchannels() > 1:
            arr = arr[:: wf.getnchannels()]
    return arr


def media_decode(data: bytes, kind: str) -> np.ndarray:
    """REAL decode dispatcher: container sniffed from magic bytes
    (PNG signature / RIFF), signal returned as raw sample values
    (pixel channel bytes 0..255 row-major — grayscale, RGB, expanded
    palette, or alpha channels alike; int16 audio samples) as float64
    — integers exact in double, so downstream pooled means are
    bit-reproducible in any engine."""
    if data[:8] == _PNG_SIG:
        return decode_png(data).reshape(-1).astype(np.float64)
    if data[:4] == b"RIFF":
        return decode_wav(data).astype(np.float64)
    raise ValueError(f"unrecognized media container for kind={kind!r}")


def extract_features(
    df: DataFrame,
    decode: Optional[Callable[[bytes, str], np.ndarray]] = None,
    strict: bool = False,
    batch_rows: int = 64,
) -> DataFrame:
    """(media_id, kind, feature: array<float>, n_bytes) via mapInPandas.

    Arrow-batched; ``batch_rows`` bounds rows per pandas batch so large
    blobs don't blow executor memory (set spark.sql.execution.arrow.
    maxRecordsPerBatch accordingly in production).
    """
    if decode is None:
        if strict:
            def decode(data, kind):  # pragma: no cover - stub guard
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "pass decode= or strict=False for the deterministic stub"
                )
        else:
            decode = _stub_decode

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats, nb = [], []
                for data, kind in zip(chunk["bytes"], chunk["kind"]):
                    raw = decode(bytes(data) if data is not None else b"", kind)
                    sig = np.asarray(raw, dtype=float)
                    # pool the fake signal down to FEATURE_DIM
                    pooled = sig[: (len(sig) // FEATURE_DIM) * FEATURE_DIM]
                    pooled = pooled.reshape(FEATURE_DIM, -1).mean(axis=1)
                    feats.append(pooled.tolist())
                    nb.append(len(data) if data is not None else 0)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "feature": feats,
                        "n_bytes": nb,
                    }
                )

    return df.select("media_id", "kind", "bytes").mapInPandas(op, out_schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame sampling plan: (media_id, frame_idx) rows.

    The decode of each sampled frame is the stubbed step; the explode /
    planning side (which frames, how many rows) is real and is the part
    that matters for partitioning: one media row fans out to at most
    ``max_frames`` rows BEFORE decode, so decode parallelism is
    per-frame, not per-video.
    """
    frames = F.sequence(
        F.lit(0),
        F.least(
            F.coalesce(
                F.col("meta").getItem("n_frames").cast("int") - 1, F.lit(0)
            ),
            F.lit((max_frames - 1) * every_n),
        ),
        F.lit(every_n),
    )
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id", F.explode(frames).alias("frame_idx"), "meta"
        )
    )


def resize_plan(df: DataFrame, width: int, height: int) -> DataFrame:
    """Attach target-size metadata for a downstream (stubbed) resize:
    real columns, stub codec."""
    return df.withColumn(
        "meta",
        F.map_concat(
            F.coalesce(
                F.col("meta"),
                F.create_map().cast("map<string,string>"),
            ),
            F.create_map(
                F.lit("resize_w"), F.lit(str(width)),
                F.lit("resize_h"), F.lit(str(height)),
            ),
        ),
    )


def synthetic_pixels(i: int, size: int = 16) -> np.ndarray:
    """The deterministic test pattern for media item ``i``: pixel(r, c)
    = (i*31 + r*8 + c*7) mod 256 — closed-form, so a SQL oracle can
    recompute every pixel without a PNG codec."""
    r = np.arange(size).reshape(-1, 1)
    c = np.arange(size).reshape(1, -1)
    return ((i * 31 + r * 8 + c * 7) % 256).astype(np.uint8)


def synthetic_samples(i: int, n_samples: int = 64) -> np.ndarray:
    """Deterministic int16 audio pattern: s(j) = (i*73 + j*29) mod 4096
    - 2048."""
    j = np.arange(n_samples)
    return ((i * 73 + j * 29) % 4096 - 2048).astype(np.int16)


def synthetic_media(
    spark, n: int = 32, kind: str = "image", codec: str = "hash"
) -> DataFrame:
    """Deterministic media table for tests.

    ``codec="hash"`` keeps the legacy opaque payload (sha256-derived
    bytes the stub decode folds). ``codec="png"`` / ``codec="wav"``
    emit REAL container bytes — encode_png/encode_wav of the
    closed-form synthetic patterns — for exercising the real decode
    path end-to-end."""
    rows = []
    for i in range(n):
        if codec == "png":
            payload = encode_png(synthetic_pixels(i))
        elif codec == "wav":
            payload = encode_wav(synthetic_samples(i))
        else:
            payload = hashlib.sha256(f"{kind}:{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"n_frames": str(40 + i)} if kind == "video" else {},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
