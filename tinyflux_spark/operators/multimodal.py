"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery here is real and tested — schema, partition-
preserving ``mapInPandas`` operators with Arrow batch transfer, UDF
signatures, batch shapes. The actual media codecs are NOT (no
PIL/ffmpeg/librosa in this environment): ``decode=`` defaults to a
clearly-marked stub that either raises ``NotImplementedError``
(``strict=True``) or produces a deterministic fake derived from the
bytes, so pipelines are exercisable end-to-end today and the codec can
be dropped in later without touching the plumbing.

At scale: media rows are large (MBs); operators keep ``bytes`` out of
shuffles — feature extraction projects to small vectors *before* any
wide transformation, and batch sizes are row-count based so Arrow
batches stay within executor memory.
"""

from __future__ import annotations

import hashlib
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


def synthetic_media(spark, n: int = 32, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests (no codecs needed)."""
    rows = []
    for i in range(n):
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
