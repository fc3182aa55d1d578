"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Data model (the 100 TB layout):

    content   BINARY            -- raw bytes (or a URI when externalized)
    modality  STRING            -- 'image' | 'audio' | 'video'
    meta      STRUCT<mime: STRING, width: INT, height: INT,
                     duration_ms: INT, sample_rate: INT>

The Spark-side plumbing — schema, Arrow batching, mapInPandas signatures,
partition sizing — is real and tested. The codec step itself (PIL/ffmpeg
et al.) is NOT available in this container, so decoding is stubbed: pass
``fake=True`` for a deterministic hash-derived fake decode (stable test
vectors), or ``fake=False`` to get the explicit NotImplementedError a
deployment must replace with a real codec.

Why mapInPandas: decode is per-row CPU work with a wide, variable-size
output; Arrow batches amortize the Python crossing, and the iterator
form streams batches so one task never materializes its whole partition.
At scale, repartition so (rows per task × bytes per row) fits executor
memory — see ``partition_for_decode``.
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
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("content", BinaryType()),
        StructField("modality", StringType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("modality", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", IntegerType()),
    ]
)

FEATURE_DIM = 16


def _fake_decode(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a codec+featurizer: bytes → sha256 →
    unit-norm float vector. Stable across runs/partitions, so tests can
    assert exact values while the real codec is absent."""
    digest = hashlib.sha256(content).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    vec = (raw.astype(np.float64) / np.iinfo("uint32").max) - 0.5
    return (vec / np.linalg.norm(vec)).astype(np.float32)


def decode_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract binary media via mapInPandas (Arrow batches).

    ``fake=False`` raises NotImplementedError at execution time: this
    container has no image/audio libraries (see module docstring); the
    function body is the exact shape a real codec plugs into.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs are not installed in this environment; "
                    "wire a real decoder here (PIL/torchaudio/ffmpeg) or "
                    "pass fake=True for the deterministic test decode"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feature": [
                        _fake_decode(bytes(c)).tolist() for c in pdf["content"]
                    ],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Image resize: binary in → binary out, meta updated. Stub: the fake
    path truncates/pads bytes deterministically (plumbing-only); the
    real path is a PIL/opencv call in the same mapInPandas shape."""
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codec not installed; pass fake=True for the "
                    "deterministic plumbing stub"
                )
            content = [
                (bytes(c) * (target // max(len(bytes(c)), 1) + 1))[:target]
                for c in pdf["content"]
            ]
            meta = pd.DataFrame(
                {
                    "mime": [m["mime"] if m is not None else None for m in pdf["meta"]],
                    "width": width,
                    "height": height,
                    "duration_ms": [
                        m["duration_ms"] if m is not None else None for m in pdf["meta"]
                    ],
                    "sample_rate": [
                        m["sample_rate"] if m is not None else None for m in pdf["meta"]
                    ],
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": content,
                    "modality": pdf["modality"],
                    "meta": meta.to_dict("records"),
                }
            )

    return df.mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Video frame sampling: one row in → N frame rows out (mapInPandas
    is the right operator precisely because output cardinality differs
    from input). Fake path derives frame count from meta.duration_ms."""
    out_schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codec not installed; pass fake=True for the "
                    "deterministic plumbing stub"
                )
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                duration = (row["meta"] or {}).get("duration_ms")
                # Arrow → pandas surfaces nullable ints as float (NaN for null)
                if duration is None or duration != duration:
                    duration = 0
                n = max(int(duration) // every_ms, 0)
                blob = bytes(row["content"])
                for i in range(n):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    frames.append(hashlib.sha256(blob + i.to_bytes(4, "little")).digest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, out_schema)


def partition_for_decode(df: DataFrame, target_bytes_per_task: int = 256 << 20) -> DataFrame:
    """Right-size partitions for decode: estimate bytes per partition from
    content lengths and repartition so a task's Arrow batches stay within
    budget. At 100 TB this is the difference between streaming decode and
    OOM."""
    stats = df.select(
        F.count("*").alias("n"), F.avg(F.length("content")).alias("avg_len")
    ).collect()[0]
    if not stats["n"]:
        return df
    total = float(stats["n"]) * float(stats["avg_len"] or 1.0)
    parts = max(int(total // target_bytes_per_task) + 1, 1)
    return df.repartition(parts)
