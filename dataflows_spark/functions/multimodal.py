"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` operators.

The actual image/audio/video decode libraries are NOT in this
container, so the decode kernels are STUBBED (clearly marked): each
stub either raises ``NotImplementedError`` (``strict=True``) or emits a
deterministic fake derived from the payload bytes (``strict=False``,
default — keeps the Spark-side plumbing fully testable: schema,
batching, partitioning, UDF signatures are all real).

Audio is NOT stubbed — real PCM codecs live in ``functions.audio``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_SCHEMA = "width int, height int, channels int, mean_intensity double"
FRAME_SAMPLE_SCHEMA = "frame_idx int, frame_bytes binary"


def _fake_image_meta(raw: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake decode: dimensions/intensity derived from a
    hash of the payload (stands in for PIL/opencv)."""
    h = hashlib.sha256(raw).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 if h[2] % 4 == 0 else 3
    mean_intensity = h[3] / 255.0
    return width, height, channels, mean_intensity


def image_features(df: DataFrame, bytes_col: str = "bytes", strict: bool = False) -> DataFrame:
    """Decode + feature-extract an image binary column.

    STUB: real decode would be ``PIL.Image.open(io.BytesIO(raw))`` inside
    the same mapInPandas kernel; the container lacks the library, so the
    kernel emits deterministic fake metadata (or raises when strict)."""
    out_schema = f"{df.schema.simpleString()[7:-1]}, {IMAGE_FEATURE_SCHEMA}"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("image decode library not available in this container")
            feats = [
                _fake_image_meta(b) if b is not None else (None, None, None, None)
                for b in pdf[bytes_col]
            ]
            fdf = pd.DataFrame(feats, columns=["width", "height", "channels", "mean_intensity"], index=pdf.index)
            yield pd.concat([pdf, fdf], axis=1)

    return df.mapInPandas(kernel, schema=out_schema)


def resize_images(df: DataFrame, bytes_col: str = "bytes", size: tuple[int, int] = (224, 224), strict: bool = False) -> DataFrame:
    """Resize an image binary column in place.

    STUB: fake 'resize' re-hashes payloads to a size-tagged digest;
    real kernel would be PIL ``img.resize(size)``. Signature, schema and
    Arrow batch shape are the real thing."""
    schema = df.schema.simpleString()[7:-1]
    w, h = size

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("image decode library not available in this container")
            pdf = pdf.copy()
            pdf[bytes_col] = [
                None if b is None else hashlib.sha256(b + f"{w}x{h}".encode()).digest()
                for b in pdf[bytes_col]
            ]
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


def sample_video_frames(df: DataFrame, bytes_col: str = "bytes", id_col: str = "clip_id", every_n: int = 10, strict: bool = False) -> DataFrame:
    """Explode a video binary column into sampled frames (1:N rows).

    STUB: fake frames are fixed-width slices of the payload; real kernel
    would be pyav/ffmpeg frame iteration. Demonstrates the row-exploding
    mapInPandas shape (output rows ≠ input rows)."""
    out_schema = f"{id_col} string, {FRAME_SAMPLE_SCHEMA}"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("video decode library not available in this container")
            rows = []
            for cid, raw in zip(pdf[id_col], pdf[bytes_col]):
                if raw is None:
                    continue
                n_frames = max(1, len(raw) // 1024)
                for fi in range(0, n_frames, every_n):
                    rows.append({id_col: cid, "frame_idx": fi, "frame_bytes": raw[fi * 1024 : (fi + 1) * 1024]})
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_bytes"])

    return df.mapInPandas(kernel, schema=out_schema)
