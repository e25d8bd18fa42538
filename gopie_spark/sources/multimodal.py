"""Multimodal binary columns: schema, batching, and decode plumbing.

Training-data pipelines carry images/audio/video as opaque ``binary``
columns with typed metadata.  This module makes the *Spark-side plumbing*
real and tested — schemas, Arrow batch shapes, partition-friendly UDF
signatures — while the codec step itself is stubbed (the image/audio
libraries are not in this container):

- :func:`decode_image` raises ``NotImplementedError`` by design; swap in
  a real decoder (PIL/libvips) with the same signature in production;
- :func:`fake_feature_extractor` is the deterministic stand-in used by
  tests: a seeded projection of the raw bytes into a fixed-length float
  vector (byte-stable, so pipelines are testable end to end);
- :func:`frame_sample` does deterministic "frame" sampling over the byte
  stream (stride slices), exercising the real batching path a video
  pipeline needs.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),   # image|audio|video
    StructField("payload", BinaryType(), False),      # opaque encoded bytes
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_DIM = 64


def decode_image(payload: bytes):
    """Real decoder goes here (PIL.Image.open etc.).  Stubbed: the
    container has no imaging libraries."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; plug a decoder with signature bytes -> ndarray here")


def fake_feature_extractor(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector: bytes -> float32[dim].

    Stable across runs/machines (pure function of the payload), so the
    distributed plumbing around it is fully testable."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    if raw.size == 0:
        return np.zeros(dim, dtype=np.float32)
    pad = (-raw.size) % dim
    mat = np.pad(raw, (0, pad)).reshape(-1, dim).astype(np.float64)
    weights = 1.0 / np.arange(1, mat.shape[0] + 1)
    vec = (mat * weights[:, None]).sum(axis=0)
    norm = np.linalg.norm(vec)
    return (vec / norm if norm else vec).astype(np.float32)


def extract_features(df: DataFrame, payload_col: str = "payload",
                     out_col: str = "features",
                     extractor=fake_feature_extractor) -> DataFrame:
    """Add a float-vector feature column via mapInPandas (Arrow batches of
    binary payloads in, array<float> out) — the real pipeline shape."""
    schema = StructType(df.schema.fields +
                        [StructField(out_col, ArrayType(FloatType()), False)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [extractor(bytes(p)).tolist() for p in pdf[payload_col]]
            out = pdf.copy()
            out[out_col] = feats
            yield out

    return df.mapInPandas(fn, schema)


def fake_resizer(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic resize stand-in: nearest-neighbor downsample of the
    raw byte grid to ``target_w x target_h`` bytes.  A real pipeline swaps
    in an image resizer (PIL/libvips) with the same signature; the Spark
    batching/schema below is unchanged."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    n = target_w * target_h
    if raw.size == 0:
        return bytes(n)
    idx = np.linspace(0, raw.size - 1, n).astype(np.int64)
    return raw[idx].tobytes()


def resize_media(df: DataFrame, payload_col: str = "payload",
                 target_w: int = 64, target_h: int = 64,
                 out_col: str = "resized",
                 resizer=fake_resizer) -> DataFrame:
    """Add a resized-payload column via mapInPandas (binary in, binary
    out, fixed output size) — the shape of a real thumbnail stage.  Output
    width/height land in the schema as metadata columns so downstream
    stages never re-decode to learn dimensions."""
    schema = StructType(df.schema.fields +
                        [StructField(out_col, BinaryType(), False),
                         StructField(f"{out_col}_w", IntegerType(), False),
                         StructField(f"{out_col}_h", IntegerType(), False)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = [resizer(bytes(p), target_w, target_h)
                            for p in pdf[payload_col]]
            out[f"{out_col}_w"] = np.int32(target_w)
            out[f"{out_col}_h"] = np.int32(target_h)
            yield out

    return df.mapInPandas(fn, schema)


def frame_sample(df: DataFrame, payload_col: str = "payload",
                 n_frames: int = 4, frame_bytes: int = 256,
                 out_col: str = "frames") -> DataFrame:
    """Deterministic 'frame' sampling: n evenly-spaced byte slices per
    payload (a real video pipeline swaps the slicer for a keyframe
    decoder; batching/schema/partitioning stay identical)."""
    schema = StructType(df.schema.fields +
                        [StructField(out_col, ArrayType(BinaryType()), False)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames: List[List[bytes]] = []
            for p in pdf[payload_col]:
                b = bytes(p)
                if not b:
                    frames.append([])
                    continue
                step = max(1, (len(b) - frame_bytes) // max(n_frames - 1, 1))
                frames.append([b[i:i + frame_bytes]
                               for i in range(0, min(len(b), step * n_frames),
                                              step)][:n_frames])
            out = pdf.copy()
            out[out_col] = frames
            yield out

    return df.mapInPandas(fn, schema)


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    rows = []
    types = ["image", "audio", "video"]
    for i in range(n):
        mt = types[i % 3]
        size = int(rng.integers(512, 4096))
        payload = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
        rows.append((i, mt, payload,
                     {"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[mt],
                     int(rng.integers(16, 512)) if mt == "image" else None,
                     int(rng.integers(16, 512)) if mt == "image" else None,
                     int(rng.integers(1000, 60000)) if mt != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
