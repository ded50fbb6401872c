"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata.

The decode/resize/feature-extract kernels need codec libraries that are
NOT in this container, so the *kernels* are stubbed (deterministic fakes
or NotImplementedError) — but the Spark-side plumbing is real and tested:
schema contracts, Arrow batch shape, ``mapInPandas`` partitioning, and
metadata propagation all behave exactly as they would with a real codec.

Swap ``_fake_image_features`` for a PIL/torchvision call and nothing else
changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, feature array<float>"


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque binary column — pure SQL, no decode:
    size, content hash (the sha256 integrity invariant applies to binary
    payloads exactly as to text)."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_sha256", F.sha2(F.col(payload_col), 256)
    )


def _fake_image_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB for a real decoder: deterministic feature vector derived from
    the payload hash. Replace with PIL/torchvision; signature and batch
    shape stay identical."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas``: Arrow-batched binary
    in, fixed-dim float vectors out. The per-batch loop vectorizes the
    *decode boundary* the way a real codec call would (one call per
    payload, batched I/O)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_image_features(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.select("media_id", "payload").mapInPandas(
        run, schema="media_id long, feature array<float>"
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize needs a codec library not present here."""
    raise NotImplementedError(
        "image codec not available in this environment; plumbing-tested via "
        "extract_features's deterministic fake"
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plan for video payloads: pure-SQL timestamp grid per
    media row (the decode of each frame is the stubbed kernel)."""
    grid = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return df.where(F.col("kind") == "video").select(
        "media_id", F.explode(grid).alias("frame_ts_ms")
    )


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32,
                48 + i % 24,
                1000 * (1 + i % 10),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
