"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata.

Real kernels where no codec library is needed — binary PPM (P6) images
and PCM WAV audio are plain header + raw samples, decodable with numpy
alone — so decode, resize (area-average pooling), and feature
extraction are REAL, TESTED numpy kernels running in ``mapInPandas``
over Arrow batches. Compressed formats (JPEG/PNG/MP4) need codec
libraries that are NOT in this container; those route to the same
kernels' dispatch and raise a clear ``NotImplementedError`` (swap in
PIL/torchvision/ffmpeg on a real cluster and nothing else changes —
schema contracts, batch shape, partitioning are shared).
"""

from __future__ import annotations

import hashlib
import struct
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

DECODABLE_IMAGE_MIMES = {"image/x-portable-pixmap"}
DECODABLE_AUDIO_MIMES = {"audio/wav"}


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque binary column — pure SQL, no decode:
    size, content hash (the sha256 integrity invariant applies to binary
    payloads exactly as to text)."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_sha256", F.sha2(F.col(payload_col), 256)
    )


# ---------------------------------------------------------------- codecs


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 array [h, w, 3]. Pure numpy — PPM is an
    ASCII header (magic, width, height, maxval) + raw RGB bytes."""
    if not payload.startswith(b"P6"):
        raise NotImplementedError(
            "only binary PPM (P6) images decode without a codec library; "
            "route JPEG/PNG through PIL on a real cluster"
        )
    parts: list[int] = []
    pos = 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while not payload[end : end + 1].isspace():
            end += 1
        parts.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, _maxval = parts
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(
        h, w, 3
    )


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (int16 samples [n, channels], sample_rate). Pure
    struct/numpy — RIFF header + raw little-endian samples."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    while pos + 8 <= len(payload):
        chunk, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if chunk == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            if audio_fmt != 1:
                raise NotImplementedError("only PCM WAV decodes without a codec")
            fmt = (channels, rate)
        elif chunk == b"data" and fmt is not None:
            channels, rate = fmt
            samples = np.frombuffer(body, dtype="<i2")
            return samples.reshape(-1, channels), rate
        pos += 8 + size + (size & 1)
    raise NotImplementedError("WAV data chunk not found")


def _resize_area(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Area-average resize via exact block pooling when the ratio is
    integral, else nearest-neighbor index sampling — both pure numpy."""
    h, w, c = img.shape
    if h % height == 0 and w % width == 0:
        bh, bw = h // height, w // width
        return (
            img.reshape(height, bh, width, bw, c).mean(axis=(1, 3)).astype(np.uint8)
        )
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


def _image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Real feature kernel: per-channel means over a sqrt(dim/3)-ish
    grid + global stats — deterministic, resolution-independent."""
    g = max(int(np.sqrt(dim // 3)), 1)
    pooled = _resize_area(img, g, g).astype(np.float32) / 255.0
    flat = pooled.reshape(-1)
    feats = np.concatenate([flat, [img.mean() / 255.0, img.std() / 255.0]])
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(feats))] = feats[:dim]
    return out


def _audio_features(samples: np.ndarray, rate: int, dim: int) -> np.ndarray:
    """Real audio kernel: RMS energy over ``dim−2`` equal windows +
    zero-crossing rate + duration — pure numpy."""
    mono = samples.astype(np.float32).mean(axis=1) / 32768.0
    n_win = max(dim - 2, 1)
    wins = np.array_split(mono, n_win)
    rms = np.array([np.sqrt((w**2).mean()) if len(w) else 0.0 for w in wins])
    zcr = float((np.diff(np.sign(mono)) != 0).mean()) if len(mono) > 1 else 0.0
    feats = np.concatenate([rms, [zcr, len(mono) / rate]])
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(feats))] = feats[:dim]
    return out


def _fallback_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for payloads whose codec is absent
    (JPEG/PNG/MP4): hash-derived vector. Keeps the pipeline total."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def media_features(payload: bytes, mime: str, dim: int = 16) -> np.ndarray:
    """Dispatch: real decode for PPM/WAV, hash fallback otherwise."""
    try:
        if mime in DECODABLE_IMAGE_MIMES:
            return _image_features(decode_ppm(payload), dim)
        if mime in DECODABLE_AUDIO_MIMES:
            s, rate = decode_wav(payload)
            return _audio_features(s, rate, dim)
    except NotImplementedError:
        pass
    return _fallback_features(payload, dim)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas``: Arrow-batched
    binary in, fixed-dim float vectors out. PPM and WAV payloads run
    the REAL numpy kernels; codec-less formats take the deterministic
    fallback."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                media_features(p, m, dim).tolist() if p is not None else None
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.select("media_id", "payload", "mime").mapInPandas(
        run, schema="media_id long, feature array<float>"
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize decodable images (PPM) with the numpy area-average kernel,
    re-encoded as PPM; compressed formats raise per batch (codec absent
    here — swap the decode call on a real cluster).
    Returns [media_id, payload, width, height]."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                img = decode_ppm(bytes(p))
                out.append(encode_ppm(_resize_area(img, width, height)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        run, schema="media_id long, payload binary, width int, height int"
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plan for video payloads: pure-SQL timestamp grid per
    media row (the decode of each frame is the codec-gated kernel)."""
    grid = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return df.where(F.col("kind") == "video").select(
        "media_id", F.explode(grid).alias("frame_ts_ms")
    )


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL decodable payloads: image
    rows are valid binary PPMs, audio rows are valid PCM WAVs, video
    rows are opaque bytes (codec-less)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 8 + 4 * (i % 3), 8 + 4 * (i % 2)
            rng = (np.arange(h * w * 3, dtype=np.uint32) * (seed + i + 1)) % 256
            payload = encode_ppm(rng.astype(np.uint8).reshape(h, w, 3))
            mime, width, height, dur = "image/x-portable-pixmap", w, h, 0
        elif kind == "audio":
            rate, secs = 8000, 1 + i % 2
            t = np.arange(rate * secs, dtype=np.float32)
            wave = (
                np.sin(2 * np.pi * (110 + i) * t / rate) * 12000
            ).astype("<i2")
            body = wave.tobytes()
            hdr = (
                b"RIFF"
                + struct.pack("<I", 36 + len(body))
                + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                + b"data"
                + struct.pack("<I", len(body))
            )
            payload = hdr + body
            mime, width, height, dur = "audio/wav", 0, 0, secs * 1000
        else:
            payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
            mime, width, height, dur = "video/mp4", 64, 48, 1000 * (1 + i % 10)
        rows.append((i, kind, bytearray(payload), mime, width, height, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
