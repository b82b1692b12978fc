"""Multimodal (image/audio/video) columns as opaque binaries + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` payload columns
with a typed metadata struct; decode/feature-extract/resize/frame-sample run
as Arrow-batched pandas UDFs over ``mapInPandas`` so payload bytes never cross
a per-row Python boundary one row at a time.

The container has no image/audio codecs, so the real decoder is STUBBED
behind ``decode_media`` (raises NotImplementedError unless a library import
succeeds), and tests exercise the full Spark-side plumbing — schema,
partitioning, UDF signature, batch shapes — through ``fake_decode``, a
deterministic stand-in that derives pixels/samples directly from the payload
bytes. Swapping ``fake_decode`` for a PIL/ffmpeg call changes ONE function.

Media table schema (one row per asset):
    media_id : string
    kind     : string            -- 'image' | 'audio' | 'video'
    payload  : binary            -- opaque encoded bytes
    meta     : struct<width:int, height:int, channels:int,
                      sample_rate:int, n_frames:int, fmt:string>
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, IntegerType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),
    StructField("payload", BinaryType()),
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fmt", StringType()),
    ])),
])

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, "
    "mean array<double>, std array<double>, "
    "thumb array<double>, n_frames_sampled int"
)

THUMB = 4  # thumbnail side after strided resize


def decode_media(payload: bytes, meta: dict) -> np.ndarray:
    """Real decoder — requires codec libraries absent from this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "media codecs unavailable in this environment; pipeline plumbing "
            "is exercised via fake_decode (deterministic stand-in)") from None
    raise NotImplementedError("real decode path not wired in this sandbox")


def fake_decode(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in decoder: tiles the payload bytes into the shape
    the metadata declares. (height, width, channels) for images; (n_samples,)
    for audio; (n_frames, height, width, channels) for video."""
    fmt = meta["fmt"]
    if fmt == "audio":
        shape: tuple[int, ...] = (int(meta["sample_rate"]),)
    elif fmt == "video":
        shape = (int(meta["n_frames"]), int(meta["height"]),
                 int(meta["width"]), int(meta["channels"]))
    else:
        shape = (int(meta["height"]), int(meta["width"]), int(meta["channels"]))
    n = int(np.prod(shape))
    raw = np.frombuffer(payload, dtype=np.uint8)
    reps = -(-n // max(raw.size, 1))
    return np.tile(raw, reps)[:n].reshape(shape)


def _resize_strided(img: np.ndarray, side: int = THUMB) -> np.ndarray:
    """Strided-subsample resize to (side, side, C) — deterministic, no interp."""
    h, w = img.shape[0], img.shape[1]
    ri = (np.arange(side) * h) // side
    ci = (np.arange(side) * w) // side
    return img[ri][:, ci]


def extract_features(df: DataFrame, frame_stride: int = 2,
                     decoder=fake_decode) -> DataFrame:
    """decode → (frame-sample for video) → per-channel mean/std → strided
    thumbnail, one Arrow batch at a time. The shuffle-free scale path: media
    rows are independent, so this is a pure mapInPandas over the scan."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                meta = pdf["meta"].values[i]
                payload = pdf["payload"].values[i]
                arr = decoder(payload, meta)
                n_sampled = 0
                if meta["fmt"] == "video":
                    arr = arr[::frame_stride]          # frame sampling
                    n_sampled = arr.shape[0]
                    arr = arr.reshape((-1,) + arr.shape[2:])  # stack frames
                if arr.ndim == 1:                       # audio → (n, 1)
                    arr = arr[:, None]
                flat = arr.reshape(-1, arr.shape[-1]).astype(np.float64)
                mean = flat.mean(axis=0)
                std = flat.std(axis=0)
                thumb = (_resize_strided(arr).astype(np.float64).ravel()
                         if arr.ndim == 3 else np.zeros(0))
                rows.append({
                    "media_id": pdf["media_id"].values[i],
                    "kind": pdf["kind"].values[i],
                    "n_bytes": len(payload),
                    "mean": mean, "std": std, "thumb": thumb,
                    "n_frames_sampled": n_sampled,
                })
            if rows:
                yield pd.DataFrame(rows)

    return df.select("media_id", "kind", "payload", "meta") \
             .mapInPandas(run, FEATURE_SCHEMA)


def generate_media(seed: int, n: int) -> pd.DataFrame:
    """Seeded synthetic media table (pipeline plumbing fixture)."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(["image", "audio", "video"], size=n, p=[0.6, 0.2, 0.2])
    rows = []
    for i in range(n):
        kind = str(kinds[i])
        if kind == "image":
            h, w, c = int(rng.integers(8, 64)), int(rng.integers(8, 64)), 3
            meta = {"width": w, "height": h, "channels": c, "sample_rate": 0,
                    "n_frames": 0, "fmt": "image"}
            nbytes = int(rng.integers(64, 4096))
        elif kind == "audio":
            sr = int(rng.integers(100, 2000))
            meta = {"width": 0, "height": 0, "channels": 1, "sample_rate": sr,
                    "n_frames": 0, "fmt": "audio"}
            nbytes = int(rng.integers(64, 4096))
        else:
            h, w, c, nf = (int(rng.integers(4, 16)), int(rng.integers(4, 16)),
                           3, int(rng.integers(2, 12)))
            meta = {"width": w, "height": h, "channels": c, "sample_rate": 0,
                    "n_frames": nf, "fmt": "video"}
            nbytes = int(rng.integers(64, 4096))
        rows.append({
            "media_id": f"m-{seed:04d}-{i:06d}",
            "kind": kind,
            "payload": rng.integers(0, 256, size=nbytes, dtype=np.uint8).tobytes(),
            "meta": meta,
        })
    return pd.DataFrame(rows)
