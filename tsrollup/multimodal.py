"""Multimodal (image/audio/video) columns as opaque binaries + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` payload columns
with a typed metadata struct; decode/feature-extract/resize/frame-sample run
as Arrow-batched pandas UDFs over ``mapInPandas`` so payload bytes never cross
a per-row Python boundary one row at a time.

``decode_media`` is a REAL decoder for the formats stdlib can express:
PNG (zlib inflate + full five-filter unfiltering), PCM16 WAV, and MPNG
(length-prefixed PNG frames — the fixture video container); see
``tsrollup.media_codecs``. Formats that genuinely require external codec
libraries (JPEG, H.264, …) raise NotImplementedError with the library to
install; ``fake_decode`` remains as the plumbing-only stand-in for tests of
the Spark-side mechanics independent of any codec.

Media table schema (one row per asset):
    media_id : string
    kind     : string            -- 'image' | 'audio' | 'video'
    payload  : binary            -- encoded bytes (png | wav | mpng)
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
    """Real decoder for the stdlib-expressible formats (PNG/WAV/MPNG via
    tsrollup.media_codecs); external-codec formats raise with the dependency
    named — the swap point for a PIL/ffmpeg-equipped cluster."""
    from . import media_codecs as mc

    fmt = meta["fmt"]
    if fmt == "png":
        return mc.decode_png(bytes(payload))
    if fmt == "wav":
        samples, _sr = mc.decode_wav(bytes(payload))
        return samples[:, 0] if samples.shape[1] == 1 else samples
    if fmt == "mpng":
        return mc.decode_mpng(bytes(payload))
    raise NotImplementedError(
        f"format {fmt!r} needs an external codec (PIL/ffmpeg) not present "
        "in this container")


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
                     decoder=decode_media) -> DataFrame:
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
                if meta["fmt"] in ("video", "mpng"):
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


def generate_media(seed: int, n: int, real: bool = True) -> pd.DataFrame:
    """Seeded synthetic media table. ``real=True`` (default) writes GENUINE
    encoded payloads — PNG images, PCM16 WAVs, MPNG videos — that the real
    ``decode_media`` path decodes; ``real=False`` keeps the opaque-bytes
    plumbing fixture for codec-independent tests (``fake_decode``)."""
    from . import media_codecs as mc

    rng = np.random.default_rng(seed)
    kinds = rng.choice(["image", "audio", "video"], size=n, p=[0.6, 0.2, 0.2])
    rows = []
    for i in range(n):
        kind = str(kinds[i])
        if kind == "image":
            h, w, c = int(rng.integers(8, 64)), int(rng.integers(8, 64)), 3
            meta = {"width": w, "height": h, "channels": c, "sample_rate": 0,
                    "n_frames": 0, "fmt": "png" if real else "image"}
            payload = (mc.encode_png(
                rng.integers(0, 256, (h, w, c), dtype=np.uint8)) if real
                else rng.integers(0, 256, int(rng.integers(64, 4096)),
                                  dtype=np.uint8).tobytes())
        elif kind == "audio":
            sr = int(rng.integers(100, 2000))
            meta = {"width": 0, "height": 0, "channels": 1, "sample_rate": sr,
                    "n_frames": 0, "fmt": "wav" if real else "audio"}
            payload = (mc.encode_wav(
                rng.integers(-2 ** 15, 2 ** 15, sr).astype(np.int16), sr)
                if real
                else rng.integers(0, 256, int(rng.integers(64, 4096)),
                                  dtype=np.uint8).tobytes())
        else:
            h, w, c, nf = (int(rng.integers(4, 16)), int(rng.integers(4, 16)),
                           3, int(rng.integers(2, 12)))
            meta = {"width": w, "height": h, "channels": c, "sample_rate": 0,
                    "n_frames": nf, "fmt": "mpng" if real else "video"}
            payload = (mc.encode_mpng(
                rng.integers(0, 256, (nf, h, w, c), dtype=np.uint8)) if real
                else rng.integers(0, 256, int(rng.integers(64, 4096)),
                                  dtype=np.uint8).tobytes())
        rows.append({
            "media_id": f"m-{seed:04d}-{i:06d}",
            "kind": kind,
            "payload": payload,
            "meta": meta,
        })
    return pd.DataFrame(rows)
