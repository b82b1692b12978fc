"""Real media codecs in pure stdlib + NumPy — no external codec libraries.

The container has no PIL/ffmpeg, but PNG needs only zlib (stdlib) and WAV is
plain RIFF framing — so the engine ships REAL decoders instead of stubs:

* PNG  — 8-bit gray/RGB/RGBA, all five scanline filters (None/Sub/Up/
  Average/Paeth) implemented per the PNG spec; decode is NumPy-vectorized
  across the row (the inter-row recurrence is inherent to the format).
* WAV  — PCM16 RIFF: 'fmt ' + 'data' chunk parse, int16 LE samples.
* MPNG — the engine's video container for fixtures: length-prefixed PNG
  frames (a motion-PNG analog); decode = per-frame PNG decode. Real-world
  codecs (H.264 etc.) genuinely require ffmpeg and stay out of scope —
  ``decode_media`` raises NotImplementedError for those formats.

Round-trips are bit-exact (tests/test_multimodal.py): decode(encode(x)) == x.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CT_FOR_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}
_CHANNELS_FOR_CT = {v: k for k, v in _CT_FOR_CHANNELS.items()}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a row."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray) -> bytes:
    """8-bit PNG encoder; rows cycle through all five filter types so the
    decoder's full unfilter path is exercised by every fixture."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    bpp = ch
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CT_FOR_CHANNELS[ch], 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        row = img[y].reshape(-1)
        f = y % 5
        left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
        if f == 0:
            filt = row
        elif f == 1:   # Sub
            filt = row - left
        elif f == 2:   # Up
            filt = row - prev
        elif f == 3:   # Average
            filt = row - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8)
        else:          # Paeth
            filt = row - _paeth(left, prev, upleft)
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """8-bit PNG decoder: chunk parse → inflate → unfilter. Returns
    (h, w, channels) uint8."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = ch = 0
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ct, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if depth != 8 or inter != 0:
                raise NotImplementedError("only 8-bit non-interlaced PNG")
            if ct not in _CHANNELS_FOR_CT:
                raise NotImplementedError(
                    f"PNG color type {ct} (e.g. palette) not supported")
            ch = _CHANNELS_FOR_CT[ct]
        elif typ == b"IDAT":
            idat.extend(body)
        elif typ == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * ch
    rows = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = ch
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].copy()
        if f == 0:
            row = line
        elif f == 1:   # Sub: left-to-right recurrence, per-pixel-lane
            row = line
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif f == 2:   # Up — fully vectorized
            row = line + prev
        elif f == 3:   # Average
            row = line
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:   # Paeth
            row = line
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        out[y] = row
        prev = row
    return out.reshape(h, w, ch)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM16 mono/multi-channel RIFF WAV. samples: (n,) or (n, ch) int16."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = np.ascontiguousarray(s).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Returns (samples (n, ch) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    ch = sr = 0
    raw = None
    # buffer the data chunk and reshape AFTER the walk: a spec-legal WAV may
    # put 'data' before 'fmt ', and reshape(-1, ch) with ch still 0 would die
    # with an opaque ValueError instead of a clear parse error
    while pos + 8 <= len(data):
        typ = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if typ == b"fmt ":
            audio_fmt, ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV")
        elif typ == b"data":
            raw = body
    if raw is None:
        raise ValueError("no data chunk")
    if ch == 0:
        raise ValueError("no fmt chunk")
    return np.frombuffer(raw, dtype="<i2").reshape(-1, ch), sr


def encode_mpng(frames: np.ndarray) -> bytes:
    """Motion-PNG: u32-count header then length-prefixed PNG frames."""
    frames = np.asarray(frames, dtype=np.uint8)
    out = bytearray(struct.pack("<I", frames.shape[0]))
    for f in frames:
        png = encode_png(f)
        out.extend(struct.pack("<I", len(png)))
        out.extend(png)
    return bytes(out)


def decode_mpng(data: bytes) -> np.ndarray:
    """Returns (n_frames, h, w, ch) uint8."""
    (n,) = struct.unpack("<I", data[:4])
    pos = 4
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack("<I", data[pos:pos + 4])
        frames.append(decode_png(data[pos + 4:pos + 4 + ln]))
        pos += 4 + ln
    return np.stack(frames) if frames else np.empty((0, 0, 0, 0), np.uint8)
