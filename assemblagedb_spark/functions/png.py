"""Pure-stdlib PNG pixel codec (zlib + numpy) — a REAL image codec with
no third-party dependency.

The container ships no PIL/ffmpeg, but PNG needs neither: the format is
zlib-compressed filtered scanlines in CRC-framed chunks (RFC 2083), all
of which the standard library provides. This module implements 8-bit
gray / gray+alpha / RGB / RGBA encode and decode plus nearest-neighbor
resize, which upgrades the multimodal pixel path (decode → transform →
re-encode) from a stub to a working codec for the most common lossless
training-data format. Palette (color type 3) decodes through its PLTE
lookup; interlaced (Adam7) images are refused explicitly.

Scale shape: these functions run INSIDE Arrow batches (mapInPandas) —
the per-payload work is zlib (C speed) plus vectorized numpy row math.
The encoder always emits filter type 0, so payloads produced here decode
on the pure-numpy fast path; the decoder still implements all five
filter types (sequential per-row reconstruction) for foreign payloads,
pinned by hand-filtered fixtures in tests/test_png_codec.py.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# color type -> channels (bit depth 8 only)
_TYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_TYPE = {v: k for k, v in _TYPE_CHANNELS.items()}


def _chunk(kind: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + kind
        + data
        + struct.pack(">I", crc32(kind + data) & 0xFFFFFFFF)
    )


def png_encode(arr) -> bytes:
    """Encode a uint8 array as a PNG: (H, W) or (H, W, 1/2/3/4) →
    gray / gray+alpha / RGB / RGBA. Scanlines use filter type 0 (the
    always-valid choice; smallest code, and decodes on the vectorized
    fast path), IDAT is one zlib stream."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _CHANNELS_TYPE:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w, ch = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CHANNELS_TYPE[ch], 0, 0, 0)
    # filter byte 0 per row, then the raw row bytes
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * ch)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes):
    """Decode an 8-bit PNG to a uint8 numpy array of shape (H, W, C)
    (palette images resolve through PLTE to RGB). All five scanline
    filters reconstruct; filter-0 streams (everything :func:`png_encode`
    produces) take a single vectorized reshape. Raises ``ValueError``
    on non-PNG bytes, non-8-bit depth, Adam7 interlace, or
    truncated/corrupt streams."""
    try:
        return _png_decode(payload)
    except (struct.error, zlib.error, IndexError) as ex:
        # normalize truncation/corruption errors to the ValueError
        # contract the Arrow kernels' pass-through handlers rely on
        raise ValueError(f"malformed PNG payload: {ex}") from ex


def _png_decode(payload: bytes):
    import numpy as np

    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG payload")
    pos, n = 8, len(payload)
    width = height = None
    color_type = None
    plte = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        kind = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC
        if kind == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if interlace:
                raise ValueError("Adam7 interlace not supported")
        elif kind == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif kind == b"IDAT":
            idat.extend(data)
        elif kind == b"IEND":
            break
    if width is None:
        raise ValueError("PNG without IHDR")
    if color_type == 3:
        ch = 1  # palette indexes, expanded after unfiltering
    elif color_type in _TYPE_CHANNELS:
        ch = _TYPE_CHANNELS[color_type]
    else:
        raise ValueError(f"unsupported color type {color_type}")
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != height * (1 + stride):
        raise ValueError("IDAT size mismatch")
    rows = raw.reshape(height, 1 + stride)
    filters = rows[:, 0]
    data = rows[:, 1:]
    if (filters == 0).all():  # the common (and our own) case: one reshape
        out = data.copy()
    else:
        out = np.zeros((height, stride), dtype=np.uint8)
        for y in range(height):
            f = int(filters[y])
            cur = data[y].astype(np.int64)
            prev = out[y - 1].astype(np.int64) if y else np.zeros(
                stride, dtype=np.int64
            )
            if f == 0:
                rec = cur
            elif f == 2:  # up
                rec = (cur + prev) & 0xFF
            else:  # sub / average / paeth need a sequential pass
                rec = np.zeros(stride, dtype=np.int64)
                for x in range(stride):
                    a = rec[x - ch] if x >= ch else 0
                    b = prev[x]
                    c = prev[x - ch] if x >= ch else 0
                    if f == 1:
                        rec[x] = (cur[x] + a) & 0xFF
                    elif f == 3:
                        rec[x] = (cur[x] + (a + b) // 2) & 0xFF
                    elif f == 4:
                        rec[x] = (cur[x] + _paeth(int(a), int(b), int(c))) & 0xFF
                    else:
                        raise ValueError(f"unknown filter {f}")
            out[y] = rec.astype(np.uint8)
    img = out.reshape(height, width, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        img = plte[img[:, :, 0]]
    return img


def resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resize of an (H, W, C) array to (height, width, C):
    out[y, x] = src[floor(y·H/height), floor(x·W/width)] — the integer
    mapping a SQL oracle replays exactly (no interpolation arithmetic)."""
    import numpy as np

    a = np.asarray(arr)
    src_h, src_w = a.shape[0], a.shape[1]
    ys = (np.arange(height, dtype=np.int64) * src_h) // height
    xs = (np.arange(width, dtype=np.int64) * src_w) // width
    return a[ys][:, xs]
