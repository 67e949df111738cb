"""Dependency-free image byte codecs.

Capability parity with the reference's image helpers
(``oarphpy/util/misc.py:281-329``: ``to_png_bytes`` /
``to_jpeg_bytes`` / header-only jpeg sizing) WITHOUT requiring
pillow/imageio on executors: PNG is fully implemented here against the
public spec (zlib + per-row filters), and JPEG gets header-only
structural parsing (dimensions without decode). Pillow, when present,
is used only for JPEG pixel transcodes (see
``oarphpy_spark.llm.multimodal``).

These run inside Arrow-batched ``mapInPandas`` workers at scale — pure
CPU per item, no shared state, no driver involvement.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img) -> bytes:
    """Encode a uint8 ndarray — (H, W) gray, or (H, W, C) with C in
    {1: gray, 2: gray+alpha, 3: RGB, 4: RGBA} — as PNG bytes.
    Filter 0 on every row + one zlib stream: spec-valid output any
    decoder accepts."""
    arr = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _CHANNELS_COLOR:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w, ch = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CHANNELS_COLOR[ch], 0, 0, 0)
    # Prepend the per-row filter byte (0 = None) columnar-wise.
    raw = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 1:] = arr.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG per-row filters (types 0-4, incl. Paeth) -> (h, stride)."""
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            recon = line
        elif ftype == 2:
            recon = (line + prior) & 0xFF
        else:
            recon = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = recon[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                recon[i] = (line[i] + pred) & 0xFF
        out[y] = recon.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode 8-bit non-interlaced PNG bytes to a uint8 ndarray of
    shape (H, W) for grayscale or (H, W, C) otherwise."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    i = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + length  # len + tag + payload + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _COLOR_CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} interlace={interlace})"
        )
    ch = _COLOR_CHANNELS[color]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("PNG IDAT size mismatch")
    out = _unfilter(raw, h, stride, bpp=ch).reshape(h, w, ch)
    return out[:, :, 0] if ch == 1 else out


def png_header_dimensions(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the IHDR chunk — no decompression."""
    if not data.startswith(_PNG_SIG) or len(data) < 24:
        return None
    if data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", data[16:24])
    return (w, h)


def jpeg_header_dimensions(data: bytes) -> tuple[int, int] | None:
    """(width, height) from JPEG SOF headers WITHOUT decoding — the
    header-only sizing idea from the reference
    (``oarphpy/util/misc.py:305-329``), implemented against the JFIF
    marker layout: scan segments for SOF0-SOF15 (excl. DHT/DAC/RST)
    and read the 5-byte dims block."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    i = 2
    sof_markers = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
    while i + 9 < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in sof_markers:
            height = int.from_bytes(data[i + 5 : i + 7], "big")
            width = int.from_bytes(data[i + 7 : i + 9], "big")
            return (width, height)
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        i += 2 + seg_len
    return None


def image_dimensions(data: bytes) -> tuple[int, int] | None:
    """(width, height) for PNG or JPEG bytes, header-only."""
    data = bytes(data)
    if data.startswith(_PNG_SIG):
        return png_header_dimensions(data)
    return jpeg_header_dimensions(data)
