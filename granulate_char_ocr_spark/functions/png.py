"""Pure-NumPy + stdlib-zlib PNG codec (no PIL/cv2 in this sandbox).

Implements the subset a real OCR corpus needs — 8-bit greyscale (color type
0), RGB (2) and RGBA (6), non-interlaced, all five scanline filters — so the
reference's very first production step (PIL PNG decode,
``backend/application/services/ocr_service.py:97-99``) is real here, not a
stub. The encoder exists for tests and accepts a per-row ``filter_type`` so
round-trips cover every unfilter branch.

Spec: https://www.w3.org/TR/png-3/ (chunk layout §5, filters §9).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def _apply_filter(
    ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Forward filter (encoder side): raw row -> filtered bytes."""
    r = row.astype(np.int16)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int16)
    ul = np.zeros_like(up)
    ul[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        out = r - _paeth(left, up, ul)
    else:
        raise ValueError(f"unknown filter {ftype}")
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (H,W) grey / (H,W,3) RGB / (H,W,4) RGBA -> PNG bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, channels = 0, 1
        flat = img
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        channels = img.shape[2]
        color = 2 if channels == 3 else 6
        flat = img.reshape(img.shape[0], -1)
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[0], img.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    prev = np.zeros(flat.shape[1], dtype=np.uint8)
    rows = []
    for y in range(h):
        filtered = _apply_filter(filter_type, flat[y], prev, channels)
        rows.append(bytes([filter_type]) + filtered.tobytes())
        prev = flat[y]
    idat = zlib.compress(b"".join(rows), 6)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(
    ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Inverse filter (decoder side) — Sub/Average/Paeth recur on the
    reconstructed left pixel, so those run a per-pixel-column loop; Up and
    None stay fully vectorized (they dominate real encoders' output)."""
    if ftype == 0:
        return cur
    if ftype == 2:  # Up
        return (cur.astype(np.int16) + prev).astype(np.uint8)
    out = cur.astype(np.int32)
    prev32 = prev.astype(np.int32)
    n = len(cur)
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            out[i] = (out[i] + out[i - bpp]) & 0xFF
    elif ftype == 3:  # Average
        out[:bpp] = (out[:bpp] + prev32[:bpp] // 2) & 0xFF
        for i in range(bpp, n):
            out[i] = (out[i] + (out[i - bpp] + prev32[i]) // 2) & 0xFF
    elif ftype == 4:  # Paeth
        out[:bpp] = (out[:bpp] + prev32[:bpp]) & 0xFF
        for i in range(bpp, n):
            a, b, c = out[i - bpp], prev32[i], prev32[i - bpp]
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (out[i] + pred) & 0xFF
    else:
        raise ValueError(f"PNG: unknown scanline filter {ftype}")
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array: (H,W) for greyscale, (H,W,3/4) for RGB(A).

    Supports bit depth 8, color types 0/2/6, interlace 0 — the slice of the
    format OCR corpora actually use; anything else raises with the reason.
    """
    if data[:8] != _SIGNATURE:
        raise ValueError("PNG: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or interlace != 0 or comp != 0:
        raise ValueError(
            f"PNG: unsupported (depth={depth}, color={color}, "
            f"interlace={interlace}) — decoder handles 8-bit grey/RGB/RGBA"
        )
    channels = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: IDAT length mismatch")
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        prev = _unfilter(int(mat[y, 0]), mat[y, 1:], prev, channels)
        out[y] = prev
    return out if channels == 1 else out.reshape(h, w, channels)
