"""Pure-NumPy BMP (Windows DIB) codec.

The simplest still format OCR test corpora carry: 'BM' file header +
BITMAPINFOHEADER, uncompressed (BI_RGB) pixels in 4-byte-padded rows,
bottom-up by default. Decodes 8-bit paletted (incl. grayscale ramps),
24-bit BGR and 32-bit BGRA; encodes 8-bit grayscale and 24-bit for
round-trip tests. RLE compressions are rare enough to stay rejected with
the reason.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (H, W) grayscale (8-bit paletted ramp) or (H, W, 3) RGB
    (24-bit BGR rows) -> BMP bytes (bottom-up, BI_RGB)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and not (img.ndim == 3 and img.shape[2] == 3):
        raise ValueError("encode_bmp: (H, W) grayscale or (H, W, 3) RGB")
    h, w = img.shape[0], img.shape[1]
    if gray:
        palette = b"".join(bytes([v, v, v, 0]) for v in range(256))
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = img
        bits, pal_n = 8, 256
    else:
        palette = b""
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = img[..., ::-1].reshape(h, w * 3)  # RGB -> BGR
        bits, pal_n = 24, 0
    data = rows[::-1].tobytes()  # bottom-up
    offset = 14 + 40 + len(palette)
    header = (
        b"BM"
        + struct.pack("<IHHI", offset + len(data), 0, 0, offset)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bits, 0, len(data), 2835, 2835,
            pal_n, 0,
        )
    )
    return header + palette + data


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> uint8 (H, W) grayscale (when the palette is a neutral
    ramp), (H, W, 3) RGB, or (H, W, 4) RGBA."""
    if data[:2] != b"BM":
        raise ValueError("BMP: bad signature")
    (offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("BMP: pre-BITMAPINFOHEADER formats unsupported")
    w, h, _planes, bits, comp = struct.unpack("<iiHHI", data[18:34])
    (pal_n,) = struct.unpack("<I", data[46:50])
    if comp != 0:
        raise ValueError(f"BMP: compression {comp} unsupported (BI_RGB only)")
    top_down = h < 0
    h = abs(h)
    if bits == 8:
        n = pal_n or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off : pal_off + 4 * n], dtype=np.uint8
        ).reshape(-1, 4)[:, 2::-1]  # BGRX -> RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(
            data[offset : offset + h * stride], dtype=np.uint8
        ).reshape(h, stride)[:, :w]
        if not top_down:
            rows = rows[::-1]
        if len(pal) == 256 and np.array_equal(pal, np.repeat(
            np.arange(256, dtype=np.uint8)[:, None], 3, axis=1
        )):
            return np.ascontiguousarray(rows)  # neutral ramp = grayscale
        return pal[np.clip(rows, 0, len(pal) - 1)]
    if bits in (24, 32):
        ch = bits // 8
        stride = (w * ch + 3) & ~3
        rows = np.frombuffer(
            data[offset : offset + h * stride], dtype=np.uint8
        ).reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
        if not top_down:
            rows = rows[::-1]
        if ch == 3:
            return np.ascontiguousarray(rows[..., ::-1])  # BGR -> RGB
        return np.ascontiguousarray(rows[..., [2, 1, 0, 3]])  # BGRA -> RGBA
    raise ValueError(f"BMP: {bits}-bit pixels unsupported (8/24/32 only)")
