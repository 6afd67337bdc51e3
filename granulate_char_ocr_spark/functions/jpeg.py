"""Pure-NumPy baseline JPEG codec (grayscale), stdlib-only.

Closes the last codec stub in operators/multimodal.py: the reference's
corpora are compressed images (its decode step is PIL — ocr_service.py:
97-99) and this sandbox has no image library, so both directions are
implemented from the published standard (ITU-T T.81): 8×8 DCT blocks,
libjpeg-style quality-scaled quantization, zigzag, differential DC +
run-length AC, Huffman coding with the Annex K luminance tables.

Scope: BASELINE SEQUENTIAL, single component (grayscale) — the slice an
OCR corpus needs. Progressive, arithmetic coding, color, restart markers
are rejected with the reason. The decoder reads quantization and Huffman
tables FROM the stream (DQT/DHT), so third-party baseline grayscale files
decode correctly; the encoder embeds its tables, so its output decodes in
any standard decoder. JPEG is lossy: round-trips are near-equal (PSNR),
not bit-equal — pinned by tests.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

# K.1 luminance quantization table (quality 50 base), raster order
_QTBL_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

# zigzag scan order: _ZIGZAG[k] = raster index of the k-th zigzag element
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# K.3.1 luminance DC: BITS (codes per length 1..16) and HUFFVAL
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

# K.3.2 luminance AC
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# DCT-II orthonormal basis: F = _C @ block @ _C.T ; inverse = _C.T @ F @ _C
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _quant_table(quality: int) -> np.ndarray:
    """libjpeg quality scaling of the base table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((_QTBL_LUMA * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _build_huffman(bits: list[int], vals: list[int]):
    """(value -> (code, length)) and (length, code) -> value maps from the
    BITS/HUFFVAL representation (T.81 §C.2 canonical code assignment)."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            dec[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return enc, dec


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _destuff_scan(data: bytes, pos: int) -> bytes:
    """Entropy-coded segment with stuffed zeros removed (stops at the first
    real marker)."""
    out = bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0xFF:
            nxt = data[pos + 1] if pos + 1 < n else None
            if nxt == 0x00:
                out.append(0xFF)
                pos += 2
                continue
            break  # real marker (EOI) ends the scan
        out.append(b)
        pos += 1
    return bytes(out)


def _window16(payload: bytes) -> np.ndarray:
    """w[i] = the 16 bits starting at bit offset i, as one int per offset —
    the whole entropy stream becomes one vectorized sliding-window array so
    Huffman decode is ONE table lookup per symbol, not per bit."""
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
    bits = np.concatenate([bits, np.zeros(16, dtype=np.uint8)])
    windows = np.lib.stride_tricks.sliding_window_view(bits, 16)
    powers = (1 << np.arange(15, -1, -1)).astype(np.int64)
    return windows @ powers


def _build_lut(bits: list[int], vals: list[int]) -> np.ndarray:
    """65536-entry decode table: LUT[next16bits] = (symbol << 8) | length.
    Canonical codes are prefix-free, so every 16-bit window starting at a
    code boundary resolves to exactly one (symbol, length)."""
    lut = np.zeros(1 << 16, dtype=np.int32)  # 0 = invalid code
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            lut[lo:hi] = (vals[k] << 8) | length
            code += 1
            k += 1
        code <<= 1
    return lut


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_magnitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1  # ones' complement form


def _decode_magnitude(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits >> (size - 1):
        return bits
    return bits - (1 << size) + 1


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (H, W) grayscale -> baseline JPEG bytes."""
    if img.ndim != 2:
        raise ValueError("encode_jpeg: grayscale (H, W) only")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    if h > 65535 or w > 65535:
        raise ValueError("encode_jpeg: baseline dimensions cap at 65535")
    qt = _quant_table(quality)
    dc_enc, _ = _build_huffman(_DC_BITS, _DC_VALS)
    ac_enc, _ = _build_huffman(_AC_BITS, _AC_VALS)

    # pad to 8x8 multiples with edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")

    # vectorized DCT + quantization of every block at once
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    # F = C @ B @ C.T as two broadcast BLAS matmuls (einsum's naive
    # contraction path costs ~4x here)
    coefs = np.matmul(np.matmul(_C, blocks), _C.T)
    quant = np.round(coefs / qt).astype(np.int32)
    zz = quant.reshape(-1, 64)[:, _ZIGZAG]  # raster -> zigzag sequence

    bw = _BitWriter()
    prev_dc = 0
    for row in zz:
        dc = int(row[0])
        diff = dc - prev_dc
        prev_dc = dc
        size = _category(diff)
        code, length = dc_enc[size]
        bw.write(code, length)
        if size:
            bw.write(_encode_magnitude(diff, size), size)
        ac = row[1:]
        nz = np.flatnonzero(ac)
        pos = 0
        for idx in nz:
            run = int(idx) - pos
            while run >= 16:
                code, length = ac_enc[0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            v = int(ac[idx])
            size = _category(v)
            code, length = ac_enc[(run << 4) | size]
            bw.write(code, length)
            bw.write(_encode_magnitude(v, size), size)
            pos = int(idx) + 1
        if pos < 63:
            code, length = ac_enc[0x00]  # EOB
            bw.write(code, length)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qt_zz = qt.reshape(-1)[_ZIGZAG].astype(np.uint8)  # DQT stores zigzag order
    dqt = seg(0xFFDB, bytes([0x00]) + qt_zz.tobytes())
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof0 + dht + sos + bytes(bw.out) + b"\xff\xd9"
    )


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline grayscale JPEG bytes -> uint8 (H, W)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("JPEG: bad SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> dec map
    h = w = None
    comp_q = 0
    dc_id = ac_id = 0
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: marker desync")
        while data[pos + 1] == 0xFF:  # fill bytes before a marker (B.1.1.2)
            pos += 1
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xFFDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables unsupported")
                tbl = np.zeros(64)
                tbl[_ZIGZAG] = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                )
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xFFC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_lut(bits, vals)
                p += 17 + n
        elif marker == 0xFFC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if precision != 8 or ncomp != 1:
                raise ValueError(
                    "JPEG: decoder handles 8-bit single-component "
                    f"(got precision={precision}, components={ncomp})"
                )
            comp_q = payload[8]
            # sampling factors are irrelevant in a non-interleaved
            # single-component scan (T.81 A.2) — accept any
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC9, 0xFFCA, 0xFFCB):
            raise ValueError("JPEG: only baseline sequential (SOF0) supported")
        elif marker == 0xFFDD:
            raise ValueError("JPEG: restart intervals unsupported")
        elif marker == 0xFFDA:  # SOS
            dc_id = payload[2] >> 4
            ac_id = payload[2] & 0xF
            scan_start = pos
            break
    if h is None or scan_start is None:
        raise ValueError("JPEG: missing SOF0/SOS")
    qt = qtables[comp_q]
    dc_lut = htables[(0, dc_id)]
    ac_lut = htables[(1, ac_id)]
    w16 = _window16(_destuff_scan(data, scan_start))

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    n_blocks = (ph // 8) * (pw // 8)
    zz = np.zeros((n_blocks, 64), dtype=np.float64)
    pos = 0
    prev_dc = 0
    try:
        for b in range(n_blocks):
            pack = int(dc_lut[w16[pos]])
            if pack == 0:
                raise ValueError("JPEG: invalid Huffman code")
            size = pack >> 8
            pos += pack & 0xFF
            mag = (int(w16[pos]) >> (16 - size)) if size else 0
            pos += size
            prev_dc += _decode_magnitude(mag, size)
            zz[b, 0] = prev_dc
            k = 1
            while k < 64:
                pack = int(ac_lut[w16[pos]])
                if pack == 0:
                    raise ValueError("JPEG: invalid Huffman code")
                rs = pack >> 8
                pos += pack & 0xFF
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = rs >> 4, rs & 0xF
                k += run
                if k > 63:
                    raise ValueError("JPEG: AC index overflow")
                mag = int(w16[pos]) >> (16 - size)
                pos += size
                zz[b, k] = _decode_magnitude(mag, size)
                k += 1
    except IndexError:
        raise ValueError("JPEG: truncated entropy stream") from None
    coefs = np.zeros((n_blocks, 64))
    coefs[:, _ZIGZAG] = zz  # de-zigzag
    coefs = coefs.reshape(-1, 8, 8) * qt
    # B = C.T @ F @ C as two broadcast BLAS matmuls
    pixels = np.matmul(np.matmul(_C.T, coefs), _C) + 128.0
    out = (
        pixels.reshape(ph // 8, pw // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(ph, pw)
    )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)[:h, :w]
