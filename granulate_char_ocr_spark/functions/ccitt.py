"""CCITT Group 4 (ITU-T T.6 MMR) bilevel codec — the fax/scan compression.

Real scanned-document TIFFs are overwhelmingly G4-compressed bilevel;
this implements the two-dimensional Modified Modified READ coding from
the public standards: vertical/pass/horizontal modes against the
reference line's changing elements (T.6 §2), with horizontal-mode run
lengths coded by the T.4 §2 Modified Huffman white/black tables
(terminating codes 0-63, makeup codes to 1728, shared extended makeups
to 2560, repeated for longer runs). G4 rows carry no EOL codes; EOFB
terminates the stream. The same MH run coder also backs the
one-dimensional modes — TIFF compression 2 (MH-RLE, byte-aligned rows)
and compression 3 in its default 1D form (EOL before each row) — and
the shared 2D row coder backs 2D G3 (T.4 §2.2.2: EOL + tag bit per row,
1D anchor rows every K lines).

No external TIFF tooling exists in-sandbox to cross-validate the code
tables, so tests/test_ccitt.py pins their STRUCTURE against the spec:
each table is prefix-free, complete over its run-length domain, and
matches the published code-length histogram — catching transcription
errors that a same-table round-trip cannot.

Rows are coded over booleans with True = black (ink); the TIFF layer
maps photometric polarity.
"""

from __future__ import annotations

import numpy as np

# T.4 Table 2 — white run lengths (terminating 0-63)
_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
# T.4 Table 3 — white makeup codes (64-1728)
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}
# T.4 Table 2 — black run lengths (terminating 0-63)
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
}
# T.4 Table 3 — black makeup codes (64-1728)
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
# T.4 Table 4 — extended makeup codes, shared by both colors (1792-2560)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}
# T.6 §2.2.4 — two-dimensional mode codes
_MODE_P = "0001"
_MODE_H = "001"
_MODE_V = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
           3: "0000011", -3: "0000010"}
_EOFB = "000000000001" * 2


def _decode_tree(tables: list[dict[int, str]]) -> dict[str, int]:
    out: dict[str, int] = {}
    for t in tables:
        for run, code in t.items():
            out[code] = run
    return out


_WHITE_DEC = _decode_tree([_WHITE_TERM, _WHITE_MAKEUP, _EXT_MAKEUP])
_BLACK_DEC = _decode_tree([_BLACK_TERM, _BLACK_MAKEUP, _EXT_MAKEUP])

# ---------------------------------------------------------------------------
# decode LUTs (r4 VERDICT item: the per-code string walk was the residual
# interpreted loop). One fixed-width peek indexes a flat table holding
# (value, code length) for every code padded out to the table width —
# one dict lookup per CODE instead of one string append per BIT.
# ---------------------------------------------------------------------------

_RUN_BITS = 13  # longest MH/extended-makeup code (asserted below)


def _run_lut(dec: dict[str, int]) -> tuple[list[int], list[int]]:
    assert max(len(c) for c in dec) <= _RUN_BITS
    runs = [-1] * (1 << _RUN_BITS)
    lens = [0] * (1 << _RUN_BITS)
    for code, run in dec.items():
        pad = _RUN_BITS - len(code)
        base = int(code, 2) << pad
        for i in range(1 << pad):
            runs[base + i] = run
            lens[base + i] = len(code)
    return runs, lens


_WHITE_LUT = _run_lut(_WHITE_DEC)
_BLACK_LUT = _run_lut(_BLACK_DEC)

_MODE_BITS = 7  # longest 2D mode code (V±3)


def _mode_lut() -> list[tuple[str, int, int] | None]:
    lut: list[tuple[str, int, int] | None] = [None] * (1 << _MODE_BITS)
    codes = [("V", d, c) for d, c in _MODE_V.items()]
    codes += [("H", 0, _MODE_H), ("P", 0, _MODE_P)]
    for kind, delta, code in codes:
        pad = _MODE_BITS - len(code)
        base = int(code, 2) << pad
        for i in range(1 << pad):
            lut[base + i] = (kind, delta, len(code))
    return lut  # index 0 (seven zeros) stays None -> EOL/EOFB slow path


_MODE_LUT = _mode_lut()


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[str] = []
        self.nbits = 0  # running length: O(1) byte-alignment checks

    def write(self, code: str) -> None:
        self.bits.append(code)
        self.nbits += len(code)

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _emit_run(bw: _BitWriter, run: int, black: bool) -> None:
    """One MH run: repeated 2560-makeups, one makeup, one terminator."""
    makeup = _BLACK_MAKEUP if black else _WHITE_MAKEUP
    term = _BLACK_TERM if black else _WHITE_TERM
    while run >= 2624:  # 2560 + max 63 terminator headroom
        bw.write(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        m = (run // 64) * 64
        bw.write(_EXT_MAKEUP[m] if m >= 1792 else makeup[m])
        run -= m
    bw.write(term[run])


def _transitions(row: np.ndarray) -> list[int]:
    """Positions where the color changes, scanning left to right with an
    imaginary white pixel before position 0."""
    padded = np.concatenate([[False], row])
    return list(np.flatnonzero(padded[1:] != padded[:-1]))


def _encode_row_2d(bw: _BitWriter, cur: list[int], ref: list[int], w: int):
    """One row of 2D coding (shared by G4 and 2D G3): pass/vertical/
    horizontal modes against the reference line's changing elements."""
    a0 = -1
    color_black = False
    ci = 0  # index into cur of the next transition > a0
    bs = 0  # first ref transition > a0 (a0 is monotone -> amortized O(n))
    nref = len(ref)
    while a0 < w:
        a1 = cur[ci] if ci < len(cur) else w
        a2 = cur[ci + 1] if ci + 1 < len(cur) else w
        # b1: first ref transition > a0 with the same direction as a1
        # (ref transitions alternate white->black at even indices; ref is
        # strictly increasing, so the parity fix-up is at most one step)
        while bs < nref and ref[bs] <= a0:
            bs += 1
        bi = bs if (bs % 2 == 1) == color_black else bs + 1
        b1 = ref[bi] if bi < nref else w
        b2 = ref[bi + 1] if bi + 1 < nref else w
        if b2 < a1:
            bw.write(_MODE_P)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.write(_MODE_V[a1 - b1])
            a0 = a1
            ci += 1
            color_black = not color_black
        else:
            bw.write(_MODE_H)
            start = max(a0, 0)
            _emit_run(bw, a1 - start, color_black)
            _emit_run(bw, a2 - a1, not color_black)
            a0 = a2
            ci += 2


def encode_g4(img: np.ndarray) -> bytes:
    """Boolean/uint8 (H, W) with truthy = black ink -> G4 (T.6) bytes."""
    rows = np.ascontiguousarray(img).astype(bool)
    h, w = rows.shape
    bw = _BitWriter()
    ref: list[int] = []  # imaginary all-white line above row 0
    for y in range(h):
        cur = _transitions(rows[y])
        _encode_row_2d(bw, cur, ref, w)
        ref = cur
    bw.write(_EOFB)
    return bw.tobytes()


class _BitReader:
    """MSB-first reader with O(1) fixed-width ``peek``: a small integer
    accumulator fed one byte at a time. Peeks past the end see zero bits
    (codes are matched by LUT before consuming), but ``skip`` tracks the
    true bit length so a truncated stream still raises."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.nbits = len(data) * 8
        self.pos = 0  # absolute bits consumed (byte-alignment anchor)
        self._acc = 0
        self._nacc = 0
        self._byte = 0

    def peek(self, n: int) -> int:
        while self._nacc < n:
            b = self.data[self._byte] if self._byte < len(self.data) else 0
            self._byte += 1
            self._acc = (self._acc << 8) | b
            self._nacc += 8
        return (self._acc >> (self._nacc - n)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        if self.pos + n > self.nbits:
            raise ValueError("CCITT: truncated stream")
        if self._nacc < n:
            self.peek(n)
        self._nacc -= n
        self._acc &= (1 << self._nacc) - 1
        self.pos += n

    def take(self) -> int:
        b = self.peek(1)
        self.skip(1)
        return b

    def align(self) -> None:
        pad = (-self.pos) % 8
        if pad:
            self.skip(pad)


def _read_mode(br: _BitReader) -> tuple[str, int]:
    """Next 2D mode: ('V', delta) | ('H', 0) | ('P', 0) | ('EOFB', 0)."""
    hit = _MODE_LUT[br.peek(_MODE_BITS)]
    if hit is not None:
        kind, delta, n = hit
        br.skip(n)
        return kind, delta
    # seven zeros: only an EOL-shaped code (EOFB is two of them) fits
    if br.peek(12) == 1:  # 000000000001
        br.skip(12)
        return "EOFB", 0
    raise ValueError("G4: bad 2D mode code")


def _read_run(br: _BitReader, black: bool) -> int:
    """One MH run length: makeup codes accumulate until a terminator."""
    runs, lens = _BLACK_LUT if black else _WHITE_LUT
    total = 0
    while True:
        idx = br.peek(_RUN_BITS)
        run = runs[idx]
        if run < 0:
            raise ValueError("G4: bad run-length code")
        br.skip(lens[idx])
        total += run
        if run < 64:  # terminating code ends the run
            return total


def _decode_row_2d(br: _BitReader, ref: list[int], w: int) -> list[int]:
    """One row of 2D decoding (shared by G4 and 2D G3): returns the row's
    transition positions (< w)."""
    cur: list[int] = []
    a0 = -1
    color_black = False
    bs = 0  # first ref transition > a0 (a0 is monotone -> amortized O(n))
    nref = len(ref)
    while a0 < w:
        mode, delta = _read_mode(br)
        if mode == "EOFB":
            raise ValueError("G4: EOFB before image complete")
        while bs < nref and ref[bs] <= a0:
            bs += 1
        bi = bs if (bs % 2 == 1) == color_black else bs + 1
        b1 = ref[bi] if bi < nref else w
        b2 = ref[bi + 1] if bi + 1 < nref else w
        if mode == "P":
            a0 = b2
        elif mode == "V":
            a1 = b1 + delta
            if not (0 <= a1 <= w) or a1 <= a0:
                raise ValueError("G4: vertical mode out of range")
            cur.append(a1)
            a0 = a1
            color_black = not color_black
        else:  # horizontal: two runs from max(a0, 0)
            start = max(a0, 0)
            r1 = _read_run(br, color_black)
            r2 = _read_run(br, not color_black)
            cur.append(start + r1)
            cur.append(start + r1 + r2)
            a0 = start + r1 + r2
    # transitions beyond w are clamped (the final V/H may land at w)
    return [t for t in cur if t < w]


def _fill_row(out_row: np.ndarray, transitions: list[int], w: int) -> None:
    on = False
    prev = 0
    for t in transitions + [w]:
        if on:
            out_row[prev:t] = True
        on = not on
        prev = t


def decode_g4(data: bytes, w: int, h: int) -> np.ndarray:
    """G4 (T.6) bytes -> boolean (H, W) with True = black ink."""
    br = _BitReader(data)
    out = np.zeros((h, w), dtype=bool)
    ref: list[int] = []
    for y in range(h):
        cur = _decode_row_2d(br, ref, w)
        _fill_row(out[y], cur, w)
        ref = cur
    return out


# ---------------------------------------------------------------------------
# one-dimensional coding: Modified Huffman rows (T.4 §2) — TIFF compression
# 2 ("CCITT RLE": no EOLs, every row byte-aligned) and compression 3 in its
# default 1D mode (EOL code before every row)
# ---------------------------------------------------------------------------

_EOL = "000000000001"


def _row_runs(row: np.ndarray) -> list[int]:
    """Alternating run lengths starting with white (first run may be 0)."""
    t = _transitions(row)
    runs = []
    prev = 0
    for pos in t + [len(row)]:
        runs.append(pos - prev)
        prev = pos
    return runs


def encode_mh(img: np.ndarray, mode: str) -> bytes:
    """Boolean (H, W) truthy=black -> 1D MH bytes. mode 'rle' = TIFF
    compression 2 (byte-aligned rows, no EOL); mode 'g3' = compression 3
    default 1D (EOL before each row)."""
    rows = np.ascontiguousarray(img).astype(bool)
    bw = _BitWriter()
    for y in range(rows.shape[0]):
        if mode == "g3":
            bw.write(_EOL)
        elif mode == "rle" and y:
            if bw.nbits % 8:  # byte-align the start of every row
                bw.write("0" * (8 - bw.nbits % 8))
        black = False
        for run in _row_runs(rows[y]):
            _emit_run(bw, run, black)
            black = not black
    return bw.tobytes()


def _scan_eol(br: _BitReader) -> None:
    """Advance past fill bits (zeros) to the next EOL code."""
    zeros = 0
    while br.take() == 0:
        zeros += 1
        if zeros > 64 + len(_EOL):
            raise ValueError("G3: EOL not found")
    if zeros < len(_EOL) - 1:  # a 1 before 11 zeros is not an EOL
        raise ValueError("G3: garbage before EOL")


def _decode_row_1d(br: _BitReader, out_row: np.ndarray, w: int) -> None:
    """One 1D MH row of alternating runs (starting white) into out_row."""
    x = 0
    black = False
    while x < w:
        run = _read_run(br, black)
        if x + run > w:
            raise ValueError("MH: run overflows row")
        if black:
            out_row[x : x + run] = True
        x += run
        black = not black


def decode_mh(data: bytes, w: int, h: int, mode: str) -> np.ndarray:
    """1D MH bytes -> boolean (H, W) truthy=black. See encode_mh."""
    br = _BitReader(data)
    out = np.zeros((h, w), dtype=bool)
    for y in range(h):
        if mode == "g3":
            _scan_eol(br)
        elif mode == "rle" and y:
            br.align()  # rows are byte-aligned
        _decode_row_1d(br, out[y], w)
    return out


# ---------------------------------------------------------------------------
# two-dimensional G3 (T.4 §2.2.2): EOL + tag bit per row (1 = 1D row,
# 0 = 2D row coded against the previous line); at most K-1 consecutive 2D
# rows between 1D anchor rows
# ---------------------------------------------------------------------------

def encode_g3_2d(img: np.ndarray, k: int = 4) -> bytes:
    """Boolean/uint8 (H, W) truthy=black -> 2D G3 bytes (T4Options bit 0).
    Every ``k``-th row is a 1D anchor (error-resilience rule); the rest
    code 2D against the previous line."""
    rows = np.ascontiguousarray(img).astype(bool)
    h, w = rows.shape
    bw = _BitWriter()
    ref: list[int] = []
    for y in range(h):
        cur = _transitions(rows[y])
        bw.write(_EOL)
        if y % k == 0:
            bw.write("1")  # tag: 1D row follows
            black = False
            for run in _row_runs(rows[y]):
                _emit_run(bw, run, black)
                black = not black
        else:
            bw.write("0")  # tag: 2D row follows
            _encode_row_2d(bw, cur, ref, w)
        ref = cur
    return bw.tobytes()


def decode_g3_2d(data: bytes, w: int, h: int) -> np.ndarray:
    """2D G3 bytes -> boolean (H, W) truthy=black. Rows self-describe via
    the tag bit after each EOL, so any 1D/2D interleaving decodes."""
    br = _BitReader(data)
    out = np.zeros((h, w), dtype=bool)
    ref: list[int] = []
    for y in range(h):
        _scan_eol(br)
        if br.take():  # 1D row
            _decode_row_1d(br, out[y], w)
            ref = _transitions(out[y])
        else:  # 2D row against the previous line
            cur = _decode_row_2d(br, ref, w)
            _fill_row(out[y], cur, w)
            ref = cur
    return out
