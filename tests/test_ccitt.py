"""CCITT G4 (T.6 MMR) codec: round-trips over adversarial bilevel
layouts, structural validation of the T.4 Huffman tables (prefix-freeness
+ completeness — the strongest cross-implementation check available
without external TIFF tooling in-sandbox), and the G4-in-TIFF path."""

import numpy as np
import pytest

from granulate_char_ocr_spark.functions.ccitt import (
    _BLACK_MAKEUP,
    _BLACK_TERM,
    _EXT_MAKEUP,
    _WHITE_MAKEUP,
    _WHITE_TERM,
    decode_g4,
    encode_g4,
)
from granulate_char_ocr_spark.functions.tiff import decode_tiff, encode_tiff
from granulate_char_ocr_spark.sources.synthetic import render_word


def _assert_prefix_free(codes):
    codes = sorted(codes, key=len)
    for i, c in enumerate(codes):
        for other in codes[i + 1 :]:
            assert not other.startswith(c), (c, other)


def test_mh_tables_structure():
    """T.4 table invariants: complete run-length domains, prefix-free
    within each color (terminating + makeup + shared extended makeups),
    spec length bounds, Kraft inequality (catches length typos)."""
    assert sorted(_WHITE_TERM) == list(range(64))
    assert sorted(_BLACK_TERM) == list(range(64))
    assert sorted(_WHITE_MAKEUP) == list(range(64, 1729, 64))
    assert sorted(_BLACK_MAKEUP) == list(range(64, 1729, 64))
    assert sorted(_EXT_MAKEUP) == list(range(1792, 2561, 64))
    white = list(_WHITE_TERM.values()) + list(_WHITE_MAKEUP.values()) + list(
        _EXT_MAKEUP.values()
    )
    black = list(_BLACK_TERM.values()) + list(_BLACK_MAKEUP.values()) + list(
        _EXT_MAKEUP.values()
    )
    _assert_prefix_free(white)
    _assert_prefix_free(black)
    assert max(len(c) for c in _WHITE_TERM.values()) == 8
    assert max(len(c) for c in _WHITE_MAKEUP.values()) == 9
    assert max(len(c) for c in _BLACK_TERM.values()) == 12
    assert max(len(c) for c in _BLACK_MAKEUP.values()) == 13
    for table in (white, black):
        assert sum(2.0 ** -len(c) for c in table) <= 1.0
        assert len(set(table)) == len(table)


@pytest.mark.parametrize(
    "name",
    ["noise", "blank", "full", "stripes_v", "stripes_h", "checker",
     "wide_runs", "diag"],
)
def test_g4_roundtrip_layouts(name):
    rng = np.random.default_rng(17)
    imgs = {
        "noise": rng.integers(0, 2, (40, 73)).astype(bool),
        "blank": np.zeros((20, 100), dtype=bool),
        "full": np.ones((20, 100), dtype=bool),
        "stripes_v": np.tile(np.arange(64) % 2 == 0, (30, 1)),
        "stripes_h": np.tile((np.arange(30) % 2 == 0)[:, None], (1, 64)),
        "checker": np.add.outer(np.arange(21), np.arange(33)) % 2 == 0,
        "wide_runs": np.zeros((5, 3000), dtype=bool),
        "diag": np.eye(17, dtype=bool),
    }
    imgs["wide_runs"][:, 2900:] = True  # runs > the 2560 extended makeup
    img = imgs[name]
    out = decode_g4(encode_g4(img), img.shape[1], img.shape[0])
    assert np.array_equal(out, img)


def test_g4_compresses_scan_shapes():
    """A text glyph must compress well below the packed-bit size — the
    reason fax corpora are G4."""
    glyph = render_word("PLEASURE", 0) > 127
    data = encode_g4(glyph)
    assert len(data) < glyph.size // 8 / 4  # at least 4x over packed bits


def test_g4_truncated_rejected():
    img = np.eye(9, dtype=bool)
    data = encode_g4(img)
    with pytest.raises(ValueError, match="G4|truncated"):
        decode_g4(data[: len(data) // 3], 9, 9)


@pytest.mark.parametrize("rps", [None, 11])
def test_tiff_g4_glyph_roundtrip(rps):
    """G4-in-TIFF (compression 4, fax photometric WhiteIsZero) recovers
    the exact 0/255 plane, single- and multi-strip."""
    bil = (render_word("WORK", 1) > 127).astype(np.uint8) * 255
    data = encode_tiff(bil, compression=4, bilevel=True, rows_per_strip=rps)
    assert np.array_equal(decode_tiff(data), bil)


def test_tiff_g4_through_sniff_recognition(spark):
    """The full scan shape: a G4 fax TIFF through decode_payload('auto')
    recognizes exactly."""
    from granulate_char_ocr_spark.functions import kernels
    from granulate_char_ocr_spark.operators.multimodal import decode_payload

    glyph = render_word("TEAM", 2)
    payload = encode_tiff(glyph, compression=4, bilevel=True)
    gray = decode_payload(payload, "auto", 0, 0)
    assert np.array_equal(gray, glyph)
    chars = kernels.recognize_word(gray)
    assert "".join(c["latin"] for c in chars) == "TEAM"


@pytest.mark.parametrize("mode", ["rle", "g3"])
def test_mh_1d_roundtrip_layouts(mode):
    """The one-dimensional MH modes (TIFF compressions 2 and 3): same run
    coder as G4's horizontal mode, plus byte-aligned rows (RLE) / EOL
    framing (G3)."""
    from granulate_char_ocr_spark.functions.ccitt import decode_mh, encode_mh

    rng = np.random.default_rng(3)
    cases = [
        rng.integers(0, 2, (20, 67)).astype(bool),
        np.zeros((5, 40), dtype=bool),
        np.ones((3, 10), dtype=bool),  # rows START black (zero white run)
        render_word("TEAM", 0) > 127,
    ]
    wide = np.zeros((3, 3000), dtype=bool)
    wide[:, 2900:] = True
    cases.append(wide)
    for img in cases:
        out = decode_mh(
            encode_mh(img, mode), img.shape[1], img.shape[0], mode
        )
        assert np.array_equal(out, img)


@pytest.mark.parametrize("comp", [2, 3])
def test_tiff_mh_compressions(comp):
    bil = (render_word("WORK", 1) > 127).astype(np.uint8) * 255
    data = encode_tiff(bil, compression=comp, bilevel=True, rows_per_strip=9)
    assert np.array_equal(
        decode_tiff(encode_tiff(bil, compression=comp, bilevel=True)), bil
    )
    assert np.array_equal(decode_tiff(data), bil)


def test_tiff_jpeg_in_tiff():
    """Compression 7: each strip is a standalone JFIF stream; the decode
    must equal the direct JPEG round trip of the same strip."""
    from granulate_char_ocr_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(7)
    gray = np.clip(
        np.add.outer(np.arange(40) * 3, np.arange(56) * 2)
        + rng.normal(0, 10, (40, 56)),
        0, 255,
    ).astype(np.uint8)
    want = decode_jpeg(encode_jpeg(gray, quality=95))
    assert np.array_equal(
        decode_tiff(encode_tiff(gray, compression=7)), want
    )
    rgb = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    want_rgb = decode_jpeg(encode_jpeg(rgb, quality=95, subsampling="4:4:4"))
    assert np.array_equal(
        decode_tiff(encode_tiff(rgb, compression=7)), want_rgb
    )
    want_ms = np.vstack(
        [
            decode_jpeg(encode_jpeg(gray[i : i + 16], quality=95))
            for i in range(0, 40, 16)
        ]
    )
    assert np.array_equal(
        decode_tiff(encode_tiff(gray, compression=7, rows_per_strip=16)),
        want_ms,
    )


@pytest.mark.parametrize("k", [2, 4])
def test_g3_2d_roundtrip(k):
    """2D G3 (T.4 §2.2.2): 1D anchor rows every k lines, 2D rows against
    the previous line, tag bit after each EOL."""
    from granulate_char_ocr_spark.functions.ccitt import (
        decode_g3_2d,
        encode_g3_2d,
    )

    rng = np.random.default_rng(3)
    for img in (
        rng.integers(0, 2, (20, 67)).astype(bool),
        render_word("TEAM", 0) > 127,
        np.ones((1, 8), dtype=bool),
    ):
        out = decode_g3_2d(
            encode_g3_2d(img, k=k), img.shape[1], img.shape[0]
        )
        assert np.array_equal(out, img)


def test_tiff_g3_2d_and_compression_gain():
    """Compression 3 with T4Options bit 0: round-trips and beats the 1D
    mode on text shapes (the reason 2D exists)."""
    bil = (render_word("WORK", 1) > 127).astype(np.uint8) * 255
    d2 = encode_tiff(bil, compression=3, bilevel=True, t4_2d=True)
    assert np.array_equal(decode_tiff(d2), bil)
    assert np.array_equal(
        decode_tiff(
            encode_tiff(
                bil, compression=3, bilevel=True, t4_2d=True,
                rows_per_strip=9,
            )
        ),
        bil,
    )
    d1 = encode_tiff(bil, compression=3, bilevel=True)
    assert len(d2) < len(d1)


def test_fax_page_decode_budget():
    """Perf guard: a text-structured half-A4 G4 fax page (864x1100)
    decodes in interpreter-tenths, not minutes — min-of-2 with ~20x
    headroom for load drift (measured 0.065 s solo with the LUT reader
    and incremental reference-line scan)."""
    import time

    import numpy as np

    from granulate_char_ocr_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(4)
    img = np.zeros((1100, 864), dtype=np.uint8)
    for r in range(30, 1100, 40):
        for c in range(20, 800, 12):
            if rng.random() < 0.4:
                img[r : r + 18, c : c + 8] = 255
    data = encode_tiff(img, compression=4, bilevel=True)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = decode_tiff(data)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    assert np.array_equal(out > 0, img > 0)
    assert best < 1.5, f"G4 page decode took {best:.2f}s"
