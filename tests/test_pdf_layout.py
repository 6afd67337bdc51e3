"""PDF layout parse — positioned runs -> reading order (functions/pdf.py).

The line-based extractor reads text in DRAW order; these tests pin the
text-matrix tracker (Tm/Td/TD/T*/TL/' per ISO 32000-1 §9.4.2) and the
one-level XY-cut that restores reading order for multi-column and
out-of-sequence draws, plus the Spark-side ``pdf_texts(layout=True)``
operator."""

import zlib

import pytest

from granulate_char_ocr_spark.functions.pdf import (
    _assemble_single,
    decode_pdf_layout_pages,
    decode_pdf_runs,
    decode_pdf_text,
    decode_pdf_text_layout,
    encode_pdf,
    encode_pdf_runs,
)

# two-column page drawn right-column-first per line — the interleave a
# draw-order reader cannot undo
TWO_COL = [
    (300.0, 700.0, "RIGHT TOP"),
    (50.0, 700.0, "LEFT TOP"),
    (300.0, 688.0, "RIGHT MID"),
    (50.0, 688.0, "LEFT MID"),
    (50.0, 676.0, "LEFT BOT"),
]
TWO_COL_READING = "LEFT TOP\nLEFT MID\nLEFT BOT\nRIGHT TOP\nRIGHT MID"


@pytest.mark.parametrize("objstm", [False, True])
def test_two_columns_reading_order(objstm):
    """Interleaved column draws come back column-major (left column
    top-to-bottom, then right), in both 1.4 and 1.5 layouts; the
    draw-order reader keeps the interleave (the difference this feature
    exists for)."""
    data = encode_pdf_runs(TWO_COL, object_streams=objstm)
    assert decode_pdf_text_layout(data) == TWO_COL_READING
    assert decode_pdf_text(data) == "".join(t for _, _, t in TWO_COL)


def test_runs_roundtrip_positions():
    """decode_pdf_runs returns each show's absolute (x, y, text) in draw
    order — the writer's Tm coordinates verbatim."""
    assert decode_pdf_runs(encode_pdf_runs(TWO_COL)) == TWO_COL


def test_single_column_matches_draw_order():
    """For a plain top-down single-column document (encode_pdf's
    Td-relative layout) reading order IS draw order — the layout path
    must agree with the line-based extractor exactly."""
    lines = ["first line", "second line", "third line"]
    data = encode_pdf(lines)
    assert decode_pdf_text_layout(data) == decode_pdf_text(data)
    assert decode_pdf_text_layout(data) == "\n".join(lines)


def test_same_line_runs_sorted_left_to_right():
    """Runs in the same y-band (within _LINE_TOL) form one line sorted
    by x regardless of draw order, concatenated without separators."""
    runs = [
        (120.0, 700.0, " world"),
        (72.0, 700.5, "hello"),
        (72.0, 686.0, "next line"),
    ]
    assert (
        decode_pdf_text_layout(encode_pdf_runs(runs))
        == "hello world\nnext line"
    )


def test_no_false_gutter_on_small_gaps():
    """X-gaps narrower than _MIN_GUTTER never split columns: a ragged
    single column whose second line starts 6 pt right of the first
    line's estimated extent stays one column (estimated widths can only
    create gutters BETWEEN runs, and only past the threshold)."""
    # "abcd" at 12pt Courier-estimate spans 72 .. 72 + 4*0.6*12 = 100.8
    runs = [
        (72.0, 700.0, "abcd"),
        (106.0, 688.0, "ef"),  # 5.2 pt past the estimated extent
    ]
    assert decode_pdf_text_layout(encode_pdf_runs(runs)) == "abcd\nef"
    # same shape with a real gutter does split (and reads left-first)
    wide = [
        (72.0, 688.0, "abcd"),
        (200.0, 700.0, "ef"),
    ]
    assert decode_pdf_text_layout(encode_pdf_runs(wide)) == "abcd\nef"


def test_relative_positioning_operators():
    """TD (translate + set leading), T* (next line) and ' (next line +
    show) all move the text matrix the tracker must follow."""
    ops = b"\n".join(
        [
            b"BT",
            b"/F1 12 Tf",
            b"1 0 0 1 72 720 Tm",
            b"(line one) Tj",
            b"0 -14 TD",  # leading := 14, move to 706
            b"(line two) Tj",
            b"T*",  # 692
            b"(line three) Tj",
            b"(line four) '",  # 678 + show
            b"ET",
        ]
    )
    data = _assemble_single(zlib.compress(ops), False)
    assert (
        decode_pdf_text_layout(data)
        == "line one\nline two\nline three\nline four"
    )
    # the draw-order reader agrees on this single-column stream
    assert decode_pdf_text(data) == decode_pdf_text_layout(data)


def test_layout_pages_mirror_text_pages():
    """decode_pdf_layout_pages yields one string per text-bearing
    stream, like decode_pdf_text_pages; a graphics-only BT/ET stream is
    omitted from both."""
    data = encode_pdf_runs(TWO_COL)
    assert decode_pdf_layout_pages(data) == [TWO_COL_READING]
    empty = zlib.compress(b"BT\nET")
    graft = (
        b"9 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(empty)
        + empty
        + b"\nendstream\nendobj\n"
    )
    i = data.index(b"xref")
    patched = data[:i] + graft + data[i:]
    assert decode_pdf_layout_pages(patched) == [TWO_COL_READING]


def test_pdf_texts_layout_operator(spark):
    """Spark operator: pdf_texts(layout=True) restores reading order per
    document; the default path keeps draw order (both over the same
    mapInPandas plumbing)."""
    import pandas as pd

    from granulate_char_ocr_spark.operators.docparse import pdf_texts

    pdf = pd.DataFrame(
        {
            "doc_id": ["cols", "plain"],
            "payload": [
                encode_pdf_runs(TWO_COL, object_streams=True),
                encode_pdf(["just one line"]),
            ],
        }
    )
    df = spark.createDataFrame(pdf, "doc_id string, payload binary")
    got = {r["doc_id"]: r["extracted"] for r in pdf_texts(df, layout=True).collect()}
    assert got == {"cols": TWO_COL_READING, "plain": "just one line"}
    draw = {r["doc_id"]: r["extracted"] for r in pdf_texts(df).collect()}
    assert draw["cols"] == "".join(t for _, _, t in TWO_COL)
