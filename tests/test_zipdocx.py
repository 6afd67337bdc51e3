"""ZIP container + DOCX text extraction (functions/zipdocx.py)."""

import struct
import zlib

import numpy as np

from granulate_char_ocr_spark.functions import zipdocx


def test_zip_roundtrip_deflate_and_stored():
    members = {
        "a.txt": b"hello zip " * 50,
        "dir/b.bin": bytes(range(256)) * 4,
        "empty": b"",
    }
    for compress in (True, False):
        blob = zipdocx.zip_build(members, compress=compress)
        assert dict(zipdocx.zip_entries(blob)) == {
            k: len(v) for k, v in members.items()
        }
        for k, v in members.items():
            assert zipdocx.zip_read(blob, k) == v
        assert zipdocx.zip_read(blob, "missing") is None


def test_zip_trailing_comment_and_crc_guard():
    blob = zipdocx.zip_build({"x": b"payload"})
    # EOCD scan tolerates a trailing archive comment region
    assert zipdocx.zip_read(blob + b"\x00" * 100, "x") == b"payload"
    # flip a payload byte: CRC rejects instead of returning garbage
    broken = bytearray(zipdocx.zip_build({"x": b"payload"}, compress=False))
    broken[broken.find(b"payload")] ^= 0xFF
    assert zipdocx.zip_read(bytes(broken), "x") is None


def test_zip_rejects_garbage():
    assert zipdocx.zip_entries(b"") is None
    assert zipdocx.zip_entries(b"PK\x03\x04 but no directory") is None
    rng = np.random.default_rng(5)
    for _ in range(20):
        assert zipdocx.zip_entries(rng.bytes(512)) is None


def test_docx_paragraphs_tabs_breaks_entities():
    blob = zipdocx.docx_build(["Title", "Body & <markup> here", "End"])
    assert zipdocx.docx_text(blob) == "Title\nBody & <markup> here\nEnd"
    # tabs, line breaks, deleted runs and numeric entities
    xml = (
        b'<w:document><w:body>'
        b"<w:p><w:r><w:t>a</w:t></w:r><w:tab/><w:r><w:t>b</w:t></w:r></w:p>"
        b"<w:p><w:r><w:t>c</w:t></w:r><w:br/><w:r><w:t>d&#233;&#x21;</w:t>"
        b"</w:r></w:p>"
        b"<w:p><w:r><w:delText>gone</w:delText><w:t>kept</w:t></w:r></w:p>"
        b"</w:body></w:document>"
    )
    blob = zipdocx.zip_build({"word/document.xml": xml})
    assert zipdocx.docx_text(blob) == "a\tb\nc\ndé!\nkept"


def test_docx_rejects_non_docx():
    assert zipdocx.docx_text(b"plain text") is None
    assert zipdocx.docx_text(zipdocx.zip_build({"other.xml": b"<x/>"})) is None


def test_escaped_entities_decode_once_amp_last():
    # &amp; decodes LAST (functions/html.py contract): an escaped entity
    # yields its literal text, never its referent (ADVICE r4)
    blob = zipdocx.docx_build(["x &lt; y", "a &#65; b", "q &amp; r"])
    assert zipdocx.docx_text(blob) == "x &lt; y\na &#65; b\nq &amp; r"
    xml = b"<w:p><w:r><w:t>&amp;lt;|&amp;#65;|&amp;amp;|&#65;</w:t></w:r></w:p>"
    blob = zipdocx.zip_build({"word/document.xml": xml})
    assert zipdocx.docx_text(blob) == "&lt;|&#65;|&amp;|A"


def test_out_of_range_numeric_entity_passes_through():
    xml = b"<w:p><w:r><w:t>a&#x110000;b&#9999999999;c</w:t></w:r></w:p>"
    blob = zipdocx.zip_build({"word/document.xml": xml})
    assert zipdocx.docx_text(blob) == "a&#x110000;b&#9999999999;c"


def test_docx_texts_operator(spark):
    import pandas as pd

    from granulate_char_ocr_spark.operators.docparse import docx_texts

    good = zipdocx.docx_build(["Alpha", "Beta"])
    plain_zip = zipdocx.zip_build({"a": b"1", "b": b"2"})
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": ["d1", "d2", "d3"],
            "payload": [good, plain_zip, b"not a zip"],
        })
    )
    got = {r["doc_id"]: r for r in docx_texts(docs).collect()}
    assert got["d1"]["extracted"] == "Alpha\nBeta"
    assert got["d1"]["n_members"] == 2  # [Content_Types].xml + document.xml
    assert got["d2"]["extracted"] is None and got["d2"]["n_members"] == 2
    assert got["d3"]["extracted"] is None and got["d3"]["n_members"] is None


def _xlsx(sheet_xml: bytes, shared: list[str] | None = None) -> bytes:
    members = {"xl/worksheets/sheet1.xml": sheet_xml}
    if shared is not None:
        ss = b"".join(
            b"<si><t>" + s.encode() + b"</t></si>" for s in shared
        )
        members["xl/sharedStrings.xml"] = (
            b"<sst>" + ss + b"</sst>"
        )
    return zipdocx.zip_build(members)


def test_xlsx_shared_inline_numeric_and_empty_cells():
    sheet = (
        b"<worksheet><sheetData>"
        b'<row r="1">'
        b'<c r="A1" t="s"><v>0</v></c>'
        b'<c r="B1"><v>3.14</v></c>'
        b'<c r="C1" t="inlineStr"><is><t>in&amp;line</t></is></c>'
        b"</row>"
        b'<row r="2">'
        b'<c r="A2"/>'  # empty self-closing cell must NOT swallow B2
        b'<c r="B2" t="s"><v>1</v></c>'
        b'<c r="C2"></c>'
        b"</row>"
        b"</sheetData></worksheet>"
    )
    rows = zipdocx.xlsx_rows(_xlsx(sheet, shared=["alpha", "beta"]))
    assert rows == [["alpha", "3.14", "in&line"], ["", "beta", ""]]


def test_xlsx_missing_sheet_and_bad_shared_index():
    assert zipdocx.xlsx_rows(b"junk") is None
    assert zipdocx.xlsx_rows(_xlsx(b"<x/>"), sheet=2) is None
    sheet = b'<worksheet><row r="1"><c t="s"><v>99</v></c></row></worksheet>'
    assert zipdocx.xlsx_rows(_xlsx(sheet, shared=["only"])) == [[""]]


def test_odt_text():
    content = (
        b'<?xml version="1.0"?><office:document-content>'
        b'<office:body><office:text>'
        b'<text:h text:style-name="H1">Head</text:h>'
        b"<text:p>One <text:span>two</text:span>"
        b"<text:tab/>three&amp;</text:p>"
        b"<text:p></text:p>"
        b"<text:p>Last<text:line-break/>line</text:p>"
        b"</office:text></office:body></office:document-content>"
    )
    blob = zipdocx.zip_build({"content.xml": content})
    assert zipdocx.odt_text(blob) == "Head\nOne two\tthree&\nLast\nline"
    assert zipdocx.odt_text(b"nope") is None
    assert zipdocx.odt_text(zipdocx.zip_build({"a": b"b"})) is None


def test_xlsx_tables_operator(spark):
    import pandas as pd

    from granulate_char_ocr_spark.operators.docparse import xlsx_tables

    sheet = (
        b"<worksheet><sheetData>"
        b'<row r="1"><c t="s"><v>0</v></c><c><v>7</v></c></row>'
        b'<row r="2"><c t="s"><v>1</v></c><c><v>8.5</v></c></row>'
        b"</sheetData></worksheet>"
    )
    blob = _xlsx(sheet, shared=["name", "other"])
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": ["x1", "bad"],
            "payload": [blob, b"not xlsx"],
        })
    )
    got = sorted(
        (r["doc_id"], r["row_idx"], list(r["cells"]), r["n_cells"])
        for r in xlsx_tables(docs).collect()
    )
    assert got == [
        ("x1", 0, ["name", "7"], 2),
        ("x1", 1, ["other", "8.5"], 2),
    ]


def test_docx_texts_operator_handles_odt(spark):
    import pandas as pd

    from granulate_char_ocr_spark.operators.docparse import docx_texts

    odt = zipdocx.zip_build(
        {"content.xml": b"<text:p>Open Document</text:p>"}
    )
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["o1"], "payload": [odt]})
    )
    row = docx_texts(docs).collect()[0]
    assert row["extracted"] == "Open Document" and row["n_members"] == 1
