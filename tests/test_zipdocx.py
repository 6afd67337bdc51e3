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
