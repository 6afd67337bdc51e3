"""WARC container round-trip + record-explode operator + gate parity.

The byte layer (functions/warc.py) is spec-driven (ISO 28500 + the
Common Crawl per-record-gzip convention); these tests pin the framing
invariants a reader of real crawl data relies on: member splitting,
header case-insensitivity, Content-Length-exact payloads, HTTP
envelope strip, and truncation REJECTION (never a silent short body).
"""

import gzip

import pytest

from granulate_char_ocr_spark.functions import warc


def _pages(n=5):
    return [
        (
            f"https://corpus.example/d/{i}",
            f"<html><body><p>doc {i} body &amp; text</p></body></html>".encode(),
        )
        for i in range(n)
    ]


def test_roundtrip_compressed_and_plain():
    pages = _pages()
    for compress in (True, False):
        data = warc.build_warc(pages, compress=compress)
        recs = warc.parse_warc(data)
        assert recs[0].rec_type == "warcinfo"
        assert [r.rec_type for r in recs[1:]] == ["response"] * len(pages)
        assert [r.url for r in recs[1:]] == [u for u, _ in pages]
        assert [r.body for r in recs[1:]] == [b for _, b in pages]
        assert all(r.http_status == 200 for r in recs[1:])
        assert all(
            r.http_content_type.startswith("text/html") for r in recs[1:]
        )


def test_build_is_deterministic():
    pages = _pages()
    assert warc.build_warc(pages) == warc.build_warc(pages)


def test_whole_file_gzip_layout():
    # some archivers gzip the whole file as one member — same records
    plain = warc.build_warc(_pages(3), compress=False)
    recs = warc.parse_warc(gzip.compress(plain))
    assert [r.body for r in recs] == [
        r.body for r in warc.parse_warc(plain)
    ]


def test_header_names_case_insensitive():
    plain = warc.build_warc(_pages(1), compress=False)
    recs = warc.parse_warc(plain.replace(b"WARC-Target-URI", b"warc-target-uri"))
    assert recs[1].url == "https://corpus.example/d/0"


def test_truncated_payload_raises():
    plain = warc.build_warc(_pages(2), compress=False)
    with pytest.raises(ValueError, match="truncated"):
        warc.parse_warc(plain[:-40])


def test_truncated_gzip_member_raises():
    data = warc.build_warc(_pages(2))
    with pytest.raises(ValueError):
        warc.parse_warc(data[:-8])


def test_http_content_length_trims_trailing_junk():
    body = b"exact"
    payload = warc.http_response(body) + b"JUNKJUNK"
    rec = warc._record_bytes(
        [
            ("WARC-Type", "response"),
            ("WARC-Target-URI", "https://x/1"),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        payload,
    )
    recs = warc.parse_warc(rec)
    assert recs[0].body == body


def test_http_body_shorter_than_declared_raises():
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort"
    )
    rec = warc._record_bytes(
        [
            ("WARC-Type", "response"),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        payload,
    )
    with pytest.raises(ValueError, match="Content-Length"):
        warc.parse_warc(rec)


def test_negative_warc_content_length_raises():
    # a negative length would move the record cursor BACKWARD — the
    # crafted-input infinite-loop case
    import re as _re

    plain = warc.build_warc(_pages(1), compress=False)
    bad = _re.sub(rb"Content-Length: (\d+)", rb"Content-Length: -\1",
                  plain, count=1)
    assert b"Content-Length: -" in bad
    with pytest.raises(ValueError, match="negative|Content-Length"):
        warc.parse_warc(bad)


def test_negative_http_content_length_raises():
    payload = b"HTTP/1.1 200 OK\r\nContent-Length: -3\r\n\r\nhello"
    rec = warc._record_bytes(
        [
            ("WARC-Type", "response"),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        payload,
    )
    with pytest.raises(ValueError, match="Content-Length"):
        warc.parse_warc(rec)


def test_chunked_transfer_encoding_decoded():
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    )
    rec = warc._record_bytes(
        [
            ("WARC-Type", "response"),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        payload,
    )
    assert warc.parse_warc(rec)[0].body == b"hello world"


def test_truncated_chunk_raises():
    payload = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhel"
    )
    rec = warc._record_bytes(
        [
            ("WARC-Type", "response"),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        payload,
    )
    with pytest.raises(ValueError, match="chunk"):
        warc.parse_warc(rec)


def test_corrupt_gzip_member_is_valueerror():
    # error-contract: corruption surfaces as ValueError-with-reason,
    # never a bare zlib.error
    data = warc.build_warc(_pages(1)) + b"\x1f\x8bNOTGZIP" + b"\x00" * 20
    with pytest.raises(ValueError, match="gzip"):
        warc.parse_warc(data)


def test_unsupported_version_rejected():
    plain = warc.build_warc(_pages(1), compress=False)
    with pytest.raises(ValueError, match="version"):
        warc.parse_warc(plain.replace(b"WARC/1.0", b"WARC/0.9"))


def test_warc_records_operator(spark):
    """Spark explode: files -> records, bodies intact, non-response rows
    (warcinfo) surfaced with status -1."""
    from granulate_char_ocr_spark.operators.docparse import warc_records

    pages = _pages(4)
    df = spark.createDataFrame(
        [(0, bytearray(warc.build_warc(pages[:2]))),
         (1, bytearray(warc.build_warc(pages[2:])))],
        "file_id int, payload binary",
    )
    rows = warc_records(df).orderBy("file_id", "rec_index").collect()
    assert len(rows) == 6  # 2 × (warcinfo + 2 responses)
    assert [r.rec_type for r in rows] == [
        "warcinfo", "response", "response"] * 2
    resp = [r for r in rows if r.rec_type == "response"]
    assert [bytes(r.body) for r in resp] == [b for _, b in pages]
    assert {r.http_status for r in resp} == {200}
    info = [r for r in rows if r.rec_type == "warcinfo"]
    assert {r.http_status for r in info} == {-1}


def test_build_warc_files_groups_and_sorts(spark):
    """Group-pack: one WARC per file_id, pages packed in url order
    regardless of input order (determinism under partitioning)."""
    from granulate_char_ocr_spark.operators.docparse import (
        build_warc_files,
        warc_records,
    )

    rows = [
        (0, "https://x/b", "<p>B</p>"),
        (0, "https://x/a", "<p>A</p>"),
        (1, "https://x/c", "<p>C</p>"),
    ]
    df = spark.createDataFrame(rows, "file_id int, url string, html string")
    files = {r.file_id: r for r in build_warc_files(df).collect()}
    assert files[0].n_records == 3 and files[1].n_records == 2
    recs = warc_records(build_warc_files(df))
    got = [
        (r.file_id, r.url)
        for r in recs.filter("rec_type = 'response'")
        .orderBy("file_id", "rec_index")
        .collect()
    ]
    assert got == [(0, "https://x/a"), (0, "https://x/b"), (1, "https://x/c")]


def test_warc_extract_docs_parity(spark):
    """Gate query vs its oracle at sf0.001: the WARC pack → record
    explode → HTTP strip → HTML strip round trip recovers exactly the
    whitespace-collapsed source text."""
    import duckdb

    from granulate_char_ocr_spark import driver_queries

    sf = "/root/testdata/sf0.001"
    got = {
        (r.doc_id, r.main_text)
        for r in driver_queries.QUERIES["warc_extract_docs"](
            spark, sf
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = {
        tuple(r)
        for r in con.execute(
            driver_queries.ORACLES["warc_extract_docs"]
        ).fetchall()
    }
    assert got == want
