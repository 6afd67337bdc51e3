"""WARC (Web ARChive, ISO 28500) container read/write — the ingest
format of web-scale corpora (Common Crawl ships WARC; every real
main-content-extraction pipeline starts by splitting WARC records).

The reference repo has no web-ingest leg (it reads a glyph-image
corpus); this module comes from the north rule's "main-content
extraction pipeline ... over interleaved text + media documents" —
the upstream container those documents arrive in at 100 TB.

Format notes (ISO 28500 / WARC 1.0, plus the Common Crawl convention):

- A WARC file is a sequence of records. Common Crawl gzips each record
  as its OWN gzip member and concatenates the members, so a reader can
  split work without decompressing the whole file; plain (uncompressed)
  WARC is the same byte stream without the gzip framing. Both layouts
  are read here; the writer emits the per-record-member gzip layout
  (mtime=0 so output is deterministic).
- A record is: version line ``WARC/1.0\\r\\n``, header lines
  ``Name: value\\r\\n`` (case-insensitive names), blank line, exactly
  ``Content-Length`` payload bytes, then ``\\r\\n\\r\\n``.
- For ``WARC-Type: response`` records the payload is an HTTP response
  message (``Content-Type: application/http; msgtype=response``): a
  status line, HTTP headers, blank line, body. Extraction wants the
  BODY, so the HTTP envelope is parsed off and the status code and
  HTTP Content-Type are surfaced as columns.

Unsupported variants raise ValueError with the reason (the module
family's reject-with-reason contract); truncated payloads raise rather
than silently yielding short bodies.
"""

from __future__ import annotations

import gzip
import io
import zlib
from dataclasses import dataclass

CRLF = b"\r\n"

# fixed deterministic capture date for synthesized corpora (no wall
# clock anywhere in the engine — resume/replay must be byte-stable)
FIXED_WARC_DATE = "2026-01-01T00:00:00Z"


@dataclass
class WarcRecord:
    rec_type: str  # warcinfo | response | request | resource | metadata
    url: str  # WARC-Target-URI ('' when absent, e.g. warcinfo)
    date: str  # WARC-Date ('' when absent)
    record_id: str  # WARC-Record-ID ('' when absent)
    content_type: str  # the record's Content-Type header
    http_status: int  # response records: HTTP status; else -1
    http_content_type: str  # response records: payload Content-Type
    body: bytes  # response: HTTP body; others: raw record payload


def _record_bytes(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"WARC/1.0" + CRLF
    lines = [
        f"{k}: {v}".encode("utf-8") for k, v in headers
    ] + [f"Content-Length: {len(payload)}".encode("ascii")]
    return head + CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF


def _gzip_member(data: bytes) -> bytes:
    buf = io.BytesIO()
    # mtime=0: gzip stamps the current time by default, which would make
    # the same logical corpus hash differently on every build
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(data)
    return buf.getvalue()


def http_response(
    body: bytes, content_type: str = "text/html; charset=utf-8",
    status: int = 200, reason: str = "OK",
) -> bytes:
    """Assemble the HTTP response message a 'response' record carries."""
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii")
    return head + body


def build_warc(
    pages: list[tuple[str, bytes]],
    compress: bool = True,
    warcinfo: str = "software: granulate-char-ocr-spark",
) -> bytes:
    """(url, html_bytes) pages -> one WARC file (leading warcinfo record,
    then one response record per page; per-record gzip members when
    ``compress``). Deterministic for fixed input order."""
    records = [
        _record_bytes(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Date", FIXED_WARC_DATE),
                ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
                ("Content-Type", "application/warc-fields"),
            ],
            (warcinfo + "\r\n").encode("utf-8"),
        )
    ]
    for i, (url, html) in enumerate(pages):
        payload = http_response(html)
        records.append(
            _record_bytes(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Target-URI", url),
                    ("WARC-Date", FIXED_WARC_DATE),
                    # deterministic id: record ordinal within the file
                    ("WARC-Record-ID", f"<urn:uuid:{i + 1:032x}>"),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                payload,
            )
        )
    if not compress:
        return b"".join(records)
    return b"".join(_gzip_member(r) for r in records)


def _split_gzip_members(data: bytes) -> list[bytes]:
    """Decompress a concatenated-member gzip stream member by member
    (the Common Crawl record framing). memoryview keeps the per-member
    tail slice O(1) — with plain bytes a 100k-record file re-copies the
    whole remaining buffer per member, going quadratic."""
    out = []
    view = memoryview(data)
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(view[pos:]))
        except zlib.error as e:
            raise ValueError(f"WARC: corrupt gzip member: {e}") from None
        if not d.eof:
            raise ValueError("WARC: truncated gzip member")
        pos = len(data) - len(d.unused_data)
    return out


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(CRLF):
        if not line:
            continue
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("ascii")] = v.strip().decode(
            "utf-8", "replace"
        )
    return headers


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked Transfer-Encoding framing: hex-size line,
    chunk bytes, CRLF, …, terminated by a zero-size chunk (trailers
    ignored). Real crawl captures carry this routinely."""
    out = []
    pos = 0
    while True:
        eol = body.find(CRLF, pos)
        if eol < 0:
            raise ValueError("WARC: truncated chunked body (no size line)")
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            raise ValueError(
                f"WARC: bad chunk size {size_token!r}"
            ) from None
        if size == 0:
            return b"".join(out)
        start = eol + 2
        if start + size + 2 > len(body):
            raise ValueError("WARC: truncated chunk payload")
        out.append(body[start:start + size])
        if body[start + size:start + size + 2] != CRLF:
            raise ValueError("WARC: chunk not CRLF-terminated")
        pos = start + size + 2


def _parse_http(payload: bytes) -> tuple[int, str, bytes]:
    sep = payload.find(CRLF + CRLF)
    if sep < 0:
        raise ValueError("WARC: HTTP payload without header terminator")
    head, body = payload[:sep], payload[sep + 4:]
    lines = head.split(CRLF)
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError("WARC: malformed HTTP status line")
    status = int(parts[1])
    headers = _parse_headers(CRLF.join(lines[1:]))
    ct = headers.get("content-type", "")
    if "chunked" in headers.get("transfer-encoding", "").lower():
        return status, ct, _dechunk(body)
    # honor HTTP Content-Length when present (trailing junk is a
    # malformed-capture reality; over-long/negative declared lengths
    # raise — a negative slice would silently CORRUPT the body)
    cl = headers.get("content-length")
    if cl is not None:
        n = int(cl)
        if n < 0 or n > len(body):
            raise ValueError(
                "WARC: HTTP Content-Length outside body bounds"
            )
        body = body[:n]
    return status, ct, body


def parse_warc(data: bytes) -> list[WarcRecord]:
    """One WARC file (per-record-gzip, whole-file-gzip, or plain) ->
    its records, in file order."""
    if data[:2] == b"\x1f\x8b":
        stream = b"".join(_split_gzip_members(data))
    else:
        stream = data
    records: list[WarcRecord] = []
    pos = 0
    n = len(stream)
    while pos < n:
        # tolerate inter-record padding CRLFs
        while stream[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        if not stream.startswith(b"WARC/", pos):
            raise ValueError(f"WARC: expected version line at offset {pos}")
        ver_end = stream.find(CRLF, pos)
        if ver_end < 0:
            raise ValueError("WARC: truncated version line")
        ver = stream[pos:ver_end].decode("ascii")
        if ver not in ("WARC/1.0", "WARC/1.1"):
            raise ValueError(f"WARC: unsupported version {ver!r}")
        hdr_end = stream.find(CRLF + CRLF, ver_end)
        if hdr_end < 0:
            raise ValueError("WARC: truncated record header block")
        headers = _parse_headers(stream[ver_end + 2:hdr_end])
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC: record missing Content-Length") from None
        if length < 0:
            # a negative length would step the cursor BACKWARD and
            # re-parse the same record forever
            raise ValueError("WARC: negative record Content-Length")
        body_start = hdr_end + 4
        if body_start + length > n:
            raise ValueError("WARC: truncated record payload")
        payload = stream[body_start:body_start + length]
        pos = body_start + length
        rec_type = headers.get("warc-type", "")
        ct = headers.get("content-type", "")
        status, http_ct, body = -1, "", payload
        if rec_type == "response" and ct.startswith("application/http"):
            status, http_ct, body = _parse_http(payload)
        records.append(
            WarcRecord(
                rec_type=rec_type,
                url=headers.get("warc-target-uri", ""),
                date=headers.get("warc-date", ""),
                record_id=headers.get("warc-record-id", ""),
                content_type=ct,
                http_status=status,
                http_content_type=http_ct,
                body=body,
            )
        )
    return records
