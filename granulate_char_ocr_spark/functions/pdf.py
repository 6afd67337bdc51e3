r"""Minimal PDF text layer — the "PDF/layout parse" leg of the north rule.

Writes and reads the text-bearing core of ISO 32000 (PDF 1.4 subset): a
one-page document whose Flate-compressed content stream shows text with
BT/ET + Tf/Td/Tj operators, plus a classic xref table so third-party
readers open the output. The extractor walks every stream object,
inflates FlateDecode streams, and collects Tj/TJ/' strings in operator
order (one emitted line per text-positioning group), decoding literal-
string escapes (\\, \(, \), \n, \r, \t, octal) and both string
encodings the spec defines (UTF-16BE with BOM, else PDFDocEncoding ~
Latin-1). Encrypted PDFs, object streams (1.5 xref streams) and
non-Flate filters are rejected with the reason; PDFs whose text layer is
scanned IMAGES are the OCR pipeline's job, not this parser's.
"""

from __future__ import annotations

import re
import zlib

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _encode_pdf_string(s: str) -> bytes:
    """Text -> PDF literal string bytes: UTF-16BE+BOM when needed, else
    Latin-1; (, ) and \\ escaped."""
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError:
        raw = b"\xfe\xff" + s.encode("utf-16-be")
    out = bytearray(b"(")
    for byte in raw:
        if byte in (0x28, 0x29, 0x5C):  # ( ) backslash
            out += b"\\"
        out.append(byte)
    out += b")"
    return bytes(out)


def _decode_pdf_string(raw: bytes) -> str:
    """PDF literal-string body (between parens, escapes intact) -> text."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        b = raw[i]
        if b != 0x5C:  # backslash
            out.append(b)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        c = raw[i : i + 1]
        if c in _ESCAPES:
            out += _ESCAPES[c]
            i += 1
        elif c.isdigit():  # octal, up to 3 digits
            j = i
            while j < n and j - i < 3 and chr(raw[j]).isdigit():
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif c in (b"\n", b"\r"):  # line continuation
            i += 1
        else:
            out += c
            i += 1
    data = bytes(out)
    if data[:2] == b"\xfe\xff":
        return data[2:].decode("utf-16-be", errors="replace")
    return data.decode("latin-1")


def encode_pdf(lines: list[str]) -> bytes:
    """Text lines -> a minimal single-page PDF with a Flate content
    stream (Helvetica 12pt, one Td-positioned Tj per line)."""
    ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"0 -14 Td")
        ops.append(_encode_pdf_string(line) + b" Tj")
    ops.append(b"ET")
    content = zlib.compress(b"\n".join(ops))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(content)
        + content
        + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_off)
    )
    return bytes(out)


_STREAM_RE = re.compile(
    rb"<<(?P<dict>.*?)>>\s*stream\r?\n(?P<body>.*?)endstream", re.S
)
# text-showing operators inside a content stream: (string) Tj / ' or a
# TJ array mixing strings and kerning numbers
_TJ_RE = re.compile(rb"\((?P<s>(?:[^()\\]|\\.)*)\)\s*(?:Tj|')|\]\s*TJ")
_TJ_ARRAY_RE = re.compile(rb"\[(?P<a>(?:[^\]\\]|\\.)*)\]\s*TJ", re.S)
_STR_RE = re.compile(rb"\((?P<s>(?:[^()\\]|\\.)*)\)", re.S)


def decode_pdf_text(data: bytes) -> str:
    """PDF bytes -> extracted text, one line per text-positioning group,
    content streams in document order."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("PDF: bad header")
    if b"/Encrypt" in data:
        raise ValueError("PDF: encrypted documents unsupported")
    lines: list[str] = []
    found_stream = False
    for m in _STREAM_RE.finditer(data):
        d, body = m.group("dict"), m.group("body")
        # honor /Length (the last one belongs to this stream object) —
        # blind newline-trimming corrupts compressed data whose final
        # byte happens to be \r (then \r\n looks like an EOL to strip)
        lengths = re.findall(rb"/Length\s+(\d+)", d)
        if lengths and int(lengths[-1]) <= len(body):
            body = body[: int(lengths[-1])]
        elif body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith(b"\n"):
            body = body[:-1]
        if b"/FlateDecode" in d:
            try:
                body = zlib.decompress(body)
            except zlib.error as e:
                raise ValueError(f"PDF: bad Flate stream ({e})") from None
        elif re.search(rb"/Filter\b", d):
            raise ValueError("PDF: only FlateDecode streams supported")
        if b"BT" not in body:
            continue
        found_stream = True
        # split on text-positioning ops so each visual line groups
        for seg in re.split(rb"(?:T\*|-?[\d.]+\s+-?[\d.]+\s+Td)", body):
            parts: list[str] = []
            for arr in _TJ_ARRAY_RE.finditer(seg):
                for s in _STR_RE.finditer(arr.group("a")):
                    parts.append(_decode_pdf_string(s.group("s")))
            seg_wo_arrays = _TJ_ARRAY_RE.sub(b"", seg)
            for tj in _TJ_RE.finditer(seg_wo_arrays):
                if tj.group("s") is not None:
                    parts.append(_decode_pdf_string(tj.group("s")))
            if parts:
                lines.append("".join(parts))
    if not found_stream:
        raise ValueError("PDF: no text content stream found")
    return "\n".join(lines)
