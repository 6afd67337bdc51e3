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
        if raw[:2] == b"\xfe\xff":
            # would collide with the UTF-16BE BOM on decode — force the
            # unambiguous encoding (review finding)
            raw = b"\xfe\xff" + s.encode("utf-16-be")
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
        elif b"0" <= c <= b"7":  # octal, up to 3 OCTAL digits (not 8/9)
            j = i
            while j < n and j - i < 3 and 0x30 <= raw[j] <= 0x37:
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


# a dict immediately followed by the stream keyword: lazy body bound only
# as a FALLBACK — /Length (below) slices from the keyword position instead
_STREAM_RE = re.compile(
    rb"<<(?P<dict>.*?)>>\s*stream\r?\n(?P<body>.*?)endstream", re.S
)
_DELIMS = b"()<>[]{}/%"
_WHITESPACE = b"\x00\t\n\x0c\r "


def _tokenize_content(body: bytes):
    """Content-stream tokens in order: ('str', raw-escaped-bytes) for
    literal strings (escape-aware, balanced unescaped parens per the
    spec), ('op', token) for everything else. Comments skipped."""
    tokens = []
    i, n = 0, len(body)
    while i < n:
        b = body[i]
        if b in _WHITESPACE:
            i += 1
            continue
        if b == 0x25:  # % comment to end of line
            while i < n and body[i] not in (0x0A, 0x0D):
                i += 1
            continue
        if b == 0x28:  # ( literal string: track escapes + paren depth
            i += 1
            start = i
            depth = 1
            while i < n and depth:
                c = body[i]
                if c == 0x5C:
                    i += 2
                    continue
                if c == 0x28:
                    depth += 1
                elif c == 0x29:
                    depth -= 1
                i += 1
            tokens.append(("str", body[start : i - 1]))
            continue
        # operator / number / name / bracket token
        start = i
        if b in _DELIMS:
            i += 1
            if b in (0x3C, 0x3E) and i < n and body[i] == b:  # << >>
                i += 1
        else:
            while (
                i < n
                and body[i] not in _WHITESPACE
                and body[i] not in _DELIMS
            ):
                i += 1
        tokens.append(("op", body[start:i]))
    return tokens


def _extract_lines(body: bytes, lines: list[str]) -> None:
    """Walk one content stream's tokens: strings shown by Tj / ' / " / TJ
    accumulate into the current line; Td/TD/T* start a new one."""
    parts: list[str] = []
    strings: list[bytes] = []  # operand stack of pending strings
    for kind, tok in _tokenize_content(body):
        if kind == "str":
            strings.append(tok)
            continue
        if tok in (b"Tj", b"'", b'"'):
            if strings:
                parts.append(_decode_pdf_string(strings[-1]))
            strings = []
        elif tok == b"TJ":  # array form: all pending strings, in order
            parts.extend(_decode_pdf_string(s) for s in strings)
            strings = []
        elif tok in (b"Td", b"TD", b"T*", b"BT"):
            if parts:
                lines.append("".join(parts))
            parts = []
            strings = []
        elif tok == b"ET":
            strings = []
    if parts:
        lines.append("".join(parts))


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
        d = m.group("dict")
        # honor a DIRECT /Length (not an indirect 'n 0 R' reference),
        # slicing from the stream-keyword position in the file — both
        # blind newline-trimming (a body whose last byte is CR) and the
        # lazy endstream bound (compressed bytes containing 'endstream')
        # corrupt the body otherwise
        # (?![0-9]) anchors the digit run: without it, '/Length 12 0 R'
        # backtracks (\d+) to '1' so the indirect-ref lookahead sees
        # '2 0 R' and wrongly passes (ADVICE r3)
        lm = re.search(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)", d)
        if lm:
            start = m.start("body")
            body = data[start : start + int(lm.group(1))]
        else:
            body = m.group("body")
            if body.endswith(b"\r\n"):
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
        _extract_lines(body, lines)
    if not found_stream:
        raise ValueError("PDF: no text content stream found")
    return "\n".join(lines)
