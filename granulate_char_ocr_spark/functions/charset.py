"""Charset sniffing + decode for crawled HTML bodies — real captures
are NOT all UTF-8; the WHATWG encoding-sniffing ladder (abridged to
its deterministic core) picks the decoder:

1. byte-order mark (UTF-8 / UTF-16 LE / UTF-16 BE);
2. ``charset=`` parameter of the HTTP Content-Type header;
3. ``<meta charset>`` / ``<meta http-equiv=Content-Type>`` inside the
   first 1024 bytes (the WHATWG prescan window);
4. strict UTF-8 attempt;
5. windows-1252 fallback (the web's de-facto latin superset — every
   byte maps, so decode NEVER fails; WHATWG maps the 'latin-1' and
   'ascii' labels here too).

Only stdlib codecs are used; unknown labels fall through to the next
rung rather than raising (a wrong label is a page-author bug the
pipeline must absorb)."""

from __future__ import annotations

import codecs
import re

# labels the sniffer honors → Python codec names. WHATWG aliases
# iso-8859-1/us-ascii to windows-1252 (bytes 0x80-0x9F are used as
# cp1252 punctuation on the real web regardless of the label).
_CODECS = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "iso-8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
}

_CT_CHARSET = re.compile(rb"charset\s*=\s*\"?([A-Za-z0-9_.:-]+)", re.I)
_META_CHARSET = re.compile(
    rb"<meta\s[^>]*charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.I
)


def _lookup(label: bytes | str | None) -> str | None:
    if not label:
        return None
    if isinstance(label, bytes):
        label = label.decode("ascii", "replace")
    return _CODECS.get(label.strip().lower())


def sniff_charset(body: bytes, content_type: str = "") -> str:
    """body (+ HTTP Content-Type) -> codec name, never None."""
    if body[:3] == codecs.BOM_UTF8:
        return "utf-8"
    if body[:2] == codecs.BOM_UTF16_LE:
        return "utf-16-le"
    if body[:2] == codecs.BOM_UTF16_BE:
        return "utf-16-be"
    m = _CT_CHARSET.search(content_type.encode("ascii", "replace"))
    enc = _lookup(m.group(1)) if m else None
    if enc:
        return enc
    m = _META_CHARSET.search(body[:1024])
    enc = _lookup(m.group(1)) if m else None
    if enc:
        return enc
    try:
        body.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def decode_body(body: bytes, content_type: str = "") -> str:
    """Charset-sniffed decode; the BOM itself never reaches the text.
    errors='replace' on the labeled path: a page whose label lies about
    a few bytes should yield U+FFFD there, not kill the partition."""
    enc = sniff_charset(body, content_type)
    if enc == "utf-8" and body[:3] == codecs.BOM_UTF8:
        body = body[3:]
    elif enc in ("utf-16-le", "utf-16-be") and body[:2] in (
        codecs.BOM_UTF16_LE,
        codecs.BOM_UTF16_BE,
    ):
        body = body[2:]
    return body.decode(enc, "replace")
