"""ZIP container + DOCX (WordprocessingML) text extraction — the
office-document leg of main-content extraction.

ZIP per PKWARE APPNOTE.TXT (the published format spec): scan the
end-of-central-directory record backwards (variable-length trailing
comment), walk the central directory for names/methods/offsets, slice
each member past its local header, and inflate raw-deflate members with
zlib (stored members slice directly). CRC32 is verified on read — a
corrupt member yields an error, not silent garbage.

DOCX per ECMA-376: a DOCX is a ZIP whose ``word/document.xml`` holds
the text as ``<w:t>`` runs inside ``<w:p>`` paragraphs. Extraction is
the same regex-cascade discipline as functions/html.py: drop deleted
(``<w:delText>``) runs, keep ``<w:t>`` contents, map ``<w:tab/>`` to a
tab and ``<w:br/>``/paragraph ends to newlines, then decode the XML
entities. No XML DOM — WordprocessingML from real generators is
machine-written and regular, and the flatten-not-parse approach is what
keeps this executor-side cheap.

Malformed input yields ``None`` (same contract as mp3/mp4/h264).
"""

from __future__ import annotations

import re
import struct
import zlib

_EOCD_SIG = b"PK\x05\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"
_EOCD64_SIG = b"PK\x06\x06"
_CEN_SIG = b"PK\x01\x02"
_LOC_SIG = b"PK\x03\x04"
_MAX_COMMENT = 1 << 16


def zip_entries(data: bytes) -> list[tuple[str, int]] | None:
    """[(name, uncompressed_size)] from the central directory, or None
    if no EOCD record is found."""
    cd = _central_directory(data)
    if cd is None:
        return None
    return [(name, usize) for name, _, _, usize, _, _ in cd]


def _central_directory(data: bytes):
    tail_start = max(0, len(data) - _MAX_COMMENT - 22)
    eocd = data.rfind(_EOCD_SIG, tail_start)
    if eocd < 0 or eocd + 22 > len(data):
        return None
    _, n_entries, _cd_size, cd_off = struct.unpack_from("<HHII", data, eocd + 8)
    # ZIP64 (APPNOTE §4.3.14-15): saturated EOCD fields redirect through
    # the EOCD64 locator (fixed 20 bytes immediately before the EOCD) to
    # the EOCD64 record, whose 8-byte counts are authoritative. Archives
    # >4 GiB or >65 535 members are routine at crawl-bundle scale.
    if n_entries == 0xFFFF or cd_off == 0xFFFFFFFF or _cd_size == 0xFFFFFFFF:
        loc = eocd - 20
        if loc < 0 or data[loc : loc + 4] != _EOCD64_LOC_SIG:
            return None
        (rec_off,) = struct.unpack_from("<Q", data, loc + 8)
        if rec_off + 56 > len(data) or data[rec_off : rec_off + 4] != _EOCD64_SIG:
            return None
        n_entries, _cd_size, cd_off = struct.unpack_from("<QQQ", data, rec_off + 32)
    out = []
    pos = cd_off
    for _ in range(n_entries):
        if pos + 46 > len(data) or data[pos : pos + 4] != _CEN_SIG:
            return None
        (method, crc, csize, usize, nlen, elen, clen) = struct.unpack_from(
            "<H4xIIIHHH", data, pos + 10
        )
        (loc_off,) = struct.unpack_from("<I", data, pos + 42)
        name = data[pos + 46 : pos + 46 + nlen].decode("utf-8", "replace")
        if 0xFFFFFFFF in (usize, csize, loc_off):
            usize, csize, loc_off = _zip64_extra(
                data[pos + 46 + nlen : pos + 46 + nlen + elen],
                usize, csize, loc_off,
            )
            if loc_off is None:
                return None
        out.append((name, method, csize, usize, crc, loc_off))
        pos += 46 + nlen + elen + clen
    return out


def _zip64_extra(extra: bytes, usize: int, csize: int, loc_off: int):
    """Resolve 0xFFFFFFFF-saturated central-directory fields from the
    ZIP64 extended-information extra field (header id 0x0001). Fields
    appear in fixed order — usize, csize, loc_off — but ONLY the
    saturated ones are present (APPNOTE §4.5.3)."""
    pos = 0
    while pos + 4 <= len(extra):
        hid, hlen = struct.unpack_from("<HH", extra, pos)
        body = extra[pos + 4 : pos + 4 + hlen]
        if hid == 0x0001:
            need = 8 * ((usize == 0xFFFFFFFF) + (csize == 0xFFFFFFFF)
                        + (loc_off == 0xFFFFFFFF))
            if len(body) < need:
                return None, None, None
            off = 0
            if usize == 0xFFFFFFFF:
                (usize,) = struct.unpack_from("<Q", body, off)
                off += 8
            if csize == 0xFFFFFFFF:
                (csize,) = struct.unpack_from("<Q", body, off)
                off += 8
            if loc_off == 0xFFFFFFFF:
                (loc_off,) = struct.unpack_from("<Q", body, off)
            return usize, csize, loc_off
        pos += 4 + hlen
    return None, None, None


def zip_read(data: bytes, member: str) -> bytes | None:
    """One member's decompressed bytes; None if absent/corrupt."""
    cd = _central_directory(data)
    if cd is None:
        return None
    for name, method, csize, usize, crc, loc_off in cd:
        if name != member:
            continue
        if loc_off + 30 > len(data) or data[loc_off : loc_off + 4] != _LOC_SIG:
            return None
        # streamed writers (flag bit 3) zero the LOCAL sizes; the central
        # directory sizes parsed above are authoritative either way
        nlen, elen = struct.unpack_from("<HH", data, loc_off + 26)
        start = loc_off + 30 + nlen + elen
        raw = data[start : start + csize]
        try:
            if method == 0:
                out = raw[:usize]
            elif method == 8:
                out = zlib.decompressobj(-15).decompress(raw, usize)
            else:
                return None  # unsupported compression method
        except zlib.error:
            return None
        if len(out) != usize or zlib.crc32(out) & 0xFFFFFFFF != crc:
            return None
        return out
    return None


# --- DOCX text --------------------------------------------------------------

_DEL_RE = re.compile(rb"<w:delText\b.*?</w:delText>", re.S)
_T_RE = re.compile(rb"<w:t(?:\s[^>]*)?>(.*?)</w:t>|<w:tab\s*/>|<w:br\s*/>|</w:p>", re.S)

# the four predefined XML 1.0 §4.6 entities minus &amp;, which decodes
# LAST (same contract as functions/html.py) so escaped entities such as
# "&amp;lt;" yield the literal "&lt;" — never a double decode
_ENTITIES_PRE = {
    b"&lt;": b"<", b"&gt;": b">",
    b"&quot;": b'"', b"&apos;": b"'",
}


def _decode_entities(raw: bytes) -> str:
    for k, v in _ENTITIES_PRE.items():
        raw = raw.replace(k, v)
    text = raw.decode("utf-8", "replace")

    def _chr(m: re.Match) -> str:
        g = m.group(1)
        cp = int(g[1:], 16) if g[0] in "xX" else int(g)
        # out-of-range references (\"&#x110000;\") pass through verbatim
        # instead of raising mid-operator
        return chr(cp) if cp <= 0x10FFFF else m.group(0)

    # numeric references run before &amp; so "&amp;#65;" stays the
    # literal "&#65;" rather than decoding to "A"
    text = re.sub(r"&#(x[0-9a-fA-F]+|\d+);", _chr, text)
    return text.replace("&amp;", "&")


def docx_text(data: bytes) -> str | None:
    """Paragraph-joined document text, or None if not a DOCX."""
    xml = zip_read(data, "word/document.xml")
    if xml is None:
        return None
    xml = _DEL_RE.sub(b"", xml)
    parts: list[str] = []
    for m in _T_RE.finditer(xml):
        tok = m.group(0)
        if tok.startswith(b"<w:t") and not tok.startswith(b"<w:tab"):
            parts.append(_decode_entities(m.group(1)))
        elif tok.startswith(b"<w:tab"):
            parts.append("\t")
        else:  # <w:br/> or </w:p>
            parts.append("\n")
    text = "".join(parts)
    # trailing paragraph breaks collapse; internal structure is kept
    return re.sub(r"\n{3,}", "\n\n", text).strip("\n")


# --- fixture-builder twin ----------------------------------------------------


def zip_build(members: dict[str, bytes], compress: bool = True) -> bytes:
    """Spec-valid ZIP writer (the test twin of the reader)."""
    blobs, central = [], []
    offset = 0
    for name, payload in members.items():
        nb = name.encode("utf-8")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        if compress:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = c.compress(payload) + c.flush()
            method = 8
        else:
            raw, method = payload, 0
        # flag bit 11 (EFS) declares the name UTF-8 — without it other
        # readers (stdlib zipfile included) decode names as cp437
        # (caught by the stdlib cross-validation, test_stdlib_interop)
        flags = 0x0800
        loc = (
            _LOC_SIG
            + struct.pack(
                "<HHHHHIIIHH", 20, flags, method, 0, 0, crc, len(raw),
                len(payload), len(nb), 0,
            )
            + nb + raw
        )
        central.append(
            _CEN_SIG
            + struct.pack(
                "<HHHHHHIIIHHHHHII", 20, 20, flags, method, 0, 0, crc,
                len(raw), len(payload), len(nb), 0, 0, 0, 0, 0, offset,
            )
            + nb
        )
        blobs.append(loc)
        offset += len(loc)
    cd = b"".join(central)
    eocd = _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, len(members), len(members), len(cd), offset, 0
    )
    return b"".join(blobs) + cd + eocd


def docx_build(paragraphs: list[str]) -> bytes:
    """Minimal ECMA-376 DOCX (document.xml + [Content_Types].xml)."""
    body = "".join(
        "<w:p><w:r><w:t xml:space=\"preserve\">"
        + p.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        + "</w:t></w:r></w:p>"
        for p in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>' + body
        + "</w:body></w:document>"
    ).encode("utf-8")
    types = (
        b'<?xml version="1.0"?><Types xmlns="http://schemas.openxml'
        b'formats.org/package/2006/content-types"/>'
    )
    return zip_build(
        {"[Content_Types].xml": types, "word/document.xml": doc}
    )


# --- XLSX / ODT (same ZIP reader, sibling XML dialects) ----------------------

_SI_RE = re.compile(rb"<si>(.*?)</si>", re.S)
_XT_RE = re.compile(rb"<t(?:\s[^>]*)?>(.*?)</t>", re.S)
_ROW_RE = re.compile(rb"<row[ >].*?</row>", re.S)
# cells first (self-closing or spanned), THEN fields within each cell —
# a one-shot alternation could backtrack an empty cell's .*? across the
# </c> boundary and swallow its neighbor
_CELL_RE = re.compile(rb"<c\b[^>]*/>|<c\b[^>]*>.*?</c>", re.S)
_CTYPE_RE = re.compile(rb'\bt="(\w+)"')
_V_RE = re.compile(rb"<v>(.*?)</v>", re.S)
_IS_RE = re.compile(rb"<is>(.*?)</is>", re.S)


def xlsx_rows(data: bytes, sheet: int = 1) -> list[list[str]] | None:
    """Row-major cell texts of one worksheet (SpreadsheetML, ECMA-376):
    shared strings resolved, inline strings flattened, other cell types
    (numbers, formula results) read from <v> verbatim. None if the blob
    is not an XLSX with that sheet."""
    xml = zip_read(data, f"xl/worksheets/sheet{sheet}.xml")
    if xml is None:
        return None
    shared: list[str] = []
    ss = zip_read(data, "xl/sharedStrings.xml")
    if ss is not None:
        for si in _SI_RE.finditer(ss):
            shared.append(
                "".join(_decode_entities(t.group(1))
                        for t in _XT_RE.finditer(si.group(1)))
            )
    rows = []
    for rm in _ROW_RE.finditer(xml):
        row = []
        for cm in _CELL_RE.finditer(rm.group(0)):
            cell = cm.group(0)
            head = cell.split(b">", 1)[0]
            tm = _CTYPE_RE.search(head)
            ctype = tm.group(1) if tm else None
            im = _IS_RE.search(cell)
            vm = _V_RE.search(cell)
            if im is not None:
                row.append("".join(_decode_entities(t.group(1))
                                   for t in _XT_RE.finditer(im.group(1))))
            elif vm is None:
                row.append("")
            elif ctype == b"s":
                try:
                    row.append(shared[int(vm.group(1))])
                except (ValueError, IndexError):
                    row.append("")
            else:
                row.append(_decode_entities(vm.group(1)))
        rows.append(row)
    return rows


_ODT_P_RE = re.compile(rb"<text:[ph]\b[^>]*>(.*?)</text:[ph]>", re.S)
_ODT_TAG_RE = re.compile(rb"<[^>]+>")


def odt_text(data: bytes) -> str | None:
    """Paragraph/heading text of an OpenDocument text file (ODF
    content.xml): inline markup flattened, entities decoded."""
    xml = zip_read(data, "content.xml")
    if xml is None:
        return None
    parts = []
    for m in _ODT_P_RE.finditer(xml):
        inner = m.group(1).replace(b"<text:tab/>", b"\t").replace(
            b"<text:line-break/>", b"\n"
        )
        parts.append(_decode_entities(_ODT_TAG_RE.sub(b"", inner)))
    return "\n".join(p for p in parts if p.strip())
