"""EXIF metadata — the camera/capture fields a media-curation pipeline
stores next to image payloads (orientation for correct decode, capture
time for temporal dedup/sampling, make/model for device stratification,
GPS for geo-filtering and PII scrubbing).

EXIF (CIPA DC-008) is a TIFF-format IFD tree embedded in a JPEG APP1
segment behind the ``Exif\\0\\0`` signature: IFD0 carries the camera
fields, tag 0x8769 points at the Exif sub-IFD (capture parameters) and
tag 0x8825 at the GPS IFD. This module walks that tree directly —
functions/tiff.py's IFD loop is image-strip-specific (it skips ASCII
and RATIONAL types, which are exactly the types metadata lives in), so
the tag reader here is its metadata-typed sibling, same structure
handling (II/MM endianness, inline-vs-offset values).

``build_exif_jpeg`` is the test direction: it splices a hand-built
APP1 into a JPEG from functions/jpeg.py so round-trip tests own both
sides. Parsing never raises on malformed input — a curation pass over
a billion crawled images treats bad EXIF as absent EXIF (fields come
back None), not as a task failure.

The reference repo has no EXIF leg (its corpus is synthetic pixel
buffers); this module comes from the builder's web-tier brief
(multimodal columns with typed metadata).
"""

from __future__ import annotations

import struct

EXIF_SIG = b"Exif\x00\x00"

# IFD0 / Exif-IFD / GPS-IFD tags we surface
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_TAG_EXPOSURE = 0x829A
_TAG_FNUMBER = 0x829D
_TAG_ISO = 0x8827
_TAG_DT_ORIGINAL = 0x9003
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _read_ifd(data: bytes, end: str, off: int) -> dict[int, tuple[int, bytes]]:
    """One IFD at ``off`` -> {tag: (type, raw value bytes)}. Bounds are
    checked everywhere; anything malformed just ends the walk."""
    out: dict[int, tuple[int, bytes]] = {}
    if off + 2 > len(data):
        return out
    (n,) = struct.unpack(end + "H", data[off : off + 2])
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(data):
            break
        tag, typ, count = struct.unpack(end + "HHI", data[e : e + 8])
        size = _TYPE_SIZE.get(typ, 0) * count
        if size == 0 or size > len(data):
            continue
        if size <= 4:
            raw = data[e + 8 : e + 8 + size]
        else:
            (voff,) = struct.unpack(end + "I", data[e + 8 : e + 12])
            if voff + size > len(data):
                continue
            raw = data[voff : voff + size]
        out[tag] = (typ, raw)
    return out


def _ascii(v: tuple[int, bytes] | None) -> str | None:
    if v is None or v[0] != 2:
        return None
    s = v[1].split(b"\x00", 1)[0].decode("ascii", "replace").strip()
    return s or None


def _short(v: tuple[int, bytes] | None, end: str) -> int | None:
    if v is None or v[0] not in (3, 4) or not v[1]:
        return None
    fmt = "H" if v[0] == 3 else "I"
    return struct.unpack(end + fmt, v[1][: struct.calcsize(fmt)])[0]


def _rational(v: tuple[int, bytes] | None, end: str, idx: int = 0) -> float | None:
    if v is None or v[0] not in (5, 10) or len(v[1]) < 8 * (idx + 1):
        return None
    fmt = "II" if v[0] == 5 else "ii"
    num, den = struct.unpack(end + fmt, v[1][8 * idx : 8 * idx + 8])
    return num / den if den else None


def _gps_degrees(
    v: tuple[int, bytes] | None, ref: str | None, end: str
) -> float | None:
    """GPS DMS rational triple + N/S/E/W ref -> signed decimal degrees."""
    if v is None or ref is None:
        return None
    d, m, s = (_rational(v, end, i) for i in range(3))
    if d is None or m is None or s is None:
        return None
    deg = d + m / 60.0 + s / 3600.0
    return -deg if ref in ("S", "W") else deg


def parse_exif(app1: bytes) -> dict:
    """APP1 payload (or raw TIFF-format EXIF block) -> the surfaced
    field dict; every field None when absent/malformed."""
    fields = {
        "make": None,
        "model": None,
        "orientation": None,
        "datetime": None,
        "datetime_original": None,
        "exposure_time": None,
        "f_number": None,
        "iso": None,
        "gps_lat": None,
        "gps_lon": None,
    }
    if app1.startswith(EXIF_SIG):
        app1 = app1[len(EXIF_SIG) :]
    if len(app1) < 8 or app1[:2] not in (b"II", b"MM"):
        return fields
    end = "<" if app1[:2] == b"II" else ">"
    (magic,) = struct.unpack(end + "H", app1[2:4])
    if magic != 42:
        return fields
    (ifd0_off,) = struct.unpack(end + "I", app1[4:8])
    ifd0 = _read_ifd(app1, end, ifd0_off)
    fields["make"] = _ascii(ifd0.get(_TAG_MAKE))
    fields["model"] = _ascii(ifd0.get(_TAG_MODEL))
    fields["orientation"] = _short(ifd0.get(_TAG_ORIENTATION), end)
    fields["datetime"] = _ascii(ifd0.get(_TAG_DATETIME))
    exif_off = _short(ifd0.get(_TAG_EXIF_IFD), end)
    if exif_off is not None:
        sub = _read_ifd(app1, end, exif_off)
        fields["datetime_original"] = _ascii(sub.get(_TAG_DT_ORIGINAL))
        fields["exposure_time"] = _rational(sub.get(_TAG_EXPOSURE), end)
        fields["f_number"] = _rational(sub.get(_TAG_FNUMBER), end)
        fields["iso"] = _short(sub.get(_TAG_ISO), end)
    gps_off = _short(ifd0.get(_TAG_GPS_IFD), end)
    if gps_off is not None:
        gps = _read_ifd(app1, end, gps_off)
        fields["gps_lat"] = _gps_degrees(
            gps.get(_GPS_LAT), _ascii(gps.get(_GPS_LAT_REF)), end
        )
        fields["gps_lon"] = _gps_degrees(
            gps.get(_GPS_LON), _ascii(gps.get(_GPS_LON_REF)), end
        )
    return fields


def exif_from_jpeg(jpeg: bytes) -> dict:
    """Scan a JPEG's marker segments for the Exif APP1 and parse it;
    all-None fields when no EXIF is present or the file is malformed."""
    i = 2 if jpeg[:2] == b"\xff\xd8" else 0
    n = len(jpeg)
    while i + 4 <= n:
        if jpeg[i] != 0xFF:
            break
        # legal 0xFF fill bytes may precede any marker (T.81 B.1.1.2) —
        # skip them or the next byte is read as a bogus marker and the
        # APP1 is silently missed (review finding r4)
        while i + 4 <= n and jpeg[i + 1] == 0xFF:
            i += 1
        if i + 4 > n:
            break
        marker = jpeg[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA or marker == 0xD9:
            break  # scan data / EOI: no more headers
        (seglen,) = struct.unpack(">H", jpeg[i + 2 : i + 4])
        if seglen < 2 or i + 2 + seglen > n:
            break
        if marker == 0xE1 and jpeg[i + 4 : i + 10] == EXIF_SIG:
            return parse_exif(jpeg[i + 4 : i + 2 + seglen])
        i += 2 + seglen
    return parse_exif(b"")  # the all-None dict


# --- test direction: build an EXIF APP1 and splice it into a JPEG --------


def _rat(num: int, den: int) -> bytes:
    return struct.pack("<II", num, den)


def build_exif(
    make: str = "ExampleCorp",
    model: str = "Cam 9",
    orientation: int = 6,
    datetime: str = "2024:03:01 10:20:30",
    exposure: tuple[int, int] = (1, 250),
    f_number: tuple[int, int] = (28, 10),
    iso: int = 200,
    gps: tuple[float, float] | None = (48.8584, 2.2945),
) -> bytes:
    """A deterministic little-endian EXIF APP1 payload (with signature)
    carrying the surfaced fields — the fixture generator for tests."""
    mk = make.encode() + b"\x00"
    md = model.encode() + b"\x00"
    dt = datetime.encode() + b"\x00"

    # layout: header(8) IFD0 [exif ifd] [gps ifd] value area
    # compute IFD0 with placeholder offsets first to learn sizes
    def sizes(n_entries: int) -> int:
        return 2 + 12 * n_entries + 4

    ifd0_n = 6 if gps is not None else 5
    exif_n = 4
    gps_n = 4 if gps is not None else 0
    ifd0_off = 8
    exif_off = ifd0_off + sizes(ifd0_n)
    gps_off = exif_off + sizes(exif_n)
    val_base = gps_off + (sizes(gps_n) if gps else 0)

    extra: list[bytes] = []

    def val(v: bytes) -> bytes:
        """Return inline bytes or an offset into the value area."""
        if len(v) <= 4:
            return v
        off = val_base + sum(len(x) for x in extra)
        extra.append(v)
        return struct.pack("<I", off)

    def ifd(entries: list[tuple[int, int, int, bytes]]) -> bytes:
        out = struct.pack("<H", len(entries))
        for tag, typ, count, v in sorted(entries):
            out += struct.pack("<HHI", tag, typ, count) + val(v).ljust(
                4, b"\x00"
            )
        return out + struct.pack("<I", 0)

    ifd0_entries = [
        (_TAG_MAKE, 2, len(mk), mk),
        (_TAG_MODEL, 2, len(md), md),
        (_TAG_ORIENTATION, 3, 1, struct.pack("<H", orientation)),
        (_TAG_DATETIME, 2, len(dt), dt),
        (_TAG_EXIF_IFD, 4, 1, struct.pack("<I", exif_off)),
    ]
    if gps is not None:
        ifd0_entries.append((_TAG_GPS_IFD, 4, 1, struct.pack("<I", gps_off)))
    exif_entries = [
        (_TAG_EXPOSURE, 5, 1, _rat(*exposure)),
        (_TAG_FNUMBER, 5, 1, _rat(*f_number)),
        (_TAG_ISO, 3, 1, struct.pack("<H", iso)),
        (_TAG_DT_ORIGINAL, 2, len(dt), dt),
    ]
    blocks = [ifd(ifd0_entries), ifd(exif_entries)]
    if gps is not None:
        lat, lon = gps

        def dms(deg: float) -> bytes:
            a = abs(deg)
            d = int(a)
            m = int((a - d) * 60)
            s = round(((a - d) * 60 - m) * 60 * 10000)
            return _rat(d, 1) + _rat(m, 1) + _rat(s, 10000)

        gps_entries = [
            (_GPS_LAT_REF, 2, 2, (b"N" if lat >= 0 else b"S") + b"\x00"),
            (_GPS_LAT, 5, 3, dms(lat)),
            (_GPS_LON_REF, 2, 2, (b"E" if lon >= 0 else b"W") + b"\x00"),
            (_GPS_LON, 5, 3, dms(lon)),
        ]
        blocks.append(ifd(gps_entries))
    tiff = (
        b"II" + struct.pack("<H", 42) + struct.pack("<I", ifd0_off)
        + b"".join(blocks)
        + b"".join(extra)
    )
    return EXIF_SIG + tiff


def splice_exif_into_jpeg(jpeg: bytes, exif_payload: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (the standard position)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    seg = b"\xff\xe1" + struct.pack(">H", len(exif_payload) + 2) + exif_payload
    return jpeg[:2] + seg + jpeg[2:]
