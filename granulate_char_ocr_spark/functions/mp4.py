"""MP4 / ISO-BMFF container metadata (ISO/IEC 14496-12 box walk +
14496-15 avcC) — the container most web video actually ships in.

Same no-decode posture as functions/mp3.py and h264.py: walk the box
tree for brand, timescale-exact duration, per-track handler/codec
fourcc, visual geometry and audio rate/channels; when the video track
is AVC, the avcC record's embedded SPS is handed to
functions/h264.parse_sps for the cropped coded size (the container's
tkhd width is a 16.16 *presentation* hint and can disagree with the
coded size — both are reported). Malformed input yields None, never an
exception.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

# recursion is bounded by the fixed _find() paths (max 4 levels), so no
# depth guard is needed; iter_boxes never recurses on its own


@dataclass
class Mp4Info:
    brand: str
    duration_s: float | None
    n_tracks: int
    video_codec: str | None  # stsd fourcc, e.g. 'avc1'
    width: int | None  # coded (SPS) when AVC, else tkhd presentation
    height: int | None
    profile_level: str | None  # from avcC/SPS when AVC
    audio_codec: str | None  # e.g. 'mp4a'
    audio_sample_rate: int | None
    audio_channels: int | None


def iter_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end) for sibling boxes."""
    if end is None:
        end = len(data)
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos  # box runs to end of file
        if size < hdr or pos + size > end:
            return  # corrupt length: stop cleanly
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, path: list[bytes], start: int, end: int):
    """First box at a nested path; (payload_start, payload_end) or None."""
    head, rest = path[0], path[1:]
    for btype, s, e in iter_boxes(data, start, end):
        if btype == head:
            return (s, e) if not rest else _find(data, rest, s, e)
    return None


def _mvhd_duration(data: bytes, s: int, e: int) -> float | None:
    version = data[s]
    if version == 1 and s + 32 <= e:
        timescale = struct.unpack_from(">I", data, s + 20)[0]
        duration = struct.unpack_from(">Q", data, s + 24)[0]
    elif version == 0 and s + 24 <= e:
        timescale = struct.unpack_from(">I", data, s + 12)[0]
        duration = struct.unpack_from(">I", data, s + 16)[0]
    else:
        return None
    return duration / timescale if timescale else None


def _tkhd_geometry(data: bytes, s: int, e: int):
    """(width, height) from the 16.16 presentation size at the end of
    tkhd (v0: 84-byte body, v1: 96)."""
    version = data[s]
    off = s + (88 if version == 1 else 76)
    if off + 8 > e:
        return None
    w = struct.unpack_from(">I", data, off)[0] >> 16
    h = struct.unpack_from(">I", data, off + 4)[0] >> 16
    return (w, h) if w and h else None


def _parse_avcc(data: bytes, s: int, e: int):
    """avcC (14496-15 §5.3.3.1): profile/level + the first SPS, parsed
    with the Annex-B SPS reader for exact cropped geometry."""
    from granulate_char_ocr_spark.functions.h264 import parse_sps

    if s + 6 > e or data[s] != 1:
        return None
    n_sps = data[s + 5] & 0x1F
    pos = s + 6
    for _ in range(n_sps):
        if pos + 2 > e:
            return None
        ln = struct.unpack_from(">H", data, pos)[0]
        pos += 2
        if pos + ln > e:
            return None
        sps = parse_sps(data[pos : pos + ln])
        if sps is not None:
            return sps
        pos += ln
    return None


def _parse_stsd_entry(data: bytes, s: int, e: int, handler: bytes):
    """First sample-description entry: (fourcc, details dict)."""
    if s + 8 > e:
        return None
    n = struct.unpack_from(">I", data, s + 4)[0]
    if n < 1:
        return None
    for fourcc, es, ee in iter_boxes(data, s + 8, e):
        name = fourcc.decode("latin-1")
        if handler == b"vide":
            det = {}
            if es + 78 <= ee:
                det["width"] = struct.unpack_from(">H", data, es + 24)[0]
                det["height"] = struct.unpack_from(">H", data, es + 26)[0]
                # extension boxes (avcC, pasp, ...) follow the 78-byte
                # VisualSampleEntry body
                for bt, bs, be in iter_boxes(data, es + 78, ee):
                    if bt == b"avcC":
                        sps = _parse_avcc(data, bs, be)
                        if sps:
                            det["sps"] = sps
            return name, det
        if handler == b"soun":
            det = {}
            if es + 28 <= ee:
                det["channels"] = struct.unpack_from(">H", data, es + 16)[0]
                det["sample_rate"] = (
                    struct.unpack_from(">I", data, es + 24)[0] >> 16
                )
            return name, det
        return name, {}
    return None


def parse_mp4(data: bytes) -> Mp4Info | None:
    """None unless the payload leads with a well-formed ftyp box."""
    try:
        first = next(iter_boxes(data), None)
        if first is None or first[0] != b"ftyp" or first[2] - first[1] < 4:
            return None
        brand = data[first[1] : first[1] + 4].decode("latin-1")
        moov = _find(data, [b"moov"], 0, len(data))
        if moov is None:
            return Mp4Info(brand, None, 0, None, None, None, None, None,
                           None, None)
        duration = None
        mvhd = _find(data, [b"mvhd"], *moov)
        if mvhd:
            duration = _mvhd_duration(data, *mvhd)
        n_tracks = 0
        video = audio = None  # (fourcc, det)
        tkhd_geo = None
        for btype, s, e in iter_boxes(data, *moov):
            if btype != b"trak":
                continue
            n_tracks += 1
            hdlr = _find(data, [b"mdia", b"hdlr"], s, e)
            if hdlr is None or hdlr[0] + 12 > hdlr[1]:
                continue
            handler = data[hdlr[0] + 8 : hdlr[0] + 12]
            stsd = _find(data, [b"mdia", b"minf", b"stbl", b"stsd"], s, e)
            if stsd is None:
                continue
            entry = _parse_stsd_entry(data, *stsd, handler)
            if entry is None:
                continue
            if handler == b"vide" and video is None:
                video = entry
                tkhd = _find(data, [b"tkhd"], s, e)
                if tkhd:
                    tkhd_geo = _tkhd_geometry(data, *tkhd)
            elif handler == b"soun" and audio is None:
                audio = entry
        width = height = profile_level = None
        if video:
            det = video[1]
            sps = det.get("sps")
            if sps:
                width, height = sps["width"], sps["height"]
                profile_level = (
                    f"{sps['profile_idc']}@{sps['level_idc'] / 10:.1f}"
                )
            elif det.get("width"):
                width, height = det["width"], det["height"]
            elif tkhd_geo:
                width, height = tkhd_geo
        return Mp4Info(
            brand=brand,
            duration_s=round(duration, 6) if duration is not None else None,
            n_tracks=n_tracks,
            video_codec=video[0] if video else None,
            width=width,
            height=height,
            profile_level=profile_level,
            audio_codec=audio[0] if audio else None,
            audio_sample_rate=(audio[1].get("sample_rate") if audio else None),
            audio_channels=(audio[1].get("channels") if audio else None),
        )
    except (struct.error, IndexError, ValueError, RecursionError):
        return None


def box(btype: bytes, payload: bytes) -> bytes:
    """Test-fixture builder twin of iter_boxes."""
    return struct.pack(">I", 8 + len(payload)) + btype + payload
