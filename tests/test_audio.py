"""Log-mel audio front-end (functions/audio.py) + the mm_audio_features
gate chain (VERDICT r3 item 6)."""

import numpy as np
import pytest

from granulate_char_ocr_spark.functions.audio import (
    FRAME,
    mel_features,
    mel_filterbank,
)


def test_filterbank_shape_and_coverage():
    fb = mel_filterbank(16, FRAME, 8000.0)
    assert fb.shape == (16, FRAME // 2 + 1)
    # triangles tile the spectrum: every filter has mass, none negative
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()


def test_tone_lands_in_the_right_band():
    sr = 8000.0
    t = np.arange(int(sr)) / sr
    fb = mel_filterbank(16, FRAME, sr)
    freqs = np.fft.rfftfreq(FRAME, d=1.0 / sr)
    for tone in (300.0, 1000.0, 3000.0):
        x = np.sin(2 * np.pi * tone * t) * 10000
        feats = mel_features(x, sr)
        band = int(np.argmax(feats))
        # the argmax band's filter must cover the tone's FFT bin
        bin_idx = int(np.argmin(np.abs(freqs - tone)))
        assert fb[band, bin_idx] > 0, (tone, band)


def test_short_clip_pads_to_one_frame():
    feats = mel_features(np.ones(10), 8000.0)
    assert feats.shape == (16,)
    assert np.isfinite(feats).all()


def test_gate_query_matches_golden(spark):
    """The Spark chain (executor-rendered WAV store → sniff → mel UDF →
    left-fold sum) reproduces the Python-twin golden exactly."""
    import duckdb

    from granulate_char_ocr_spark import driver_queries

    got = {
        r["media_ref"]: (r["duration_sec"], r["mel_sum"])
        for r in driver_queries.QUERIES["mm_audio_features"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    want = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(
            driver_queries.ORACLES["mm_audio_features"]
        ).fetchall()
    }
    assert got == want  # bit-identical doubles, no tolerance


def test_g711_companding():
    """ITU-T G.711 u-law/A-law (WAV formats 7/6): LUTs match the spec's
    landmark values, every code round-trips through the nearest-value
    encoder, and a companded sine keeps textbook SNR (~37 dB)."""
    from granulate_char_ocr_spark.functions.wav import (
        _ALAW_DEC,
        _ULAW_DEC,
        _g711_encode,
        decode_wav,
        encode_wav,
    )

    assert _ULAW_DEC[0xFF] == 0 and _ULAW_DEC[0x7F] == 0
    assert _ULAW_DEC.max() == 32124 and _ULAW_DEC.min() == -32124
    assert _ALAW_DEC.max() == 32256 and _ALAW_DEC.min() == -32256
    assert _ALAW_DEC[0x55] == -8 and _ALAW_DEC[0xD5] == 8
    for dec in (_ULAW_DEC, _ALAW_DEC):
        codes = np.frombuffer(
            _g711_encode(dec.astype(np.int16), dec), np.uint8
        )
        assert np.array_equal(dec[codes], dec)
    t = np.arange(8000)
    sine = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    for codec in ("ulaw", "alaw"):
        out, rate = decode_wav(encode_wav(sine, 8000, codec=codec))
        assert rate == 8000 and len(out) == len(sine)
        err = (out.astype(np.float64) - sine) ** 2
        snr = 10 * np.log10(
            (sine.astype(np.float64) ** 2).mean() / err.mean()
        )
        assert snr > 30


def test_ima_adpcm_roundtrip():
    """IMA/DVI ADPCM (WAV format 0x11): 4:1 compression with ~30 dB SNR
    on a full-scale sine; per-block warm-start index recorded in the
    header keeps attack error bounded on short inputs."""
    from granulate_char_ocr_spark.functions.wav import decode_wav, encode_wav

    t = np.arange(16000)
    sine = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    data = encode_wav(sine, 8000, codec="ima")
    assert len(data) < 2 * len(sine) // 3  # genuinely compressed
    out, rate = decode_wav(data)
    assert rate == 8000 and len(out) >= len(sine)
    err = (out[: len(sine)].astype(np.float64) - sine) ** 2
    snr = 10 * np.log10((sine.astype(np.float64) ** 2).mean() / err.mean())
    assert snr > 25
    short = sine[:100]
    out2, _ = decode_wav(encode_wav(short, 8000, codec="ima"))
    assert np.abs(out2[:100].astype(np.float64) - short).max() < 2000
    with pytest.raises(ValueError, match="mono"):
        encode_wav(np.zeros((10, 2), np.int16), 8000, codec="ima")


def test_audio_features_g711_container(spark):
    """G.711 and ADPCM WAVs flow through the audio featurizer end to
    end via the container sniff — real duration and finite features."""
    import pandas as pd

    from granulate_char_ocr_spark.functions.wav import encode_wav
    from granulate_char_ocr_spark.operators.multimodal import audio_features

    t = np.arange(8000)
    sine = (np.sin(2 * np.pi * 440 * t / 8000) * 18000).astype(np.int16)
    pdf = pd.DataFrame(
        {
            "media_ref": ["u", "a", "i"],
            "codec": ["auto"] * 3,
            "sample_rate": [0] * 3,
            "payload": [
                encode_wav(sine, 8000, codec="ulaw"),
                encode_wav(sine, 8000, codec="alaw"),
                encode_wav(sine, 8000, codec="ima"),
            ],
        }
    )
    df = spark.createDataFrame(
        pdf,
        "media_ref string, codec string, sample_rate int, payload binary",
    )
    rows = {r["media_ref"]: r for r in audio_features(df).collect()}
    assert set(rows) == {"u", "a", "i"}
    for r in rows.values():
        assert 0.9 < r["duration_sec"] < 1.1  # ~1 s (ADPCM pads blocks)
        assert len(r["features"]) == 16
        assert all(np.isfinite(v) for v in r["features"])


def test_ima_adpcm_fact_and_partial_blocks():
    """Review fixes: the writer records the true sample count in a fact
    chunk (decode returns exactly the input length, so short clips keep
    real durations), and a foreign partial final block decodes its
    (tail-4)*2+1 samples instead of being dropped or rejected."""
    from granulate_char_ocr_spark.functions.wav import (
        _ima_decode,
        _ima_encode,
        decode_wav,
        encode_wav,
    )

    short = (np.sin(np.arange(100) / 5.0) * 15000).astype(np.int16)
    out, rate = decode_wav(encode_wav(short, 8000, codec="ima"))
    assert len(out) == 100  # fact chunk trims block padding
    # foreign file: raw blocks with a partial tail (no fact chunk)
    full = _ima_encode(np.zeros(4082, np.int16), 1024)  # two blocks
    assert len(full) == 2048
    tail = full[:1024] + full[1024 : 1024 + 14]  # 1 block + 10 nibble bytes
    got = _ima_decode(tail, 1024)
    assert len(got) == 2041 + (14 - 4) * 2 + 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated"):
        _ima_decode(full[:1026], 1024)  # mid-header tail


# --- energy-VAD segmentation ------------------------------------------------


def test_activity_segments_tone_between_silences():
    import numpy as np

    from granulate_char_ocr_spark.functions.audio import activity_segments

    sr = 8000
    t = np.arange(int(0.5 * sr))
    x = np.concatenate(
        [
            np.zeros(int(0.3 * sr)),
            np.sin(2 * np.pi * 440 * t / sr) * 10000,
            np.zeros(int(0.4 * sr)),
        ]
    )
    segs = activity_segments(x, sr)
    assert [a for _, _, a in segs] == [False, True, False]
    assert abs(segs[1][0] - 0.3) < 0.05 and abs(segs[1][1] - 0.8) < 0.05


def test_activity_segments_click_suppressed_and_silence():
    import numpy as np

    from granulate_char_ocr_spark.functions.audio import activity_segments

    sr = 8000
    # a 5 ms click inside silence must not open a segment (hangover)
    click = np.concatenate(
        [np.zeros(sr), np.ones(40) * 9000, np.zeros(sr)]
    )
    assert all(not a for _, _, a in activity_segments(click, sr))
    # pure silence: one inactive segment; empty clip: none
    assert [a for _, _, a in activity_segments(np.zeros(sr), sr)] == [False]
    assert activity_segments(np.zeros(0), sr) == []


def test_audio_segments_operator_wav_and_raw(spark):
    import numpy as np

    from granulate_char_ocr_spark.functions.wav import encode_wav
    from granulate_char_ocr_spark.operators import multimodal

    sr = 8000
    t = np.arange(int(0.4 * sr))
    voiced = (np.sin(2 * np.pi * 330 * t / sr) * 9000).astype(np.int16)
    pcm = np.concatenate(
        [np.zeros(int(0.3 * sr), np.int16), voiced]
    )
    wav = encode_wav(pcm, sr)
    df = spark.createDataFrame(
        [
            ("w", "audio", "auto", 0, 0, 0, 0, bytearray(wav)),
            ("r", "audio", "raw", 0, 0, 0, sr, pcm.tobytes()),
        ],
        schema=multimodal.MULTIMODAL_SCHEMA,
    )
    rows = multimodal.audio_segments(df).collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r)
    for ref in ("w", "r"):
        segs = sorted(by_ref[ref], key=lambda r: r.seg_index)
        assert [s.active for s in segs] == [False, True]
        assert abs(segs[1].start_sec - 0.3) < 0.05


def test_activity_segments_partition_whole_clip():
    # segments are disjoint and sum to the clip duration (review r4:
    # the tail beyond the last full frame was previously uncovered)
    import numpy as np

    from granulate_char_ocr_spark.functions.audio import activity_segments

    sr = 8000
    t = np.arange(int(0.5 * sr))
    x = np.concatenate(
        [
            np.zeros(int(0.3 * sr)),
            np.sin(2 * np.pi * 440 * t / sr) * 10000,
            np.zeros(1000),  # odd tail, not a whole frame
        ]
    )
    segs = activity_segments(x, sr)
    total = sum(e - s for s, e, _ in segs)
    assert abs(total - len(x) / sr) < 1e-9
    for (s1, e1, _), (s2, e2, _) in zip(segs, segs[1:]):
        assert abs(e1 - s2) < 1e-9  # disjoint, gapless


def test_activity_segments_linear_on_pathological_noise():
    # near-threshold alternating noise must smooth in linear time
    # (review r4: the flip-and-rescan loop was quadratic)
    import time

    import numpy as np

    from granulate_char_ocr_spark.functions.audio import activity_segments

    sr = 16000
    rng = np.random.RandomState(3)
    x = rng.randn(sr * 60) * 3000  # 1 minute of noise
    t0 = time.perf_counter()
    segs = activity_segments(x, sr)
    assert time.perf_counter() - t0 < 5.0
    assert sum(e - s for s, e, _ in segs) == len(x) / sr
