"""Pure-stdlib/NumPy WAV (RIFF) codec.

The audio leg of the multimodal column family previously accepted only
engine-native raw int16 PCM buffers; real corpora carry containers. This
implements the PCM slice of the format uncompressed corpora actually
use — RIFF/WAVE with a ``fmt `` chunk of format 1 (integer PCM, 8-bit
unsigned / 16-bit signed / 24-bit signed / 32-bit signed), format 3
(IEEE float32/64), the ITU-T G.711 telephony compandings A-law (6)
and u-law (7), or mono IMA/DVI ADPCM (0x11), any channel count — decoded to int16 mono (channel
mean) plus the container's sample rate. Compressed audio (MP3/AAC)
remains honestly out of scope in-sandbox (no codec library).

Spec: Microsoft/IBM "Multimedia Programming Interface and Data
Specifications 1.0" (the RIFF/WAVE chunk layout); unknown chunks are
skipped by their declared size, and a truncated data chunk raises.
"""

from __future__ import annotations

import struct

import numpy as np


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """(ulaw_decode, alaw_decode) int16 LUTs for all 256 codes, built
    from the ITU-T G.711 reference expansion formulas (the classic Sun
    reference implementation's arithmetic)."""
    u = np.arange(256, dtype=np.int32)
    cu = (~u) & 0xFF
    t = (((cu & 0x0F) << 3) + 0x84) << ((cu & 0x70) >> 4)
    ulaw = np.where(cu & 0x80, 0x84 - t, t - 0x84)
    a = np.arange(256, dtype=np.int32) ^ 0x55
    seg = (a & 0x70) >> 4
    base = (a & 0x0F) << 4
    mag = np.where(
        seg == 0,
        base + 8,
        np.where(
            seg == 1,
            base + 0x108,
            (base + 0x108) << np.maximum(seg - 1, 0),
        ),
    )
    alaw = np.where(a & 0x80, mag, -mag)
    return ulaw.astype(np.int16), alaw.astype(np.int16)


_ULAW_DEC, _ALAW_DEC = _g711_tables()


def _g711_encode(samples: np.ndarray, dec: np.ndarray) -> bytes:
    """Nearest-decoded-value companding: exact inverse of the LUT on its
    own outputs, monotone on everything else (sidesteps the historical
    off-by-one variants of the segment-search encoders)."""
    order = np.argsort(dec, kind="stable")
    sorted_vals = dec[order].astype(np.int32)
    x = np.clip(samples.astype(np.int32), -32768, 32767).reshape(-1)
    idx = np.searchsorted(sorted_vals, x)
    idx = np.clip(idx, 1, len(sorted_vals) - 1)
    left, right = sorted_vals[idx - 1], sorted_vals[idx]
    pick = np.where(np.abs(x - left) <= np.abs(right - x), idx - 1, idx)
    return order[pick].astype(np.uint8).tobytes()


# IMA/DVI ADPCM (WAV format 0x11): 4-bit adaptive delta coding with the
# canonical 89-entry step table and 8-entry index adaptation table
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_step(pred, index, nib):
    """One decoder update, vectorized over blocks: the per-sample loop
    runs only block-length times regardless of audio duration."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    diff = diff + np.where(nib & 1, step >> 2, 0)
    diff = diff + np.where(nib & 2, step >> 1, 0)
    diff = diff + np.where(nib & 4, step, 0)
    pred = np.clip(pred + np.where(nib & 8, -diff, diff), -32768, 32767)
    index = np.clip(index + _IMA_INDEX[nib & 7], 0, 88)
    return pred, index


def _ima_decode(raw: bytes, block_align: int) -> np.ndarray:
    """Mono IMA ADPCM data -> int16 samples. A partial final block
    (real writers produce one) decodes its true sample count:
    (tail_bytes - 4) * 2 + 1."""
    if block_align < 5:
        raise ValueError("WAV: IMA ADPCM block too small")
    spb = (block_align - 4) * 2 + 1
    nblocks, tail = divmod(len(raw), block_align)
    n_samples = nblocks * spb
    if tail > 4:
        n_samples += (tail - 4) * 2 + 1
    elif tail:
        raise ValueError("WAV: truncated IMA ADPCM block header")
    if n_samples == 0:
        raise ValueError("WAV: empty IMA ADPCM data")
    if tail:  # zero-pad the partial block; output is trimmed below
        raw = raw + bytes(block_align - tail)
        nblocks += 1
    blocks = np.frombuffer(raw, dtype=np.uint8).reshape(
        nblocks, block_align
    )
    pred = (
        blocks[:, :2].copy().view("<i2")[:, 0].astype(np.int32)
    )
    index = np.clip(blocks[:, 2].astype(np.int32), 0, 88)
    nib_bytes = blocks[:, 4:]
    nibs = np.empty((nblocks, nib_bytes.shape[1] * 2), dtype=np.int32)
    nibs[:, 0::2] = nib_bytes & 0x0F  # low nibble first (spec order)
    nibs[:, 1::2] = nib_bytes >> 4
    out = np.empty((nblocks, 1 + nibs.shape[1]), dtype=np.int16)
    out[:, 0] = pred
    for j in range(nibs.shape[1]):
        pred, index = _ima_step(pred, index, nibs[:, j])
        out[:, j + 1] = pred
    return out.reshape(-1)[:n_samples]


def _ima_encode(samples: np.ndarray, block_align: int = 1024) -> bytes:
    """int16 mono -> IMA ADPCM blocks (standard quantize-then-track-the-
    decoder loop, vectorized over blocks)."""
    spb = (block_align - 4) * 2 + 1  # samples per block incl. header
    x = samples.astype(np.int32).reshape(-1)
    if len(x) == 0:
        raise ValueError("encode_wav: empty ADPCM input")
    pad = (-len(x)) % spb
    x = np.concatenate([x, np.full(pad, x[-1], dtype=np.int32)])
    nblocks = len(x) // spb
    # each block independently covers spb consecutive samples: the
    # header carries the first one verbatim, nibbles code the rest
    starts = np.arange(nblocks) * spb
    pred = x[starts]
    # per-block initial index from the first delta (recorded in the
    # header, so any conformant decoder tracks): avoids the slow
    # step-table attack a cold index-0 start pays on loud signals
    first_delta = np.abs(
        x[np.minimum(starts + 1, len(x) - 1)] - pred
    )
    index = np.clip(
        np.searchsorted(_IMA_STEPS, first_delta), 0, 88
    ).astype(np.int32)
    index0 = index.copy()
    nibs = np.empty((nblocks, spb - 1), dtype=np.uint8)
    for j in range(spb - 1):
        s = x[starts + 1 + j]
        step = _IMA_STEPS[index]
        diff = s - pred
        sign = diff < 0
        mag = np.abs(diff)
        b4 = mag >= step
        mag = mag - np.where(b4, step, 0)
        b2 = mag >= step >> 1
        mag = mag - np.where(b2, step >> 1, 0)
        b1 = mag >= step >> 2
        nib = (
            sign.astype(np.int32) * 8
            + b4.astype(np.int32) * 4
            + b2.astype(np.int32) * 2
            + b1.astype(np.int32)
        )
        nibs[:, j] = nib
        pred, index = _ima_step(pred, index, nib)
    out = np.zeros((nblocks, block_align), dtype=np.uint8)
    out[:, :2] = (
        x[starts].astype("<i2")[:, None].view(np.uint8)
    )
    out[:, 2] = index0.astype(np.uint8)
    out[:, 4:] = nibs[:, 0::2] | (nibs[:, 1::2] << 4)
    return out.tobytes()


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16,
    codec: str = "pcm",
) -> bytes:
    """int16 (n,) mono or (n, ch) multi-channel samples -> WAV bytes.
    ``bits`` 8 (unsigned PCM), 16 (signed PCM) or 32 (IEEE float);
    ``codec`` 'pcm' (default), the G.711 telephony compandings
    'ulaw' / 'alaw' (format 7 / 6, 8-bit), or mono IMA/DVI ADPCM
    'ima' (format 0x11, 4-bit blocks)."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    fact = b""
    if codec == "ulaw":
        fmt, bits = 7, 8
        data = _g711_encode(samples, _ULAW_DEC)
        block = ch
        byte_rate = sample_rate * block
    elif codec == "alaw":
        fmt, bits = 6, 8
        data = _g711_encode(samples, _ALAW_DEC)
        block = ch
        byte_rate = sample_rate * block
    elif codec == "ima":
        if ch != 1:
            raise ValueError("encode_wav: IMA ADPCM is mono-only here")
        fmt, bits = 0x11, 4
        block = 1024  # ADPCM block size, not ch*bits/8
        data = _ima_encode(samples[:, 0], block)
        byte_rate = sample_rate * block // ((block - 4) * 2 + 1)
        # fact chunk: true sample count (blocks pad to a multiple)
        fact = b"fact" + struct.pack("<II", 4, n)
    elif codec != "pcm":
        raise ValueError("encode_wav: codec must be pcm/ulaw/alaw/ima")
    elif bits == 16:
        fmt, data = 1, samples.astype("<i2").tobytes()
        block = ch * bits // 8
        byte_rate = sample_rate * block
    elif bits == 8:
        fmt = 1
        data = ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
        block = ch * bits // 8
        byte_rate = sample_rate * block
    elif bits == 32:
        fmt = 3
        data = (samples.astype(np.float64) / 32768.0).astype("<f4").tobytes()
        block = ch * bits // 8
        byte_rate = sample_rate * block
    else:
        raise ValueError("encode_wav: bits must be 8, 16 or 32")
    fmt_chunk = struct.pack(
        "<HHIIHH", fmt, ch, sample_rate, byte_rate, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 mono samples, sample_rate). Multi-channel input
    downmixes by channel mean; 8/24/32-bit and float samples rescale to
    the int16 range."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("WAV: bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    raw = None
    n_fact = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("WAV: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif tag == b"fact" and size >= 4:
            (n_fact,) = struct.unpack("<I", payload[:4])
        elif tag == b"data":
            if len(payload) < size:
                raise ValueError("WAV: truncated data chunk")
            raw = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_format, ch, rate, _byte_rate, _block, bits = fmt
    if ch < 1:
        raise ValueError("WAV: zero channels")
    if rate < 1:
        raise ValueError("WAV: invalid sample rate")
    sample_bytes = bits // 8
    if sample_bytes and len(raw) % sample_bytes:
        # tolerate a trailing partial sample (truncated writes) instead of
        # surfacing a bare numpy reshape error
        raw = raw[: len(raw) - len(raw) % sample_bytes]
    if audio_format == 1 and bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif audio_format == 1 and bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) * 256.0
    elif audio_format == 1 and bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64) / 256.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 65536.0
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(raw, dtype="<f4").astype(np.float64) * 32768.0
    elif audio_format == 3 and bits == 64:
        x = np.frombuffer(raw, dtype="<f8").astype(np.float64) * 32768.0
    elif audio_format == 6 and bits == 8:  # G.711 A-law (telephony)
        x = _ALAW_DEC[np.frombuffer(raw, dtype=np.uint8)].astype(np.float64)
    elif audio_format == 7 and bits == 8:  # G.711 mu-law (telephony)
        x = _ULAW_DEC[np.frombuffer(raw, dtype=np.uint8)].astype(np.float64)
    elif audio_format == 0x11 and bits == 4:  # IMA/DVI ADPCM
        if ch != 1:
            raise ValueError("WAV: multi-channel IMA ADPCM unsupported")
        mono = _ima_decode(raw, _block)
        if n_fact is not None:  # fact chunk: true pre-padding length
            mono = mono[:n_fact]
        return mono, int(rate)
    else:
        raise ValueError(
            f"WAV: unsupported (format={audio_format}, bits={bits}) — "
            "PCM 8/16/24/32, IEEE float32/64, G.711 u-law/A-law and mono "
            "IMA ADPCM only (MP3/AAC need a codec library)"
        )
    n = len(x) - len(x) % ch
    mono = x[:n].reshape(-1, ch).mean(axis=1)
    return np.clip(np.round(mono), -32768, 32767).astype(np.int16), int(rate)


def wav_info(data: bytes):
    """Header-only probe: (codec_tag, sample_rate, channels, duration_s)
    from the fmt/fact/data chunk headers — no sample decode (the
    media_stream_info routing pass). None if not RIFF/WAVE."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_size = None
    n_fact = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"fmt " and size >= 16:
            fmt = struct.unpack("<HHIIHH", data[pos + 8 : pos + 24])
        elif tag == b"fact" and size >= 4:
            (n_fact,) = struct.unpack("<I", data[pos + 8 : pos + 12])
        elif tag == b"data":
            data_size = min(size, max(0, len(data) - pos - 8))
        pos += 8 + size + (size & 1)
    if fmt is None:
        return None
    codec_tag, channels, rate, _bps, block_align, bits = fmt
    duration = None
    if n_fact is not None and rate:
        duration = n_fact / rate  # compressed codecs: fact is exact
    elif data_size is not None and rate and channels and bits:
        duration = data_size / (rate * channels * max(bits, 1) / 8)
    return codec_tag, rate, channels, duration
