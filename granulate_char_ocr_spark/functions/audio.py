"""Real audio features in pure NumPy (VERDICT r3 item 6): framed STFT →
power spectrum → mel-filterbank band energies → log compression.

No DSP library needed — the mel scale is a formula (O'Shaughnessy 1987:
mel(f) = 2595·log10(1 + f/700)) and the filterbank is triangular
weights over FFT bins; np.fft.rfft does the rest. This replaces the
earlier block-RMS stand-in: the output is a real log-mel band-energy
vector, the standard front-end of speech/audio models.

Deterministic: same samples + rate + geometry → bit-identical float32
vector (the Spark pandas UDF and the golden-parquet twin both call
THIS function — twin-equality oracle, the mm_image_embeddings model).
"""

from __future__ import annotations

import numpy as np

FRAME = 512
HOP = 256
N_MELS = 16


def _hann(n: int) -> np.ndarray:
    # periodic Hann (the STFT convention), explicit formula for parity
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def mel_filterbank(
    n_mels: int, n_fft: int, rate: float
) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filters, mel-spaced 0..rate/2."""
    def mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def invmel(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    pts = invmel(np.linspace(0.0, float(mel(rate / 2.0)), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / rate).astype(np.int64)
    fb = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, ctr, hi = bins[m], bins[m + 1], bins[m + 2]
        for k in range(lo, ctr):
            if ctr > lo:
                fb[m, k] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fb[m, k] = (hi - k) / (hi - ctr)
    return fb


def mel_features(
    samples: np.ndarray,
    rate: float,
    n_mels: int = N_MELS,
    frame: int = FRAME,
    hop: int = HOP,
) -> np.ndarray:
    """mono float samples -> float32 (n_mels,) log-mel band energies,
    time-averaged over frames. Short clips are zero-padded to one frame."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * _hann(frame)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n_frames, bins)
    fb = mel_filterbank(n_mels, frame, rate)
    band = power @ fb.T  # (n_frames, n_mels)
    return np.log1p(band.mean(axis=0)).astype(np.float32)


def activity_segments(
    samples: np.ndarray,
    rate: float,
    frame: int = FRAME,
    hop: int = HOP,
    threshold_db: float = -35.0,
    min_ms: float = 100.0,
) -> list[tuple[float, float, bool]]:
    """Energy VAD: mono samples -> [(start_sec, end_sec, active), …]
    partitioning the whole clip (hop-aligned boundaries, the last
    segment extended to the clip end — segments are disjoint and their
    durations sum to the clip length). A frame is active when its RMS
    is within ``threshold_db`` of the clip's peak frame (relative
    threshold — no absolute level assumption). Hangover smoothing is
    the standard two-pass morphology, each pass LINEAR in the frame
    count (review finding r4: the earlier flip-and-rescan loop was
    quadratic on near-threshold noise): first drop active runs shorter
    than ``min_ms`` (clicks don't open segments), then fill interior
    inactive gaps shorter than ``min_ms`` (breaths don't close them).
    Deterministic, pure NumPy, no model."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) == 0:
        return []
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    rms = np.sqrt((x[idx] ** 2).mean(axis=1))
    peak = rms.max()
    if peak <= 0:
        active = np.zeros(n_frames, dtype=bool)
    else:
        with np.errstate(divide="ignore"):
            db = 20.0 * np.log10(rms / peak)
        active = db > threshold_db
    min_frames = max(1, int(round(min_ms / 1000.0 * rate / hop)))
    # pass 1: drop short ACTIVE runs
    for s, e, a in _runs(active):
        if a and e - s < min_frames:
            active[s:e] = False
    # pass 2: fill short INTERIOR inactive gaps (leading/trailing
    # silence is real silence, not a gap between speech)
    runs = _runs(active)
    for i, (s, e, a) in enumerate(runs):
        if not a and e - s < min_frames and 0 < i < len(runs) - 1:
            active[s:e] = True
    # hop-aligned disjoint boundaries; final segment takes the tail
    # (frames overlap by frame-hop samples — attributing each boundary
    # to the hop grid keeps segments disjoint and exhaustive)
    runs = _runs(active)
    out = []
    for i, (s, e, a) in enumerate(runs):
        start = s * hop / rate
        end = (
            len(samples) / rate
            if i == len(runs) - 1
            else e * hop / rate
        )
        out.append((start, end, bool(a)))
    return out


def _runs(mask: np.ndarray) -> list[tuple[int, int, bool]]:
    """[(start, end, value), …] run-length segments of a bool array."""
    out = []
    s = 0
    for i in range(1, len(mask) + 1):
        if i == len(mask) or mask[i] != mask[s]:
            out.append((s, i, bool(mask[s])))
            s = i
    return out
