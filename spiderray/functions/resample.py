"""Windowed-sinc (Kaiser) sample-rate conversion — the production-quality
resampler behind the audio transform stage.

Textbook polyphase-equivalent design (public DSP: Smith's "Digital Audio
Resampling", CCRMA; Oppenheim & Schafer ch. 4): each output sample at
fractional input time ``t_j = j·sr_in/sr_out`` is a windowed-sinc
interpolation of the neighbouring input samples; when DOWN-sampling the
sinc is stretched by the rate ratio so its cutoff lands at the OUTPUT
Nyquist — that stretch is the anti-aliasing filter linear interpolation
lacks (a 10 kHz tone resampled 44.1k→16k must vanish, not fold to 6 kHz;
tested in tests/test_resample.py).

Pure numpy, fully vectorized: output samples are computed in blocks with a
(block × taps) gather + one matmul-shaped weighted sum — no Python loop
over samples.  Deterministic (no state, no rng).

Cost model at scale: O(n_out × taps) with taps ≈ 2·half·max(1, M/L);
8k→16k costs ~24 taps/output, 44.1k→16k ~67.  The per-clip work is
embarrassingly parallel across the actor pool — the stage's distribution
shape (stages/multimodal.AudioTransformActor) is unchanged.
"""

from __future__ import annotations

import math

import numpy as np

_HALF = 12          # zero crossings per side at the (stretched) cutoff
_KAISER_BETA = 8.6  # ≈ Blackman-Harris-level sidelobe suppression (−80 dB)
_BLOCK = 65536      # output samples per gather block (bounds temp memory)


def _i0(x: np.ndarray) -> np.ndarray:
    """Modified Bessel I0 via the series — enough terms for beta ≤ 20.
    (numpy has np.i0 but its docs allow implementation drift; pinning the
    series keeps resampled bytes stable across numpy versions.)"""
    x = np.asarray(x, dtype=np.float64)
    acc = np.ones_like(x)
    term = np.ones_like(x)
    half_sq = (x / 2.0) ** 2
    for k in range(1, 25):
        term = term * half_sq / (k * k)
        acc = acc + term
    return acc


def _kaiser(offsets: np.ndarray, half_width: float, beta: float) -> np.ndarray:
    r = offsets / half_width
    w = np.zeros_like(r)
    inside = np.abs(r) <= 1.0
    w[inside] = _i0(beta * np.sqrt(1.0 - r[inside] ** 2)) / float(_i0(np.array(beta)))
    return w


def resample_sinc(pcm: np.ndarray, sr_in: int, sr_out: int,
                  half: int = _HALF, beta: float = _KAISER_BETA) -> np.ndarray:
    """Resample float PCM from sr_in to sr_out with a Kaiser-windowed-sinc
    kernel.  Returns float32; identity when rates match or input is empty."""
    if sr_in == sr_out or len(pcm) == 0 or sr_in <= 0 or sr_out <= 0:
        return np.asarray(pcm, dtype=np.float32)
    x = np.asarray(pcm, dtype=np.float64)
    n_in = len(x)
    ratio = sr_in / sr_out            # input samples per output sample
    stretch = max(1.0, ratio)         # sinc dilation = anti-alias cutoff
    taps_side = int(math.ceil(half * stretch))
    n_out = max(int(round(n_in * sr_out / sr_in)), 1)

    offsets = np.arange(-taps_side + 1, taps_side + 1, dtype=np.float64)
    g = math.gcd(int(sr_in), int(sr_out))
    p, q = int(sr_in) // g, int(sr_out) // g
    if q <= 1024:
        # POLYPHASE fast path: for a rational rate pair the fractional
        # offset cycles through exactly q values (frac(j) = (j·p mod q)/q),
        # so the sinc·kaiser weight table is (q, taps) computed ONCE —
        # the per-block window evaluation (the dominant cost: the Bessel
        # series per element) disappears.  Exact integer time arithmetic
        # (base = j·p // q) also removes the float-drift of j·ratio.
        u_all = offsets[None, :] - (np.arange(q, dtype=np.float64) / q)[:, None]
        w_all = np.sinc(u_all / stretch) * _kaiser(u_all, half * stretch, beta)
        out = np.empty(n_out, dtype=np.float64)
        off_i = offsets.astype(np.int64)
        for start in range(0, n_out, _BLOCK):
            j = np.arange(start, min(start + _BLOCK, n_out), dtype=np.int64)
            t_num = j * p
            base = t_num // q
            phase = (t_num % q).astype(np.int64)
            idx = base[:, None] + off_i[None, :]
            valid = (idx >= 0) & (idx < n_in)
            vals = np.where(valid, x[np.clip(idx, 0, n_in - 1)], 0.0)
            out[start : start + len(j)] = (
                (vals * w_all[phase]).sum(axis=1) / stretch)
        return out.astype(np.float32)

    out = np.empty(n_out, dtype=np.float64)
    for start in range(0, n_out, _BLOCK):
        j = np.arange(start, min(start + _BLOCK, n_out), dtype=np.float64)
        t = j * ratio                                # fractional input times
        base = np.floor(t).astype(np.int64)
        frac = t - base
        # (block, taps): input index and sinc argument per contribution
        idx = base[:, None] + offsets[None, :].astype(np.int64)
        u = offsets[None, :] - frac[:, None]       # input-sample distances
        w = np.sinc(u / stretch) * _kaiser(u, half * stretch, beta)
        # gather with zero padding outside the signal
        valid = (idx >= 0) & (idx < n_in)
        vals = np.where(valid, x[np.clip(idx, 0, n_in - 1)], 0.0)
        out[int(j[0]) : int(j[-1]) + 1] = (vals * w).sum(axis=1) / stretch
    return out.astype(np.float32)


def stretch_applies(n: int, rate: float, frame: int = 1024,
                    hop_syn: int = 256) -> bool:
    """True when time_stretch will actually process an ``n``-sample clip
    at ``rate`` (≥2 analysis frames); False for the identity-passthrough
    cases (rate 1, or a clip shorter than the vocoder can frame).  The
    augmentation actors use this to report an honest param of 1.0 / 0
    instead of an augmentation that never happened (review finding)."""
    if rate == 1.0 or n < frame + 1:
        return False
    ha = max(1, int(round(hop_syn * rate)))
    return 1 + (n - frame) // ha >= 2


def time_stretch(pcm: np.ndarray, rate: float, frame: int = 1024,
                 hop_syn: int = 256) -> np.ndarray:
    """Phase-vocoder time stretch (Flanagan & Golden 1966; the Dolson
    1986 tutorial formulation): change tempo WITHOUT changing pitch —
    the augmentation axis speed perturbation cannot give (there duration
    and pitch move together).  ``rate`` > 1 plays faster (shorter
    output); output length ≈ len/rate.

    Analysis hop = round(hop_syn·rate); per-bin instantaneous frequency
    from the princarg-wrapped phase increment; synthesis phases
    accumulate at hop_syn; windowed overlap-add with win² normalization.
    Pure numpy, deterministic; clips shorter than one frame (or
    rate == 1) return unchanged."""
    if rate <= 0:
        raise ValueError("rate must be positive")
    x = np.asarray(pcm, dtype=np.float64)
    if not stretch_applies(len(x), rate, frame, hop_syn):
        return np.asarray(pcm, dtype=np.float32).copy()
    ha = max(1, int(round(hop_syn * rate)))
    n_frames = 1 + (len(x) - frame) // ha
    win = np.hanning(frame)
    idx = np.arange(frame)[None, :] + ha * np.arange(n_frames)[:, None]
    spec = np.fft.rfft(x[idx] * win, axis=1)
    mag = np.abs(spec)
    phase = np.angle(spec)
    omega = 2.0 * np.pi * np.arange(spec.shape[1]) / frame  # rad/sample
    dphi = phase[1:] - phase[:-1] - omega * ha
    dphi = (dphi + np.pi) % (2.0 * np.pi) - np.pi          # princarg
    inst_freq = omega + dphi / ha
    out_phase = np.empty_like(phase)
    out_phase[0] = phase[0]
    out_phase[1:] = phase[0] + np.cumsum(inst_freq * hop_syn, axis=0)
    frames_out = np.fft.irfft(mag * np.exp(1j * out_phase), frame,
                              axis=1) * win
    out_len = frame + hop_syn * (n_frames - 1)
    y = np.zeros(out_len, dtype=np.float64)
    wsum = np.zeros(out_len, dtype=np.float64)
    w2 = win * win
    for i in range(n_frames):
        start = i * hop_syn
        y[start:start + frame] += frames_out[i]
        wsum[start:start + frame] += w2
    # 10%-of-interior clamp: edge wsum -> 0 would amplify the modified-
    # phase residual instead of tapering it (see denoise_spectral)
    y /= np.maximum(wsum, 0.1 * float(wsum.max()))
    return np.clip(y, -1.0, 1.0).astype(np.float32)


def pitch_shift(pcm: np.ndarray, sr: int, semitones: float) -> np.ndarray:
    """Pitch shift WITHOUT tempo change: time-stretch by 1/f (duration
    ×f, pitch unchanged) then windowed-sinc speed-resample by f
    (duration ÷f, pitch ×f) — net duration ≈ unchanged, pitch scaled by
    f = 2^(semitones/12).  The third corner of the tempo/pitch plane
    next to speed perturbation (both move) and time stretch (tempo
    only).

    Clips the vocoder cannot frame (see stretch_applies) pass through
    UNCHANGED — resampling them anyway would silently degrade to speed
    perturbation and break the duration contract (review finding).  The
    resample ratio is the best ≤1/512 rational approximation of f
    (sub-cent pitch error) so every shift stays on the polyphase
    cached-weight path instead of the per-block Bessel branch."""
    if semitones == 0.0:
        return np.asarray(pcm, dtype=np.float32).copy()
    f = 2.0 ** (semitones / 12.0)
    if not stretch_applies(len(pcm), 1.0 / f):
        return np.asarray(pcm, dtype=np.float32).copy()
    from fractions import Fraction

    frac = Fraction(f).limit_denominator(512)
    y = time_stretch(pcm, 1.0 / f)
    return np.clip(
        resample_sinc(y, frac.numerator, frac.denominator), -1.0, 1.0
    ).astype(np.float32)
