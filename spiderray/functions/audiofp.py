"""Audio fingerprinting and quality-measurement kernels (pure numpy).

Three public-method banks, shared between the distributed stages
(stages/audioquality.py, stages/audiodedup.py) and their serial oracles —
the repo's established shared-function-bank pattern:

* **Spectral-peak landmark fingerprints** — the constellation-map method of
  Wang 2003 ("An Industrial-Strength Audio Search Algorithm", ISMIR): STFT
  peak per frame → (anchor, target, dt) landmark triples hashed into one
  uint64 each.  Gain-invariant by construction (argmax bins), robust to
  additive low-level noise; used for acoustic near-duplicate detection.
* **K-weighted gated loudness** per ITU-R BS.1770-4 / EBU R128 semantics:
  400 ms blocks at 75% overlap, −70 LKFS absolute gate, −10 LU relative
  gate for the integrated value, −20 LU gate + 10th/95th percentiles for
  the loudness range.  The K-weighting filter is applied in the FREQUENCY
  domain — the analytic |H(e^jw)|^2 of the spec's two 48 kHz biquads
  evaluated at each block-FFT bin's physical frequency (no scipy in this
  container; per-block mean-square energy is what the gate consumes, and
  by Parseval the frequency-domain weighting matches the time-domain
  filter's energy up to block-edge transients — documented approximation).
* **MFCC** — HTK-formula mel filterbank + log + orthonormal DCT-II, the
  standard speech front-end; per-clip mean coefficients summarize a clip
  as a fixed-size vector (feeds the embedding near-dup / ANN operators).

All kernels are per-clip deterministic (no cross-clip state, float64
internally), so the distributed and serial paths agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Spectral-peak landmark fingerprints
# ---------------------------------------------------------------------------

_HANN_CACHE: dict[int, np.ndarray] = {}


def _hann(n: int) -> np.ndarray:
    w = _HANN_CACHE.get(n)
    if w is None:
        w = np.hanning(n).astype(np.float64)
        _HANN_CACHE[n] = w
    return w


def _peak_track(
    pcm: np.ndarray,
    sr: int,
    frame: int,
    hop: int,
    hz_quant: float,
    max_frames: int,
    min_peak_mag: float,
):
    """Shared per-frame peak extraction behind ``spectral_landmarks`` and
    ``spectral_landmarks_timed`` — identical numpy ops in identical order,
    so factoring it out keeps the untimed hashes bit-stable.  Returns
    (peak_q uint64, voiced bool, frame_ms float, n_frames int)."""
    x = pcm[: frame + hop * max_frames].astype(np.float64)
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    mags = np.abs(np.fft.rfft(x[idx] * _hann(frame), axis=1))
    peak_bins = mags.argmax(axis=1)
    peak_mag = mags[np.arange(n_frames), peak_bins]
    voiced = peak_mag >= min_peak_mag
    peak_q = np.round(peak_bins * (sr / frame) / hz_quant).astype(np.uint64)
    frame_ms = hop * 1000.0 / sr
    return peak_q, voiced, frame_ms, n_frames


def spectral_landmarks(
    pcm: np.ndarray,
    sr: int,
    frame: int = 512,
    hop: int = 256,
    fanout: int = 3,
    hz_quant: float = 100.0,
    ms_quant: float = 20.0,
    max_frames: int = 512,
    min_peak_mag: float = 1e-4,
) -> np.ndarray:
    """Unique landmark hashes for one clip: per-frame spectral peak →
    (anchor_hz, target_hz, dt) triples for targets 1..fanout frames ahead,
    quantized to physical units (``hz_quant`` Hz / ``ms_quant`` ms) so
    clips at different sample rates hash into the same space.  Pairs whose
    two peaks quantize equal are dropped — a held tone yields runs of
    identical frames whose self-pairs carry no melodic information but
    would let any two clips sharing ONE pitch collide on several hashes.
    ``hz_quant`` should be at least the analysis bin width (sr/frame; 86 Hz
    at 44.1 kHz) so adjacent-bin argmax jitter from low-level noise stays
    inside one cell.  Returns a sorted unique uint64 array; frames whose
    peak magnitude is below ``min_peak_mag`` (near-silence) contribute no
    landmarks."""
    if sr <= 0 or len(pcm) < frame + hop:
        return np.empty(0, dtype=np.uint64)
    peak_q, voiced, frame_ms, n_frames = _peak_track(
        pcm, sr, frame, hop, hz_quant, max_frames, min_peak_mag)
    hashes = []
    for d in range(1, fanout + 1):
        if n_frames <= d:
            break
        ok = voiced[:-d] & voiced[d:] & (peak_q[:-d] != peak_q[d:])
        if not ok.any():
            continue
        dt = np.uint64(max(int(round(d * frame_ms / ms_quant)), 0)) & np.uint64(0xFF)
        h = (
            (peak_q[:-d][ok] << np.uint64(32))
            ^ (peak_q[d:][ok] << np.uint64(8))
            ^ dt
        )
        hashes.append(h)
    if not hashes:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(hashes))


def spectral_landmarks_timed(
    pcm: np.ndarray,
    sr: int,
    frame: int = 512,
    hop: int = 256,
    fanout: int = 3,
    hz_quant: float = 100.0,
    max_frames: int = 512,
    min_peak_mag: float = 1e-4,
) -> tuple[np.ndarray, np.ndarray]:
    """``spectral_landmarks`` with anchor TIMES, for query-by-example
    retrieval: returns (hashes uint64, anchor frame index int32), one row
    per (hash, frame) pair — duplicates of the same hash at different
    anchors are KEPT (they are what offset voting counts), duplicate
    (hash, frame) pairs are not.  Anchor time is the raw frame index on
    the hop grid, exact for query/corpus pairs sharing sr and hop (a
    hop-aligned excerpt matches at one constant offset); cross-rate
    matching still works through the hashes but blurs the offsets.  The
    hash arithmetic (and the dt byte's ms quantization at 20 ms) is
    identical to ``spectral_landmarks`` via the shared ``_peak_track``."""
    ms_quant = 20.0
    if sr <= 0 or len(pcm) < frame + hop:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int32))
    peak_q, voiced, frame_ms, n_frames = _peak_track(
        pcm, sr, frame, hop, hz_quant, max_frames, min_peak_mag)
    hashes, anchors = [], []
    for d in range(1, fanout + 1):
        if n_frames <= d:
            break
        ok = voiced[:-d] & voiced[d:] & (peak_q[:-d] != peak_q[d:])
        if not ok.any():
            continue
        dt = np.uint64(max(int(round(d * frame_ms / ms_quant)), 0)) & np.uint64(0xFF)
        h = (
            (peak_q[:-d][ok] << np.uint64(32))
            ^ (peak_q[d:][ok] << np.uint64(8))
            ^ dt
        )
        hashes.append(h)
        anchors.append(np.nonzero(ok)[0].astype(np.int32))
    if not hashes:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int32))
    h = np.concatenate(hashes)
    t = np.concatenate(anchors)
    # unique (hash, anchor) pairs, sorted by (hash, anchor)
    order = np.lexsort((t, h))
    h, t = h[order], t[order]
    keep = np.ones(len(h), dtype=bool)
    keep[1:] = (h[1:] != h[:-1]) | (t[1:] != t[:-1])
    return h[keep], t[keep]


MIN_LOOP_SCORE_PPM = 800_000  # best-lag self-match above this → looped flag
MIN_LOOP_UNIQUE_PEAKS = 3     # melodic variety guard: held tones never flag


def audio_loop_stats(pcm: np.ndarray, sr: int,
                     frame: int = 512, hop: int = 256,
                     min_period: int = 8, min_overlap: int = 8,
                     min_cycles: int = 2,
                     hz_quant: float = 100.0, max_frames: int = 512,
                     min_peak_mag: float = 1e-4) -> dict:
    """Self-similarity loop signals for one mono clip in [-1, 1] — the
    audio analog of the ASR hallucination-loop gate (functions/halluc):
    hold music, loopy jingles, and synthetically TILED audio repeat a
    short segment verbatim, so their quantized spectral-peak track
    (shared ``_peak_track`` — same frames, same quantization as the
    landmark fingerprints) matches itself at the loop's lag.

    For every lag ``p`` in [min_period, n_frames - min_overlap] the score
    is the exact integer fraction (ppm, //) of voiced-overlap frames with
    equal quantized peaks; ``loop_score_ppm`` is the max, and
    ``loop_period_frames`` the SMALLEST lag attaining it (the fundamental
    period — its multiples score the same on perfectly tiled audio).
    ``min_period`` floors the lag above one held note so a melody does
    not match itself inside a single note; ``min_cycles`` caps it at
    n_frames // min_cycles so a "loop" must actually repeat in view —
    without the cap, extreme lags compare only the ``min_overlap`` tail
    against the head, and a melody whose LAST note happens to equal its
    first scores 7/8 (the same degenerate tail the text gate's
    cycling-≥4 rule excludes); ``n_unique_peaks`` feeds the variety
    guard (a stationary tone matches at EVERY lag but carries one peak
    value, which is stationarity, not looping).  All arithmetic is
    integer, so the row is bit-stable under any partitioning."""
    out = {"n_frames": 0, "n_voiced": 0, "n_unique_peaks": 0,
           "loop_period_frames": 0, "loop_score_ppm": 0, "loop_overlap": 0}
    if sr <= 0 or len(pcm) < frame + hop:
        return out
    peak_q, voiced, _, n_frames = _peak_track(
        pcm, sr, frame, hop, hz_quant, max_frames, min_peak_mag)
    out["n_frames"] = int(n_frames)
    out["n_voiced"] = int(voiced.sum())
    if out["n_voiced"]:
        out["n_unique_peaks"] = int(len(np.unique(peak_q[voiced])))
    best_ppm, best_p, best_ov = 0, 0, 0
    for p in range(min_period,
                   min(n_frames // min_cycles, n_frames - min_overlap) + 1):
        m = voiced[p:] & voiced[:-p]
        comparisons = int(m.sum())
        if comparisons < min_overlap:
            continue
        matches = int((m & (peak_q[p:] == peak_q[:-p])).sum())
        ppm = 1_000_000 * matches // comparisons
        if ppm > best_ppm:
            best_ppm, best_p, best_ov = ppm, p, comparisons
    out["loop_period_frames"] = best_p
    out["loop_score_ppm"] = best_ppm
    out["loop_overlap"] = best_ov
    return out


# ---------------------------------------------------------------------------
# BS.1770-style K-weighted gated loudness
# ---------------------------------------------------------------------------

# ITU-R BS.1770-4 Table 1/2 biquad coefficients, defined at 48 kHz:
# stage 1 high-shelf (head response), stage 2 high-pass (RLB weighting).
_KW_FS = 48000.0
_KW_SHELF_B = (1.53512485958697, -2.69169618940638, 1.19839281085285)
_KW_SHELF_A = (1.0, -1.69065929318241, 0.73248077421585)
_KW_HP_B = (1.0, -2.0, 1.0)
_KW_HP_A = (1.0, -1.99004745483398, 0.99007225036621)


def kweight_mag2(freqs_hz: np.ndarray) -> np.ndarray:
    """Analytic squared magnitude of the BS.1770 K-weighting cascade at
    physical frequencies (Hz).  The biquads are defined at 48 kHz; their
    discrete-time response is evaluated at w = 2*pi*f/48000 — valid for any
    clip sample rate because the weighting is a function of physical Hz."""
    w = 2.0 * np.pi * np.asarray(freqs_hz, dtype=np.float64) / _KW_FS
    z1 = np.exp(-1j * w)
    z2 = z1 * z1

    def _h2(b, a):
        num = b[0] + b[1] * z1 + b[2] * z2
        den = a[0] + a[1] * z1 + a[2] * z2
        return (num.real**2 + num.imag**2) / (den.real**2 + den.imag**2)

    return _h2(_KW_SHELF_B, _KW_SHELF_A) * _h2(_KW_HP_B, _KW_HP_A)


_KW_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _block_loudness(pcm: np.ndarray, sr: int,
                    block_ms: int = 400, step_ms: int = 100) -> np.ndarray:
    """Per-block loudness (LKFS) over ``block_ms`` windows at ``step_ms``
    stride (75% overlap at the defaults) — K-weighted mean-square energy
    computed in the frequency domain via Parseval."""
    blen = max(int(sr * block_ms / 1000), 2)
    step = max(int(sr * step_ms / 1000), 1)
    if len(pcm) < blen:
        return np.empty(0, dtype=np.float64)
    n_blocks = 1 + (len(pcm) - blen) // step
    idx = np.arange(blen)[None, :] + step * np.arange(n_blocks)[:, None]
    X = np.fft.rfft(pcm[idx].astype(np.float64), axis=1)
    key = (sr, blen)
    w2s = _KW_CACHE.get(key)
    if w2s is None:
        w2 = kweight_mag2(np.fft.rfftfreq(blen, d=1.0 / sr))
        # Parseval for rfft: double every bin except DC (and Nyquist when
        # blen is even), normalize by blen^2 → time-domain mean square
        scale = np.full(len(w2), 2.0)
        scale[0] = 1.0
        if blen % 2 == 0:
            scale[-1] = 1.0
        w2s = w2 * scale / (blen * blen)
        _KW_CACHE[key] = w2s
    ms = ((X.real**2 + X.imag**2) * w2s).sum(axis=1)
    with np.errstate(divide="ignore"):
        return -0.691 + 10.0 * np.log10(ms)


_LUFS_FLOOR = -99.0


def _gated_mean_lufs(block_lufs: np.ndarray, rel_gate_lu: float) -> float:
    """Two-stage gated integrated loudness: −70 LKFS absolute gate, then a
    relative gate ``rel_gate_lu`` below the absolutely-gated mean."""
    absd = block_lufs[block_lufs > -70.0]
    if absd.size == 0:
        return _LUFS_FLOOR
    mean_ms = np.mean(10.0 ** ((absd + 0.691) / 10.0))
    rel_thresh = -0.691 + 10.0 * np.log10(mean_ms) + rel_gate_lu
    gated = absd[absd > rel_thresh]
    if gated.size == 0:
        return _LUFS_FLOOR
    return float(-0.691 + 10.0 * np.log10(
        np.mean(10.0 ** ((gated + 0.691) / 10.0))))


def loudness_stats(pcm: np.ndarray, sr: int) -> dict:
    """Integrated loudness (LUFS), loudness range (LU), clipping ratio and
    DC offset for one mono clip in [-1, 1] float.  Short/silent clips clamp
    to the −99 floor rather than emitting −inf."""
    if sr <= 0 or len(pcm) == 0:
        return {"lufs_integrated": _LUFS_FLOOR, "lufs_range": 0.0,
                "clip_ratio": 0.0, "dc_offset": 0.0}
    bl = _block_loudness(pcm, sr)
    integrated = _gated_mean_lufs(bl, -10.0) if bl.size else _LUFS_FLOOR
    # EBU R128 loudness range: −20 LU relative gate, 10th→95th percentile
    lra = 0.0
    if bl.size:
        absd = bl[bl > -70.0]
        if absd.size:
            mean_ms = np.mean(10.0 ** ((absd + 0.691) / 10.0))
            rel = absd[absd > -0.691 + 10.0 * np.log10(mean_ms) - 20.0]
            if rel.size >= 2:
                lo, hi = np.percentile(rel, [10.0, 95.0])
                lra = float(hi - lo)
    return {
        "lufs_integrated": float(max(integrated, _LUFS_FLOOR)),
        "lufs_range": lra,
        "clip_ratio": float(np.mean(np.abs(pcm) >= 0.999)),
        "dc_offset": float(np.mean(pcm)),
    }


# ---------------------------------------------------------------------------
# MFCC
# ---------------------------------------------------------------------------


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


_MEL_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}


def _mel_dct(sr: int, n_fft: int, n_mels: int, n_mfcc: int):
    key = (sr, n_fft, n_mels, n_mfcc)
    got = _MEL_CACHE.get(key)
    if got is not None:
        return got
    # triangular filters on the HTK mel scale, 0..sr/2
    pts = _mel_to_hz(np.linspace(0.0, _hz_to_mel(sr / 2.0), n_mels + 2))
    bins = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    fb = np.zeros((n_mels, len(bins)), dtype=np.float64)
    for m in range(n_mels):
        lo, mid, hi = pts[m], pts[m + 1], pts[m + 2]
        up = (bins - lo) / max(mid - lo, 1e-9)
        down = (hi - bins) / max(hi - mid, 1e-9)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    # orthonormal DCT-II
    k = np.arange(n_mfcc)[:, None]
    m = np.arange(n_mels)[None, :]
    dct = np.sqrt(2.0 / n_mels) * np.cos(np.pi * k * (2 * m + 1) / (2 * n_mels))
    dct[0] /= np.sqrt(2.0)
    got = (fb, dct)
    _MEL_CACHE[key] = got
    return got


def mfcc_mean(
    pcm: np.ndarray,
    sr: int,
    frame: int = 512,
    hop: int = 256,
    n_mels: int = 24,
    n_mfcc: int = 13,
    max_frames: int = 512,
) -> np.ndarray:
    """Mean MFCC vector over the clip's frames (float64, length n_mfcc);
    zeros for clips too short for one frame."""
    if sr <= 0 or len(pcm) < frame:
        return np.zeros(n_mfcc, dtype=np.float64)
    x = pcm[: frame + hop * max_frames].astype(np.float64)
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = np.abs(np.fft.rfft(x[idx] * _hann(frame), axis=1)) ** 2
    fb, dct = _mel_dct(sr, frame, n_mels, n_mfcc)
    mel = np.log(spec @ fb.T + 1e-10)
    return (mel @ dct.T).mean(axis=0)


def log_mel_spectrogram(
    pcm: np.ndarray,
    sr: int,
    frame: int = 512,
    hop: int = 256,
    n_mels: int = 24,
    max_frames: int = 512,
) -> np.ndarray:
    """(n_frames, n_mels) float64 log-mel spectrogram — the frame-level
    front-end mfcc_mean averages over; empty (0, n_mels) for clips too
    short for one frame."""
    if sr <= 0 or len(pcm) < frame:
        return np.zeros((0, n_mels), dtype=np.float64)
    x = pcm[: frame + hop * max_frames].astype(np.float64)
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = np.abs(np.fft.rfft(x[idx] * _hann(frame), axis=1)) ** 2
    fb, _ = _mel_dct(sr, frame, n_mels, 1)
    return np.log(spec @ fb.T + 1e-10)


# ---------------------------------------------------------------------------
# SNR / noise-floor estimation and pitch (F0) tracking
# ---------------------------------------------------------------------------
#
# * ``snr_stats`` — the standard percentile (energy-histogram) SNR estimator
#   for speech: frame mean-square powers, noise floor = mean of the quietest
#   20% of frames, signal = mean of the loudest 50%.  It assumes the clip
#   contains pauses (true for conversational speech); a pause-free signal
#   reports ~0 dB by construction — documented, and the gate treats only
#   LOW values as suspicious.
# * ``pitch_stats`` — frame-level autocorrelation F0 tracking (the classic
#   method; computed via FFT power spectrum → IFFT for all frames at once):
#   a frame is voiced when the normalized autocorrelation peak in the
#   [fmin, fmax] lag range exceeds ``clarity``; clip F0 = median of voiced
#   frames with parabolic sub-sample lag interpolation.  Speech F0 lives in
#   50-450 Hz; a clip of decodable audio with voiced_ratio≈0 is noise-like.

_SNR_EPS = 1e-12


def snr_stats(pcm: np.ndarray, sr: int, frame_ms: float = 30.0) -> dict:
    """Percentile-method SNR estimate over non-overlapping frames.

    Returns ``snr_db`` (signal-over-noise-floor, >=0), ``noise_floor_db``
    (dBFS of the quietest-quintile mean power, floored at -120) and
    ``active_ratio`` (fraction of frames >6 dB above the noise floor).
    Zeros for undecodable/too-short input."""
    out = {"snr_db": 0.0, "noise_floor_db": -120.0, "active_ratio": 0.0}
    if sr <= 0 or pcm is None or len(pcm) == 0:
        return out
    flen = max(int(sr * frame_ms / 1000.0), 1)
    n_frames = len(pcm) // flen
    if n_frames < 1:
        return out
    x = pcm[: n_frames * flen].astype(np.float64).reshape(n_frames, flen)
    powers = np.mean(x * x, axis=1)
    order = np.sort(powers)
    n_noise = max(1, int(round(0.2 * n_frames)))
    n_sig = max(1, int(round(0.5 * n_frames)))
    noise_p = float(np.mean(order[:n_noise]))
    sig_p = float(np.mean(order[-n_sig:]))
    out["noise_floor_db"] = max(-120.0, 10.0 * np.log10(noise_p + _SNR_EPS))
    out["snr_db"] = max(0.0, 10.0 * np.log10((sig_p + _SNR_EPS) / (noise_p + _SNR_EPS)))
    out["active_ratio"] = float(np.mean(powers > 4.0 * noise_p)) if noise_p > 0 \
        else float(np.mean(powers > _SNR_EPS))
    return out


def pitch_stats(
    pcm: np.ndarray,
    sr: int,
    fmin: float = 50.0,
    fmax: float = 450.0,
    frame_ms: float = 40.0,
    clarity: float = 0.5,
    max_frames: int = 512,
) -> dict:
    """Autocorrelation pitch tracking: ``f0_hz`` (median over voiced frames,
    0.0 when none) and ``voiced_ratio``.  Deterministic float64 numpy."""
    out = {"f0_hz": 0.0, "voiced_ratio": 0.0}
    if sr <= 0 or pcm is None:
        return out
    flen = int(sr * frame_ms / 1000.0)
    lag_min = max(2, int(sr / fmax))
    lag_max = int(sr / fmin)
    if flen < 16 or lag_max + 2 >= flen or len(pcm) < flen:
        return out
    n_frames = min(len(pcm) // flen, max_frames)
    x = pcm[: n_frames * flen].astype(np.float64).reshape(n_frames, flen)
    x = x - x.mean(axis=1, keepdims=True)
    nfft = 1 << int(np.ceil(np.log2(2 * flen)))
    spec = np.abs(np.fft.rfft(x, n=nfft, axis=1)) ** 2
    r = np.fft.irfft(spec, n=nfft, axis=1)[:, :flen]
    r0 = r[:, 0]
    live = r0 > 1e-7 * flen  # silence guard: mean-square > 1e-7
    hi = min(lag_max, flen - 2)
    window = r[:, lag_min: hi + 1]
    k_rel = np.argmax(window, axis=1)
    k = k_rel + lag_min
    rows = np.arange(n_frames)
    peak = r[rows, k]
    with np.errstate(divide="ignore", invalid="ignore"):
        cl = np.where(r0 > 0, peak / r0, 0.0)
    voiced = live & (cl > clarity)
    if not voiced.any():
        return out
    # parabolic sub-sample interpolation around each voiced peak
    rm1, rp1 = r[rows, k - 1], r[rows, k + 1]
    denom = rm1 - 2.0 * peak + rp1
    delta = np.where(np.abs(denom) > _SNR_EPS,
                     0.5 * (rm1 - rp1) / denom, 0.0)
    delta = np.clip(delta, -0.5, 0.5)
    f0 = sr / (k + delta)
    out["f0_hz"] = float(np.median(f0[voiced]))
    out["voiced_ratio"] = float(np.mean(voiced))
    return out


def _max_run(mask: np.ndarray) -> int:
    """Length of the longest True run (vectorized edge-detect, no Python
    loop over samples)."""
    if len(mask) == 0 or not mask.any():
        return 0
    padded = np.concatenate([[0], mask.astype(np.int8), [0]])
    d = np.diff(padded)
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return int((ends - starts).max())


def clipping_stats(pcm: np.ndarray, sr: int, clip_thresh: float = 0.999) -> dict:
    """Digital-defect stats for a decoded clip: ``clip_ratio`` (fraction of
    samples at/above ``clip_thresh`` of full scale), ``max_clip_run_ms``
    (longest saturated run — sustained saturation is audible distortion
    even at a low overall ratio), ``max_zero_run_ms`` (longest exactly-zero
    run: a digital dropout, distinct from quiet-but-dithered silence) and
    ``peak`` (max |sample|).  Zeros for undecodable/too-short input."""
    out = {"clip_ratio": 0.0, "max_clip_run_ms": 0.0,
           "max_zero_run_ms": 0.0, "peak": 0.0}
    if sr <= 0 or pcm is None or len(pcm) == 0:
        return out
    a = np.abs(pcm.astype(np.float64))
    out["peak"] = float(a.max())
    clipped = a >= clip_thresh
    out["clip_ratio"] = float(np.mean(clipped))
    out["max_clip_run_ms"] = _max_run(clipped) * 1000.0 / sr
    out["max_zero_run_ms"] = _max_run(a == 0.0) * 1000.0 / sr
    return out


# --------------------------------------------------------------------------
# Effective-bandwidth estimate: fake-sample-rate / upsample detection
# --------------------------------------------------------------------------
#
# Speech corpora routinely contain clips whose container sample rate lies:
# 8 kHz telephony or low-bitrate-codec output resampled to 16/44.1 kHz has
# (near-)zero energy above the ORIGINAL Nyquist.  The spectral-rolloff
# estimate below recovers the effective bandwidth — the frequency below
# which ``energy_q`` of the spectral energy sits — so a quality gate can
# flag "upsampled" clips whose bandwidth is a small fraction of the
# container Nyquist.  Standard practice in TTS/ASR data pipelines (e.g.
# bandwidth filtering in large-scale speech corpus papers); kernel is one
# rFFT + cumsum per clip.

BANDWIDTH_ENERGY_Q = 0.99    # rolloff quantile
BANDWIDTH_MAX_SAMPLES = 1 << 17   # analysis cap: ~8 s at 16 kHz, one rFFT
MIN_BW_RATIO = 0.55          # bw/nyquist below this → flagged upsampled


def bandwidth_stats(pcm: np.ndarray, sr: int,
                    energy_q: float = BANDWIDTH_ENERGY_Q) -> dict:
    """Effective bandwidth of a PCM clip via spectral energy rolloff.

    Returns ``bw_hz`` (smallest frequency containing ``energy_q`` of the
    power-spectrum energy over the first BANDWIDTH_MAX_SAMPLES samples)
    and ``bw_ratio`` (bw_hz / (sr/2)).  Zeros for empty/silent input."""
    out = {"bw_hz": 0.0, "bw_ratio": 0.0}
    if sr <= 0 or pcm is None or len(pcm) == 0:
        return out
    x = np.asarray(pcm[:BANDWIDTH_MAX_SAMPLES], dtype=np.float64)
    spec = np.abs(np.fft.rfft(x))
    spec *= spec
    total = spec.sum()
    if total <= 0.0:
        return out
    k = int(np.searchsorted(np.cumsum(spec), energy_q * total))
    bw = k * sr / len(x)          # rFFT bin width = sr / n_samples
    out["bw_hz"] = float(bw)
    out["bw_ratio"] = float(bw / (sr / 2.0))
    return out


# --------------------------------------------------------------------------
# Mains-hum + DC-offset defect signals
# --------------------------------------------------------------------------
#
# Two classic capture-chain defects in scraped speech audio: a DC bias from
# a miscalibrated ADC (wastes headroom, breaks energy-based VAD and some
# codecs) and 50/60 Hz mains hum plus harmonics from ground loops.  Both
# are narrow deterministic signals: DC is the normalized mean, hum is the
# fraction of (DC-removed, Hann-windowed) spectral energy inside ±2 Hz of
# each mains frequency — a narrow band that broadband speech barely
# touches but a ground-loop tone dominates.  One rFFT per clip, same
# analysis cap as bandwidth_stats.

HUM_FREQS = (50.0, 60.0, 100.0, 120.0, 150.0, 180.0)
HUM_BAND_HZ = 2.0            # ± band around each mains frequency
MAX_HUM_RATIO = 0.05         # band energy fraction above this → hum flag
MAX_DC_RATIO = 0.05          # |mean| / rms above this → dc_offset flag


def hum_stats(pcm: np.ndarray, sr: int) -> dict:
    """DC-offset and mains-hum measurements for a PCM clip.

    Returns ``dc_ratio`` (|mean| / rms over the first
    BANDWIDTH_MAX_SAMPLES samples) and ``hum_ratio`` (max over HUM_FREQS
    below Nyquist of the spectral-energy fraction within ±HUM_BAND_HZ,
    DC removed, Hann window).  Zeros for empty/silent input."""
    out = {"dc_ratio": 0.0, "hum_ratio": 0.0}
    if sr <= 0 or pcm is None or len(pcm) == 0:
        return out
    x = np.asarray(pcm[:BANDWIDTH_MAX_SAMPLES], dtype=np.float64)
    rms = float(np.sqrt(np.mean(x * x)))
    if rms <= 0.0:
        return out
    out["dc_ratio"] = float(abs(x.mean()) / rms)
    xc = x - x.mean()
    spec = np.abs(np.fft.rfft(xc * np.hanning(len(xc))))
    spec *= spec
    total = spec.sum()
    if total <= 0.0:
        return out
    bin_hz = sr / len(xc)
    hum = 0.0
    for f in HUM_FREQS:
        if f >= sr / 2.0:
            continue
        lo = max(1, int(np.floor((f - HUM_BAND_HZ) / bin_hz)))
        hi = min(len(spec) - 1, int(np.ceil((f + HUM_BAND_HZ) / bin_hz)))
        if hi >= lo:
            hum = max(hum, float(spec[lo:hi + 1].sum() / total))
    out["hum_ratio"] = hum
    return out


REVERB_FRAME_MS = 20.0       # energy-envelope frame (no overlap)
REVERB_OFFSET_DB = 6.0       # "end of last burst" window below peak
REVERB_FLOOR_DB = 35.0       # decay tail measured down to peak − this
MAX_RT60_MS = 60_000.0       # sentinel when no decay is measurable
MAX_REVERB_RT60_MS = 700.0   # rt60 above this → reverberant flag


def reverb_stats(pcm: np.ndarray, sr: int,
                 frame_ms: float = REVERB_FRAME_MS) -> dict:
    """Blind reverberation proxy for a PCM clip: Schroeder-style decay
    slope after the LAST energy burst.

    Frame RMS energies (``frame_ms`` non-overlapping frames, first
    BANDWIDTH_MAX_SAMPLES samples) form a dB envelope; the decay tail
    runs from the last frame within REVERB_OFFSET_DB of the peak until
    the envelope first reaches EITHER REVERB_FLOOR_DB below the peak OR
    3 dB above the clip's own noise floor (the post-burst envelope
    minimum) — so neither trailing silence NOR a steady background-noise
    floor can flatten the fit: once the envelope is at the floor it
    carries no decay information (a dry clip with a −20 dB noise bed
    measures only the instant cliff, not a fake slow slope).  An OLS
    line over the tail gives ``decay_db_s``; ``rt60_ms = −60/slope``
    (capped at MAX_RT60_MS when the measured window does not decay).
    Tails shorter than 3 frames — a dry clip's instant cliff, a burst
    running to the clip edge, or a tail indistinguishable from the
    clip's own floor — return 0 (no measurable reverberation): the gate
    stays conservative when the offset is unobservable.

    A long RT60 means the capture room smears phones together — a
    standard re-record / drop signal in ASR corpus preparation that
    loudness- and bandwidth-gates cannot see."""
    out = {"rt60_ms": 0.0, "decay_db_s": 0.0}
    if sr <= 0 or pcm is None or len(pcm) == 0:
        return out
    x = np.asarray(pcm[:BANDWIDTH_MAX_SAMPLES], dtype=np.float64)
    w = max(1, int(round(sr * frame_ms / 1000.0)))
    nf = len(x) // w
    if nf < 3:
        return out
    E = np.mean(x[:nf * w].reshape(nf, w) ** 2, axis=1)
    if float(E.max()) <= 0.0:
        return out
    env = 10.0 * np.log10(np.maximum(E, 1e-20))
    peak = float(env.max())
    last_burst = int(np.max(np.nonzero(env >= peak - REVERB_OFFSET_DB)[0]))
    tail_env = env[last_burst + 1:]
    floor = float(tail_env.min()) if len(tail_env) else peak
    cut_db = max(peak - REVERB_FLOOR_DB, floor + 3.0)
    below = np.nonzero(tail_env <= cut_db)[0]
    end = last_burst + 1 + (int(below[0]) if len(below)
                            else len(env) - last_burst - 2)
    y = env[last_burst:end + 1]
    if len(y) < 3:
        return out
    t = np.arange(len(y), dtype=np.float64) * (w / sr)
    tm, ym = t.mean(), y.mean()
    vart = float(np.sum((t - tm) ** 2))
    slope = float(np.sum((t - tm) * (y - ym)) / vart) if vart > 0 else 0.0
    out["decay_db_s"] = slope
    if slope >= -1e-9:
        out["rt60_ms"] = MAX_RT60_MS
    else:
        out["rt60_ms"] = float(min(MAX_RT60_MS, -60.0 / slope * 1000.0))
    return out


CHAN_DEAD_RATIO = 0.01     # min-rms/max-rms below this → dead channel
CHAN_FAKE_CORR = 0.995     # corr above this (balanced) → fake stereo
CHAN_BALANCE_DB = 1.0      # rms ratio within this → "balanced"
CHAN_INVERT_CORR = -0.95   # corr below this → phase inversion


def channel_stats(x: np.ndarray) -> dict:
    """Channel-layout defect measurements for a channel-preserving
    (n, ch) PCM array (first BANDWIDTH_MAX_SAMPLES frames).

    Returns ``n_channels``, ``lr_corr`` (zero-mean Pearson correlation of
    the first two channels; 0.0 when either is flat) and ``rms_ratio``
    (min/max channel RMS; 1.0 when all channels are silent or mono).
    The three broadcast-QC defects derive from these: a dead channel
    (one side of a stereo capture unplugged), fake stereo (a mono
    master duplicated into L=R — wastes half the storage and breaks
    mid/side processing), and phase inversion (L≈−R — the clip cancels
    to silence on any mono downmix, which is exactly what the mono
    feature path of this engine would see)."""
    out = {"n_channels": 1, "lr_corr": 0.0, "rms_ratio": 1.0}
    if x is None or x.size == 0:
        return out
    if x.ndim == 1:
        x = x.reshape(-1, 1)
    x = np.asarray(x[:BANDWIDTH_MAX_SAMPLES], dtype=np.float64)
    out["n_channels"] = int(x.shape[1])
    if x.shape[1] < 2 or x.shape[0] == 0:
        return out
    rms = np.sqrt(np.mean(x * x, axis=0))
    mx = float(rms.max())
    out["rms_ratio"] = float(rms.min() / mx) if mx > 0.0 else 1.0
    l_ch = x[:, 0] - x[:, 0].mean()
    r_ch = x[:, 1] - x[:, 1].mean()
    denom = float(np.sqrt(np.sum(l_ch * l_ch) * np.sum(r_ch * r_ch)))
    if denom > 0.0:
        out["lr_corr"] = float(np.sum(l_ch * r_ch) / denom)
    return out


# Declared codec → container families whose magic bytes it may legally
# carry.  Raw sample codecs have no container signature at all, so for
# them ANY recognized container magic is a mislabel.
CODEC_FAMILIES = {
    "wav": {"riff"}, "pcm_s16le": set(), "pcm_mulaw": set(),
    "mulaw": set(), "ulaw": set(), "pcm_alaw": set(), "alaw": set(),
    "adpcm": set(), "adpcm_ima": set(),
    "flac": {"flac"}, "aiff": {"form"},
    "opus": {"ogg"}, "vorbis": {"ogg"}, "ogg": {"ogg"},
    # an unsniffable ID3v2 tag is legal on both MPEG audio and ADTS
    "mp3": {"mp3", "id3"}, "aac": {"adts", "id3"},
}


def sniff_container(buf: bytes) -> str | None:
    """Magic-byte container identification for an audio payload: 'riff'
    (RIFF/WAVE), 'flac', 'form' (IFF/AIFF), 'ogg', 'mp3' (MPEG audio
    frame sync with validated header fields), 'adts', 'id3' (an ID3v2
    tag whose payload could not be sniffed — tag ≠ codec: both mp3 and
    ADTS legally carry one, so the tag is skipped and the bytes after
    it are sniffed), or None for raw/unknown bytes.  Pure prefix
    checks — no decode.  The MPEG/ADTS syncs validate the version,
    layer, bitrate-index and sample-rate-index fields so random raw-PCM
    sample bytes (e.g. a clip starting at -1 = FF FF) almost never
    false-positive (review finding)."""
    if not buf or len(buf) < 4:
        return None
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "riff"
    if buf[:4] == b"fLaC":
        return "flac"
    if buf[:4] == b"FORM" and buf[8:12] in (b"AIFF", b"AIFC"):
        return "form"
    if buf[:4] == b"OggS":
        return "ogg"
    if buf[:3] == b"ID3" and len(buf) >= 10:
        # ID3v2 header: "ID3" ver(2) flags(1) syncsafe-size(4) — skip the
        # tag and sniff what it wraps; an unsniffable payload stays 'id3'
        if all(b < 0x80 for b in buf[6:10]):
            size = (buf[6] << 21) | (buf[7] << 14) | (buf[8] << 7) | buf[9]
            inner = sniff_container(buf[10 + size:])
            if inner is not None:
                return inner
        return "id3"
    if len(buf) >= 3 and buf[0] == 0xFF:
        b1, b2 = buf[1], buf[2]
        if (b1 & 0xF6) == 0xF0:          # ADTS: sync 0xFFF + MPEG-4/2, layer 0
            if ((b2 >> 2) & 0xF) != 0xF:  # valid sampling_frequency_index
                return "adts"
            return None
        if ((b1 & 0xE0) == 0xE0
                and ((b1 >> 3) & 0x3) != 0x1      # version not reserved
                and ((b1 >> 1) & 0x3) != 0x0      # layer not reserved
                and (b2 >> 4) != 0xF              # bitrate index valid
                and ((b2 >> 2) & 0x3) != 0x3):    # sample-rate index valid
            return "mp3"
    return None


def codec_mismatch(buf: bytes, declared: str) -> tuple[str | None, bool]:
    """(sniffed_container, mismatch) for a clip: mismatch when the bytes
    carry a recognizable container signature the declared codec cannot
    legally have — the 'FLAC bytes labeled wav' / 're-encoded upload kept
    its old codec column' ingest defect.  Unknown declared codecs and
    unrecognized bytes never flag (conservative: absence of a signature
    is not evidence)."""
    sniffed = sniff_container(buf or b"")
    if sniffed is None:
        return None, False
    allowed = CODEC_FAMILIES.get((declared or "").lower())
    if allowed is None:
        return sniffed, False
    return sniffed, sniffed not in allowed


def denoise_spectral(pcm: np.ndarray, sr: int, frame: int = 512,
                     hop: int = 256, noise_pct: float = 10.0,
                     alpha: float = 2.0, beta: float = 0.01) -> tuple:
    """Spectral-subtraction noise reduction (Boll 1979, public method):
    the per-bin noise power spectrum is estimated as the mean over the
    lowest-energy ``noise_pct``% of frames (speech pauses), then each
    frame keeps ``max(|X|² − α·N, β·N)`` of its power (oversubtraction
    factor α, spectral floor β against musical noise) with the ORIGINAL
    phase, and overlap-adds back.  Deterministic, pure numpy.

    Returns ``(denoised float32, noise_floor_db)`` where noise_floor_db
    is the mean estimated noise power in dB (the audit column).  Clips
    shorter than two frames pass through unchanged with floor −200."""
    x = np.asarray(pcm, dtype=np.float64)
    if sr <= 0 or len(x) < frame + hop:
        return np.asarray(pcm, dtype=np.float32).copy(), -200.0
    n_frames = 1 + (len(x) - frame) // hop
    win = np.hanning(frame)
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = np.fft.rfft(x[idx] * win, axis=1)
    power = spec.real ** 2 + spec.imag ** 2
    frame_e = power.sum(axis=1)
    k = max(1, int(round(n_frames * noise_pct / 100.0)))
    quiet = np.argsort(frame_e, kind="stable")[:k]
    noise = power[quiet].mean(axis=0)
    floor_db = float(10.0 * np.log10(max(noise.mean(), 1e-20)))
    cleaned = np.maximum(power - alpha * noise, beta * noise)
    gain = np.sqrt(cleaned / np.maximum(power, 1e-30))
    frames_out = np.fft.irfft(spec * gain, frame, axis=1) * win
    out_len = frame + hop * (n_frames - 1)
    y = np.zeros(out_len, dtype=np.float64)
    wsum = np.zeros(out_len, dtype=np.float64)
    w2 = win * win
    for i in range(n_frames):
        s = i * hop
        y[s:s + frame] += frames_out[i]
        wsum[s:s + frame] += w2
    # clamp the OLA normalizer at 10% of its interior value: at the clip
    # edges wsum -> 0 and, once the spectrum has been MODIFIED, dividing
    # by it amplifies the residual enormously (measured: a 0.03-rms noise
    # bed became 0.13 rms in the first frame) — tapered edges are correct
    y /= np.maximum(wsum, 0.1 * float(wsum.max()))
    return np.clip(y, -1.0, 1.0).astype(np.float32), floor_db


def compress_dynamics(x: "np.ndarray", sr: int, threshold_db: float = -24.0,
                      ratio: float = 4.0, attack_ms: float = 10.0,
                      release_ms: float = 100.0, makeup_db: float = 0.0,
                      frame_ms: float = 10.0):
    """Feed-forward dynamic-range compressor (the public design of
    Giannoulis, Massberg & Reiss 2012): frame-RMS level detection, a
    static gain curve above ``threshold_db`` with slope ``1-1/ratio``,
    one-pole attack/release smoothing of the gain-reduction envelope
    (attack when reduction RISES, release when it falls), frame-held
    gain application, optional makeup gain, hard clip at ±1 — the
    loudness-consistency transform a speech corpus applies between
    normalization and the trainer (a shouted clip stops dominating the
    batch loss; whispers keep their shape).

    Deterministic: float64 math in a fixed order, Python frame loop only
    over ~100 frames/s (the per-sample work is vectorized numpy).
    Returns ``(y float32, max_gain_reduction_db float)``."""
    if ratio < 1.0:
        raise ValueError(f"ratio must be >= 1, got {ratio}")
    x64 = np.asarray(x, dtype=np.float64)
    if len(x64) == 0 or sr <= 0:
        return x64.astype(np.float32), 0.0
    frame = max(int(sr * frame_ms / 1000.0), 1)
    n_fr = (len(x64) + frame - 1) // frame
    padded = np.zeros(n_fr * frame, dtype=np.float64)
    padded[:len(x64)] = x64
    rms = np.sqrt(np.mean(padded.reshape(n_fr, frame) ** 2, axis=1))
    lvl = 20.0 * np.log10(np.maximum(rms, 1e-10))
    gr = np.maximum(lvl - threshold_db, 0.0) * (1.0 - 1.0 / ratio)
    a_att = np.exp(-frame_ms / attack_ms) if attack_ms > 0 else 0.0
    a_rel = np.exp(-frame_ms / release_ms) if release_ms > 0 else 0.0
    sm = np.empty(n_fr, dtype=np.float64)
    s = 0.0
    for i in range(n_fr):
        c = a_att if gr[i] > s else a_rel
        s = c * s + (1.0 - c) * gr[i]
        sm[i] = s
    gain = 10.0 ** ((makeup_db - sm) / 20.0)
    y = x64 * np.repeat(gain, frame)[:len(x64)]
    return np.clip(y, -1.0, 1.0).astype(np.float32), float(sm.max())


# --------------------------------------------------------------------------
# Music / speech / other discrimination signals
# --------------------------------------------------------------------------
#
# Scraped "speech" corpora carry music beds, jingles and hold music that
# poison ASR training; the classic model-free discriminator (Scheirer &
# Slaney 1997) keys on three signals with no learned weights:
#   * 4 Hz modulation energy — speech's syllabic envelope beats at 2-8 Hz,
#     while music/noise envelopes are comparatively steady;
#   * spectral flatness — sustained tonal music concentrates energy in few
#     partials (flatness → 0) while broadband noise is flat (→ 1);
#   * spectral flux — frame-to-frame spectral change, low for steady tones.
# One decode, one envelope rFFT, one framed rFFT per clip.

MUSIC_ANALYSIS_MAX_SAMPLES = 1 << 16
SPEECH_MOD_MIN = 0.30       # 2-8 Hz envelope energy fraction ⇒ speech …
SPEECH_DEPTH_MIN = 0.25     # … but only with real modulation DEPTH (steady
                            # tones show large RATIOS of a near-zero total)
MUSIC_FLATNESS_MAX = 0.10   # tonal concentration ⇒ music (if not speech)


def musicness_stats(pcm: np.ndarray, sr: int) -> dict:
    """Modulation / flatness / flux signals for one mono clip in [-1, 1].

    Returns ``mod_ratio`` (envelope power fraction in the 2-8 Hz syllabic
    band, DC excluded), ``env_depth`` (envelope std/mean — the absolute
    modulation depth that guards the ratio against steady tones whose tiny
    envelope wobble is spectrally concentrated), ``flatness``
    (geometric/arithmetic power-spectrum mean over 1024-sample Hann
    frames), ``flux`` (mean L2 distance of consecutive L1-normalized
    magnitude spectra).  Zeros for empty or silent input."""
    out = {"mod_ratio": 0.0, "env_depth": 0.0, "flatness": 0.0, "flux": 0.0}
    if sr <= 0 or pcm is None or len(pcm) == 0:
        return out
    x = np.asarray(pcm[:MUSIC_ANALYSIS_MAX_SAMPLES], dtype=np.float64)

    # syllabic-band envelope modulation: 10 ms RMS frames → 100 Hz envelope
    frame = max(sr // 100, 1)
    n_fr = len(x) // frame
    if n_fr >= 8:
        env = np.sqrt(np.mean(x[: n_fr * frame].reshape(n_fr, frame) ** 2,
                              axis=1))
        em = env.mean()
        if em > 0.0:
            out["env_depth"] = float(env.std() / em)
        env = env - em
        spec = np.abs(np.fft.rfft(env * _hann(n_fr)))
        spec *= spec
        freqs = np.arange(len(spec)) * (100.0 / n_fr)
        total = spec[1:].sum()
        if total > 0.0:
            band = spec[(freqs >= 2.0) & (freqs <= 8.0)].sum()
            out["mod_ratio"] = float(band / total)

    # framed spectra for flatness + flux
    nf, hop = 1024, 512
    if len(x) >= nf:
        n_frames = 1 + (len(x) - nf) // hop
        idx = np.arange(nf)[None, :] + hop * np.arange(n_frames)[:, None]
        frames = x[idx] * _hann(nf)[None, :]
        mag = np.abs(np.fft.rfft(frames, axis=1))
        p = mag * mag
        pm = p.mean(axis=0)
        am = pm.mean()
        if am > 0.0:
            gm = np.exp(np.mean(np.log(pm + 1e-12)))
            out["flatness"] = float(gm / am)
        norms = mag.sum(axis=1, keepdims=True)
        ok = norms[:, 0] > 0.0
        if ok.sum() >= 2:
            nm = mag[ok] / norms[ok]
            d = np.diff(nm, axis=0)
            out["flux"] = float(np.mean(np.sqrt((d * d).sum(axis=1))))
    return out


def classify_audio_content(stats: dict) -> str:
    """speech / music / other decision from musicness_stats signals —
    fixed thresholds, calibrated on the planted strata (tests assert
    perfect separation there; real corpora tune the two constants)."""
    if (stats["mod_ratio"] >= SPEECH_MOD_MIN
            and stats["env_depth"] >= SPEECH_DEPTH_MIN):
        return "speech"
    # flatness is exactly 0.0 only when no spectrum was computable
    # (silent/short clip) — that is "other", not tonal music
    if 0.0 < stats["flatness"] <= MUSIC_FLATNESS_MAX:
        return "music"
    return "other"


# ---------------------------------------------------------------------------
# DTMF (dialed-digit) detection — in-band PII for call-center audio
# ---------------------------------------------------------------------------

# ITU-T Q.23 tone grid: a digit is one row + one column frequency
DTMF_ROWS = (697.0, 770.0, 852.0, 941.0)
DTMF_COLS = (1209.0, 1336.0, 1477.0, 1633.0)
DTMF_GRID = (
    ("1", "2", "3", "A"),
    ("4", "5", "6", "B"),
    ("7", "8", "9", "C"),
    ("*", "0", "#", "D"),
)
DTMF_MIN_FRAMES = 3   # ≥3 consecutive 16 ms frames ≈ the 40 ms Q.24 minimum
DTMF_MIN_RATIO = 0.55  # row+col pair must carry most of the frame's energy


def dtmf_digits(pcm: np.ndarray, sr: int,
                frame_ms: float = 16.0,
                min_frames: int = DTMF_MIN_FRAMES,
                min_ratio: float = DTMF_MIN_RATIO,
                max_frames: int = 4096) -> str:
    """Decode the DTMF digit sequence audible in one mono clip — dialed
    phone numbers, PINs and IVR menu choices are PII that lives in the
    WAVEFORM, invisible to every transcript-side scrubber.

    Goertzel-style detection, vectorized: frames on a ``frame_ms`` grid
    are projected onto the 8 ITU-T Q.23 tones at their EXACT physical
    frequencies (one (frame × 16) real dot per clip — works at any
    sample rate), a frame registers a digit when one row and one column
    tone together carry ≥ ``min_ratio`` of its band energy and each
    dominates its own group by 2×; runs of ≥ ``min_frames`` consecutive
    identical digits emit once (Q.24's 40 ms minimum), a non-digit
    frame re-arms.  Pure float64 arithmetic in a fixed expression
    order, same result on every partitioning; '' when nothing rings."""
    if sr <= 0:
        return ""
    frame = max(int(round(sr * frame_ms / 1000.0)), 16)
    n_frames = min(len(pcm) // frame, max_frames)
    if n_frames == 0:
        return ""
    x = pcm[: n_frames * frame].astype(np.float64).reshape(n_frames, frame)
    t = np.arange(frame, dtype=np.float64) / sr
    freqs = np.array(DTMF_ROWS + DTMF_COLS)
    # tones are not bin-aligned: project on cos+sin per tone (Goertzel
    # power without the recurrence), normalize per frame
    C = np.cos(2 * np.pi * freqs[None, :] * t[:, None])
    S = np.sin(2 * np.pi * freqs[None, :] * t[:, None])
    p = (x @ C) ** 2 + (x @ S) ** 2  # (n_frames, 8) tone power
    rows_p, cols_p = p[:, :4], p[:, 4:]
    ri = rows_p.argmax(axis=1)
    ci = cols_p.argmax(axis=1)
    rbest = rows_p[np.arange(n_frames), ri]
    cbest = cols_p[np.arange(n_frames), ci]
    # the pair must carry most of the frame's TOTAL energy, not merely
    # dominate the other six grid tones: a harmonic triad whose 2f/3f
    # land near the grid passes a tones-only ratio but fails this one
    # because its off-grid fundamental still holds the energy.  For a
    # sine of amplitude a, proj² = (a·frame/2)² while its energy in the
    # frame is a²·frame/2, so proj²/(frame/2) recovers the energy share.
    energy = (x * x).sum(axis=1)
    energy[energy == 0] = 1.0
    pair_ratio = (rbest + cbest) / (frame / 2.0) / energy
    # each winner must dominate its own group (2nd-best × 2)
    rsort = np.sort(rows_p, axis=1)
    csort = np.sort(cols_p, axis=1)
    ok = ((pair_ratio >= min_ratio)
          & (rbest >= 2.0 * rsort[:, -2])
          & (cbest >= 2.0 * csort[:, -2]))
    digits = []
    run_digit, run_len, armed = None, 0, True
    for i in range(n_frames):
        if not ok[i]:
            run_digit, run_len, armed = None, 0, True
            continue
        d = DTMF_GRID[ri[i]][ci[i]]
        if d == run_digit:
            run_len += 1
        else:
            run_digit, run_len, armed = d, 1, True
        if armed and run_len >= min_frames:
            digits.append(d)
            armed = False
    return "".join(digits)


def synth_dtmf(digits: str, sr: int, tone_ms: float = 60.0,
               gap_ms: float = 40.0, amp: float = 0.4) -> np.ndarray:
    """Reference DTMF synthesizer (tests + planted corpora): each digit is
    its Q.23 row+column tone pair for ``tone_ms``, digits separated by
    ``gap_ms`` of silence.  float64 in [-1, 1]."""
    lut = {DTMF_GRID[r][c]: (DTMF_ROWS[r], DTMF_COLS[c])
           for r in range(4) for c in range(4)}
    n_tone = int(sr * tone_ms / 1000.0)
    n_gap = int(sr * gap_ms / 1000.0)
    t = np.arange(n_tone, dtype=np.float64) / sr
    out = [np.zeros(n_gap)]
    for d in digits:
        fr, fc = lut[d]
        out.append(amp * 0.5 * (np.sin(2 * np.pi * fr * t)
                                + np.sin(2 * np.pi * fc * t)))
        out.append(np.zeros(n_gap))
    return np.concatenate(out)


# ---------------------------------------------------------------------------
# Tempo estimation — onset-autocorrelation beat tracking
# ---------------------------------------------------------------------------

TEMPO_MIN_BPM = 60
TEMPO_MAX_BPM = 180
TEMPO_MIN_CONF_PPM = 450_000   # autocorr peak share above this …
TEMPO_MIN_ONSET_PPM = 10_000   # … AND onset energy ≥1% of envelope → has_beat


def tempo_stats(pcm: np.ndarray, sr: int,
                frame: int = 512, hop: int = 256,
                max_frames: int = 4096) -> dict:
    """Tempo (BPM) estimate for one mono clip — the music-metadata
    extractor of a scraped-audio pipeline (tempo + beat confidence feed
    catalog search and the music/speech routing beside the
    Scheirer-Slaney gate): frame-RMS envelope → half-wave-rectified
    onset strength → autocorrelation over the 60–180 BPM lag range; the
    winning lag (first max) gives ``bpm`` = round(60·fps/lag) and
    ``tempo_conf_ppm`` = its normalized autocorrelation as exact integer
    ppm of the onset energy.  Unrhythmic audio (steady tones, noise,
    speech) autocorrelates weakly at every musical lag, so the
    confidence gate separates it without a model.  Octave caveat: a
    period that is a half-integer in frames aliases to the half tempo
    (its doubled lag aligns with the frame grid when the single lag
    cannot) — the ambiguity every bare autocorrelation tracker carries;
    disambiguate downstream with a tempo prior if one octave matters.
    Fixed float expression order, integer outputs — partition-stable."""
    out = {"bpm": 0, "tempo_conf_ppm": 0, "onset_ppm": 0, "n_frames": 0}
    if sr <= 0 or len(pcm) < frame + hop:
        return out
    n_frames = min(1 + (len(pcm) - frame) // hop, max_frames)
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    x = pcm[: frame + hop * (n_frames - 1)].astype(np.float64)
    env = np.sqrt((x[idx] ** 2).mean(axis=1))
    onset = np.maximum(np.diff(env), 0.0)
    out["n_frames"] = int(n_frames)
    r0 = float((onset * onset).sum())
    e0 = float((env * env).sum())
    # onset-energy share of the envelope: a STEADY tone's flat envelope
    # leaves only numerical jitter in the onset signal, which
    # autocorrelates near-perfectly — the ratio gate alone cannot tell
    # it from a beat, but its onset energy is ~0 of the envelope's
    out["onset_ppm"] = int(1_000_000 * r0 // e0) if e0 > 0.0 else 0
    if r0 <= 0.0:
        return out
    fps = sr / hop
    lag_lo = max(int(np.ceil(60.0 * fps / TEMPO_MAX_BPM)), 1)
    lag_hi = int(np.floor(60.0 * fps / TEMPO_MIN_BPM))
    best_lag, best_r = 0, 0.0
    for lag in range(lag_lo, min(lag_hi, len(onset) - 1) + 1):
        r = float((onset[lag:] * onset[:-lag]).sum())
        if r > best_r:
            best_lag, best_r = lag, r
    if best_lag == 0:
        return out
    out["bpm"] = int(round(60.0 * fps / best_lag))
    out["tempo_conf_ppm"] = int(1_000_000 * best_r // r0) if r0 else 0
    return out


# ---------------------------------------------------------------------------
# Speaker-turn detection — adjacent-window spectral change
# ---------------------------------------------------------------------------

MIN_SPEAKER_TURNS = 2  # boundaries below this → single-voice clip


def speaker_turn_stats(pcm: np.ndarray, sr: int,
                       seg_frames: int = 16,
                       max_frames: int = 4096) -> dict:
    """Diarization-lite turn signals for one mono clip — the
    conversation-vs-monologue router of a speech corpus (multi-speaker
    clips need diarization before ASR training; monologues do not):
    log-mel windows of ``seg_frames`` frames, adjacent-window euclidean
    distances, a TURN counted at every local maximum above 2× the
    median distance (a speaker change moves the whole spectral envelope;
    syllabic modulation within one voice does not).  ``sep_ppm`` rides
    along: the between/(between+within) share of a deterministic 2-means
    split (init = first/last window) — supporting evidence, not the
    decision (a single voice's syllable phases also split).  Silence
    yields zero distances and zero turns.  Fixed float expression order,
    integer outputs — partition-stable."""
    out = {"n_windows": 0, "turn_count": 0, "sep_ppm": 0}
    M = log_mel_spectrogram(pcm, sr, max_frames=max_frames)
    if len(M) < 2 * seg_frames:
        return out
    n_win = len(M) // seg_frames
    W = M[: n_win * seg_frames].reshape(n_win, seg_frames, -1).mean(axis=1)
    out["n_windows"] = int(n_win)
    d = np.sqrt(((W[1:] - W[:-1]) ** 2).sum(axis=1))
    med = float(np.median(d))
    thr = 2.0 * med
    if len(d) >= 3:
        peaks = (d[1:-1] > thr) & (d[1:-1] >= d[:-2]) & (d[1:-1] >= d[2:])
        out["turn_count"] = int(peaks.sum())
    c0, c1 = W[0].copy(), W[-1].copy()
    d0 = ((W - c0) ** 2).sum(axis=1)
    d1 = ((W - c1) ** 2).sum(axis=1)
    for _ in range(5):
        d0 = ((W - c0) ** 2).sum(axis=1)
        d1 = ((W - c1) ** 2).sum(axis=1)
        a = d1 < d0
        if a.any() and (~a).any():
            c1 = W[a].mean(axis=0)
            c0 = W[~a].mean(axis=0)
    within = float(np.minimum(d0, d1).mean())
    between = float(((c0 - c1) ** 2).sum())
    out["sep_ppm"] = int(1_000_000 * between / (between + within + 1e-12))
    return out


# ---------------------------------------------------------------------------
# Declipping — cubic interpolation across clipped runs
# ---------------------------------------------------------------------------

DECLIP_THRESHOLD = 0.985  # |sample| at/above this fraction of FS = clipped


def declip(pcm: np.ndarray, threshold: float = DECLIP_THRESHOLD
           ) -> tuple[np.ndarray, int, int]:
    """Repair hard-clipped runs by cubic Hermite interpolation — the
    REPAIR half of the clipping story (AudioDefectActor detects; this
    fixes what is fixable): each maximal run of samples at/above
    ``threshold``·FS is replaced by the cubic through its two boundary
    neighbours with matching one-sided slopes, the standard declip
    baseline (a clipped peak is locally smooth, so a cubic restores the
    missing crest).  Runs touching the signal edge hold the boundary
    value (no extrapolation).  The result is rescaled by one global
    factor when interpolation overshoots full scale, so re-encoding
    cannot re-clip.  Returns (repaired float64, n_clipped_samples,
    n_runs); pure per-clip float64 in fixed order — deterministic."""
    x = np.asarray(pcm, dtype=np.float64).copy()
    n = len(x)
    if n < 4:
        return x, 0, 0
    clipped = np.abs(x) >= threshold
    n_clip = int(clipped.sum())
    if n_clip == 0:
        return x, 0, 0
    edges = np.diff(clipped.astype(np.int8))
    starts = np.nonzero(edges == 1)[0] + 1
    ends = np.nonzero(edges == -1)[0]  # inclusive run ends
    if clipped[0]:
        starts = np.concatenate([[0], starts])
    if clipped[-1]:
        ends = np.concatenate([ends, [n - 1]])
    n_runs = len(starts)
    # Edge runs hold the boundary value (no extrapolation).  The left
    # edge run is applied BEFORE gathering interior inputs and the right
    # edge run AFTER, matching the left-to-right processing order the
    # per-run formulation used: an interior run whose s-2 touches the
    # left edge run sees its held value, while one whose e+2 touches the
    # right edge run sees the still-clipped original.
    right_edge_start = -1
    if ends[-1] == n - 1:
        right_edge_start = int(starts[-1])
        starts, ends = starts[:-1], ends[:-1]
    if len(starts) and starts[0] == 0:
        e0 = int(ends[0])
        x[:e0 + 1] = x[e0 + 1]  # e0 < n-1 here (whole-array run removed above)
        starts, ends = starts[1:], ends[1:]
    if right_edge_start == 0:  # single run covering the whole signal
        right_edge_start = -1  # original holds it unchanged
    if len(starts):
        s_ = starts.astype(np.int64)
        e_ = ends.astype(np.int64)
        run_len = e_ - s_ + 1
        # per-run inputs, gathered up front (p0/p1/m1 neighbours are
        # outside every interior run, so order-independent; m1's e+2 may
        # sit in a LATER run, whose value at gather time is the original
        # clipped sample — exactly what left-to-right processing reads)
        p0 = x[s_ - 1]
        p1 = x[e_ + 1]
        m0 = np.where(s_ >= 2, x[s_ - 1] - x[np.maximum(s_ - 2, 0)], 0.0)
        m1 = np.where(e_ + 2 < n, x[np.minimum(e_ + 2, n - 1)] - x[e_ + 1],
                      0.0)
        L = (run_len + 1).astype(np.float64)  # parameter span s-1 .. e+1
        # gap==1 chains: when exactly one unclipped sample separates two
        # runs, the later run's m0 reads s-2 == the PREVIOUS run's last
        # repaired sample.  The repaired last value is linear in m0 with
        # m0-independent Hermite basis coefficients, so the chain resolves
        # with a scalar recurrence over the dependent runs — same
        # expression order as the vectorized pass, hence bit-exact —
        # BEFORE the single vectorized evaluation below (clipped harmonic
        # material rails on nearly every half-cycle, so dep runs are the
        # COMMON case on real declip corpora, not the rare one).
        dep = s_[1:] - e_[:-1] == 2
        if dep.any():
            tL = run_len.astype(np.float64) / L
            h00L = 2 * tL ** 3 - 3 * tL ** 2 + 1
            h10L = tL ** 3 - 2 * tL ** 2 + tL
            h01L = -2 * tL ** 3 + 3 * tL ** 2
            h11L = tL ** 3 - tL ** 2
            need_last = np.zeros(len(s_), dtype=bool)
            need_last[:-1] = dep  # run i's last feeds run i+1's m0
            last = 0.0
            for i in range(len(s_)):
                if i > 0 and dep[i - 1]:
                    m0[i] = p0[i] - last
                if need_last[i]:
                    last = (h00L[i] * p0[i] + h10L[i] * m0[i] * L[i]
                            + h01L[i] * p1[i] + h11L[i] * m1[i] * L[i])
        total = int(run_len.sum())
        off = np.repeat(np.cumsum(run_len) - run_len, run_len)
        j = np.arange(total, dtype=np.int64) - off + 1  # 1-based in-run pos
        t = j.astype(np.float64) / np.repeat(L, run_len)
        h00 = 2 * t ** 3 - 3 * t ** 2 + 1
        h10 = t ** 3 - 2 * t ** 2 + t
        h01 = -2 * t ** 3 + 3 * t ** 2
        h11 = t ** 3 - t ** 2
        idx = np.repeat(s_, run_len) + j - 1
        x[idx] = (h00 * np.repeat(p0, run_len)
                  + h10 * np.repeat(m0, run_len) * np.repeat(L, run_len)
                  + h01 * np.repeat(p1, run_len)
                  + h11 * np.repeat(m1, run_len) * np.repeat(L, run_len))
    if right_edge_start > 0:
        x[right_edge_start:] = x[right_edge_start - 1]
    peak = float(np.abs(x).max())
    if peak > 1.0:
        x = x / peak
    return x, n_clip, n_runs


def flat_clip_ppm(pcm: np.ndarray, threshold: float = DECLIP_THRESHOLD
                  ) -> int:
    """The true clip-artifact measure: ppm of samples sitting on a FLAT
    rail (at/above ``threshold``·FS AND equal to a neighbour within
    1e-6) — a restored crest is loud but curved, so an amplitude-only
    ratio keeps counting it after a successful repair while this does
    not.  Integer ppm (//), deterministic."""
    x = np.asarray(pcm, dtype=np.float64)
    n = len(x)
    if n < 2:
        return 0
    loud = np.abs(x) >= threshold
    eq = np.abs(np.diff(x)) < 1e-6
    flat = np.zeros(n, dtype=bool)
    flat[:-1] |= eq
    flat[1:] |= eq
    return int(1_000_000 * int((loud & flat).sum()) // n)
