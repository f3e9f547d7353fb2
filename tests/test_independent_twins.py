"""Independently-written twins for the per-row audio kernels whose serial
oracles share code with the engine (round-4 verdict: "same-kernel twin
burn-down").  Each twin here re-derives the kernel's contract from its
docstring / the public algorithm it implements, in a deliberately different
code structure (scalar per-run loops vs the engine's vectorized passes),
and must match BIT-IDENTICALLY — so a semantics bug in the shared kernel
can no longer pass both sides of the oracle unnoticed.

Reference for the declip contract: the cubic Hermite declip baseline (a
clipped peak is locally smooth; the cubic through the boundary neighbours
with one-sided slopes restores the crest) — see
spiderray/functions/audiofp.py declip()."""

import numpy as np
import pytest

from spiderray.functions.audiofp import (
    DECLIP_THRESHOLD,
    declip,
    flat_clip_ppm,
)


# ---------------------------------------------------------------------------
# Independent declip twin: per-run scalar-loop formulation.  The engine
# kernel concatenates every run into one vectorized Hermite pass with a
# sequential fix-up for gap==1 chains; this twin walks the signal run by
# run, left to right, exactly as the contract reads — runs repaired in
# order, each reading whatever the signal holds at that moment.
# ---------------------------------------------------------------------------

def declip_twin(pcm, threshold=DECLIP_THRESHOLD):
    x = np.asarray(pcm, dtype=np.float64).copy()
    n = len(x)
    if n < 4:
        return x, 0, 0
    clipped = np.abs(x) >= threshold
    n_clip = int(clipped.sum())
    if n_clip == 0:
        return x, 0, 0
    # run discovery by plain scan (the engine diffs a mask)
    runs = []
    i = 0
    while i < n:
        if clipped[i]:
            j = i
            while j + 1 < n and clipped[j + 1]:
                j += 1
            runs.append((i, j))
            i = j + 1
        else:
            i += 1
    for s, e in runs:
        if s == 0 and e == n - 1:
            continue  # whole signal clipped: nothing to anchor on
        if s == 0:
            x[:e + 1] = x[e + 1]
            continue
        if e == n - 1:
            x[s:] = x[s - 1]
            continue
        p0, p1 = x[s - 1], x[e + 1]
        m0 = x[s - 1] - x[s - 2] if s >= 2 else 0.0
        m1 = x[e + 2] - x[e + 1] if e + 2 < n else 0.0
        L = e - s + 2
        t = np.arange(1, e - s + 2, dtype=np.float64) / L
        h00 = 2 * t ** 3 - 3 * t ** 2 + 1
        h10 = t ** 3 - 2 * t ** 2 + t
        h01 = -2 * t ** 3 + 3 * t ** 2
        h11 = t ** 3 - t ** 2
        x[s:e + 1] = h00 * p0 + h10 * m0 * L + h01 * p1 + h11 * m1 * L
    peak = float(np.abs(x).max())
    if peak > 1.0:
        x = x / peak
    return x, n_clip, len(runs)


def _declip_cases():
    rng = np.random.RandomState(7)
    cases = []
    # bench-shaped: over-amplified sines at several amps/freqs
    for amp in (1.5, 2.0, 2.5, 3.5, 4.5):
        for f in (220.0, 440.0, 880.0, 1760.0):
            t = np.arange(16000) / 16000.0
            cases.append(np.clip(amp * np.sin(2 * np.pi * f * t), -1, 1))
    # gap==1 chains: rails separated by exactly one unclipped sample —
    # the later run's left slope reads the previous run's REPAIRED tail
    x = np.ones(200)
    x[::7] = 0.5
    cases.append(x.copy())
    x = np.ones(200)
    x[::2] = 0.2
    cases.append(x.copy())
    # edge-clipped starts/ends, whole-array, tiny arrays
    e = np.zeros(100)
    e[:17] = 1.0
    e[-23:] = -1.0
    e[40:45] = 0.999
    cases.append(e)
    cases.append(np.ones(50))
    cases.append(np.ones(4))
    cases.append(np.array([0.1, 1.0, 1.0, 0.2, -1.0, -1.0, -1.0, 0.3]))
    # random clipped noise, including a heavy gap-1 regime
    for i in range(20):
        cases.append(
            np.clip(rng.randn(rng.randint(10, 5000)) * (0.5 + i * 0.15),
                    -1, 1))
    cases.append(np.clip(rng.randn(8000) * 3.0, -1, 1))
    return cases


class TestDeclipTwin:
    def test_bit_identical_on_adversarial_corpus(self):
        for i, c in enumerate(_declip_cases()):
            ref, n_ref, r_ref = declip_twin(c)
            got, n_got, r_got = declip(c)
            assert n_got == n_ref and r_got == r_ref, f"case {i} counts"
            assert np.array_equal(got, ref), (
                f"case {i}: first diff at "
                f"{np.nonzero(got != ref)[0][:5]}")

    def test_flat_rail_removed_on_isolated_crests(self):
        t = np.arange(16000) / 16000.0
        clip = np.clip(2.0 * np.sin(2 * np.pi * 440 * t), -1, 1)
        rep, n, r = declip(clip)
        assert n > 0 and r > 0
        assert flat_clip_ppm(rep) < flat_clip_ppm(clip)

    def test_quantized_bytes_identical(self):
        # the stage pins repaired BYTES via md5; pin the same quantization
        t = np.arange(8000) / 16000.0
        clip = np.clip(3.5 * np.sin(2 * np.pi * 440 * t), -1, 1)
        for fn in (declip, declip_twin):
            rep = fn(clip)[0]
            q = np.clip(np.floor(rep * 32767.0 + 0.5), -32768, 32767)
            b = q.astype("<i2").tobytes()
            assert len(b) == 2 * len(clip)
        a = declip(clip)[0]
        b = declip_twin(clip)[0]
        qa = np.clip(np.floor(a * 32767.0 + 0.5), -32768, 32767)
        qb = np.clip(np.floor(b * 32767.0 + 0.5), -32768, 32767)
        assert qa.astype("<i2").tobytes() == qb.astype("<i2").tobytes()


# ---------------------------------------------------------------------------
# Independent halluc-loop twin: pure-Python word comparisons (the engine
# hashes words with crc32 and vectorizes the per-period equality; this twin
# compares the words themselves with plain loops).  Contract source:
# functions/halluc.py docstring — longest periodic suffix w[i]==w[i-p],
# >=3 completed cycles to count, flag at >=4 repeats over >=8 words.
# ---------------------------------------------------------------------------

def loop_stats_twin(text):
    from spiderray.functions.halluc import (
        LOOP_MAX_PERIOD,
        LOOP_MAX_WORDS,
        LOOP_MIN_REPEATS,
        LOOP_MIN_WORDS,
    )

    words = (text or "").split()
    if len(words) > LOOP_MAX_WORDS:
        words = words[-LOOP_MAX_WORDS:]
    n = len(words)
    out = {"n_words": n, "loop_period": 0, "loop_len": 0,
           "loop_ratio": 0.0, "dup3_ratio": 0.0, "halluc": False}
    if n < 6:
        return out
    best_len, best_p = 0, 0
    for p in range(1, min(LOOP_MAX_PERIOD, n // 3) + 1):
        # longest suffix with w[i] == w[i-p], walked backwards by hand
        run = 0
        i = n - 1
        while i - p >= 0 and words[i] == words[i - p]:
            run += 1
            i -= 1
        if run >= 2 * p and run + p > best_len:
            best_len, best_p = run + p, p
    tris = [tuple(words[i:i + 3]) for i in range(n - 2)]
    if tris:
        out["dup3_ratio"] = float(1.0 - len(set(tris)) / len(tris))
    if best_p:
        out["loop_period"] = best_p
        out["loop_len"] = best_len
        out["loop_ratio"] = best_len / n
        out["halluc"] = (best_len // best_p >= LOOP_MIN_REPEATS
                         and best_len >= LOOP_MIN_WORDS)
    return out


# ---------------------------------------------------------------------------
# Independent DTMF twin: per-frame scalar loop with per-tone projections and
# an emit/re-arm state machine rewritten from the Q.23/Q.24 contract (the
# engine computes one (frames x 16) matmul and a run-length scan).  The
# tone-power sums keep numpy's reduction form — summation order is part of
# the pinned kernel contract; independence lives in framing, gating and the
# digit state machine.
# ---------------------------------------------------------------------------

def dtmf_digits_twin(pcm, sr):
    from spiderray.functions.audiofp import (
        DTMF_COLS,
        DTMF_GRID,
        DTMF_MIN_FRAMES,
        DTMF_MIN_RATIO,
        DTMF_ROWS,
    )

    if sr <= 0:
        return ""
    frame = max(int(round(sr * 16.0 / 1000.0)), 16)
    n_frames = min(len(pcm) // frame, 4096)
    if n_frames == 0:
        return ""
    t = np.arange(frame, dtype=np.float64) / sr
    tones = list(DTMF_ROWS) + list(DTMF_COLS)
    cos = [np.cos(2 * np.pi * f * t) for f in tones]
    sin = [np.sin(2 * np.pi * f * t) for f in tones]
    digits = []
    prev, count, emitted = None, 0, False
    for i in range(n_frames):
        seg = np.asarray(pcm[i * frame:(i + 1) * frame], dtype=np.float64)
        p = [ (seg * cos[k]).sum() ** 2 + (seg * sin[k]).sum() ** 2
              for k in range(8) ]
        rp, cp = p[:4], p[4:]
        ri = max(range(4), key=lambda k: rp[k])
        ci = max(range(4), key=lambda k: cp[k])
        energy = (seg * seg).sum()
        if energy == 0:
            energy = 1.0
        pair_ratio = (rp[ri] + cp[ci]) / (frame / 2.0) / energy
        r2 = sorted(rp)[-2]
        c2 = sorted(cp)[-2]
        good = (pair_ratio >= DTMF_MIN_RATIO and rp[ri] >= 2.0 * r2
                and cp[ci] >= 2.0 * c2)
        if not good:
            prev, count, emitted = None, 0, False
            continue
        d = DTMF_GRID[ri][ci]
        if d != prev:
            prev, count, emitted = d, 1, False
        else:
            count += 1
        if count >= DTMF_MIN_FRAMES and not emitted:
            digits.append(d)
            emitted = True
    return "".join(digits)


# ---------------------------------------------------------------------------
# Independent tempo twin: per-frame envelope loop + per-lag scan that
# collects every autocorrelation then takes the FIRST maximum (the engine
# streams a best-so-far).  Reduction form pinned as above.
# ---------------------------------------------------------------------------

def tempo_stats_twin(pcm, sr, frame=512, hop=256, max_frames=4096):
    from spiderray.functions.audiofp import TEMPO_MAX_BPM, TEMPO_MIN_BPM

    out = {"bpm": 0, "tempo_conf_ppm": 0, "onset_ppm": 0, "n_frames": 0}
    if sr <= 0 or len(pcm) < frame + hop:
        return out
    n_frames = min(1 + (len(pcm) - frame) // hop, max_frames)
    x = np.asarray(pcm[: frame + hop * (n_frames - 1)], dtype=np.float64)
    env = np.empty(n_frames, dtype=np.float64)
    for i in range(n_frames):
        seg = x[i * hop: i * hop + frame]
        env[i] = np.sqrt((seg ** 2).mean())
    onset = np.maximum(np.diff(env), 0.0)
    out["n_frames"] = int(n_frames)
    r0 = float((onset * onset).sum())
    e0 = float((env * env).sum())
    out["onset_ppm"] = int(1_000_000 * r0 // e0) if e0 > 0.0 else 0
    if r0 <= 0.0:
        return out
    fps = sr / hop
    lag_lo = max(int(np.ceil(60.0 * fps / TEMPO_MAX_BPM)), 1)
    lag_hi = int(np.floor(60.0 * fps / TEMPO_MIN_BPM))
    lags = list(range(lag_lo, min(lag_hi, len(onset) - 1) + 1))
    if not lags:
        return out
    rs = [float((onset[lag:] * onset[:-lag]).sum()) for lag in lags]
    best_r = max(rs)
    if best_r <= 0.0:
        return out
    best_lag = lags[rs.index(best_r)]  # first maximum, like the streamed scan
    out["bpm"] = int(round(60.0 * fps / best_lag))
    out["tempo_conf_ppm"] = int(1_000_000 * best_r // r0) if r0 else 0
    return out


# ---------------------------------------------------------------------------
# Independent compressor twin: per-frame scalar loop over the Giannoulis/
# Massberg/Reiss 2012 design (the engine vectorizes level detection and the
# gain application around a scalar smoothing loop).  All scalars stay
# np.float64 so the libm calls match the vectorized ufuncs.
# ---------------------------------------------------------------------------

def compress_dynamics_twin(x, sr, threshold_db=-24.0, ratio=4.0,
                           attack_ms=10.0, release_ms=100.0, makeup_db=0.0,
                           frame_ms=10.0):
    x64 = np.asarray(x, dtype=np.float64)
    if len(x64) == 0 or sr <= 0:
        return x64.astype(np.float32), 0.0
    frame = max(int(sr * frame_ms / 1000.0), 1)
    n_fr = (len(x64) + frame - 1) // frame
    a_att = np.exp(-frame_ms / attack_ms) if attack_ms > 0 else 0.0
    a_rel = np.exp(-frame_ms / release_ms) if release_ms > 0 else 0.0
    y = np.empty(len(x64), dtype=np.float64)
    s = np.float64(0.0)
    max_sm = np.float64(0.0)
    for i in range(n_fr):
        seg = x64[i * frame:(i + 1) * frame]
        if len(seg) < frame:  # the engine zero-pads the last frame
            buf = np.zeros(frame, dtype=np.float64)
            buf[:len(seg)] = seg
            rms = np.sqrt(np.mean(buf ** 2))
        else:
            rms = np.sqrt(np.mean(seg ** 2))
        lvl = 20.0 * np.log10(np.maximum(rms, 1e-10))
        gr = np.maximum(lvl - threshold_db, 0.0) * (1.0 - 1.0 / ratio)
        c = a_att if gr > s else a_rel
        s = c * s + (1.0 - c) * gr
        if s > max_sm:
            max_sm = s
        gain = np.float64(10.0) ** ((makeup_db - s) / 20.0)
        y[i * frame: i * frame + len(seg)] = seg * gain
    return np.clip(y, -1.0, 1.0).astype(np.float32), float(max_sm)


# ---------------------------------------------------------------------------
# Independent spectral-gate twins: bandwidth rolloff, hum/DC, musicness,
# speaker turns.  The FFT and the reduction forms (np.fft.rfft, .sum(),
# .mean()) are pinned kernel contract — like the shared decoder — while the
# framing, band-edge arithmetic, scan loops, thresholds and branch logic
# are re-derived from the docstrings in different code structure.
# ---------------------------------------------------------------------------

def bandwidth_twin(pcm, sr):
    from spiderray.functions.audiofp import (
        BANDWIDTH_ENERGY_Q,
        BANDWIDTH_MAX_SAMPLES,
    )

    out = {"bw_hz": 0.0, "bw_ratio": 0.0}
    if sr <= 0 or pcm is None or len(pcm) == 0:
        return out
    x = np.asarray(pcm[:BANDWIDTH_MAX_SAMPLES], dtype=np.float64)
    spec = np.abs(np.fft.rfft(x))
    spec *= spec
    total = spec.sum()
    if total <= 0.0:
        return out
    # explicit scan for the rolloff bin (the engine uses
    # searchsorted(cumsum)); sequential accumulation == cumsum order
    target = BANDWIDTH_ENERGY_Q * total
    acc = 0.0
    k = len(spec)
    for i, e in enumerate(spec):
        acc += e
        if acc >= target:
            k = i
            break
    bw = k * sr / len(x)
    return {"bw_hz": float(bw), "bw_ratio": float(bw / (sr / 2.0))}


def hum_twin(pcm, sr):
    import math

    from spiderray.functions.audiofp import (
        BANDWIDTH_MAX_SAMPLES,
        HUM_BAND_HZ,
        HUM_FREQS,
    )

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
    fracs = []
    for f in HUM_FREQS:
        if f >= sr / 2.0:
            continue
        lo = math.floor((f - HUM_BAND_HZ) / bin_hz)
        if lo < 1:
            lo = 1
        hi = math.ceil((f + HUM_BAND_HZ) / bin_hz)
        if hi > len(spec) - 1:
            hi = len(spec) - 1
        if hi >= lo:
            fracs.append(float(spec[lo:hi + 1].sum() / total))
    out["hum_ratio"] = max(fracs) if fracs else 0.0
    return out


def musicness_twin(pcm, sr):
    from spiderray.functions.audiofp import MUSIC_ANALYSIS_MAX_SAMPLES

    out = {"mod_ratio": 0.0, "env_depth": 0.0, "flatness": 0.0, "flux": 0.0}
    if sr <= 0 or pcm is None or len(pcm) == 0:
        return out
    x = np.asarray(pcm[:MUSIC_ANALYSIS_MAX_SAMPLES], dtype=np.float64)

    frame = sr // 100 if sr // 100 >= 1 else 1
    n_fr = len(x) // frame
    if n_fr >= 8:
        env = np.empty(n_fr, dtype=np.float64)
        for i in range(n_fr):
            env[i] = np.sqrt(np.mean(x[i * frame:(i + 1) * frame] ** 2))
        em = env.mean()
        if em > 0.0:
            out["env_depth"] = float(env.std() / em)
        env = env - em
        spec = np.abs(np.fft.rfft(env * np.hanning(n_fr)))
        spec *= spec
        total = spec[1:].sum()
        if total > 0.0:
            freqs = np.arange(len(spec)) * (100.0 / n_fr)
            band = spec[(freqs >= 2.0) & (freqs <= 8.0)].sum()
            out["mod_ratio"] = float(band / total)

    nf, hop = 1024, 512
    if len(x) >= nf:
        n_frames = 1 + (len(x) - nf) // hop
        win = np.hanning(nf)
        mags = []
        for i in range(n_frames):
            seg = x[i * hop: i * hop + nf]
            mags.append(np.abs(np.fft.rfft(seg * win)))
        mag = np.stack(mags)
        p = mag * mag
        pm = p.mean(axis=0)
        am = pm.mean()
        if am > 0.0:
            gm = np.exp(np.mean(np.log(pm + 1e-12)))
            out["flatness"] = float(gm / am)
        norms = mag.sum(axis=1, keepdims=True)
        ok = norms[:, 0] > 0.0
        if int(ok.sum()) >= 2:
            nm = mag[ok] / norms[ok]
            d = np.diff(nm, axis=0)
            out["flux"] = float(np.mean(np.sqrt((d * d).sum(axis=1))))
    return out


def classify_audio_twin(stats):
    from spiderray.functions.audiofp import (
        MUSIC_FLATNESS_MAX,
        SPEECH_DEPTH_MIN,
        SPEECH_MOD_MIN,
    )

    if (stats["mod_ratio"] >= SPEECH_MOD_MIN
            and stats["env_depth"] >= SPEECH_DEPTH_MIN):
        return "speech"
    if 0.0 < stats["flatness"] <= MUSIC_FLATNESS_MAX:
        return "music"
    return "other"


def speaker_turn_twin(pcm, sr, seg_frames=16, max_frames=4096):
    # log_mel_spectrogram is shared infrastructure (like the decoder);
    # the windowing, distance scan, peak logic and 2-means split are
    # re-derived below
    from spiderray.functions.audiofp import log_mel_spectrogram

    out = {"n_windows": 0, "turn_count": 0, "sep_ppm": 0}
    M = log_mel_spectrogram(pcm, sr, max_frames=max_frames)
    if len(M) < 2 * seg_frames:
        return out
    n_win = len(M) // seg_frames
    W = np.empty((n_win, M.shape[1]), dtype=M.dtype)
    for i in range(n_win):
        W[i] = M[i * seg_frames:(i + 1) * seg_frames].mean(axis=0)
    out["n_windows"] = int(n_win)
    d = np.empty(n_win - 1, dtype=np.float64)
    for i in range(n_win - 1):
        d[i] = np.sqrt(((W[i + 1] - W[i]) ** 2).sum())
    thr = 2.0 * float(np.median(d))
    turns = 0
    for i in range(1, len(d) - 1):
        if d[i] > thr and d[i] >= d[i - 1] and d[i] >= d[i + 1]:
            turns += 1
    out["turn_count"] = turns
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


def reverb_twin(pcm, sr, frame_ms=20.0):
    """Schroeder-style decay after the last burst (reverb_stats contract):
    framing / burst scan / tail cut / OLS re-derived with explicit loops,
    reduction forms pinned."""
    from spiderray.functions.audiofp import (
        BANDWIDTH_MAX_SAMPLES,
        MAX_RT60_MS,
        REVERB_FLOOR_DB,
        REVERB_OFFSET_DB,
    )

    out = {"rt60_ms": 0.0, "decay_db_s": 0.0}
    if sr <= 0 or pcm is None or len(pcm) == 0:
        return out
    x = np.asarray(pcm[:BANDWIDTH_MAX_SAMPLES], dtype=np.float64)
    w = int(round(sr * frame_ms / 1000.0))
    if w < 1:
        w = 1
    nf = len(x) // w
    if nf < 3:
        return out
    E = np.empty(nf, dtype=np.float64)
    for i in range(nf):
        E[i] = np.mean(x[i * w:(i + 1) * w] ** 2)
    if float(E.max()) <= 0.0:
        return out
    env = 10.0 * np.log10(np.maximum(E, 1e-20))
    peak = float(env.max())
    last_burst = -1  # scan backwards for the last frame near the peak
    for i in range(nf - 1, -1, -1):
        if env[i] >= peak - REVERB_OFFSET_DB:
            last_burst = i
            break
    tail_env = env[last_burst + 1:]
    floor = float(tail_env.min()) if len(tail_env) else peak
    cut_db = max(peak - REVERB_FLOOR_DB, floor + 3.0)
    end = len(env) - 1  # first tail frame at/below the cut, else clip end
    for i, v in enumerate(tail_env):
        if v <= cut_db:
            end = last_burst + 1 + i
            break
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


def channel_twin(x):
    """channel_stats contract re-derived: RMS per channel by loop, Pearson
    with explicit zero-mean sums."""
    from spiderray.functions.audiofp import BANDWIDTH_MAX_SAMPLES

    out = {"n_channels": 1, "lr_corr": 0.0, "rms_ratio": 1.0}
    if x is None or x.size == 0:
        return out
    if x.ndim == 1:
        x = x.reshape(-1, 1)
    x = np.asarray(x[:BANDWIDTH_MAX_SAMPLES], dtype=np.float64)
    out["n_channels"] = int(x.shape[1])
    if x.shape[1] < 2 or x.shape[0] == 0:
        return out
    # axis-0 reduction is a pinned form: numpy's 2-D column reduction
    # accumulates sequentially, not pairwise like a 1-D mean would
    rms = np.sqrt(np.mean(x * x, axis=0))
    mx = float(rms.max())
    out["rms_ratio"] = float(rms.min() / mx) if mx > 0.0 else 1.0
    l_ch = x[:, 0] - x[:, 0].mean()
    r_ch = x[:, 1] - x[:, 1].mean()
    denom = float(np.sqrt(np.sum(l_ch * l_ch) * np.sum(r_ch * r_ch)))
    if denom > 0.0:
        out["lr_corr"] = float(np.sum(l_ch * r_ch) / denom)
    return out


# ---------------------------------------------------------------------------
# The burn-down tests: regenerate each fixture table from the independent
# twin and require BIT-IDENTITY with the shared-kernel serial oracle — a
# semantics bug in the shared kernel can no longer pass both oracle sides.
# ---------------------------------------------------------------------------

SF_SMALL = "/root/testdata/sf0.001"


class TestFixtureRegeneration:
    def test_halluc_loops_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.pipelines.serial_oracles import _docs, so_halluc_loops
        from spiderray.pipelines.queries import _halluc_texts

        ref = so_halluc_loops(SF_SMALL)
        t = _docs(SF_SMALL)
        ids = t.column("doc_id").to_numpy()
        texts = _halluc_texts(ids, t.column("text").to_pylist())
        stats = [loop_stats_twin(x) for x in texts]
        twin = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array([s["n_words"] for s in stats], pa.int64()),
            "loop_period": pa.array(
                [s["loop_period"] for s in stats], pa.int64()),
            "loop_len": pa.array([s["loop_len"] for s in stats], pa.int64()),
            "loop_ratio_milli": pa.array(
                [int(np.floor(s["loop_ratio"] * 1000 + 0.5)) for s in stats],
                pa.int64()),
            "dup3_ratio_milli": pa.array(
                [int(np.floor(s["dup3_ratio"] * 1000 + 0.5)) for s in stats],
                pa.int64()),
            "halluc": pa.array([s["halluc"] for s in stats], pa.bool_()),
        })
        assert twin.equals(ref)

    def test_dtmf_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.pipelines.queries import _dtmfmix_clips_batch
        from spiderray.pipelines.serial_oracles import _docs, so_dtmf_scan
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_dtmf_scan(SF_SMALL)
        clips = _dtmfmix_clips_batch(_docs(SF_SMALL, ("doc_id",)))
        out = {"clip_id": [], "decode_ok": [], "dtmf_digits": [],
               "n_digits": [], "has_dtmf": []}
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                seq = dtmf_digits_twin(
                    _decode_one(buf or b"", codec or ""), int(sr or 0))
                ok = True
            except DecodeUnsupported:
                seq, ok = "", False
            out["clip_id"].append(cid)
            out["decode_ok"].append(ok)
            out["dtmf_digits"].append(seq)
            out["n_digits"].append(len(seq))
            out["has_dtmf"].append(ok and len(seq) >= 3)
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            "dtmf_digits": pa.array(out["dtmf_digits"], pa.string()),
            "n_digits": pa.array(out["n_digits"], pa.int64()),
            "has_dtmf": pa.array(out["has_dtmf"], pa.bool_()),
        })
        assert twin.equals(ref)

    def test_tempo_kernel_twin_bit_identical(self):
        from spiderray.functions.audiofp import tempo_stats

        rng = np.random.RandomState(11)
        sr = 16000
        cases = []
        # click tracks at several BPMs
        for bpm in (60, 90, 120, 150, 180):
            n = sr * 4
            x = np.zeros(n)
            period = int(sr * 60.0 / bpm)
            x[::period] = 1.0
            cases.append(np.convolve(x, np.hanning(64), mode="same"))
        # steady tone / noise / silence / short
        t = np.arange(sr * 2) / sr
        cases.append(0.5 * np.sin(2 * np.pi * 440 * t))
        cases.append(rng.randn(sr * 2) * 0.3)
        cases.append(np.zeros(sr))
        cases.append(np.zeros(100))
        for i, c in enumerate(cases):
            assert tempo_stats(c, sr) == tempo_stats_twin(c, sr), f"case {i}"

    def test_compress_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.pipelines.queries import _noisy_clips_batch
        from spiderray.pipelines.serial_oracles import (
            _docs,
            so_audio_compress,
        )
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_audio_compress(SF_SMALL)
        clips = _noisy_clips_batch(_docs(SF_SMALL, ("doc_id",)))
        out = {"clip_id": [], "compress_ok": [], "gain_reduction_db": [],
               "out_rms": []}
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                if len(pcm) == 0:
                    raise DecodeUnsupported("empty")
                y, gr = compress_dynamics_twin(pcm, int(sr or 0))
                ok = True
                rms = float(np.sqrt(np.mean(y.astype(np.float64) ** 2)))
            except DecodeUnsupported:
                ok, gr, rms = False, 0.0, 0.0
            out["clip_id"].append(cid)
            out["compress_ok"].append(ok)
            out["gain_reduction_db"].append(gr)
            out["out_rms"].append(rms)
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "compress_ok": pa.array(out["compress_ok"], pa.bool_()),
            "gain_reduction_db": pa.array(out["gain_reduction_db"],
                                          pa.float32()),
            "out_rms": pa.array(out["out_rms"], pa.float32()),
        })
        assert twin.equals(ref)

    def test_bandwidth_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.functions.audiofp import MIN_BW_RATIO
        from spiderray.pipelines.queries import _bandlimited_clips_batch
        from spiderray.pipelines.serial_oracles import (
            _docs,
            so_audio_bandwidth,
        )
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_audio_bandwidth(SF_SMALL)
        clips = _bandlimited_clips_batch(_docs(SF_SMALL, ("doc_id",)))
        out = {"clip_id": [], "decode_ok": [], "bw_hz": [], "bw_ratio": [],
               "upsampled": []}
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                stats = bandwidth_twin(
                    _decode_one(buf or b"", codec or ""), int(sr or 0))
                ok = True
            except DecodeUnsupported:
                stats, ok = {"bw_hz": 0.0, "bw_ratio": 0.0}, False
            out["clip_id"].append(cid)
            out["decode_ok"].append(ok)
            out["bw_hz"].append(stats["bw_hz"])
            out["bw_ratio"].append(stats["bw_ratio"])
            out["upsampled"].append(ok and stats["bw_ratio"] > 0.0
                                    and stats["bw_ratio"] < MIN_BW_RATIO)
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            "bw_hz": pa.array(out["bw_hz"], pa.float32()),
            "bw_ratio": pa.array(out["bw_ratio"], pa.float32()),
            "upsampled": pa.array(out["upsampled"], pa.bool_()),
        })
        assert twin.equals(ref)

    def test_humdc_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.functions.audiofp import MAX_DC_RATIO, MAX_HUM_RATIO
        from spiderray.pipelines.queries import _humdc_clips_batch
        from spiderray.pipelines.serial_oracles import _docs, so_audio_humdc
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_audio_humdc(SF_SMALL)
        clips = _humdc_clips_batch(_docs(SF_SMALL, ("doc_id",)))
        out = {"clip_id": [], "decode_ok": [], "dc_ratio": [],
               "hum_ratio": [], "dc_offset": [], "hum": []}
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                stats = hum_twin(
                    _decode_one(buf or b"", codec or ""), int(sr or 0))
                ok = True
            except DecodeUnsupported:
                stats, ok = {"dc_ratio": 0.0, "hum_ratio": 0.0}, False
            out["clip_id"].append(cid)
            out["decode_ok"].append(ok)
            out["dc_ratio"].append(stats["dc_ratio"])
            out["hum_ratio"].append(stats["hum_ratio"])
            out["dc_offset"].append(ok and stats["dc_ratio"] > MAX_DC_RATIO)
            out["hum"].append(ok and stats["hum_ratio"] > MAX_HUM_RATIO)
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            "dc_ratio": pa.array(out["dc_ratio"], pa.float32()),
            "hum_ratio": pa.array(out["hum_ratio"], pa.float32()),
            "dc_offset": pa.array(out["dc_offset"], pa.bool_()),
            "hum": pa.array(out["hum"], pa.bool_()),
        })
        assert twin.equals(ref)

    def test_music_detect_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.pipelines.queries import _musicmix_clips_batch
        from spiderray.pipelines.serial_oracles import _docs, so_music_detect
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_music_detect(SF_SMALL)
        clips = _musicmix_clips_batch(_docs(SF_SMALL, ("doc_id",)))
        keys = ("mod_ratio", "env_depth", "flatness", "flux")
        out = {"clip_id": [], "decode_ok": [], "audio_class": []}
        milli = {k: [] for k in keys}
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                stats = musicness_twin(
                    _decode_one(buf or b"", codec or ""), int(sr or 0))
                ok, klass = True, classify_audio_twin(stats)
            except DecodeUnsupported:
                stats = dict.fromkeys(keys, 0.0)
                ok, klass = False, "undecodable"
            out["clip_id"].append(cid)
            out["decode_ok"].append(ok)
            out["audio_class"].append(klass)
            for k in keys:
                milli[k].append(int(np.floor(stats[k] * 1000 + 0.5)))
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            "mod_ratio_milli": pa.array(milli["mod_ratio"], pa.int64()),
            "env_depth_milli": pa.array(milli["env_depth"], pa.int64()),
            "flatness_milli": pa.array(milli["flatness"], pa.int64()),
            "flux_milli": pa.array(milli["flux"], pa.int64()),
            "audio_class": pa.array(out["audio_class"], pa.string()),
        })
        assert twin.equals(ref)

    def test_reverb_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.functions.audiofp import MAX_REVERB_RT60_MS
        from spiderray.pipelines.queries import _reverb_clips_batch
        from spiderray.pipelines.serial_oracles import _docs, so_audio_reverb
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_audio_reverb(SF_SMALL)
        clips = _reverb_clips_batch(_docs(SF_SMALL, ("doc_id",)))
        out = {"clip_id": [], "decode_ok": [], "rt60_ms": [],
               "decay_db_s": [], "reverberant": []}
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                stats = reverb_twin(
                    _decode_one(buf or b"", codec or ""), int(sr or 0))
                ok = True
            except DecodeUnsupported:
                stats, ok = {"rt60_ms": 0.0, "decay_db_s": 0.0}, False
            out["clip_id"].append(cid)
            out["decode_ok"].append(ok)
            out["rt60_ms"].append(stats["rt60_ms"])
            out["decay_db_s"].append(stats["decay_db_s"])
            out["reverberant"].append(
                ok and stats["rt60_ms"] > MAX_REVERB_RT60_MS)
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            "rt60_ms": pa.array(out["rt60_ms"], pa.float32()),
            "decay_db_s": pa.array(out["decay_db_s"], pa.float32()),
            "reverberant": pa.array(out["reverberant"], pa.bool_()),
        })
        assert twin.equals(ref)

    def test_channel_kernel_twin_bit_identical(self):
        from spiderray.functions.audiofp import channel_stats

        rng = np.random.RandomState(31)
        n = 16000
        mono = rng.randn(n) * 0.3
        cases = [
            np.stack([mono, mono], axis=1),                    # fake stereo
            np.stack([mono, -mono], axis=1),                   # inverted
            np.stack([mono, np.zeros(n)], axis=1),             # dead channel
            np.stack([mono, rng.randn(n) * 0.3], axis=1),      # real stereo
            np.stack([mono, mono * 0.5, mono * 0.1], axis=1),  # 3-channel
            mono,                                              # mono 1-D
            np.zeros((n, 2)),                                  # silence
            np.zeros(0),                                       # empty
        ]
        for i, c in enumerate(cases):
            assert channel_stats(c) == channel_twin(c), i

    def test_speaker_turn_kernel_twin_bit_identical(self):
        from spiderray.functions.audiofp import speaker_turn_stats

        rng = np.random.RandomState(23)
        sr = 16000

        def voice(f1, f2, length, phase=0.0):
            t = np.arange(length) / sr
            return 0.4 * (np.sin(2 * np.pi * f1 * t + phase)
                          + 0.3 * np.sin(2 * np.pi * f2 * t))

        cases = []
        # alternating-voice conversation
        conv = np.concatenate([
            voice(140, 1100, sr) if i % 2 == 0 else voice(260, 2400, sr)
            for i in range(6)])
        cases.append(conv)
        cases.append(voice(180, 1500, sr * 4))       # monologue
        cases.append(rng.randn(sr * 3) * 0.2)        # noise
        cases.append(np.zeros(sr * 2))               # silence
        cases.append(np.zeros(100))                  # too short
        for i, c in enumerate(cases):
            assert speaker_turn_stats(c, sr) == speaker_turn_twin(c, sr), i

    def test_compress_kernel_twin_bit_identical_samples(self):
        from spiderray.functions.audiofp import compress_dynamics

        rng = np.random.RandomState(3)
        sr = 16000
        for i in range(5):
            x = np.clip(rng.randn(sr + i * 1000) * (0.2 + 0.3 * i), -1, 1)
            ya, ga = compress_dynamics(x, sr)
            yb, gb = compress_dynamics_twin(x, sr)
            assert ga == gb and np.array_equal(ya, yb), f"case {i}"


class TestAdaptivePool:
    def test_model_pool_respects_requested_cap(self, monkeypatch):
        """Model pools (the only remaining _adaptive_pool callers) hold a
        model copy per actor — the requested size is a MEMORY bound and
        must never be silently raised on a big host."""
        from spiderray.stages import perplexity_stage as ps

        class FakeRay:
            @staticmethod
            def cluster_resources():
                return {"CPU": 64.0}

        monkeypatch.setitem(
            __import__("sys").modules, "ray", FakeRay())
        assert ps._adaptive_pool(4) == 4
        assert ps._adaptive_pool(2) == 2

    def test_clamps_down_on_small_sessions(self, monkeypatch):
        from spiderray.stages import perplexity_stage as ps

        class FakeRay:
            @staticmethod
            def cluster_resources():
                return {"CPU": 4.0}

        monkeypatch.setitem(
            __import__("sys").modules, "ray", FakeRay())
        # 1/4 of the session (deadlock note)
        assert ps._adaptive_pool(4) == 1

    def test_explicit_tuple_passes_through(self):
        from spiderray.stages import perplexity_stage as ps

        assert ps._adaptive_pool((3, 7)) == (3, 7)

    def test_task_cap_scales_with_session(self, monkeypatch):
        """Tasks hold no model state: the cap rides the session size."""
        from spiderray.stages import perplexity_stage as ps

        class FakeRay:
            @staticmethod
            def cluster_resources():
                return {"CPU": 32.0}

        monkeypatch.setitem(
            __import__("sys").modules, "ray", FakeRay())
        assert ps._adaptive_tasks(4) == 16


# ---------------------------------------------------------------------------
# Independent loudness (BS.1770) + defect twins.  The biquad coefficients
# are ITU-R BS.1770-4 Table 1/2 data; block framing, Parseval scaling, the
# two-stage gate, the LRA percentile window and the run/flag logic are
# re-derived below (reduction forms pinned as before).
# ---------------------------------------------------------------------------

def loudness_twin(pcm, sr):
    FLOOR = -99.0
    out = {"lufs_integrated": FLOOR, "lufs_range": 0.0,
           "clip_ratio": 0.0, "dc_offset": 0.0}
    if sr <= 0 or len(pcm) == 0:
        return out
    # K-weighting cascade magnitude^2 at physical Hz (biquads defined at
    # 48 kHz; BS.1770-4 Table 1/2 coefficients = spec data)
    SH_B = (1.53512485958697, -2.69169618940638, 1.19839281085285)
    SH_A = (1.0, -1.69065929318241, 0.73248077421585)
    HP_B = (1.0, -2.0, 1.0)
    HP_A = (1.0, -1.99004745483398, 0.99007225036621)

    blen = max(int(sr * 400 / 1000), 2)
    step = max(int(sr * 100 / 1000), 1)
    x = np.asarray(pcm, dtype=np.float64)
    if len(x) >= blen:
        freqs = np.fft.rfftfreq(blen, d=1.0 / sr)
        w = 2.0 * np.pi * freqs / 48000.0
        z1 = np.exp(-1j * w)
        z2 = z1 * z1

        def h2(b, a):
            num = b[0] + b[1] * z1 + b[2] * z2
            den = a[0] + a[1] * z1 + a[2] * z2
            return ((num.real ** 2 + num.imag ** 2)
                    / (den.real ** 2 + den.imag ** 2))

        w2 = h2(SH_B, SH_A) * h2(HP_B, HP_A)
        # Parseval for rfft, re-derived: every bin twice except DC and
        # (even blen) Nyquist, /blen^2 -> time-domain mean square
        scale = np.where(np.arange(len(w2)) == 0, 1.0, 2.0)
        if blen % 2 == 0:
            scale[-1] = 1.0
        w2s = w2 * scale / (blen * blen)
        n_blocks = 1 + (len(x) - blen) // step
        # batched rfft kept (pocketfft row plan == the engine's) — the
        # framing INDEX construction below is the re-derived part
        rows = np.empty((n_blocks, blen), dtype=np.float64)
        for i in range(n_blocks):
            rows[i] = x[i * step: i * step + blen]
        X = np.fft.rfft(rows, axis=1)
        ms = ((X.real ** 2 + X.imag ** 2) * w2s).sum(axis=1)
        with np.errstate(divide="ignore"):
            bl = -0.691 + 10.0 * np.log10(ms)
        # two-stage gate, re-derived from BS.1770 §4: -70 LKFS absolute,
        # then -10 LU under the absolutely-gated energy mean
        absd = bl[bl > -70.0]
        if absd.size:
            mean_ms = np.mean(10.0 ** ((absd + 0.691) / 10.0))
            rel_thresh = -0.691 + 10.0 * np.log10(mean_ms) - 10.0
            gated = absd[absd > rel_thresh]
            if gated.size:
                out["lufs_integrated"] = float(max(
                    -0.691 + 10.0 * np.log10(
                        np.mean(10.0 ** ((gated + 0.691) / 10.0))),
                    FLOOR))
            # EBU R128 LRA: -20 LU relative gate, 10th->95th percentile
            rel20 = absd[absd > -0.691 + 10.0 * np.log10(mean_ms) - 20.0]
            if rel20.size >= 2:
                lo, hi = np.percentile(rel20, [10.0, 95.0])
                out["lufs_range"] = float(hi - lo)
    out["clip_ratio"] = float(np.mean(np.abs(pcm) >= 0.999))
    out["dc_offset"] = float(np.mean(pcm))
    return out


def _max_run_twin(mask):
    best = cur = 0
    for v in mask:
        if v:
            cur += 1
            if cur > best:
                best = cur
        else:
            cur = 0
    return best


def clipping_twin(pcm, sr, clip_thresh=0.999):
    out = {"clip_ratio": 0.0, "max_clip_run_ms": 0.0,
           "max_zero_run_ms": 0.0, "peak": 0.0}
    if sr <= 0 or pcm is None or len(pcm) == 0:
        return out
    a = np.abs(pcm.astype(np.float64))
    out["peak"] = float(a.max())
    clipped = a >= clip_thresh
    out["clip_ratio"] = float(np.mean(clipped))
    out["max_clip_run_ms"] = _max_run_twin(clipped) * 1000.0 / sr
    out["max_zero_run_ms"] = _max_run_twin(a == 0.0) * 1000.0 / sr
    return out


class TestLoudnessDefectTwins:
    def test_loudness_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.pipelines.serial_oracles import (
            _clips,
            so_audio_loudness,
        )
        from spiderray.stages.audioquality import MAX_CLIP_RATIO, MIN_LUFS
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_audio_loudness(SF_SMALL)
        clips = _clips(SF_SMALL)
        keys = ("lufs_integrated", "lufs_range", "clip_ratio", "dc_offset")
        out = {k: [] for k in ("clip_id", "decode_ok", "too_quiet",
                               "clipped")}
        vals = {k: [] for k in keys}
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                stats = loudness_twin(
                    _decode_one(buf or b"", codec or ""), int(sr or 0))
                ok = True
            except DecodeUnsupported:
                stats = dict.fromkeys(keys, 0.0)
                ok = False
            out["clip_id"].append(cid)
            out["decode_ok"].append(ok)
            out["too_quiet"].append(
                ok and stats["lufs_integrated"] < MIN_LUFS)
            out["clipped"].append(
                ok and stats["clip_ratio"] > MAX_CLIP_RATIO)
            for k in keys:
                vals[k].append(stats[k])
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            "lufs_integrated": pa.array(vals["lufs_integrated"],
                                        pa.float32()),
            "lufs_range": pa.array(vals["lufs_range"], pa.float32()),
            "clip_ratio": pa.array(vals["clip_ratio"], pa.float32()),
            "dc_offset": pa.array(vals["dc_offset"], pa.float32()),
            "too_quiet": pa.array(out["too_quiet"], pa.bool_()),
            "clipped": pa.array(out["clipped"], pa.bool_()),
        })
        assert twin.equals(ref)

    def test_defects_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.pipelines.serial_oracles import (
            _clips,
            so_audio_defects,
        )
        from spiderray.stages.audioquality import (
            MAX_CLIP_RATIO,
            MAX_CLIP_RUN_MS,
            MIN_DROPOUT_MS,
            distorted_clips_batch,
        )
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_audio_defects(SF_SMALL)
        clips = distorted_clips_batch(_clips(SF_SMALL))
        keys = ("clip_ratio", "max_clip_run_ms", "max_zero_run_ms", "peak")
        out = {k: [] for k in ("clip_id", "decode_ok", "clipped", "dropout")}
        vals = {k: [] for k in keys}
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                stats = clipping_twin(
                    _decode_one(buf or b"", codec or ""), int(sr or 0))
                ok = True
            except DecodeUnsupported:
                stats = dict.fromkeys(keys, 0.0)
                ok = False
            out["clip_id"].append(cid)
            out["decode_ok"].append(ok)
            out["clipped"].append(
                ok and (stats["clip_ratio"] >= MAX_CLIP_RATIO
                        or stats["max_clip_run_ms"] >= MAX_CLIP_RUN_MS))
            out["dropout"].append(
                ok and stats["peak"] > 0.0
                and stats["max_zero_run_ms"] >= MIN_DROPOUT_MS)
            for k in keys:
                vals[k].append(stats[k])
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            "clip_ratio": pa.array(vals["clip_ratio"], pa.float32()),
            "max_clip_run_ms": pa.array(vals["max_clip_run_ms"],
                                        pa.float32()),
            "max_zero_run_ms": pa.array(vals["max_zero_run_ms"],
                                        pa.float32()),
            "peak": pa.array(vals["peak"], pa.float32()),
            "clipped": pa.array(out["clipped"], pa.bool_()),
            "dropout": pa.array(out["dropout"], pa.bool_()),
        })
        assert twin.equals(ref)


# ---------------------------------------------------------------------------
# Independent SNR + pitch twins — the noisy/unvoiced keep/drop gates.
# Framing loops, quantile-count arithmetic, the lag scan, voicing rules and
# parabolic interpolation re-derived; rfft/irfft and the np.mean/median
# reduction forms pinned as before.
# ---------------------------------------------------------------------------

def snr_twin(pcm, sr, frame_ms=30.0):
    EPS = 1e-12
    out = {"snr_db": 0.0, "noise_floor_db": -120.0, "active_ratio": 0.0}
    if sr <= 0 or pcm is None or len(pcm) == 0:
        return out
    flen = int(sr * frame_ms / 1000.0)
    if flen < 1:
        flen = 1
    n_frames = len(pcm) // flen
    if n_frames < 1:
        return out
    x = np.asarray(pcm[: n_frames * flen], dtype=np.float64)
    powers = np.empty(n_frames, dtype=np.float64)
    for i in range(n_frames):
        seg = x[i * flen:(i + 1) * flen]
        powers[i] = np.mean(seg * seg)
    order = np.sort(powers)
    n_noise = int(round(0.2 * n_frames))
    if n_noise < 1:
        n_noise = 1
    n_sig = int(round(0.5 * n_frames))
    if n_sig < 1:
        n_sig = 1
    noise_p = float(np.mean(order[:n_noise]))
    sig_p = float(np.mean(order[n_frames - n_sig:]))
    nf = 10.0 * np.log10(noise_p + EPS)
    out["noise_floor_db"] = nf if nf > -120.0 else -120.0
    snr = 10.0 * np.log10((sig_p + EPS) / (noise_p + EPS))
    out["snr_db"] = snr if snr > 0.0 else 0.0
    if noise_p > 0:
        out["active_ratio"] = float(np.mean(powers > 4.0 * noise_p))
    else:
        out["active_ratio"] = float(np.mean(powers > EPS))
    return out


def pitch_twin(pcm, sr, fmin=50.0, fmax=450.0, frame_ms=40.0, clarity=0.5,
               max_frames=512):
    EPS = 1e-12
    out = {"f0_hz": 0.0, "voiced_ratio": 0.0}
    if sr <= 0 or pcm is None:
        return out
    flen = int(sr * frame_ms / 1000.0)
    lag_min = max(2, int(sr / fmax))
    lag_max = int(sr / fmin)
    if flen < 16 or lag_max + 2 >= flen or len(pcm) < flen:
        return out
    n_frames = min(len(pcm) // flen, max_frames)
    nfft = 1
    while nfft < 2 * flen:
        nfft *= 2
    hi = min(lag_max, flen - 2)
    f0s, n_voiced = [], 0
    for i in range(n_frames):
        seg = np.asarray(pcm[i * flen:(i + 1) * flen], dtype=np.float64)
        seg = seg - seg.mean()
        spec = np.abs(np.fft.rfft(seg, n=nfft)) ** 2
        r = np.fft.irfft(spec, n=nfft)[:flen]
        r0 = r[0]
        if not r0 > 1e-7 * flen:       # silence guard
            continue
        # first-max lag scan, re-derived as an explicit walk
        best_lag, best_v = lag_min, r[lag_min]
        for lag in range(lag_min + 1, hi + 1):
            if r[lag] > best_v:
                best_lag, best_v = lag, r[lag]
        cl = best_v / r0 if r0 > 0 else 0.0
        if not cl > clarity:
            continue
        n_voiced += 1
        rm1, rp1 = r[best_lag - 1], r[best_lag + 1]
        denom = rm1 - 2.0 * best_v + rp1
        delta = 0.5 * (rm1 - rp1) / denom if abs(denom) > EPS else 0.0
        if delta < -0.5:
            delta = -0.5
        elif delta > 0.5:
            delta = 0.5
        f0s.append(sr / (best_lag + delta))
    if not n_voiced:
        return out
    out["f0_hz"] = float(np.median(np.asarray(f0s)))
    out["voiced_ratio"] = float(np.float64(n_voiced) / np.float64(n_frames))
    return out


class TestSnrPitchTwins:
    def test_snr_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.pipelines.serial_oracles import _clips, so_audio_snr
        from spiderray.stages.audioquality import (
            MIN_SNR_DB,
            MIN_VOICED_RATIO,
        )
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_audio_snr(SF_SMALL)
        clips = _clips(SF_SMALL)
        keys = ("snr_db", "noise_floor_db", "active_ratio", "f0_hz",
                "voiced_ratio")
        out = {k: [] for k in ("clip_id", "decode_ok", "noisy", "unvoiced")}
        vals = {k: [] for k in keys}
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                stats = {**snr_twin(pcm, int(sr or 0)),
                         **pitch_twin(pcm, int(sr or 0))}
                ok = True
            except DecodeUnsupported:
                stats = dict.fromkeys(keys, 0.0)
                ok = False
            out["clip_id"].append(cid)
            out["decode_ok"].append(ok)
            has_signal = ok and stats["active_ratio"] > 0.0
            out["noisy"].append(has_signal and stats["snr_db"] < MIN_SNR_DB)
            out["unvoiced"].append(
                ok and stats["voiced_ratio"] < MIN_VOICED_RATIO)
            for k in keys:
                vals[k].append(stats[k])
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            **{k: pa.array(vals[k], pa.float32()) for k in keys},
            "noisy": pa.array(out["noisy"], pa.bool_()),
            "unvoiced": pa.array(out["unvoiced"], pa.bool_()),
        })
        assert twin.equals(ref)


# ---------------------------------------------------------------------------
# Independent VAD segmenter — the utterance-cutting path prepare_speech
# feeds from.  The merge-and-prune rule (bridge gaps < min_gap, then drop
# runs < min_seg) is re-derived as a single explicit scan state machine;
# frame-RMS framing by loop.
# ---------------------------------------------------------------------------

def vad_segments_twin(pcm, sr, frame_ms=20, threshold=1e-3,
                      min_gap_ms=200, min_seg_ms=200):
    """-> [(start_frame, end_frame_exclusive, seg_rms), ...]"""
    if sr <= 0 or len(pcm) == 0:
        return []
    flen = max(int(sr * frame_ms / 1000), 1)
    n_frames = len(pcm) // flen
    if n_frames == 0:
        return []
    min_gap = max(int(round(min_gap_ms / frame_ms)), 1)
    min_seg = max(int(round(min_seg_ms / frame_ms)), 1)
    x = np.asarray(pcm[: n_frames * flen])
    mask = np.empty(n_frames, dtype=bool)
    for i in range(n_frames):
        seg = x[i * flen:(i + 1) * flen].astype(np.float64)
        mask[i] = np.sqrt((seg ** 2).mean()) >= threshold
    # one forward scan: open a segment at speech, extend across gaps
    # shorter than min_gap, close otherwise
    segs = []
    start = None
    last_speech = None
    for i in range(n_frames):
        if mask[i]:
            if start is None:
                start = i
            elif i - (last_speech + 1) >= min_gap:
                segs.append((start, last_speech + 1))
                start = i
            last_speech = i
    if start is not None:
        segs.append((start, last_speech + 1))
    out = []
    for s, e in segs:
        if e - s < min_seg:
            continue
        seg = pcm[s * flen: e * flen].astype(np.float64)
        out.append((s, e, float(np.sqrt(np.mean(seg ** 2)))))
    return out


class TestVadTwin:
    def test_vad_segments_fixture_from_twin(self):
        import pandas as pd

        from spiderray.pipelines.serial_oracles import (
            _clips,
            so_vad_segments,
        )
        from spiderray.stages.multimodal import (
            DecodeUnsupported,
            _decode_one,
            gapped_clips_batch,
        )

        ref = so_vad_segments(SF_SMALL)
        clips = gapped_clips_batch(_clips(SF_SMALL))
        rows = []
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                pcm = _decode_one(buf or b"", codec or "")
            except DecodeUnsupported:
                continue
            sr = int(sr or 0)
            if sr <= 0 or len(pcm) == 0:
                continue
            for k, (s, e, rms) in enumerate(vad_segments_twin(pcm, sr)):
                rows.append({
                    "clip_id": cid, "seg_idx": k, "start_ms": s * 20,
                    "end_ms": e * 20, "dur_ms": (e - s) * 20,
                    "seg_rms_milli": int(np.floor(rms * 1000 + 0.5)),
                })
        twin = pd.DataFrame(rows)
        for c in ("seg_idx", "start_ms", "end_ms", "dur_ms",
                  "seg_rms_milli"):
            twin[c] = twin[c].astype(np.int64)
        exp = ref.to_pandas() if hasattr(ref, "to_pandas") else ref
        exp = exp.reset_index(drop=True)
        twin = twin[list(exp.columns)].reset_index(drop=True)
        pd.testing.assert_frame_equal(twin, exp)

    def test_segmenter_rules(self):
        sr = 16000
        frame = sr // 50  # 20 ms
        # speech(400ms) gap(100ms) speech(400ms): bridged into one segment
        a = np.concatenate([np.ones(frame * 20) * 0.5, np.zeros(frame * 5),
                            np.ones(frame * 20) * 0.5])
        segs = vad_segments_twin(a, sr)
        assert len(segs) == 1 and segs[0][0] == 0 and segs[0][1] == 45
        # speech(400ms) gap(300ms) speech(100ms): split, short run dropped
        b = np.concatenate([np.ones(frame * 20) * 0.5, np.zeros(frame * 15),
                            np.ones(frame * 5) * 0.5])
        segs = vad_segments_twin(b, sr)
        assert len(segs) == 1 and segs[0][1] == 20
        assert vad_segments_twin(np.zeros(sr), sr) == []


# ---------------------------------------------------------------------------
# Independent mel-filterbank / DCT / MFCC twin — closes the "log-mel is
# shared infrastructure" residual of the speaker-turn twin: the filterbank
# triangles and the orthonormal DCT-II are re-derived per-filter /
# per-coefficient from the HTK mel formulas; framing by loop; rfft and the
# matmul/mean reduction forms pinned.
# ---------------------------------------------------------------------------

def mel_dct_twin(sr, n_fft, n_mels, n_mfcc):
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64)
                                 / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64)
                                 / 2595.0) - 1.0)

    pts = mel_to_hz(np.linspace(0.0, hz_to_mel(sr / 2.0), n_mels + 2))
    bins = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    fb = np.zeros((n_mels, len(bins)), dtype=np.float64)
    for m in range(n_mels):
        lo, mid, hi = pts[m], pts[m + 1], pts[m + 2]
        dlo = mid - lo if mid - lo > 1e-9 else 1e-9
        dhi = hi - mid if hi - mid > 1e-9 else 1e-9
        up = (bins - lo) / dlo
        down = (hi - bins) / dhi
        tri = np.minimum(up, down)
        fb[m] = np.clip(tri, 0.0, None)
    dct = np.empty((n_mfcc, n_mels), dtype=np.float64)
    for k in range(n_mfcc):
        for m in range(n_mels):
            dct[k, m] = (np.sqrt(2.0 / n_mels)
                         * np.cos(np.pi * k * (2 * m + 1) / (2 * n_mels)))
    dct[0] /= np.sqrt(2.0)
    return fb, dct


def mfcc_mean_twin(pcm, sr, frame=512, hop=256, n_mels=24, n_mfcc=13,
                   max_frames=512):
    if sr <= 0 or len(pcm) < frame:
        return np.zeros(n_mfcc, dtype=np.float64)
    x = np.asarray(pcm[: frame + hop * max_frames], dtype=np.float64)
    n_frames = 1 + (len(x) - frame) // hop
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / (frame - 1))
    rows = np.empty((n_frames, frame), dtype=np.float64)
    for i in range(n_frames):
        rows[i] = x[i * hop: i * hop + frame]
    spec = np.abs(np.fft.rfft(rows * win, axis=1)) ** 2
    fb, dct = mel_dct_twin(sr, frame, n_mels, n_mfcc)
    mel = np.log(spec @ fb.T + 1e-10)
    return (mel @ dct.T).mean(axis=0)


class TestMfccTwin:
    def test_filterbank_and_dct_bit_identical(self):
        from spiderray.functions.audiofp import _mel_dct

        for sr in (8000, 16000, 44100):
            fb_e, dct_e = _mel_dct(sr, 512, 24, 13)
            fb_t, dct_t = mel_dct_twin(sr, 512, 24, 13)
            assert np.array_equal(fb_e, fb_t), sr
            assert np.array_equal(dct_e, dct_t), sr

    def test_hann_window_matches_engine(self):
        from spiderray.functions.audiofp import _hann

        win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(512) / 511)
        assert np.allclose(_hann(512), win, rtol=0, atol=0) or \
            np.array_equal(_hann(512), np.hanning(512))

    def test_mfcc_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.pipelines.serial_oracles import _clips, so_audio_mfcc
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_audio_mfcc(SF_SMALL)
        clips = _clips(SF_SMALL)
        out = {"clip_id": [], "decode_ok": []}
        vecs = []
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                v = mfcc_mean_twin(
                    _decode_one(buf or b"", codec or ""), int(sr or 0))
                ok = True
            except DecodeUnsupported:
                v, ok = np.zeros(13), False
            out["clip_id"].append(cid)
            out["decode_ok"].append(ok)
            vecs.append(v)
        V = np.stack(vecs)
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            **{f"mfcc_{k}": pa.array(V[:, k].astype(np.float32),
                                     pa.float32()) for k in range(13)},
        })
        assert twin.equals(ref)


# ---------------------------------------------------------------------------
# Independent spectral-features twin: rolloff by explicit accumulation scan,
# dominant by first-max walk, ZCR by sign-change count; the centroid /
# bandwidth moment sums keep the pinned reduction forms.
# ---------------------------------------------------------------------------

def spectral_twin(pcm, sr):
    zeros = {"centroid_hz": 0.0, "bandwidth_hz": 0.0, "rolloff_hz": 0.0,
             "dominant_hz": 0.0, "zcr": 0.0}
    x = np.asarray(pcm[: 1 << 16], dtype=np.float64)
    if len(x) < 2 or not np.any(x):
        return zeros
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), d=1.0 / (sr if sr > 1 else 1))
    power = mag * mag
    total = power.sum()
    if total <= 0:
        return zeros
    centroid = float((freqs * power).sum() / total)
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * power).sum()
                              / total))
    # rolloff: first bin where the running energy reaches 85% — explicit
    # sequential accumulation (== cumsum order)
    target = 0.85 * total
    acc = 0.0
    k = len(power)
    for i, e in enumerate(power):
        acc += e
        if acc >= target:
            k = i
            break
    rolloff = float(freqs[k])
    # dominant: first-max walk over the magnitude spectrum
    best_i, best_v = 0, mag[0]
    for i in range(1, len(mag)):
        if mag[i] > best_v:
            best_i, best_v = i, mag[i]
    dominant = float(freqs[best_i])
    # ZCR: sign-change count over adjacent samples (signbit semantics:
    # -0.0 is negative, +0.0 positive)
    flips = 0
    prev = bool(np.signbit(x[0]))
    for v in x[1:]:
        cur = bool(np.signbit(v))
        if cur != prev:
            flips += 1
        prev = cur
    zcr = float(np.float64(flips) / np.float64(len(x) - 1))
    return {"centroid_hz": centroid, "bandwidth_hz": bandwidth,
            "rolloff_hz": rolloff, "dominant_hz": dominant, "zcr": zcr}


class TestSpectralTwin:
    def test_spectral_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.pipelines.serial_oracles import (
            _clips,
            so_audio_spectral,
        )
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_audio_spectral(SF_SMALL)
        clips = _clips(SF_SMALL)
        keys = ("centroid_hz", "bandwidth_hz", "rolloff_hz", "dominant_hz",
                "zcr")
        out = {"clip_id": [], "decode_ok": []}
        vals = {k: [] for k in keys}
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                feats = spectral_twin(
                    _decode_one(buf or b"", codec or ""), int(sr or 0))
                ok = True
            except DecodeUnsupported:
                feats, ok = dict.fromkeys(keys, 0.0), False
            out["clip_id"].append(cid)
            out["decode_ok"].append(ok)
            for k in keys:
                vals[k].append(feats[k])
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            **{k: pa.array(vals[k], pa.float32()) for k in keys},
        })
        assert twin.equals(ref)


class TestFeaturesTwin:
    def test_features_fixture_from_twin(self):
        """Base per-clip features (n_samples / audio_rms / clip_ratio) —
        the columns every downstream audio stage keys on — re-derived with
        explicit comparisons (strict > 0.999 for the clip ratio, not >=)."""
        import pyarrow as pa

        from spiderray.pipelines.serial_oracles import (
            _clips,
            so_audio_features,
        )
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_audio_features(SF_SMALL)
        clips = _clips(SF_SMALL)
        out = {"clip_id": [], "codec": [], "decode_ok": [], "n_samples": [],
               "audio_rms": [], "clip_ratio": []}
        for cid, buf, codec in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
        ):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                ok = True
            except DecodeUnsupported:
                pcm, ok = np.zeros(0), False
            out["clip_id"].append(cid)
            out["codec"].append(codec)
            out["decode_ok"].append(ok)
            out["n_samples"].append(len(pcm) if ok else 0)
            if ok and len(pcm):
                out["audio_rms"].append(float(np.sqrt(np.mean(pcm ** 2))))
                a = np.abs(pcm)
                out["clip_ratio"].append(float(np.mean(a > 0.999)))
            else:
                out["audio_rms"].append(0.0)
                out["clip_ratio"].append(0.0)
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "codec": pa.array(out["codec"], pa.string()),
            "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
            "n_samples": pa.array(out["n_samples"], pa.int32()),
            "audio_rms": pa.array(
                np.asarray(out["audio_rms"], np.float32), pa.float32()),
            "clip_ratio": pa.array(
                np.asarray(out["clip_ratio"], np.float32), pa.float32()),
        })
        assert twin.equals(ref)


# ---------------------------------------------------------------------------
# Independent silence-trim + loudness-normalize twins — the prepare_speech
# chain's transforms.  Trim re-derives the active-window cut (first/last
# frame above threshold, ±pad, clamped) with a scan; normalize re-derives
# the gain rule (target − measured, clamped to ±max) on top of the
# loudness twin above.
# ---------------------------------------------------------------------------

def silence_trim_twin(pcm, sr, frame_ms=20, threshold=1e-3, pad_ms=40):
    """-> (trim_ok, trimmed_ms, out_n_samples)"""
    if sr <= 0 or len(pcm) == 0:
        return False, 0, 0
    flen = max(int(sr * frame_ms / 1000), 1)
    n_frames = len(pcm) // flen
    first = last = -1
    for i in range(n_frames):
        seg = pcm[i * flen:(i + 1) * flen].astype(np.float64)
        if np.sqrt((seg ** 2).mean()) >= threshold:
            if first < 0:
                first = i
            last = i
    if first < 0:
        return False, 0, len(pcm)
    pad = int(sr * pad_ms / 1000)
    start = first * flen - pad
    if start < 0:
        start = 0
    end = (last + 1) * flen + pad
    if end > len(pcm):
        end = len(pcm)
    out_n = end - start
    return True, int((len(pcm) - out_n) * 1000 / sr), out_n


def loudness_normalize_twin(pcm, sr, target_lufs=-16.0, max_gain_db=30.0):
    """-> (norm_ok, gain_db_milli, lufs_out)"""
    if sr <= 0 or len(pcm) == 0:
        return False, 0, 0.0
    measured = loudness_twin(pcm, sr)["lufs_integrated"]
    gain_db = target_lufs - measured
    if gain_db > max_gain_db:
        gain_db = max_gain_db
    elif gain_db < -max_gain_db:
        gain_db = -max_gain_db
    y = np.clip(pcm.astype(np.float64) * (10.0 ** (gain_db / 20.0)),
                -1.0, 1.0).astype(np.float32)
    return (True, int(round(gain_db * 1000)),
            float(loudness_twin(y, sr)["lufs_integrated"]))


class TestTrimNormalizeTwins:
    def test_silence_trim_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.pipelines.serial_oracles import _clips, so_silence_trim
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_silence_trim(SF_SMALL)
        clips = _clips(SF_SMALL)
        out = {"clip_id": [], "trim_ok": [], "trimmed_ms": [],
               "out_n_samples": []}
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                if int(sr or 0) <= 0 or len(pcm) == 0:
                    raise DecodeUnsupported("empty")
                ok, tms, n = silence_trim_twin(pcm, int(sr or 0))
            except DecodeUnsupported:
                ok, tms, n = False, 0, 0
            out["clip_id"].append(cid)
            out["trim_ok"].append(ok)
            out["trimmed_ms"].append(tms)
            out["out_n_samples"].append(n)
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "trim_ok": pa.array(out["trim_ok"], pa.bool_()),
            "trimmed_ms": pa.array(out["trimmed_ms"], pa.int32()),
            "out_n_samples": pa.array(out["out_n_samples"], pa.int32()),
        })
        assert twin.equals(ref)

    def test_loudness_normalize_fixture_from_twin(self):
        import pyarrow as pa

        from spiderray.pipelines.serial_oracles import (
            _clips,
            so_loudness_normalize,
        )
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_loudness_normalize(SF_SMALL)
        clips = _clips(SF_SMALL)
        out = {"clip_id": [], "norm_ok": [], "gain_db_milli": [],
               "lufs_out": []}
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                if int(sr or 0) <= 0 or len(pcm) == 0:
                    raise DecodeUnsupported("empty")
                ok, gmilli, lout = loudness_normalize_twin(pcm, int(sr or 0))
            except DecodeUnsupported:
                ok, gmilli, lout = False, 0, 0.0
            out["clip_id"].append(cid)
            out["norm_ok"].append(ok)
            out["gain_db_milli"].append(gmilli)
            out["lufs_out"].append(lout)
        twin = pa.table({
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "norm_ok": pa.array(out["norm_ok"], pa.bool_()),
            "gain_db_milli": pa.array(out["gain_db_milli"], pa.int32()),
            "lufs_out": pa.array(
                np.asarray(out["lufs_out"], np.float32), pa.float32()),
        })
        assert twin.equals(ref)


# ---------------------------------------------------------------------------
# Independent window-chunker twin — the fixed-receptive-field ASR batching
# cut.  Window walk, tail rule and the ms arithmetic re-derived with a
# while loop (the engine uses a range(0, n, hop) for with a break).
# ---------------------------------------------------------------------------

def window_chunks_twin(pcm, sr, win_ms=100, hop_ms=50, min_tail_ms=30):
    """-> [(win_idx, start_ms, end_ms, dur_ms, win_rms), ...]"""
    if sr <= 0 or len(pcm) == 0:
        return []
    wlen = max(int(sr * win_ms / 1000), 1)
    hop = max(int(sr * hop_ms / 1000), 1)
    tail_min = int(sr * min_tail_ms / 1000)
    if tail_min < 1:
        tail_min = 1
    rows = []
    s, k = 0, 0
    n = len(pcm)
    while s < n:
        e = s + wlen
        if e > n:
            e = n
        if s > 0 and e - s < tail_min:
            break
        w = pcm[s:e].astype(np.float64)
        rows.append((k, int(s * 1000 / sr), int(e * 1000 / sr),
                     int((e - s) * 1000 / sr),
                     float(np.sqrt(np.mean(w ** 2)))))
        k += 1
        if s + wlen >= n:  # a window reached the clip end: later hops
            break          # would only re-cover the same tail
        s += hop
    return rows


class TestWindowChunkTwin:
    def test_windows_fixture_from_twin(self):
        import pandas as pd

        from spiderray.pipelines.serial_oracles import (
            _clips,
            so_audio_windows,
        )
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        ref = so_audio_windows(SF_SMALL)
        clips = _clips(SF_SMALL)
        rows = []
        for cid, buf, codec, sr in zip(
            clips.column("clip_id").to_pylist(),
            clips.column("bytes").to_pylist(),
            clips.column("codec").to_pylist(),
            clips.column("sr_hz").to_pylist(),
        ):
            try:
                pcm = _decode_one(buf or b"", codec or "")
            except DecodeUnsupported:
                continue
            sr = int(sr or 0)
            if sr <= 0 or len(pcm) == 0:
                continue
            for k, s_ms, e_ms, d_ms, rms in window_chunks_twin(pcm, sr):
                rows.append({"clip_id": cid, "win_idx": k, "start_ms": s_ms,
                             "end_ms": e_ms, "dur_ms": d_ms, "win_rms": rms})
        twin = pd.DataFrame(rows)
        exp = ref.to_pandas() if hasattr(ref, "to_pandas") else ref
        twin = twin[list(exp.columns)].reset_index(drop=True)
        # dtypes follow the actor's arrow schema
        for c in exp.columns:
            twin[c] = twin[c].astype(exp[c].dtype)
        pd.testing.assert_frame_equal(twin, exp.reset_index(drop=True))

    def test_tail_rule(self):
        sr = 1000
        # 250 samples, 100ms windows / 50ms hop: the window at 150 reaches
        # the clip end (150+100 >= 250) so the walk STOPS there — later
        # hops would only re-cover the same tail
        x = np.ones(250)
        rows = window_chunks_twin(x, sr)
        assert [r[1] for r in rows] == [0, 50, 100, 150]
        assert rows[-1][3] == 100
        # 120 samples: the 70ms partial at 50 clears the 30ms tail minimum
        rows = window_chunks_twin(np.ones(120), sr)
        assert [r[1] for r in rows] == [0, 50]
        assert rows[-1][3] == 70
        # a sub-tail-minimum partial is dropped: 115 samples, window at 100
        # would be 15ms < 30ms — but the window at 50 already reached the
        # end, so the walk stopped there anyway
        rows = window_chunks_twin(np.ones(115), sr)
        assert [r[1] for r in rows] == [0, 50]
