"""Multimodal (audio) stages — opaque ``bytes`` columns with typed metadata
(SURVEY.md engine-additions).

Per-codec decode semantics:
  * pcm_s16le / mulaw / wav — REAL numpy decode.
  * flac — REAL from-scratch subset decode (functions/flacdec.py:
    mono/stereo ≤24-bit, all subframe + stereo-decorrelation modes).
  * opus — PCM decode is STUBBED (libopus absent → ``decode_ok=False``),
    but the Ogg CONTAINER layer is REAL (functions/oggopus.py): the audio
    gate validates framing/CRC/OpusHead and the granule-position duration,
    so corrupt or metadata-contradicting opus clips drop with a real
    reason instead of passing through.
Swapping in a real PCM decoder changes only ``_decode_one``.

Batch sizing: audio rows are wide (bytes payload), so these stages run with a
smaller batch_size than text stages — batch bytes ≈ batch_size × avg clip
size must fit the worker heap (SURVEY.md §4.2 block-splitting row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig


class DecodeUnsupported(NotImplementedError):
    """Raised internally for codecs without a decoder in this environment."""


def _mulaw_expand(u: np.ndarray) -> np.ndarray:
    """ITU-T G.711 µ-law → linear float32 (pure numpy; no audio libs)."""
    u = (~u).astype(np.int64) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    magnitude = ((mantissa << 3) + 0x84) << exponent
    magnitude -= 0x84
    linear = np.where(sign != 0, -magnitude, magnitude).astype(np.float32)
    return linear / 32124.0


def _alaw_expand(a: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law → linear float32 (pure numpy; the µ-law sibling).
    Reference arithmetic: a ^= 0x55; seg 0 → (m<<4)+8, seg ≥1 →
    ((m<<4)+0x108)<<(seg-1); MSB set = positive; peak 32256."""
    a = a.astype(np.int64) ^ 0x55
    mant = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    mag = np.where(seg == 0, mant + 8,
                   (mant + 0x108) << np.maximum(seg - 1, 0))
    linear = np.where(a & 0x80, mag, -mag).astype(np.float32)
    return linear / 32256.0


def _layout(x: np.ndarray, n_ch: int, channels: bool) -> np.ndarray:
    """Interleaved 1-D samples → mono downmix (default) or a channel-
    preserving (n_frames, n_ch) array when ``channels`` is set."""
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch)
        return x if channels else x.mean(axis=1)
    return x.reshape(-1, 1) if channels else x


def _parse_wav(buf: bytes, channels: bool = False) -> np.ndarray:
    """RIFF/WAVE container parse honoring the fmt chunk: PCM 8-bit
    unsigned / 16-bit (format 1), A-law (6), µ-law (7), IMA ADPCM (0x11,
    mono + stereo word-interleave — functions/adpcm.decode_wav_ima), and
    MS ADPCM (0x02 — functions/adpcm.decode_wav_ms); multi-channel
    downmixed to mono for the feature path (``channels=True`` preserves
    the layout as (n, ch) for the channel-defect gate).  A data chunk
    with no fmt chunk decodes as mono PCM16 (the historical fallback)."""
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise DecodeUnsupported("wav")
    pos = 12
    fmt_tag, n_ch, bits, block_align = 1, 1, 16, 0
    samples_per_block = None
    fact_frames = None
    data = None
    while pos + 8 <= len(buf):
        chunk_id = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt " and size >= 16:
            fmt_tag = int.from_bytes(body[0:2], "little")
            n_ch = max(int.from_bytes(body[2:4], "little"), 1)
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt_tag == 0xFFFE and size >= 40:
                # WAVE_FORMAT_EXTENSIBLE: the real format is the first
                # two bytes of the SubFormat GUID (after cbSize=22,
                # Samples union, dwChannelMask)
                fmt_tag = int.from_bytes(body[24:26], "little")
            if fmt_tag == 0x02 and size >= 20:
                # ADPCM fmt extension: wSamplesPerBlock sits at body[18:20]
                # for BOTH the direct 0x02 layout (after cbSize) and the
                # EXTENSIBLE layout (the Samples union) — read it AFTER the
                # 0xFFFE remap so extensible-wrapped MS-ADPCM gets the
                # zero-pad cap too (round-4 review finding)
                samples_per_block = int.from_bytes(body[18:20], "little") or None
        elif chunk_id == b"fact" and size >= 4:
            # dwSampleLength: exact per-channel frame count — the authority
            # on total length for compressed formats (truncates the final
            # block's zero-pad codes).  0 means "unknown" in some streaming
            # encoders: treat as absent, never truncate to empty.
            fact_frames = int.from_bytes(body[0:4], "little") or None
        elif chunk_id == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if data is None:
        raise DecodeUnsupported("wav")
    if fmt_tag == 0x11:
        from ..functions.adpcm import AdpcmError, decode_wav_ima

        try:
            x = decode_wav_ima(data, block_align, n_ch).astype(
                np.float32) / 32767.0
        except AdpcmError as e:
            raise DecodeUnsupported(f"wav ima adpcm: {e}") from e
        if fact_frames is not None:
            x = x[: fact_frames * n_ch]
        return _layout(x, n_ch, channels)
    if fmt_tag == 0x02:
        from ..functions.adpcm import AdpcmError, decode_wav_ms

        try:
            x = decode_wav_ms(
                data, block_align, n_ch, samples_per_block=samples_per_block
            ).astype(np.float32) / 32767.0
        except AdpcmError as e:
            raise DecodeUnsupported(f"wav ms adpcm: {e}") from e
        if fact_frames is not None:
            x = x[: fact_frames * n_ch]
        return _layout(x, n_ch, channels)
    if fmt_tag == 1 and bits == 16:
        x = np.frombuffer(data[: len(data) - len(data) % 2],
                          dtype="<i2").astype(np.float32) / 32767.0
    elif fmt_tag == 1 and bits == 8:  # 8-bit WAV is unsigned
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
             - 128.0) / 127.0
    elif fmt_tag == 3 and bits == 32:  # IEEE float WAV
        x = np.frombuffer(data[: len(data) - len(data) % 4],
                          dtype="<f4").copy()
        x[~np.isfinite(x)] = 0.0  # corrupt floats mark as silence, not NaN
        x = np.clip(x, -1.0, 1.0)
    elif fmt_tag == 3 and bits == 64:
        x = np.frombuffer(data[: len(data) - len(data) % 8],
                          dtype="<f8").astype(np.float32)
        x[~np.isfinite(x)] = 0.0
        x = np.clip(x, -1.0, 1.0)
    elif fmt_tag == 6:
        x = _alaw_expand(np.frombuffer(data, dtype=np.uint8))
    elif fmt_tag == 7:
        x = _mulaw_expand(np.frombuffer(data, dtype=np.uint8))
    else:
        raise DecodeUnsupported(f"wav fmt {fmt_tag}/{bits}")
    return _layout(x, n_ch, channels)


def _float80_be(b: bytes) -> float:
    """80-bit IEEE 754 extended big-endian → float (AIFF COMM sample rate):
    1 sign, 15 exponent (bias 16383), 64-bit mantissa with explicit
    integer bit."""
    if len(b) != 10:
        raise DecodeUnsupported("aiff float80")
    se = int.from_bytes(b[:2], "big")
    mant = int.from_bytes(b[2:], "big")
    if se & 0x7FFF == 0 and mant == 0:
        return 0.0
    if se & 0x7FFF == 0x7FFF:  # inf / NaN encoding
        raise DecodeUnsupported("aiff rate non-finite")
    try:
        val = mant * 2.0 ** ((se & 0x7FFF) - 16383 - 63)
    except OverflowError:
        raise DecodeUnsupported("aiff rate overflow") from None
    import math

    if not math.isfinite(val):  # huge exponents overflow to inf silently
        raise DecodeUnsupported("aiff rate overflow")
    return -val if se & 0x8000 else val


def _parse_aiff(buf: bytes) -> np.ndarray:
    """AIFF (IFF FORM/AIFF) container parse: COMM (channels, sample size,
    80-bit-float rate) + SSND big-endian PCM 8/16-bit, downmixed to mono."""
    if len(buf) < 12 or buf[:4] != b"FORM" or buf[8:12] != b"AIFF":
        raise DecodeUnsupported("aiff")
    pos = 12
    n_ch, bits, data = 1, 16, None
    while pos + 8 <= len(buf):
        chunk_id = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "big")
        body = buf[pos + 8 : pos + 8 + size]
        if chunk_id == b"COMM" and size >= 18:
            n_ch = max(int.from_bytes(body[0:2], "big"), 1)
            bits = int.from_bytes(body[6:8], "big")
            _float80_be(body[8:18])  # validates the rate field
        elif chunk_id == b"SSND" and size >= 8:
            offset = int.from_bytes(body[0:4], "big")
            data = body[8 + offset :]
        pos += 8 + size + (size & 1)
    if data is None:
        raise DecodeUnsupported("aiff")
    if bits == 16:
        x = np.frombuffer(data[: len(data) - len(data) % 2],
                          dtype=">i2").astype(np.float32) / 32767.0
    elif bits == 8:  # AIFF 8-bit is SIGNED (unlike WAV)
        x = np.frombuffer(data, dtype=np.int8).astype(np.float32) / 127.0
    else:
        raise DecodeUnsupported(f"aiff {bits}-bit")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x


def _decode_one(buf: bytes, codec: str) -> np.ndarray:
    if codec == "pcm_s16le":
        return np.frombuffer(buf, dtype="<i2").astype(np.float32) / 32767.0
    if codec in ("pcm_mulaw", "mulaw", "ulaw"):
        return _mulaw_expand(np.frombuffer(buf, dtype=np.uint8))
    if codec in ("pcm_alaw", "alaw"):
        return _alaw_expand(np.frombuffer(buf, dtype=np.uint8))
    if codec in ("adpcm", "adpcm_ima"):
        # from-scratch IMA/DVI4 ADPCM (functions/adpcm.py); lossy ~32 dB
        from ..functions.adpcm import AdpcmError, decode_ima

        try:
            return decode_ima(buf).astype(np.float32) / 32767.0
        except AdpcmError as e:
            raise DecodeUnsupported(f"adpcm: {e}") from e
    if codec == "wav":
        return _parse_wav(buf)
    if codec == "aiff":
        return _parse_aiff(buf)
    if codec == "flac":
        return _parse_flac(buf)
    # opus/... need libopus — not in this container
    raise DecodeUnsupported(codec)


def _parse_flac(buf: bytes, channels: bool = False) -> np.ndarray:
    """From-scratch FLAC subset (functions/flacdec.py): mono/stereo
    ≤24-bit, CONSTANT/VERBATIM/FIXED/LPC subframes, all four stereo
    layouts; >2ch / >24-bit → unsupported.  Downmixes to mono unless
    ``channels`` preserves the (n, ch) layout."""
    from ..functions.flacdec import FlacError, FlacUnsupported, decode_flac_info

    try:
        samples, _sr, bps = decode_flac_info(buf)
    except (FlacUnsupported, FlacError, IndexError):
        raise DecodeUnsupported("flac") from None
    x = samples.astype(np.float32)
    if x.ndim == 2:
        if not channels:
            x = x.mean(axis=1)  # downmix stereo for the mono feature path
    elif channels:
        x = x.reshape(-1, 1)
    scale = float((1 << (bps - 1)) - 1) or 1.0
    return x / scale


def _decode_one_multi(buf: bytes, codec: str) -> np.ndarray:
    """Channel-preserving decode → float32 (n_frames, n_ch).  WAV and
    FLAC keep the container's channel layout; every other codec in the
    bank is mono by construction and returns (n, 1)."""
    if codec == "wav":
        return _parse_wav(buf, channels=True)
    if codec == "flac":
        return _parse_flac(buf, channels=True)
    return _decode_one(buf, codec).reshape(-1, 1)


class AudioFeatureActor:
    """Actor-pool stage: decode + per-clip features.  State (none today;
    a real decoder/model handle later) is built once per actor."""

    def __init__(self, cfg: PipelineConfig | None = None, frame_ms: int = 20):
        self.cfg = cfg or PipelineConfig()
        self.frame_ms = frame_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        ok, n_samples, rms, peak, clip_ratio, frames = [], [], [], [], [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
            except DecodeUnsupported:
                ok.append(False)
                n_samples.append(0)
                rms.append(0.0)
                peak.append(0.0)
                clip_ratio.append(0.0)
                frames.append([])
                continue
            ok.append(True)
            n_samples.append(len(pcm))
            if len(pcm):
                rms.append(float(np.sqrt(np.mean(pcm**2))))
                peak.append(float(np.max(np.abs(pcm))))
                clip_ratio.append(float(np.mean(np.abs(pcm) > 0.999)))
                flen = max(int(sr * self.frame_ms / 1000), 1)
                n_frames = len(pcm) // flen
                if n_frames:
                    fr = pcm[: n_frames * flen].reshape(n_frames, flen)
                    frames.append(np.sqrt((fr**2).mean(axis=1)).astype(np.float32).tolist())
                else:
                    frames.append([])
            else:
                rms.append(0.0)
                peak.append(0.0)
                clip_ratio.append(0.0)
                frames.append([])
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("n_samples", pa.array(n_samples, pa.int32()))
        batch = batch.append_column("audio_rms", pa.array(rms, pa.float32()))
        batch = batch.append_column("audio_peak", pa.array(peak, pa.float32()))
        batch = batch.append_column("clip_ratio", pa.array(clip_ratio, pa.float32()))
        return batch.append_column(
            "frame_rms", pa.array(frames, pa.list_(pa.float32()))
        )


def audio_features_stage(ds, cfg: PipelineConfig, concurrency: int | tuple[int, int] = 4):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioFeatureActor, (cfg,),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


def silence_gate_stage(ds, cfg: PipelineConfig, min_rms: float = 1e-3):
    """Drop-gate on decoded energy: clips that decoded but are silent get
    drop_reason='silent' (composes with the transcript keep/drop)."""
    import pyarrow.compute as pc

    def gate(batch: pa.Table) -> pa.Table:
        silent = pc.and_(
            batch.column("decode_ok"), pc.less(batch.column("audio_rms"), min_rms)
        )
        keep = batch.column("keep") if "keep" in batch.column_names else pa.array([True] * len(batch))
        new_keep = pc.and_(keep, pc.invert(silent))
        names = batch.column_names
        if "keep" in names:
            batch = batch.set_column(names.index("keep"), "keep", new_keep)
        else:
            batch = batch.append_column("keep", new_keep)
        return batch

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Spectral features (FFT; pure numpy — no audio libs)
# ---------------------------------------------------------------------------

_SPECTRAL_MAX_SAMPLES = 1 << 16  # analyze at most ~4s @16k per clip (cost cap)


def spectral_features(pcm: np.ndarray, sr: int) -> dict:
    """Whole-clip magnitude-spectrum features: centroid, bandwidth, rolloff
    (85%), dominant frequency, zero-crossing rate.  All float64 math on a
    capped sample window so per-clip cost is bounded."""
    x = pcm[:_SPECTRAL_MAX_SAMPLES].astype(np.float64)
    if len(x) < 2 or not np.any(x):
        return {"centroid_hz": 0.0, "bandwidth_hz": 0.0, "rolloff_hz": 0.0,
                "dominant_hz": 0.0, "zcr": 0.0}
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), d=1.0 / max(sr, 1))
    power = mag * mag
    total = power.sum()
    if total <= 0:
        return {"centroid_hz": 0.0, "bandwidth_hz": 0.0, "rolloff_hz": 0.0,
                "dominant_hz": 0.0, "zcr": 0.0}
    centroid = float((freqs * power).sum() / total)
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * power).sum() / total))
    cum = np.cumsum(power)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
    dominant = float(freqs[int(np.argmax(mag))])
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return {"centroid_hz": centroid, "bandwidth_hz": bandwidth,
            "rolloff_hz": rolloff, "dominant_hz": dominant, "zcr": zcr}


class AudioSpectralActor:
    """Actor-pool stage: decode + FFT spectral features per clip.  Same
    decode swap point as AudioFeatureActor (_decode_one)."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        cols: dict[str, list] = {k: [] for k in
                                 ("centroid_hz", "bandwidth_hz", "rolloff_hz",
                                  "dominant_hz", "zcr")}
        ok = []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                feats = spectral_features(pcm, int(sr or 0))
                ok.append(True)
            except DecodeUnsupported:
                feats = {k: 0.0 for k in cols}
                ok.append(False)
            for k in cols:
                cols[k].append(feats[k])
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        for k, v in cols.items():
            batch = batch.append_column(k, pa.array(v, pa.float32()))
        return batch


def audio_spectral_stage(ds, cfg: PipelineConfig, concurrency: int | tuple[int, int] = 4):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioSpectralActor, (cfg,),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


# ---------------------------------------------------------------------------
# VAD-style silence stats over the already-computed frame energies
# ---------------------------------------------------------------------------


def vad_stats_from_frames(frame_rms: list[float], frame_ms: int,
                          threshold: float) -> tuple[float, int, int, int]:
    """(silence_ratio, lead_silence_ms, trail_silence_ms, n_speech_segments)
    from per-frame RMS.  Pure numpy; consumes the frame_rms column that
    audio_features_stage already produced — no re-decode."""
    fr = np.asarray(frame_rms, dtype=np.float32)
    if fr.size == 0:
        return 1.0, 0, 0, 0
    speech = fr >= threshold
    silence_ratio = float(1.0 - speech.mean())
    nz = np.nonzero(speech)[0]
    if nz.size == 0:
        return 1.0, int(fr.size * frame_ms), int(fr.size * frame_ms), 0
    lead = int(nz[0] * frame_ms)
    trail = int((fr.size - 1 - nz[-1]) * frame_ms)
    n_segments = int(np.count_nonzero(np.diff(np.concatenate(([0], speech.view(np.int8)))) == 1))
    return silence_ratio, lead, trail, n_segments


def vad_stats_batch(batch: pa.Table, frame_ms: int = 20,
                    threshold: float = 1e-3) -> pa.Table:
    """One frame_rms-carrying batch → batch + VAD columns (pure; shared by
    the distributed stage and the serial oracle path)."""
    frames = batch.column("frame_rms").to_pylist()
    ratios, leads, trails, segs = [], [], [], []
    for fr in frames:
        r, l, t, s = vad_stats_from_frames(fr or [], frame_ms, threshold)
        ratios.append(r)
        leads.append(l)
        trails.append(t)
        segs.append(s)
    batch = batch.append_column("silence_ratio", pa.array(ratios, pa.float32()))
    batch = batch.append_column("lead_silence_ms", pa.array(leads, pa.int32()))
    batch = batch.append_column("trail_silence_ms", pa.array(trails, pa.int32()))
    return batch.append_column("n_speech_segments", pa.array(segs, pa.int32()))


def vad_stats_stage(ds, frame_ms: int = 20, threshold: float = 1e-3):
    """Stateless stage over (frame_rms) → silence/segment columns.  Input
    must already carry frame_rms (audio_features_stage)."""
    return ds.map_batches(
        lambda b: vad_stats_batch(b, frame_ms, threshold),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# Speech-rate consistency (audio ↔ transcript agreement signal)
# ---------------------------------------------------------------------------


def speech_rate_stage(ds, transcript_col: str = "transcript",
                      dur_col: str = "dur_ms",
                      min_wps: float = 0.5, max_wps: float = 6.0):
    """Words-per-second from transcript length vs audio duration — the
    cheapest audio/transcript agreement check an ASR corpus filter runs
    (a 2 s clip with a 200-word transcript is mislabeled).  Emits
    wps_milli (integer milli-wps: floor(wps*1000+0.5), exact for the
    oracle hash) and rate_ok."""
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(transcript_col).to_pylist()
        words = np.array([len((t or "").split()) for t in texts], dtype=np.float64)
        dur_s = batch.column(dur_col).to_numpy(zero_copy_only=False).astype(np.float64) / 1000.0
        wps = np.where(dur_s > 0, words / np.maximum(dur_s, 1e-12), 0.0)
        wps_milli = np.floor(wps * 1000.0 + 0.5).astype(np.int64)
        ok = (wps >= min_wps) & (wps <= max_wps)
        batch = batch.append_column("n_words", pa.array(words.astype(np.int64), pa.int64()))
        batch = batch.append_column("wps_milli", pa.array(wps_milli, pa.int64()))
        return batch.append_column("rate_ok", pa.array(ok, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Audio keep/drop gate (flagship integration; shared with the row oracle)
# ---------------------------------------------------------------------------


def audio_gate_decision(
    buf: bytes,
    codec: str,
    sr_hz: int,
    dur_ms: int,
    transcript: str,
    min_rms: float = 1e-3,
    min_wps: float = 0.5,
    max_wps: float = 6.0,
) -> tuple[bool, str]:
    """Pure per-clip audio gate: (ok, drop_reason).  Composable into both
    the vectorized stage and the row oracle (same function → F1 stays 1.0).

    Rules, in order:
      * opus → CONTAINER judgment (functions/oggopus.py): corrupt Ogg
        framing/CRC/OpusHead → 'bad_container'; granule duration
        contradicting the dur_ms metadata by >80 ms → 'duration_mismatch';
        a valid container passes (PCM decode_ok stays False — libopus is
        absent, so signal rules below cannot apply)
      * other undecodable codecs → gate does not apply (the codec
        allowlist is the authority on codecs; this gate judges SIGNAL)
      * rms below ``min_rms`` → 'silent_audio'
      * words-per-second outside [min_wps, max_wps] → 'speech_rate'
        (duration from the DECODED samples when available, else dur_ms)
    """
    if (codec or "") == "opus":
        from ..functions.oggopus import OggError, parse_ogg_opus

        try:
            info = parse_ogg_opus(buf or b"")
        except OggError:
            return False, "bad_container"
        if dur_ms and abs(info["duration_ms"] - dur_ms) > 80:
            return False, "duration_mismatch"
        return True, ""
    if (codec or "") == "mp3":
        # same structural-judgment semantics as opus: the frame-header
        # walk (functions/mp3parse.py) is real, PCM decode stays stubbed
        from ..functions.mp3parse import Mp3Error, parse_mp3

        try:
            info = parse_mp3(buf or b"")
        except Mp3Error:
            return False, "bad_container"
        if dur_ms and abs(info["duration_ms"] - dur_ms) > 80:
            return False, "duration_mismatch"
        return True, ""
    try:
        pcm = _decode_one(buf or b"", codec or "")
    except DecodeUnsupported:
        return True, ""
    if len(pcm) == 0:
        return False, "silent_audio"
    rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
    if rms < min_rms:
        return False, "silent_audio"
    dur_s = len(pcm) / sr_hz if sr_hz else (dur_ms or 0) / 1000.0
    if dur_s <= 0:
        return False, "speech_rate"
    wps = len((transcript or "").split()) / dur_s
    if wps < min_wps or wps > max_wps:
        return False, "speech_rate"
    return True, ""


def audio_gate_stage(ds, cfg: PipelineConfig):
    """Flagship stage: apply audio_gate_decision to rows still kept; fails
    flip keep→False with the gate's drop_reason.  Runs after the transcript
    decision and BEFORE scrub (dropped rows skip scrubbing)."""
    min_rms = getattr(cfg, "min_audio_rms", 1e-3)
    min_wps = getattr(cfg, "min_wps", 0.5)
    max_wps = getattr(cfg, "max_wps", 6.0)

    def fn(batch: pa.Table) -> pa.Table:
        keeps = batch.column("keep").to_pylist()
        bufs = batch.column(cfg.bytes_col).to_pylist()
        codecs = batch.column(cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        durs = (
            batch.column("dur_ms").to_pylist()
            if "dur_ms" in batch.column_names
            else [0] * len(batch)
        )
        texts = batch.column(cfg.text_col).to_pylist()
        new_keep, new_reason = [], []
        reasons = batch.column("drop_reason").to_pylist()
        for k, buf, codec, sr, dur, text, r in zip(
            keeps, bufs, codecs, srs, durs, texts, reasons
        ):
            if not k:
                new_keep.append(False)
                new_reason.append(r)
                continue
            ok, reason = audio_gate_decision(
                buf, codec, sr, dur, text,
                min_rms=min_rms, min_wps=min_wps, max_wps=max_wps,
            )
            new_keep.append(ok)
            new_reason.append(r if ok else reason)
        names = batch.column_names
        batch = batch.set_column(names.index("keep"), "keep", pa.array(new_keep, pa.bool_()))
        return batch.set_column(
            names.index("drop_reason"), "drop_reason", pa.array(new_reason, pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Audio transforms: resample + loudness normalize (emit NEW pcm bytes)
# ---------------------------------------------------------------------------


def resample_linear(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resample (pure numpy) — the cheap fallback
    (``resample_method="linear"``).  No anti-alias filter: content above
    the output Nyquist folds back.  The default path is the Kaiser
    windowed-sinc resampler (functions/resample.py)."""
    if sr_in == sr_out or len(pcm) == 0 or sr_in <= 0 or sr_out <= 0:
        return pcm
    n_out = max(int(round(len(pcm) * sr_out / sr_in)), 1)
    x_out = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    return np.interp(x_out, np.arange(len(pcm), dtype=np.float64), pcm).astype(np.float32)


def normalize_loudness(pcm: np.ndarray, target_rms: float = 0.1,
                       max_gain: float = 30.0) -> np.ndarray:
    """Scale to a target RMS with a gain cap (silent clips must not explode
    into noise) and a hard clip at ±1."""
    if len(pcm) == 0:
        return pcm
    rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
    if rms <= 0:
        return pcm
    gain = min(target_rms / rms, max_gain)
    return np.clip(pcm * gain, -1.0, 1.0).astype(np.float32)


def _encode_pcm16(pcm: np.ndarray) -> bytes:
    return (np.clip(pcm, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()


class AudioTransformActor:
    """Actor-pool stage: decode → (resample to target_sr_hz) →
    (zero-phase FFT highpass at highpass_hz — kills DC/rumble below the
    speech band before the trainer) → (loudness normalize) → re-encode
    pcm_s16le.  Emits NEW bytes/sr_hz/codec columns; undecodable codecs
    pass through untouched with transform_ok=False.  The canonical
    'make the corpus uniform for the ASR trainer' stage."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 target_sr_hz: int | None = 16000,
                 target_rms: float | None = 0.1,
                 resample_method: str = "sinc",
                 highpass_hz: float | None = None):
        self.cfg = cfg or PipelineConfig()
        self.target_sr = target_sr_hz
        self.target_rms = target_rms
        self.highpass_hz = highpass_hz
        if resample_method == "sinc":
            # Kaiser windowed-sinc (functions/resample.py): real anti-alias
            # cutoff at the output Nyquist — the production default
            from ..functions.resample import resample_sinc

            self._resample = resample_sinc
        elif resample_method == "linear":
            self._resample = resample_linear
        else:
            raise ValueError(f"unknown resample_method {resample_method!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        out_bytes, out_sr, out_codec, ok = [], [], [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
            except DecodeUnsupported:
                out_bytes.append(buf)
                out_sr.append(sr)
                out_codec.append(codec)
                ok.append(False)
                continue
            sr_out = sr
            if self.target_sr and sr and sr != self.target_sr:
                pcm = self._resample(pcm, int(sr), self.target_sr)
                sr_out = self.target_sr
            if self.highpass_hz and sr_out and len(pcm):
                # zero-phase brickwall: rfft → zero bins below the cutoff
                # → irfft; deterministic, vectorized, no IIR state
                spec = np.fft.rfft(pcm.astype(np.float64))
                cut = int(np.ceil(self.highpass_hz * len(pcm) / int(sr_out)))
                spec[:cut] = 0.0
                pcm = np.fft.irfft(spec, len(pcm)).astype(np.float32)
            if self.target_rms is not None:
                pcm = normalize_loudness(pcm, self.target_rms)
            out_bytes.append(_encode_pcm16(pcm))
            out_sr.append(sr_out)
            out_codec.append("pcm_s16le")
            ok.append(True)
        names = batch.column_names
        batch = batch.set_column(
            names.index(self.cfg.bytes_col), self.cfg.bytes_col,
            pa.array(out_bytes, pa.binary()),
        )
        batch = batch.set_column(names.index("sr_hz"), "sr_hz",
                                 pa.array(out_sr, batch.schema.field("sr_hz").type))
        batch = batch.set_column(names.index(self.cfg.codec_col), self.cfg.codec_col,
                                 pa.array(out_codec, pa.string()))
        return batch.append_column("transform_ok", pa.array(ok, pa.bool_()))


def audio_transform_stage(ds, cfg: PipelineConfig, target_sr_hz: int | None = 16000,
                          target_rms: float | None = 0.1,
                          concurrency: int | tuple[int, int] = 4,
                          resample_method: str = "sinc"):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioTransformActor, (cfg, target_sr_hz, target_rms, resample_method),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


# ---------------------------------------------------------------------------
# VAD segmentation: explode clips into speech segments (utterances)
# ---------------------------------------------------------------------------


def speech_segments(speech: np.ndarray, min_gap_frames: int,
                    min_seg_frames: int) -> list:
    """Merge-and-prune speech runs from a boolean per-frame VAD mask:
    gaps shorter than ``min_gap_frames`` are bridged (hangover), then runs
    shorter than ``min_seg_frames`` are dropped.  Returns
    ``[(start_frame, end_frame_exclusive), ...]``.  Pure function — shared
    by the distributed stage and the serial oracle."""
    speech = np.asarray(speech, dtype=bool)
    if speech.size == 0 or not speech.any():
        return []
    edges = np.diff(np.concatenate(([0], speech.view(np.int8), [0])))
    starts = np.nonzero(edges == 1)[0]
    ends = np.nonzero(edges == -1)[0]
    merged = [[int(starts[0]), int(ends[0])]]
    for s, e in zip(starts[1:], ends[1:]):
        if s - merged[-1][1] < min_gap_frames:
            merged[-1][1] = int(e)
        else:
            merged.append([int(s), int(e)])
    return [(s, e) for s, e in merged if e - s >= min_seg_frames]


class VadSegmentActor:
    """Actor-pool explode stage: decode → frame RMS → VAD mask → merged
    speech segments → one OUTPUT ROW PER SEGMENT with the sliced pcm16
    bytes.  The distributed form of 'cut long recordings into utterances';
    undecodable clips emit zero rows (their drop is the gate stage's job).

    Output columns: clip_id, seg_idx, start_ms, end_ms, dur_ms, seg_rms
    (+ bytes/sr_hz/codec for the segment audio when emit_audio=True)."""

    def __init__(self, cfg: PipelineConfig | None = None, frame_ms: int = 20,
                 threshold: float = 1e-3, min_gap_ms: int = 200,
                 min_seg_ms: int = 200, emit_audio: bool = True):
        self.cfg = cfg or PipelineConfig()
        self.frame_ms = frame_ms
        self.threshold = threshold
        self.min_gap_frames = max(int(round(min_gap_ms / frame_ms)), 1)
        self.min_seg_frames = max(int(round(min_seg_ms / frame_ms)), 1)
        self.emit_audio = emit_audio

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.cfg.id_col).to_pylist()
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        out = {k: [] for k in ("clip_id", "seg_idx", "start_ms", "end_ms",
                               "dur_ms", "seg_rms")}
        seg_bytes, seg_sr = [], []
        for cid, buf, codec, sr in zip(ids, bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
            except DecodeUnsupported:
                continue
            sr = int(sr or 0)
            if sr <= 0 or len(pcm) == 0:
                continue
            flen = max(int(sr * self.frame_ms / 1000), 1)
            n_frames = len(pcm) // flen
            if n_frames == 0:
                continue
            fr = pcm[: n_frames * flen].reshape(n_frames, flen)
            frame_rms = np.sqrt((fr.astype(np.float64) ** 2).mean(axis=1))
            mask = frame_rms >= self.threshold
            for k, (s, e) in enumerate(
                speech_segments(mask, self.min_gap_frames, self.min_seg_frames)
            ):
                seg = pcm[s * flen : e * flen]
                out["clip_id"].append(cid)
                out["seg_idx"].append(k)
                out["start_ms"].append(s * self.frame_ms)
                out["end_ms"].append(e * self.frame_ms)
                out["dur_ms"].append((e - s) * self.frame_ms)
                out["seg_rms"].append(float(np.sqrt(np.mean(seg.astype(np.float64) ** 2))))
                if self.emit_audio:
                    seg_bytes.append(_encode_pcm16(seg))
                    seg_sr.append(sr)
        cols = {
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "seg_idx": pa.array(out["seg_idx"], pa.int32()),
            "start_ms": pa.array(out["start_ms"], pa.int32()),
            "end_ms": pa.array(out["end_ms"], pa.int32()),
            "dur_ms": pa.array(out["dur_ms"], pa.int32()),
            "seg_rms": pa.array(out["seg_rms"], pa.float32()),
        }
        if self.emit_audio:
            cols["bytes"] = pa.array(seg_bytes, pa.binary())
            cols["sr_hz"] = pa.array(seg_sr, pa.int32())
            cols["codec"] = pa.array(["pcm_s16le"] * len(seg_sr), pa.string())
        return pa.table(cols)


def vad_segment_stage(ds, cfg: PipelineConfig, frame_ms: int = 20,
                      threshold: float = 1e-3, min_gap_ms: int = 200,
                      min_seg_ms: int = 200, emit_audio: bool = True,
                      concurrency: int | tuple[int, int] = 4):
    """Explode clips into VAD speech segments (one row per utterance).
    Row-count changes through this stage; everything stays streaming —
    a clip's segments are produced inside the batch that carries it."""
    from .taskmap import stateless_map

    return stateless_map(ds, VadSegmentActor, (cfg, frame_ms, threshold, min_gap_ms,
                             min_seg_ms, emit_audio),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


def gapped_clips_batch(batch: pa.Table, lead_ms: int = 100,
                       gap_ms_base: int = 300) -> pa.Table:
    """Derive a segmentation test corpus: each decodable clip becomes
    lead-silence + clip + gap-silence + (0.8× clip) re-encoded as pcm16 —
    two speech bursts around a deterministic per-clip gap
    (``gap_ms_base + 100·(md5-free: last 2 id digits % 3)``).  Undecodable
    clips pass through untouched.  Pure per-row function shared by
    q_vad_segments and its serial oracle."""
    ids = batch.column("clip_id").to_pylist()
    bufs = batch.column("bytes").to_pylist()
    codecs = batch.column("codec").to_pylist()
    srs = batch.column("sr_hz").to_pylist()
    out_b, out_c = [], []
    for cid, buf, codec, sr in zip(ids, bufs, codecs, srs):
        try:
            pcm = _decode_one(buf or b"", codec or "")
        except DecodeUnsupported:
            out_b.append(buf)
            out_c.append(codec)
            continue
        sr = int(sr or 16000)
        num = int(cid.rsplit("_", 1)[-1]) if cid and cid[-1].isdigit() else 0
        gap_ms = gap_ms_base + 100 * (num % 3)
        lead = np.zeros(int(sr * lead_ms / 1000), dtype=np.float32)
        gap = np.zeros(int(sr * gap_ms / 1000), dtype=np.float32)
        out_b.append(_encode_pcm16(np.concatenate([lead, pcm, gap, 0.8 * pcm])))
        out_c.append("pcm_s16le")
    batch = batch.set_column(batch.column_names.index("bytes"), "bytes",
                             pa.array(out_b, pa.binary()))
    return batch.set_column(batch.column_names.index("codec"), "codec",
                            pa.array(out_c, pa.string()))


class WindowChunkActor:
    """Actor-pool explode stage: decode → fixed-length analysis windows
    with overlap (the Whisper-style ASR batching cut: win_ms windows every
    hop_ms, the final partial window kept if ≥ min_tail_ms) → one OUTPUT
    ROW PER WINDOW.  Complements VadSegmentActor: VAD cuts at silence,
    this cuts on the clock — the right shape when a downstream model has a
    fixed receptive field regardless of content.

    Output columns: clip_id, win_idx, start_ms, end_ms, dur_ms, win_rms
    (+ bytes/sr_hz/codec for the window audio when emit_audio=True;
    windows re-encode pcm16)."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 win_ms: int = 30_000, hop_ms: int | None = None,
                 min_tail_ms: int = 1_000, emit_audio: bool = True):
        if hop_ms is not None and hop_ms <= 0:
            raise ValueError("hop_ms must be positive")
        self.cfg = cfg or PipelineConfig()
        self.win_ms = int(win_ms)
        self.hop_ms = int(hop_ms) if hop_ms is not None else int(win_ms)
        self.min_tail_ms = int(min_tail_ms)
        self.emit_audio = emit_audio

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.cfg.id_col).to_pylist()
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        out = {k: [] for k in ("clip_id", "win_idx", "start_ms", "end_ms",
                               "dur_ms", "win_rms")}
        w_bytes, w_sr = [], []
        for cid, buf, codec, sr in zip(ids, bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
            except DecodeUnsupported:
                continue
            sr = int(sr or 0)
            if sr <= 0 or len(pcm) == 0:
                continue
            wlen = max(int(sr * self.win_ms / 1000), 1)
            hop = max(int(sr * self.hop_ms / 1000), 1)
            tail_min = int(sr * self.min_tail_ms / 1000)
            k = 0
            for s in range(0, len(pcm), hop):
                w = pcm[s : s + wlen]
                if s > 0 and len(w) < max(tail_min, 1):
                    break
                out["clip_id"].append(cid)
                out["win_idx"].append(k)
                out["start_ms"].append(int(s * 1000 / sr))
                out["end_ms"].append(int((s + len(w)) * 1000 / sr))
                out["dur_ms"].append(int(len(w) * 1000 / sr))
                out["win_rms"].append(
                    float(np.sqrt(np.mean(w.astype(np.float64) ** 2))))
                if self.emit_audio:
                    w_bytes.append(_encode_pcm16(w))
                    w_sr.append(sr)
                k += 1
                if s + wlen >= len(pcm):
                    break
        cols = {
            "clip_id": pa.array(out["clip_id"], pa.string()),
            "win_idx": pa.array(out["win_idx"], pa.int32()),
            "start_ms": pa.array(out["start_ms"], pa.int32()),
            "end_ms": pa.array(out["end_ms"], pa.int32()),
            "dur_ms": pa.array(out["dur_ms"], pa.int32()),
            "win_rms": pa.array(out["win_rms"], pa.float32()),
        }
        if self.emit_audio:
            cols["bytes"] = pa.array(w_bytes, pa.binary())
            cols["sr_hz"] = pa.array(w_sr, pa.int32())
            cols["codec"] = pa.array(["pcm_s16le"] * len(w_sr), pa.string())
        return pa.table(cols)


def window_chunk_stage(ds, cfg: PipelineConfig, win_ms: int = 30_000,
                       hop_ms: int | None = None, min_tail_ms: int = 1_000,
                       emit_audio: bool = True,
                       concurrency: int | tuple[int, int] = 4):
    """Explode clips into fixed windows (one row per window); streaming —
    a clip's windows are produced inside the batch that carries it."""
    from .taskmap import stateless_map

    return stateless_map(ds, WindowChunkActor, (cfg, win_ms, hop_ms, min_tail_ms, emit_audio),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


class AudioAugmentActor:
    """Actor-pool training-augmentation stage (the SpecAugment-adjacent
    waveform policy): decode → per-clip DETERMINISTIC gain jitter + time
    masking → re-encode pcm16.  All randomness derives from an md5 chain
    keyed on (clip_id, salt) — no RNG state, so the augmentation is
    order-independent, partition-independent and reproducible on resume
    (the same properties train_test_split gets from its hash bucket);
    changing ``salt`` yields a fresh epoch of augmentations.

    Emits bytes/sr_hz/codec (pcm16) + audit columns: aug_ok, gain_milli,
    n_masks, masked_ms, out_rms.  Undecodable clips pass through with
    aug_ok=False."""

    def __init__(self, cfg: PipelineConfig | None = None, salt: str = "",
                 gain_range: tuple[float, float] = (0.6, 1.4),
                 max_masks: int = 3, max_mask_ms: int = 60):
        self.cfg = cfg or PipelineConfig()
        self.salt = salt
        self.gain_lo, self.gain_hi = gain_range
        self.max_masks = int(max_masks)
        self.max_mask_ms = int(max_mask_ms)

    def _params(self, cid: str, n_samples: int, sr: int):
        import hashlib

        d = hashlib.md5(f"{cid}:{self.salt}".encode()).digest()
        gain = self.gain_lo + (int.from_bytes(d[0:2], "big") / 65535.0) \
            * (self.gain_hi - self.gain_lo)
        n_masks = 1 + d[2] % self.max_masks
        masks = []
        max_len = max(int(sr * self.max_mask_ms / 1000), 1)
        for k in range(n_masks):
            dk = hashlib.md5(d + bytes([k])).digest()
            start = int.from_bytes(dk[0:4], "big") % max(n_samples, 1)
            length = 1 + int.from_bytes(dk[4:6], "big") % max_len
            masks.append((start, min(start + length, n_samples)))
        return gain, masks

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.cfg.id_col).to_pylist()
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        out_bytes, out_sr, out_codec = [], [], []
        ok, gains, n_masks_c, masked_ms, out_rms = [], [], [], [], []
        for cid, buf, codec, sr in zip(ids, bufs, codecs, srs):
            sr = int(sr or 0)
            try:
                pcm = _decode_one(buf or b"", codec or "")
                if sr <= 0 or len(pcm) == 0:
                    raise DecodeUnsupported("empty")
            except DecodeUnsupported:
                out_bytes.append(buf)
                out_sr.append(sr)
                out_codec.append(codec)
                ok.append(False)
                gains.append(0)
                n_masks_c.append(0)
                masked_ms.append(0)
                out_rms.append(0.0)
                continue
            gain, masks = self._params(str(cid), len(pcm), sr)
            x = np.clip(pcm.astype(np.float32) * np.float32(gain), -1.0, 1.0)
            covered = np.zeros(len(x), dtype=bool)
            for s, e in masks:
                x[s:e] = 0.0
                covered[s:e] = True
            out_bytes.append(_encode_pcm16(x))
            out_sr.append(sr)
            out_codec.append("pcm_s16le")
            ok.append(True)
            gains.append(int(np.floor(gain * 1000 + 0.5)))
            n_masks_c.append(len(masks))
            masked_ms.append(int(covered.sum() * 1000 / sr))
            out_rms.append(float(np.sqrt(np.mean(x.astype(np.float64) ** 2))))
        names = batch.column_names
        batch = batch.set_column(names.index(self.cfg.bytes_col),
                                 self.cfg.bytes_col,
                                 pa.array(out_bytes, pa.binary()))
        batch = batch.set_column(names.index("sr_hz"), "sr_hz",
                                 pa.array(out_sr, pa.int32()))
        batch = batch.set_column(names.index(self.cfg.codec_col),
                                 self.cfg.codec_col,
                                 pa.array(out_codec, pa.string()))
        batch = batch.append_column("aug_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("gain_milli", pa.array(gains, pa.int32()))
        batch = batch.append_column("n_masks", pa.array(n_masks_c, pa.int32()))
        batch = batch.append_column("masked_ms", pa.array(masked_ms, pa.int32()))
        return batch.append_column("out_rms", pa.array(out_rms, pa.float32()))


def audio_augment_stage(ds, cfg: PipelineConfig, salt: str = "",
                        gain_range: tuple[float, float] = (0.6, 1.4),
                        max_masks: int = 3, max_mask_ms: int = 60,
                        concurrency: int | tuple[int, int] = 4):
    """Deterministic waveform augmentation (gain jitter + time masks keyed
    on clip id + salt); one epoch per salt value."""
    from .taskmap import stateless_map

    return stateless_map(ds, AudioAugmentActor, (cfg, salt, gain_range, max_masks, max_mask_ms),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


def _apply_rowwise_augment(batch: pa.Table, cfg, row_fn, param_col: str,
                           needs_sr: bool) -> pa.Table:
    """Shared decode → kernel → re-encode loop for the per-row
    tempo/pitch augmentation actors (speed / stretch / shift — review
    finding: three near-verbatim copies collapsed here).
    ``row_fn(cid, pcm, sr) -> (clipped_float_pcm, param_int)``;
    undecodable rows (and sr ≤ 0 when ``needs_sr``) pass through
    untouched with aug_ok=False and param 0."""
    ids = batch.column(cfg.id_col).to_pylist()
    bufs = batch.column(cfg.bytes_col).to_pylist()
    codecs = batch.column(cfg.codec_col).to_pylist()
    srs = batch.column("sr_hz").to_pylist()
    out_bytes, out_codec, ok = [], [], []
    param, out_n, out_rms = [], [], []
    for cid, buf, codec, sr in zip(ids, bufs, codecs, srs):
        sr = int(sr or 0)
        try:
            pcm = _decode_one(buf or b"", codec or "")
            if len(pcm) == 0 or (needs_sr and sr <= 0):
                raise DecodeUnsupported("empty")
        except DecodeUnsupported:
            out_bytes.append(buf)
            out_codec.append(codec)
            ok.append(False)
            param.append(0)
            out_n.append(0)
            out_rms.append(0.0)
            continue
        y, p = row_fn(str(cid), pcm, sr)
        out_bytes.append(_encode_pcm16(y))
        out_codec.append("pcm_s16le")
        ok.append(True)
        param.append(p)
        out_n.append(len(y))
        out_rms.append(float(np.sqrt(np.mean(y.astype(np.float64) ** 2)))
                       if len(y) else 0.0)
    names = batch.column_names
    batch = batch.set_column(names.index(cfg.bytes_col), cfg.bytes_col,
                             pa.array(out_bytes, pa.binary()))
    batch = batch.set_column(names.index(cfg.codec_col), cfg.codec_col,
                             pa.array(out_codec, pa.string()))
    batch = batch.append_column("aug_ok", pa.array(ok, pa.bool_()))
    batch = batch.append_column(param_col, pa.array(param, pa.int32()))
    batch = batch.append_column("out_n_samples", pa.array(out_n, pa.int32()))
    return batch.append_column("out_rms", pa.array(out_rms, pa.float32()))


class SpeedPerturbActor:
    """Sox-style speed perturbation — the standard ASR augmentation
    (Ko et al., "Audio augmentation for speech recognition",
    INTERSPEECH 2015): relabel the waveform's rate to sr·f and resample
    back to sr with the Kaiser windowed-sinc kernel
    (functions/resample.py), so duration scales by 1/f and pitch by f.
    The factor is md5-keyed on (clip_id, salt) over ``factors`` — pure
    per-row, deterministic, no shuffle; one augmentation epoch per salt.
    """

    def __init__(self, cfg: PipelineConfig | None = None, salt: str = "",
                 factors: tuple[float, ...] = (0.9, 1.0, 1.1)):
        self.cfg = cfg or PipelineConfig()
        self.salt = salt
        self.factors = tuple(factors)

    def _factor(self, cid: str) -> float:
        import hashlib

        d = hashlib.md5(f"{cid}:speed:{self.salt}".encode()).digest()
        return self.factors[d[0] % len(self.factors)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.resample import resample_sinc

        def row(cid: str, pcm: np.ndarray, sr: int):
            f = self._factor(cid)
            sr_virtual = int(round(sr * f))
            y = resample_sinc(pcm, sr_virtual, sr) if sr_virtual != sr \
                else np.asarray(pcm, dtype=np.float32)
            return np.clip(y, -1.0, 1.0), int(round(f * 10_000))

        return _apply_rowwise_augment(batch, self.cfg, row, "speed_bp",
                                      needs_sr=True)


def speed_perturb_stage(ds, cfg: PipelineConfig, salt: str = "",
                        factors: tuple[float, ...] = (0.9, 1.0, 1.1),
                        concurrency: int | tuple[int, int] = 4):
    """Deterministic sox-style speed perturbation over the clip table;
    actor pool (windowed-sinc kernel state amortized per actor)."""
    from .taskmap import stateless_map

    return stateless_map(ds, SpeedPerturbActor, (cfg, salt, factors),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


class AcousticAugmentActor:
    """Acoustic-environment augmentation — the other half of the standard
    ASR augmentation recipe next to speed perturbation: synthetic-room
    REVERB (convolution with an exponentially-decaying noise RIR) and
    ADDITIVE NOISE mixed at a target SNR.  Every random choice derives
    from an md5 chain on (clip_id, salt) — order/partition-independent,
    reproducible on resume, one augmentation epoch per salt:

    * RIR: length rt60_ms drawn from ``rt60_range``, shape
      n(t)·exp(−6.9·t/rt60) with n from a per-clip md5-seeded generator,
      peak-normalized; applied by FFT convolution (vectorized).
    * noise: md5-seeded white noise scaled so 10·log10(Ps/Pn) hits the
      target drawn from ``snr_choices_db``.

    Emits audit columns (rt60_ms, snr_target_db, wet gain) plus the
    re-encoded pcm16; undecodable rows mark aug_ok=False and pass
    through untouched.
    """

    def __init__(self, cfg: PipelineConfig | None = None, salt: str = "",
                 rt60_range: tuple[int, int] = (80, 320),
                 snr_choices_db: tuple[int, ...] = (5, 10, 20),
                 reverb_prob_pct: int = 50):
        self.cfg = cfg or PipelineConfig()
        self.salt = salt
        self.rt60_range = rt60_range
        self.snr_choices = tuple(snr_choices_db)
        self.reverb_prob_pct = reverb_prob_pct

    def _params(self, cid: str):
        import hashlib

        d = hashlib.md5(f"{cid}:acoustic:{self.salt}".encode()).digest()
        lo, hi = self.rt60_range
        rt60 = lo + int.from_bytes(d[0:2], "big") % max(hi - lo, 1)
        snr = self.snr_choices[d[2] % len(self.snr_choices)]
        do_reverb = (d[3] % 100) < self.reverb_prob_pct
        seed = int.from_bytes(d[4:12], "big")
        return rt60, snr, do_reverb, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.cfg.id_col).to_pylist()
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        out_bytes, out_codec = [], []
        ok, rt60s, snrs, reverbs, out_rms = [], [], [], [], []
        for cid, buf, codec, sr in zip(ids, bufs, codecs, srs):
            sr = int(sr or 0)
            try:
                pcm = _decode_one(buf or b"", codec or "").astype(np.float64)
                if sr <= 0 or len(pcm) == 0:
                    raise DecodeUnsupported("empty")
            except DecodeUnsupported:
                out_bytes.append(buf)
                out_codec.append(codec)
                ok.append(False)
                rt60s.append(0)
                snrs.append(0)
                reverbs.append(False)
                out_rms.append(0.0)
                continue
            rt60, snr_db, do_reverb, seed = self._params(str(cid))
            rng = np.random.Generator(np.random.Philox(seed))
            x = pcm
            if do_reverb:
                n_rir = max(int(sr * rt60 / 1000), 8)
                t = np.arange(n_rir) / sr
                rir = rng.standard_normal(n_rir) * np.exp(
                    -6.9 * t / (rt60 / 1000.0))
                rir[0] = 1.0  # direct path
                rir /= np.abs(rir).max()
                n_fft = 1 << int(np.ceil(np.log2(len(x) + n_rir - 1)))
                wet = np.fft.irfft(np.fft.rfft(x, n_fft)
                                   * np.fft.rfft(rir, n_fft), n_fft)[: len(x)]
                peak = np.abs(wet).max()
                if peak > 1e-9:
                    wet *= min(1.0, np.abs(x).max() / peak)  # match dry peak
                x = wet
            p_sig = float((x ** 2).mean())
            if p_sig > 0:
                noise = rng.standard_normal(len(x))
                p_noise_target = p_sig / (10.0 ** (snr_db / 10.0))
                noise *= np.sqrt(p_noise_target / float((noise ** 2).mean()))
                x = x + noise
            x = np.clip(x, -1.0, 1.0).astype(np.float32)
            out_bytes.append(_encode_pcm16(x))
            out_codec.append("pcm_s16le")
            ok.append(True)
            rt60s.append(rt60 if do_reverb else 0)
            snrs.append(snr_db)
            reverbs.append(bool(do_reverb))
            out_rms.append(float(np.sqrt((x.astype(np.float64) ** 2).mean())))
        names = batch.column_names
        batch = batch.set_column(names.index(self.cfg.bytes_col),
                                 self.cfg.bytes_col,
                                 pa.array(out_bytes, pa.binary()))
        batch = batch.set_column(names.index(self.cfg.codec_col),
                                 self.cfg.codec_col,
                                 pa.array(out_codec, pa.string()))
        batch = batch.append_column("aug_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("rt60_ms", pa.array(rt60s, pa.int32()))
        batch = batch.append_column("snr_target_db", pa.array(snrs, pa.int32()))
        batch = batch.append_column("reverb", pa.array(reverbs, pa.bool_()))
        return batch.append_column("out_rms", pa.array(out_rms, pa.float32()))


def acoustic_augment_stage(ds, cfg: PipelineConfig, salt: str = "",
                           rt60_range: tuple[int, int] = (80, 320),
                           snr_choices_db: tuple[int, ...] = (5, 10, 20),
                           reverb_prob_pct: int = 50,
                           concurrency: int | tuple[int, int] = 4):
    """Deterministic reverb + noise-mixing augmentation over the clip
    table (actor pool; FFT convolution vectorized per clip)."""
    from .taskmap import stateless_map

    return stateless_map(ds, AcousticAugmentActor, (cfg, salt, rt60_range, snr_choices_db,
                             reverb_prob_pct),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


# ---------------------------------------------------------------------------
# Audio corpus report (the audio 'data card' companion of q_corpus_report)
# ---------------------------------------------------------------------------


def audio_corpus_report(ds, codec_col: str = "codec", sr_col: str = "sr_hz",
                        dur_col: str = "dur_ms",
                        allowlist: tuple[str, ...] | None = None):
    """One narrow (metric, value) table of corpus-level audio facts —
    clip count, duration totals/min/max/floor-mean, per-codec and
    per-sample-rate histograms, allowlisted count.  Per-batch partials
    group to (codec, sr) pairs, so the only shuffle is bounded by
    |codecs| x |sample rates| regardless of corpus size; every value is
    integer-exact (floor mean), hence reproducible in plain SQL.
    Returns a pandas DataFrame sorted by metric."""
    import pandas as pd

    from ray.data.aggregate import Max, Min, Sum

    from ..functions.maps import CODEC_ALLOWLIST

    if allowlist is None:
        allowlist = CODEC_ALLOWLIST

    def partial(batch: pa.Table) -> pa.Table:
        pdf = batch.select([codec_col, sr_col, dur_col]).to_pandas()
        g = pdf.groupby([codec_col, sr_col], as_index=False).agg(
            n=(dur_col, "size"), dur=(dur_col, "sum"),
            dmin=(dur_col, "min"), dmax=(dur_col, "max"))
        for c in ("n", "dur", "dmin", "dmax"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([codec_col, sr_col])
        .aggregate(Sum("n", alias_name="n"), Sum("dur", alias_name="dur"),
                   Min("dmin", alias_name="dmin"), Max("dmax", alias_name="dmax"))
        .to_pandas()  # bounded: one row per (codec, sr) pair
    )
    n_clips = int(agg["n"].sum())
    dur_total = int(agg["dur"].sum())
    rows = [
        ("n_clips", n_clips),
        ("dur_total_ms", dur_total),
        ("dur_mean_ms", dur_total // max(n_clips, 1)),
        ("dur_min_ms", int(agg["dmin"].min()) if len(agg) else 0),
        ("dur_max_ms", int(agg["dmax"].max()) if len(agg) else 0),
        ("n_allowlisted",
         int(agg.loc[agg[codec_col].isin(list(allowlist)), "n"].sum())),
    ]
    for codec, n in agg.groupby(codec_col)["n"].sum().items():
        rows.append((f"codec:{codec}", int(n)))
    for sr, n in agg.groupby(sr_col)["n"].sum().items():
        rows.append((f"sr:{int(sr)}", int(n)))
    out = pd.DataFrame(rows, columns=["metric", "value"])
    return out.sort_values("metric").reset_index(drop=True)


class TimeStretchActor:
    """Phase-vocoder tempo augmentation (functions/resample.time_stretch)
    — the pitch-PRESERVING half of the tempo/pitch augmentation plane:
    SpeedPerturbActor moves duration and pitch together (sox speed);
    this moves duration alone (sox tempo), the variant ASR recipes use
    when speaker pitch must stay natural.  The rate is md5-keyed on
    (clip_id, salt) over ``rates`` — pure per-row, deterministic, no
    shuffle; one augmentation epoch per salt."""

    def __init__(self, cfg: PipelineConfig | None = None, salt: str = "",
                 rates: tuple[float, ...] = (0.9, 1.0, 1.1)):
        self.cfg = cfg or PipelineConfig()
        self.salt = salt
        self.rates = tuple(rates)

    def _rate(self, cid: str) -> float:
        import hashlib

        d = hashlib.md5(f"{cid}:tempo:{self.salt}".encode()).digest()
        return self.rates[d[0] % len(self.rates)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.resample import stretch_applies, time_stretch

        def row(cid: str, pcm: np.ndarray, sr: int):
            r = self._rate(cid)
            if not stretch_applies(len(pcm), r):
                # honest audit: a clip the vocoder cannot frame is NOT
                # stretched — report rate 1.0, not a phantom augmentation
                return np.asarray(pcm, dtype=np.float32).copy(), 10_000
            return time_stretch(pcm, r), int(round(r * 10_000))

        return _apply_rowwise_augment(batch, self.cfg, row, "rate_bp",
                                      needs_sr=False)


def time_stretch_stage(ds, cfg: PipelineConfig, salt: str = "",
                       rates: tuple[float, ...] = (0.9, 1.0, 1.1),
                       concurrency: int | tuple[int, int] = 4):
    """Deterministic phase-vocoder tempo augmentation; actor pool."""
    from .taskmap import stateless_map

    return stateless_map(ds, TimeStretchActor, (cfg, salt, rates),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


class PitchShiftActor:
    """Pitch-shift augmentation (functions/resample.pitch_shift: phase
    vocoder ∘ windowed-sinc) — pitch moves by 2^(semitones/12), tempo
    stays; with SpeedPerturbActor (both move) and TimeStretchActor
    (tempo only) this completes the tempo/pitch augmentation plane.
    Semitone choice is md5-keyed on (clip_id, salt)."""

    def __init__(self, cfg: PipelineConfig | None = None, salt: str = "",
                 semitones: tuple[float, ...] = (-2.0, 0.0, 2.0)):
        self.cfg = cfg or PipelineConfig()
        self.salt = salt
        self.semitones = tuple(semitones)

    def _semis(self, cid: str) -> float:
        import hashlib

        d = hashlib.md5(f"{cid}:pitch:{self.salt}".encode()).digest()
        return self.semitones[d[0] % len(self.semitones)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.resample import pitch_shift, stretch_applies

        def row(cid: str, pcm: np.ndarray, sr: int):
            st = self._semis(cid)
            f = 2.0 ** (st / 12.0)
            if st == 0.0 or not stretch_applies(len(pcm), 1.0 / f):
                # honest audit: pitch_shift passes such clips through
                return np.asarray(pcm, dtype=np.float32).copy(), 0
            return pitch_shift(pcm, sr, st), int(round(st * 100))

        return _apply_rowwise_augment(batch, self.cfg, row, "semi_cents",
                                      needs_sr=True)


def pitch_shift_stage(ds, cfg: PipelineConfig, salt: str = "",
                      semitones: tuple[float, ...] = (-2.0, 0.0, 2.0),
                      concurrency: int | tuple[int, int] = 4):
    """Deterministic pitch-shift augmentation; actor pool."""
    from .taskmap import stateless_map

    return stateless_map(ds, PitchShiftActor, (cfg, salt, semitones),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


class FlacTranscodeActor:
    """Lossless corpus compression: decode any supported codec, quantize
    to int16 (round-half-away via np.round, the repo's 32767 scale), and
    re-encode as FLAC (functions/flacdec.encode_flac — the from-scratch
    spec encoder).  ``verify=True`` re-decodes the produced stream and
    checks sample-exact equality against the quantized source — the
    transcode refuses to silently corrupt (lossless=False marks, never
    raises).  Undecodable inputs pass through with flac_ok=False.

    The storage-side sibling of the WDS/JSONL sinks: a PCM-heavy speech
    corpus typically shrinks 30-50% with zero information loss before
    sharding."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 verify: bool = True, block_size: int = 4096):
        self.cfg = cfg or PipelineConfig()
        self.verify = verify
        self.block_size = block_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.flacdec import decode_flac, encode_flac

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        out_bytes, out_codec, ok, lossless, nb_in, nb_out = \
            [], [], [], [], [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            nb_in.append(len(buf or b""))
            try:
                pcm = _decode_one(buf or b"", codec or "")
                if len(pcm) == 0:
                    raise DecodeUnsupported("empty")
            except DecodeUnsupported:
                out_bytes.append(buf)
                out_codec.append(codec)
                ok.append(False)
                lossless.append(False)
                nb_out.append(len(buf or b""))
                continue
            q = np.round(np.clip(pcm.astype(np.float64), -1.0, 1.0)
                         * 32767.0).astype(np.int16)
            flac = encode_flac(q.astype(np.int64), int(sr or 0),
                               block_size=self.block_size)
            good = True
            if self.verify:
                back, _ = decode_flac(flac)
                good = (len(back) == len(q)
                        and bool(np.array_equal(
                            np.asarray(back, np.int64), q)))
            out_bytes.append(flac)
            out_codec.append("flac")
            ok.append(True)
            lossless.append(good)
            nb_out.append(len(flac))
        names = batch.column_names
        batch = batch.set_column(names.index(self.cfg.bytes_col),
                                 self.cfg.bytes_col,
                                 pa.array(out_bytes, pa.binary()))
        batch = batch.set_column(names.index(self.cfg.codec_col),
                                 self.cfg.codec_col,
                                 pa.array(out_codec, pa.string()))
        batch = batch.append_column("flac_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("lossless",
                                    pa.array(lossless, pa.bool_()))
        batch = batch.append_column("n_bytes_in",
                                    pa.array(nb_in, pa.int64()))
        return batch.append_column("n_bytes_flac",
                                   pa.array(nb_out, pa.int64()))


def flac_transcode_stage(ds, cfg: PipelineConfig,
                         concurrency: int | tuple[int, int] = 4,
                         verify: bool = True, block_size: int = 4096):
    """Actor-pool lossless FLAC transcode over the clip table."""
    from .taskmap import stateless_map

    return stateless_map(ds, FlacTranscodeActor, (cfg, verify, block_size),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)
