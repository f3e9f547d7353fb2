"""Multimodal (audio) stages — opaque ``bytes`` columns with typed metadata
(SURVEY.md engine-additions).

The pcm_s16le path is REAL: zero-copy-ish numpy decode, per-clip features
(rms/peak/clipping), 20 ms frame-energy sampling.  Compressed codecs
(flac/opus/...) are STUBBED — the audio libraries are not in this container —
behind ``DecodeUnsupported``: the stage marks ``decode_ok=False`` and emits
zeroed features for those rows (a clearly-marked deterministic fake; the Ray
plumbing — schema, actor signature, batch sizing, output layout — is real and
tested).  Swapping in a real decoder changes only ``_decode_one``.

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


def _parse_wav(buf: bytes) -> np.ndarray:
    """Minimal RIFF/WAVE container parse (PCM16 data chunk only)."""
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise DecodeUnsupported("wav")
    pos = 12
    while pos + 8 <= len(buf):
        chunk_id = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        if chunk_id == b"data":
            data = buf[pos + 8 : pos + 8 + size]
            return np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2").astype(np.float32) / 32767.0
        pos += 8 + size + (size & 1)
    raise DecodeUnsupported("wav")


def _decode_one(buf: bytes, codec: str) -> np.ndarray:
    if codec == "pcm_s16le":
        return np.frombuffer(buf, dtype="<i2").astype(np.float32) / 32767.0
    if codec in ("pcm_mulaw", "mulaw", "ulaw"):
        return _mulaw_expand(np.frombuffer(buf, dtype=np.uint8))
    if codec == "wav":
        return _parse_wav(buf)
    # flac/opus/... need soundfile/libsndfile — not in this container
    raise DecodeUnsupported(codec)


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
    from .perplexity_stage import _adaptive_pool

    return ds.map_batches(
        AudioFeatureActor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=min(cfg.batch_size or 256, 256),  # wide rows: cap batch bytes
        concurrency=_adaptive_pool(concurrency),
        num_cpus=1,
    )


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
