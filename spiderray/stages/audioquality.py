"""Audio quality-measurement stages: K-weighted gated loudness (ITU-R
BS.1770 / EBU R128 semantics) and MFCC front-end features, over the same
decode swap point as the other audio stages (stages/multimodal._decode_one).

Both are actor-pool ``map_batches`` stages in the repo's standard shape —
setup (none beyond config today; a real loudness meter or model handle
later) once per actor in ``__init__``, per-clip numpy kernels from
functions/audiofp.py in ``__call__``.  Every kernel is per-clip
deterministic, so the serial oracles reuse the same actor classes
in-process (the established fixture-oracle pattern)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.audiofp import loudness_stats, mfcc_mean
from .multimodal import DecodeUnsupported, _decode_one

# quality_filter gate defaults: a speech corpus drops clips that are
# essentially silence (integrated loudness below the floor) or audibly
# clipped.  -40 LUFS is far below conversational speech (-25..-15) but
# above noise-floor recordings; 1% clipped samples is audible distortion.
MIN_LUFS = -40.0
MAX_CLIP_RATIO = 0.01

_LOUDNESS_COLS = ("lufs_integrated", "lufs_range", "clip_ratio", "dc_offset")


class AudioLoudnessActor:
    """Decode + BS.1770-style loudness columns + keep/drop gate flags."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 min_lufs: float = MIN_LUFS,
                 max_clip_ratio: float = MAX_CLIP_RATIO):
        self.cfg = cfg or PipelineConfig()
        self.min_lufs = min_lufs
        self.max_clip_ratio = max_clip_ratio

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        cols: dict[str, list] = {k: [] for k in _LOUDNESS_COLS}
        ok, too_quiet, clipped = [], [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                stats = loudness_stats(pcm, int(sr or 0))
                ok.append(True)
            except DecodeUnsupported:
                stats = {k: 0.0 for k in _LOUDNESS_COLS}
                ok.append(False)
            for k in _LOUDNESS_COLS:
                cols[k].append(stats[k])
            too_quiet.append(ok[-1] and stats["lufs_integrated"] < self.min_lufs)
            clipped.append(ok[-1] and stats["clip_ratio"] > self.max_clip_ratio)
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        for k in _LOUDNESS_COLS:
            batch = batch.append_column(k, pa.array(cols[k], pa.float32()))
        batch = batch.append_column("too_quiet", pa.array(too_quiet, pa.bool_()))
        return batch.append_column("clipped", pa.array(clipped, pa.bool_()))


def audio_loudness_stage(ds, cfg: PipelineConfig,
                         concurrency: int | tuple[int, int] = 4,
                         min_lufs: float = MIN_LUFS,
                         max_clip_ratio: float = MAX_CLIP_RATIO):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioLoudnessActor, (cfg, min_lufs, max_clip_ratio),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


class AudioMfccActor:
    """Decode + per-clip mean MFCC vector as scalar columns mfcc_0..mfcc_N
    (scalar columns keep the output SQL/hash-comparable; the list-column
    variant for ANN feeding is ``mfcc_vector_batch``)."""

    def __init__(self, cfg: PipelineConfig | None = None, n_mfcc: int = 13):
        self.cfg = cfg or PipelineConfig()
        self.n_mfcc = n_mfcc

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        out = np.zeros((len(bufs), self.n_mfcc), dtype=np.float64)
        ok = []
        for j, (buf, codec, sr) in enumerate(zip(bufs, codecs, srs)):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                out[j] = mfcc_mean(pcm, int(sr or 0), n_mfcc=self.n_mfcc)
                ok.append(True)
            except DecodeUnsupported:
                ok.append(False)
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        for k in range(self.n_mfcc):
            batch = batch.append_column(
                f"mfcc_{k}", pa.array(out[:, k].astype(np.float32))
            )
        return batch


def audio_mfcc_stage(ds, cfg: PipelineConfig,
                     concurrency: int | tuple[int, int] = 4, n_mfcc: int = 13):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioMfccActor, (cfg, n_mfcc),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


def mfcc_vector_batch(batch: pa.Table, cfg: PipelineConfig | None = None,
                      n_mfcc: int = 13,
                      out_col: str = "embedding") -> pa.Table:
    """One clips batch → batch + ``out_col`` list<float> of mean MFCCs —
    the adapter that lets the audio corpus feed the embedding operators
    (stages/dedup.embedding_near_dup, stages/ann) unchanged."""
    cfg = cfg or PipelineConfig()
    vecs = []
    for buf, codec, sr in zip(
        batch.column(cfg.bytes_col).to_pylist(),
        batch.column(cfg.codec_col).to_pylist(),
        batch.column("sr_hz").to_pylist(),
    ):
        try:
            pcm = _decode_one(buf or b"", codec or "")
            vecs.append(mfcc_mean(pcm, int(sr or 0), n_mfcc=n_mfcc)
                        .astype(np.float32).tolist())
        except DecodeUnsupported:
            vecs.append([0.0] * n_mfcc)
    return batch.append_column(out_col, pa.array(vecs, pa.list_(pa.float32())))


_SNR_COLS = ("snr_db", "noise_floor_db", "active_ratio", "f0_hz", "voiced_ratio")

# gate defaults: percentile-SNR under 5 dB with real signal present means the
# pauses are as loud as the speech (noise-dominated recording); decodable
# audio whose voiced_ratio is ~0 has no periodic (speech-like) content.
MIN_SNR_DB = 5.0
MIN_VOICED_RATIO = 0.05


class AudioSnrPitchActor:
    """Decode + percentile-SNR / noise-floor / pitch columns and the
    noisy / unvoiced gate flags (kernels: functions/audiofp.snr_stats,
    pitch_stats)."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 min_snr_db: float = MIN_SNR_DB,
                 min_voiced_ratio: float = MIN_VOICED_RATIO):
        self.cfg = cfg or PipelineConfig()
        self.min_snr_db = min_snr_db
        self.min_voiced_ratio = min_voiced_ratio

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import pitch_stats, snr_stats

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        cols: dict[str, list] = {k: [] for k in _SNR_COLS}
        ok, noisy, unvoiced = [], [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                stats = snr_stats(pcm, int(sr or 0))
                stats.update(pitch_stats(pcm, int(sr or 0)))
                ok.append(True)
            except DecodeUnsupported:
                stats = {k: 0.0 for k in _SNR_COLS}
                ok.append(False)
            for k in _SNR_COLS:
                cols[k].append(stats[k])
            has_signal = ok[-1] and stats["active_ratio"] > 0.0
            noisy.append(has_signal and stats["snr_db"] < self.min_snr_db)
            unvoiced.append(ok[-1] and stats["voiced_ratio"] < self.min_voiced_ratio)
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        for k in _SNR_COLS:
            batch = batch.append_column(k, pa.array(cols[k], pa.float32()))
        batch = batch.append_column("noisy", pa.array(noisy, pa.bool_()))
        return batch.append_column("unvoiced", pa.array(unvoiced, pa.bool_()))


def audio_snr_stage(ds, cfg: PipelineConfig,
                    concurrency: int | tuple[int, int] = 4,
                    min_snr_db: float = MIN_SNR_DB,
                    min_voiced_ratio: float = MIN_VOICED_RATIO):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioSnrPitchActor, (cfg, min_snr_db, min_voiced_ratio),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


# --------------------------------------------------------------------------
# Digital-defect gate: saturation runs + dropout (zero-run) detection
# --------------------------------------------------------------------------

_DEFECT_COLS = ("clip_ratio", "max_clip_run_ms", "max_zero_run_ms", "peak")

# sustained saturation ≥2 ms is audible distortion even when the overall
# clipped-sample ratio is small; an exactly-zero run ≥50 ms inside a clip
# that otherwise has signal is a digital dropout (buffer underrun/splice),
# not natural silence (real silence has dither/noise-floor energy)
MAX_CLIP_RUN_MS = 2.0
MIN_DROPOUT_MS = 50.0


def distorted_clips_batch(batch: pa.Table) -> pa.Table:
    """Derive a defect test corpus: per clip id N, N%3==0 → hard-saturated
    (gain 4, clipped to full scale), N%3==1 → a (60+20·(N%4)) ms zero run
    spliced at 40% — a digital dropout, N%3==2 → untouched.  Re-encoded
    pcm16; undecodable clips pass through.  Pure per-row function shared by
    q_audio_defects and its serial oracle (the gapped_clips_batch shape)."""
    from .multimodal import _encode_pcm16

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
        mode = num % 3
        if mode == 0:
            pcm = np.clip(pcm.astype(np.float32) * 4.0, -1.0, 1.0)
        elif mode == 1 and len(pcm) > 0:
            hole = np.zeros(int(sr * (60 + 20 * (num % 4)) / 1000.0),
                            dtype=np.float32)
            cut = int(0.4 * len(pcm))
            pcm = np.concatenate([pcm[:cut], hole, pcm[cut:]])
        out_b.append(_encode_pcm16(pcm))
        out_c.append("pcm_s16le")
    batch = batch.set_column(batch.schema.get_field_index("bytes"), "bytes",
                             pa.array(out_b, pa.binary()))
    return batch.set_column(batch.schema.get_field_index("codec"), "codec",
                            pa.array(out_c, pa.string()))


class AudioDefectActor:
    """Decode + clipping/dropout defect columns and the clipped / dropout
    gate flags (kernel: functions/audiofp.clipping_stats)."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 max_clip_run_ms: float = MAX_CLIP_RUN_MS,
                 min_dropout_ms: float = MIN_DROPOUT_MS):
        self.cfg = cfg or PipelineConfig()
        self.max_clip_run_ms = max_clip_run_ms
        self.min_dropout_ms = min_dropout_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import clipping_stats

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        cols: dict[str, list] = {k: [] for k in _DEFECT_COLS}
        ok, clipped, dropout = [], [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                stats = clipping_stats(pcm, int(sr or 0))
                ok.append(True)
            except DecodeUnsupported:
                stats = {k: 0.0 for k in _DEFECT_COLS}
                ok.append(False)
            for k in _DEFECT_COLS:
                cols[k].append(stats[k])
            clipped.append(ok[-1] and (stats["clip_ratio"] >= MAX_CLIP_RATIO
                           or stats["max_clip_run_ms"] >= self.max_clip_run_ms))
            # a dropout needs surrounding signal: an all-zero clip is
            # silence (the loudness gate's business), not a splice defect
            dropout.append(ok[-1] and stats["peak"] > 0.0
                           and stats["max_zero_run_ms"] >= self.min_dropout_ms)
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        for k in _DEFECT_COLS:
            batch = batch.append_column(k, pa.array(cols[k], pa.float32()))
        batch = batch.append_column("clipped", pa.array(clipped, pa.bool_()))
        return batch.append_column("dropout", pa.array(dropout, pa.bool_()))


def audio_defect_stage(ds, cfg: PipelineConfig,
                       concurrency: int | tuple[int, int] = 4,
                       max_clip_run_ms: float = MAX_CLIP_RUN_MS,
                       min_dropout_ms: float = MIN_DROPOUT_MS):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioDefectActor, (cfg, max_clip_run_ms, min_dropout_ms),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


# ---------------------------------------------------------------------------
# CMVN — cepstral mean/variance normalization, the standard ASR front-end
# step after MFCC extraction (Kaldi's apply-cmvn over per-speaker stats):
# each feature dimension is standardized against ITS GROUP's (speaker /
# language / corpus-shard) mean and variance so channel and loudness biases
# cancel before training.
# ---------------------------------------------------------------------------

def grouped_cmvn(ds, group_col: str, feat_cols: list[str],
                 milli: int = 1000):
    """Two-pass grouped CMVN with INTEGER-EXACT statistics.

    Pass 1: per-batch partial sums of milli-scaled features — each batch
    contributes one (group, n, sum_k, sumsq_k) row per group, so only
    O(groups × batches) rows cross the one keyed shuffle; integer sums
    make the aggregation order-independent (bit-deterministic, unlike
    float accumulation).  The per-group stats land on the driver (K
    groups — driver-representable by the same contract every grouped
    stat here carries), where exact arbitrary-precision arithmetic
    computes mean = sum//n and std = isqrt((ss·n − s²)//n²) without the
    int64 overflow a distributed product would risk.  Pass 2: a pure
    broadcast map (``ray.put`` once, read per actor) appends
    ``z_<col>`` = ((x_milli − mean)·1000) // std — int64 z-scores in
    milli units, deterministic for hash-checked oracles.

    NOTE: pass 2 re-executes ``ds``'s lineage (same contract as
    grouped_quantiles_approx); feed it a cheap-to-recompute or persisted
    feature table, not a raw decode chain, when the upstream is expensive.
    """
    import math

    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from ..functions.arrowutil import pa_from_pandas

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {group_col: pa.array([], batch.schema.field(group_col).type),
                    "n": pa.array([], pa.int64())}
            for c in feat_cols:
                cols[f"s_{c}"] = pa.array([], pa.int64())
                cols[f"ss_{c}"] = pa.array([], pa.int64())
            return pa.table(cols)
        df = pd.DataFrame({group_col: batch.column(group_col).to_pylist()})
        for c in feat_cols:
            x = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            xm = np.rint(x * milli).astype(np.int64)
            df[f"s_{c}"] = xm
            df[f"ss_{c}"] = xm * xm
        df["n"] = 1
        g = df.groupby(group_col, as_index=False).sum()
        return pa_from_pandas(g)

    aggs = [Sum("n", alias_name="n")]
    for c in feat_cols:
        aggs.append(Sum(f"s_{c}", alias_name=f"s_{c}"))
        aggs.append(Sum(f"ss_{c}", alias_name=f"ss_{c}"))
    stats = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(*aggs)
        .to_pandas()
    )
    table: dict = {}
    for _, row in stats.iterrows():
        n = int(row["n"])
        means = np.empty(len(feat_cols), dtype=np.int64)
        stds = np.empty(len(feat_cols), dtype=np.int64)
        for k, c in enumerate(feat_cols):
            s, ss = int(row[f"s_{c}"]), int(row[f"ss_{c}"])  # Python ints:
            means[k] = s // n                  # products below can't overflow
            var = (ss * n - s * s) // (n * n)
            stds[k] = max(math.isqrt(max(var, 0)), 1)
        table[row[group_col]] = (means, stds)
    table_ref = ray.put(table)

    def apply(batch: pa.Table) -> pa.Table:
        t = ray.get(table_ref)
        groups = batch.column(group_col).to_pylist()
        default = (np.zeros(len(feat_cols), np.int64),
                   np.ones(len(feat_cols), np.int64))
        means = np.stack([t.get(g, default)[0] for g in groups]) \
            if groups else np.zeros((0, len(feat_cols)), np.int64)
        stds = np.stack([t.get(g, default)[1] for g in groups]) \
            if groups else np.ones((0, len(feat_cols)), np.int64)
        for k, c in enumerate(feat_cols):
            x = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            xm = np.rint(x * milli).astype(np.int64)
            z = ((xm - means[:, k]) * milli) // stds[:, k] if len(xm) \
                else np.empty(0, np.int64)
            batch = batch.append_column(f"z_{c}", pa.array(z, pa.int64()))
        return batch

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


class SpecAugmentActor:
    """SpecAugment (Park et al. 2019, arXiv:1904.08779) — the canonical
    feature-space ASR augmentation: frequency masks (F contiguous mel
    bins) and time masks (T contiguous frames) blanked to the
    spectrogram's mean on the log-mel front end.  Mask positions/widths
    derive from an md5 chain on (clip_id, salt) — deterministic,
    partition-independent, one epoch per salt.  Emits the masked
    spectrogram as float32 bytes plus audit columns incl. its md5 (the
    contract check) and masked-cell counts."""

    def __init__(self, cfg: PipelineConfig | None = None, salt: str = "",
                 n_freq_masks: int = 2, max_f: int = 6,
                 n_time_masks: int = 2, max_t: int = 40,
                 n_mels: int = 24):
        self.cfg = cfg or PipelineConfig()
        self.salt = salt
        self.n_freq_masks = n_freq_masks
        self.max_f = max_f
        self.n_time_masks = n_time_masks
        self.max_t = max_t
        self.n_mels = n_mels

    def _masks(self, cid: str, n_frames: int):
        import hashlib

        d = hashlib.md5(f"{cid}:specaug:{self.salt}".encode()).digest()
        fmasks, tmasks = [], []
        for k in range(self.n_freq_masks):
            dk = hashlib.md5(d + b"f" + bytes([k])).digest()
            w = dk[0] % (self.max_f + 1)
            f0 = int.from_bytes(dk[1:3], "big") % max(self.n_mels - w, 1)
            fmasks.append((f0, f0 + w))
        for k in range(self.n_time_masks):
            dk = hashlib.md5(d + b"t" + bytes([k])).digest()
            w = dk[0] % (self.max_t + 1)
            t0 = int.from_bytes(dk[1:3], "big") % max(n_frames - w, 1)
            tmasks.append((t0, t0 + w))
        return fmasks, tmasks

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        from ..functions.audiofp import log_mel_spectrogram
        from .multimodal import DecodeUnsupported, _decode_one

        ids = batch.column(self.cfg.id_col).to_pylist()
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        ok, n_frames_c, masked_c, spec_md5, spec_bytes = [], [], [], [], []
        for cid, buf, codec, sr in zip(ids, bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                mel = log_mel_spectrogram(pcm, int(sr or 0),
                                          n_mels=self.n_mels)
                if mel.shape[0] == 0:
                    raise DecodeUnsupported("too short")
            except DecodeUnsupported:
                ok.append(False)
                n_frames_c.append(0)
                masked_c.append(0)
                spec_md5.append("")
                spec_bytes.append(b"")
                continue
            n_frames = mel.shape[0]
            fmasks, tmasks = self._masks(str(cid), n_frames)
            fill = float(mel.mean())
            covered = np.zeros(mel.shape, dtype=bool)
            for f0, f1 in fmasks:
                mel[:, f0:f1] = fill
                covered[:, f0:f1] = True
            for t0, t1 in tmasks:
                mel[t0:t1, :] = fill
                covered[t0:t1, :] = True
            blob = mel.astype(np.float32).tobytes()
            ok.append(True)
            n_frames_c.append(n_frames)
            masked_c.append(int(covered.sum()))
            spec_md5.append(hashlib.md5(blob).hexdigest())
            spec_bytes.append(blob)
        batch = batch.append_column("aug_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("n_frames", pa.array(n_frames_c, pa.int32()))
        batch = batch.append_column("masked_cells", pa.array(masked_c, pa.int32()))
        batch = batch.append_column("spec_md5", pa.array(spec_md5, pa.string()))
        return batch.append_column("spec", pa.array(spec_bytes, pa.binary()))


def specaugment_stage(ds, cfg: PipelineConfig, salt: str = "",
                      concurrency: int | tuple[int, int] = 4, **kw):
    """Deterministic SpecAugment over the clip table (actor pool)."""
    from .taskmap import stateless_map

    return stateless_map(ds, SpecAugmentActor, (cfg, salt), ctor_kwargs=kw,
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


class LoudnessNormalizeActor:
    """Loudness normalization to a target integrated LUFS (the EBU R128 /
    podcast-pipeline -16..-23 LUFS convention): measure the clip's
    BS.1770-style integrated loudness (functions/audiofp.loudness_stats),
    apply the single gain that moves it to ``target_lufs``, and hard-cap
    the gain so silence never amplifies into noise.  Pure per-row,
    deterministic; emits gain_db_milli (int) and the achieved loudness."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 target_lufs: float = -16.0, max_gain_db: float = 30.0):
        self.cfg = cfg or PipelineConfig()
        self.target_lufs = target_lufs
        self.max_gain_db = max_gain_db

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .multimodal import _encode_pcm16

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        out_bytes, out_codec = [], []
        ok, gains, achieved = [], [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            sr = int(sr or 0)
            try:
                pcm = _decode_one(buf or b"", codec or "")
                if sr <= 0 or len(pcm) == 0:
                    raise DecodeUnsupported("empty")
                stats = loudness_stats(pcm, sr)
            except DecodeUnsupported:
                out_bytes.append(buf)
                out_codec.append(codec)
                ok.append(False)
                gains.append(0)
                achieved.append(0.0)
                continue
            gain_db = self.target_lufs - stats["lufs_integrated"]
            gain_db = max(-self.max_gain_db, min(self.max_gain_db, gain_db))
            y = np.clip(pcm.astype(np.float64) * (10.0 ** (gain_db / 20.0)),
                        -1.0, 1.0).astype(np.float32)
            out_bytes.append(_encode_pcm16(y))
            out_codec.append("pcm_s16le")
            ok.append(True)
            gains.append(int(round(gain_db * 1000)))
            achieved.append(float(loudness_stats(y, sr)["lufs_integrated"]))
        names = batch.column_names
        batch = batch.set_column(names.index(self.cfg.bytes_col),
                                 self.cfg.bytes_col,
                                 pa.array(out_bytes, pa.binary()))
        batch = batch.set_column(names.index(self.cfg.codec_col),
                                 self.cfg.codec_col,
                                 pa.array(out_codec, pa.string()))
        batch = batch.append_column("norm_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("gain_db_milli", pa.array(gains, pa.int32()))
        return batch.append_column("lufs_out", pa.array(achieved, pa.float32()))


def loudness_normalize_stage(ds, cfg: PipelineConfig,
                             target_lufs: float = -16.0,
                             max_gain_db: float = 30.0,
                             concurrency: int | tuple[int, int] = 4):
    """Normalize every clip to a target integrated loudness (actor pool)."""
    from .taskmap import stateless_map

    return stateless_map(ds, LoudnessNormalizeActor, (cfg, target_lufs, max_gain_db),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


class SilenceTrimActor:
    """Leading/trailing silence trim — the standard TTS/ASR corpus
    preprocessing cut: frame-RMS VAD mask (same kernel family as the
    segmentation stage), keep [first_active, last_active] plus
    ``pad_ms`` context each side.  All-silent clips mark trim_ok=False
    and pass through unchanged (dropping them is the gate's business)."""

    def __init__(self, cfg: PipelineConfig | None = None, frame_ms: int = 20,
                 threshold: float = 1e-3, pad_ms: int = 40):
        self.cfg = cfg or PipelineConfig()
        self.frame_ms = frame_ms
        self.threshold = threshold
        self.pad_ms = pad_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .multimodal import _encode_pcm16

        ids = batch.column(self.cfg.id_col).to_pylist()
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        out_bytes, out_codec = [], []
        ok, trimmed_ms_c, out_n = [], [], []
        for cid, buf, codec, sr in zip(ids, bufs, codecs, srs):
            sr = int(sr or 0)
            try:
                pcm = _decode_one(buf or b"", codec or "")
                if sr <= 0 or len(pcm) == 0:
                    raise DecodeUnsupported("empty")
            except DecodeUnsupported:
                out_bytes.append(buf)
                out_codec.append(codec)
                ok.append(False)
                trimmed_ms_c.append(0)
                out_n.append(0)
                continue
            flen = max(int(sr * self.frame_ms / 1000), 1)
            n_frames = len(pcm) // flen
            fr = pcm[: n_frames * flen].reshape(max(n_frames, 0), flen) \
                if n_frames else pcm[:0].reshape(0, flen)
            frame_rms = np.sqrt((fr.astype(np.float64) ** 2).mean(axis=1)) \
                if n_frames else np.empty(0)
            active = np.nonzero(frame_rms >= self.threshold)[0]
            if len(active) == 0:
                out_bytes.append(buf)
                out_codec.append(codec)
                ok.append(False)
                trimmed_ms_c.append(0)
                out_n.append(len(pcm))
                continue
            pad = int(sr * self.pad_ms / 1000)
            start = max(int(active[0]) * flen - pad, 0)
            end = min((int(active[-1]) + 1) * flen + pad, len(pcm))
            y = pcm[start:end]
            out_bytes.append(_encode_pcm16(y))
            out_codec.append("pcm_s16le")
            ok.append(True)
            trimmed_ms_c.append(int((len(pcm) - len(y)) * 1000 / sr))
            out_n.append(len(y))
        names = batch.column_names
        batch = batch.set_column(names.index(self.cfg.bytes_col),
                                 self.cfg.bytes_col,
                                 pa.array(out_bytes, pa.binary()))
        batch = batch.set_column(names.index(self.cfg.codec_col),
                                 self.cfg.codec_col,
                                 pa.array(out_codec, pa.string()))
        batch = batch.append_column("trim_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("trimmed_ms", pa.array(trimmed_ms_c, pa.int32()))
        return batch.append_column("out_n_samples", pa.array(out_n, pa.int32()))


def silence_trim_stage(ds, cfg: PipelineConfig, frame_ms: int = 20,
                       threshold: float = 1e-3, pad_ms: int = 40,
                       concurrency: int | tuple[int, int] = 4):
    """Trim leading/trailing silence from every clip (actor pool)."""
    from .taskmap import stateless_map

    return stateless_map(ds, SilenceTrimActor, (cfg, frame_ms, threshold, pad_ms),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


# --------------------------------------------------------------------------
# Effective-bandwidth gate: flag upsampled / fake-sample-rate clips
# --------------------------------------------------------------------------

_BW_COLS = ("bw_hz", "bw_ratio")


class AudioBandwidthActor:
    """Decode + effective-bandwidth columns and the ``upsampled`` gate flag
    (kernel: functions/audiofp.bandwidth_stats — spectral energy rolloff).

    A clip whose 99%-energy rolloff sits far below the container Nyquist
    carries band-limited content behind a lying sample rate (8 kHz
    telephony resampled to 16/44.1 kHz, low-bitrate codec round-trips) —
    a standard drop/downweight signal in speech-corpus preparation.
    Undecodable clips mark ``decode_ok=False`` and never flag."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 min_bw_ratio: float | None = None):
        from ..functions.audiofp import MIN_BW_RATIO

        self.cfg = cfg or PipelineConfig()
        self.min_bw_ratio = (MIN_BW_RATIO if min_bw_ratio is None
                             else min_bw_ratio)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import bandwidth_stats
        from .multimodal import DecodeUnsupported, _decode_one

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        cols: dict[str, list] = {k: [] for k in _BW_COLS}
        ok, upsampled = [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                stats = bandwidth_stats(pcm, int(sr or 0))
                ok.append(True)
            except DecodeUnsupported:
                stats = {k: 0.0 for k in _BW_COLS}
                ok.append(False)
            for k in _BW_COLS:
                cols[k].append(stats[k])
            upsampled.append(ok[-1] and stats["bw_ratio"] > 0.0
                             and stats["bw_ratio"] < self.min_bw_ratio)
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        for k in _BW_COLS:
            batch = batch.append_column(k, pa.array(cols[k], pa.float32()))
        return batch.append_column("upsampled", pa.array(upsampled, pa.bool_()))


def audio_bandwidth_stage(ds, cfg: PipelineConfig,
                          concurrency: int | tuple[int, int] = 4,
                          min_bw_ratio: float | None = None):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioBandwidthActor, (cfg, min_bw_ratio),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


# --------------------------------------------------------------------------
# Mains-hum / DC-offset gate: flag capture-chain defects
# --------------------------------------------------------------------------

_HUM_COLS = ("dc_ratio", "hum_ratio")


class AudioHumActor:
    """Decode + DC-offset / mains-hum columns and their gate flags
    (kernel: functions/audiofp.hum_stats — one rFFT per clip).

    A DC-biased clip wastes headroom and skews energy-based VAD; a
    ground-loop 50/60 Hz tone (and harmonics) survives loudness
    normalization and poisons acoustic features — both standard drop /
    re-capture signals in speech-corpus preparation.  Undecodable clips
    mark ``decode_ok=False`` and never flag."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 max_dc_ratio: float | None = None,
                 max_hum_ratio: float | None = None):
        from ..functions.audiofp import MAX_DC_RATIO, MAX_HUM_RATIO

        self.cfg = cfg or PipelineConfig()
        self.max_dc_ratio = (MAX_DC_RATIO if max_dc_ratio is None
                             else max_dc_ratio)
        self.max_hum_ratio = (MAX_HUM_RATIO if max_hum_ratio is None
                              else max_hum_ratio)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import hum_stats
        from .multimodal import DecodeUnsupported, _decode_one

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        cols: dict[str, list] = {k: [] for k in _HUM_COLS}
        ok, dc_flag, hum_flag = [], [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                stats = hum_stats(_decode_one(buf or b"", codec or ""),
                                  int(sr or 0))
                ok.append(True)
            except DecodeUnsupported:
                stats = {k: 0.0 for k in _HUM_COLS}
                ok.append(False)
            for k in _HUM_COLS:
                cols[k].append(stats[k])
            dc_flag.append(ok[-1] and stats["dc_ratio"] > self.max_dc_ratio)
            hum_flag.append(ok[-1] and stats["hum_ratio"] > self.max_hum_ratio)
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        for k in _HUM_COLS:
            batch = batch.append_column(k, pa.array(cols[k], pa.float32()))
        batch = batch.append_column("dc_offset", pa.array(dc_flag, pa.bool_()))
        return batch.append_column("hum", pa.array(hum_flag, pa.bool_()))


def audio_hum_stage(ds, cfg: PipelineConfig,
                    concurrency: int | tuple[int, int] = 4,
                    max_dc_ratio: float | None = None,
                    max_hum_ratio: float | None = None):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioHumActor, (cfg, max_dc_ratio, max_hum_ratio),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


_REVERB_COLS = ("rt60_ms", "decay_db_s")


class AudioReverbActor:
    """Decode + blind-reverberation columns and the ``reverberant`` gate
    flag (kernel: functions/audiofp.reverb_stats — frame-energy envelope
    + OLS decay slope after the last burst, no FFT).

    A long RT60 smears phones across frames: ASR corpora drop or
    re-record such clips because no loudness/bandwidth gate can repair
    them.  Undecodable clips mark ``decode_ok=False`` and never flag."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 max_rt60_ms: float | None = None):
        from ..functions.audiofp import MAX_REVERB_RT60_MS

        self.cfg = cfg or PipelineConfig()
        self.max_rt60_ms = (MAX_REVERB_RT60_MS if max_rt60_ms is None
                            else max_rt60_ms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import reverb_stats
        from .multimodal import DecodeUnsupported, _decode_one

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        cols: dict[str, list] = {k: [] for k in _REVERB_COLS}
        ok, flag = [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                stats = reverb_stats(_decode_one(buf or b"", codec or ""),
                                     int(sr or 0))
                ok.append(True)
            except DecodeUnsupported:
                stats = {k: 0.0 for k in _REVERB_COLS}
                ok.append(False)
            for k in _REVERB_COLS:
                cols[k].append(stats[k])
            flag.append(ok[-1] and stats["rt60_ms"] > self.max_rt60_ms)
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        for k in _REVERB_COLS:
            batch = batch.append_column(k, pa.array(cols[k], pa.float32()))
        return batch.append_column("reverberant", pa.array(flag, pa.bool_()))


def audio_reverb_stage(ds, cfg: PipelineConfig,
                       concurrency: int | tuple[int, int] = 4,
                       max_rt60_ms: float | None = None):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioReverbActor, (cfg, max_rt60_ms),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


_CHAN_COLS = ("lr_corr", "rms_ratio")


class AudioChannelActor:
    """Decode (channel-preserving) + stereo-layout defect flags
    (kernel: functions/audiofp.channel_stats).

    ``dead_channel``: one side of the capture chain was unplugged;
    ``fake_stereo``: a mono master duplicated into L=R (re-encode as
    mono — half the bytes for the same signal); ``phase_inverted``:
    L≈−R, which cancels to silence on the mono downmix every feature
    stage in this engine consumes — the most dangerous of the three
    because downstream gates then see a silent clip.  Mono clips carry
    n_channels=1 and never flag; undecodable clips mark
    ``decode_ok=False``."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 dead_ratio: float | None = None,
                 fake_corr: float | None = None,
                 invert_corr: float | None = None):
        from ..functions.audiofp import (CHAN_BALANCE_DB, CHAN_DEAD_RATIO,
                                         CHAN_FAKE_CORR, CHAN_INVERT_CORR)

        self.cfg = cfg or PipelineConfig()
        self.dead_ratio = CHAN_DEAD_RATIO if dead_ratio is None else dead_ratio
        self.fake_corr = CHAN_FAKE_CORR if fake_corr is None else fake_corr
        self.invert_corr = (CHAN_INVERT_CORR if invert_corr is None
                            else invert_corr)
        self.balance = 10.0 ** (-CHAN_BALANCE_DB / 20.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import channel_stats
        from .multimodal import DecodeUnsupported, _decode_one_multi

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        cols: dict[str, list] = {k: [] for k in _CHAN_COLS}
        ok, n_ch, dead, fake, inv = [], [], [], [], []
        for buf, codec in zip(bufs, codecs):
            try:
                stats = channel_stats(_decode_one_multi(buf or b"",
                                                        codec or ""))
                ok.append(True)
            except DecodeUnsupported:
                stats = {"n_channels": 0, "lr_corr": 0.0, "rms_ratio": 1.0}
                ok.append(False)
            n_ch.append(stats["n_channels"])
            for k in _CHAN_COLS:
                cols[k].append(stats[k])
            stereo = ok[-1] and stats["n_channels"] >= 2
            dead.append(stereo and stats["rms_ratio"] < self.dead_ratio)
            fake.append(stereo and stats["lr_corr"] > self.fake_corr
                        and stats["rms_ratio"] > self.balance)
            inv.append(stereo and stats["lr_corr"] < self.invert_corr)
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("n_channels", pa.array(n_ch, pa.int32()))
        for k in _CHAN_COLS:
            batch = batch.append_column(k, pa.array(cols[k], pa.float32()))
        batch = batch.append_column("dead_channel", pa.array(dead, pa.bool_()))
        batch = batch.append_column("fake_stereo", pa.array(fake, pa.bool_()))
        return batch.append_column("phase_inverted", pa.array(inv, pa.bool_()))


def audio_channel_stage(ds, cfg: PipelineConfig,
                        concurrency: int | tuple[int, int] = 4, **thresholds):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioChannelActor, (),
                         ctor_kwargs={"cfg": cfg, **thresholds},
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


def codec_sniff_stage(ds, cfg: PipelineConfig):
    """Stateless map: container magic-byte sniff vs the declared codec
    column (functions/audiofp.codec_mismatch) → ``sniffed`` (string or
    '' when none) and ``codec_mismatch`` flag.  The 're-encoded upload
    kept its old codec column' ingest defect — caught BEFORE the decode
    pool wastes a worker slot failing on it.  Prefix checks only: no
    decode, no actor state, runs fused with the read."""
    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import codec_mismatch

        bufs = batch.column(cfg.bytes_col).to_pylist()
        codecs = batch.column(cfg.codec_col).to_pylist()
        sniffed, flag = [], []
        for buf, codec in zip(bufs, codecs):
            s, m = codec_mismatch(buf or b"", codec or "")
            sniffed.append(s or "")
            flag.append(m)
        batch = batch.append_column("sniffed", pa.array(sniffed, pa.string()))
        return batch.append_column("codec_mismatch", pa.array(flag, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class AudioDenoiseActor:
    """Spectral-subtraction noise reduction (kernel: functions/audiofp.
    denoise_spectral — Boll 1979): noise spectrum estimated from the
    quietest frames (speech pauses), oversubtracted with a spectral
    floor, original phase, tapered OLA.  Emits NEW pcm_s16le bytes plus
    the estimated ``noise_floor_db`` audit column; undecodable clips
    pass through with denoise_ok=False.  The enhancement transform a
    speech corpus runs between the defect gates and the trainer."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 noise_pct: float = 10.0, alpha: float = 2.0,
                 beta: float = 0.01):
        self.cfg = cfg or PipelineConfig()
        self.noise_pct = noise_pct
        self.alpha = alpha
        self.beta = beta

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import denoise_spectral
        from .multimodal import DecodeUnsupported, _decode_one, _encode_pcm16

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        out_bytes, out_codec, ok, floor, out_rms = [], [], [], [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                if len(pcm) == 0:
                    raise DecodeUnsupported("empty")
            except DecodeUnsupported:
                out_bytes.append(buf)
                out_codec.append(codec)
                ok.append(False)
                floor.append(0.0)
                out_rms.append(0.0)
                continue
            y, fdb = denoise_spectral(pcm, int(sr or 0),
                                      noise_pct=self.noise_pct,
                                      alpha=self.alpha, beta=self.beta)
            out_bytes.append(_encode_pcm16(y))
            out_codec.append("pcm_s16le")
            ok.append(True)
            floor.append(fdb)
            out_rms.append(float(np.sqrt(np.mean(y.astype(np.float64) ** 2)))
                           if len(y) else 0.0)
        names = batch.column_names
        batch = batch.set_column(names.index(self.cfg.bytes_col),
                                 self.cfg.bytes_col,
                                 pa.array(out_bytes, pa.binary()))
        batch = batch.set_column(names.index(self.cfg.codec_col),
                                 self.cfg.codec_col,
                                 pa.array(out_codec, pa.string()))
        batch = batch.append_column("denoise_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("noise_floor_db",
                                    pa.array(floor, pa.float32()))
        return batch.append_column("out_rms", pa.array(out_rms, pa.float32()))


def audio_denoise_stage(ds, cfg: PipelineConfig,
                        concurrency: int | tuple[int, int] = 4,
                        noise_pct: float = 10.0, alpha: float = 2.0,
                        beta: float = 0.01):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioDenoiseActor, (cfg, noise_pct, alpha, beta),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


_QC_FLAGS = ("codec_mismatch", "dc_offset", "hum", "upsampled",
             "reverberant", "clipped", "dropout", "dead_channel",
             "fake_stereo", "phase_inverted")


class AudioQcActor:
    """The fused corpus-QC battery: ONE decode feeds EVERY defect kernel
    (codec sniff, hum/DC, effective bandwidth, reverberation, clipping/
    dropout, channel layout) using the standalone gates' exact flag
    rules and default thresholds.  Each gate exists standalone for
    selective pipelines; a full QC pass wants all of them, and decoding
    once per clip instead of once per gate family is a ~6× decode
    saving.  Output: decode_ok, sniffed, the ten defect flags, and
    ``keep`` = decoded ∧ no flag."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import (CHAN_BALANCE_DB, CHAN_DEAD_RATIO,
                                         CHAN_FAKE_CORR, CHAN_INVERT_CORR,
                                         MAX_DC_RATIO, MAX_HUM_RATIO,
                                         MAX_REVERB_RT60_MS, MIN_BW_RATIO,
                                         bandwidth_stats, channel_stats,
                                         clipping_stats, codec_mismatch,
                                         hum_stats, reverb_stats)
        from .multimodal import DecodeUnsupported, _decode_one_multi

        balance = 10.0 ** (-CHAN_BALANCE_DB / 20.0)
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        ok, sniffed = [], []
        flags: dict[str, list] = {k: [] for k in _QC_FLAGS}
        keep = []
        for buf, codec, sr in zip(bufs, codecs, srs):
            sr = int(sr or 0)
            sniff, mism = codec_mismatch(buf or b"", codec or "")
            sniffed.append(sniff or "")
            flags["codec_mismatch"].append(mism)
            try:
                multi = _decode_one_multi(buf or b"", codec or "")
                mono = multi.mean(axis=1) if multi.shape[1] > 1 \
                    else multi[:, 0]
                if len(mono) == 0:
                    raise DecodeUnsupported("empty")
                decoded = True
            except DecodeUnsupported:
                decoded = False
            ok.append(decoded)
            if not decoded:
                for k in _QC_FLAGS[1:]:
                    flags[k].append(False)
                keep.append(False)
                continue
            hum = hum_stats(mono, sr)
            bw = bandwidth_stats(mono, sr)
            rv = reverb_stats(mono, sr)
            cl = clipping_stats(mono, sr)
            ch = channel_stats(multi)
            stereo = ch["n_channels"] >= 2
            flags["dc_offset"].append(hum["dc_ratio"] > MAX_DC_RATIO)
            flags["hum"].append(hum["hum_ratio"] > MAX_HUM_RATIO)
            flags["upsampled"].append(
                bw["bw_ratio"] > 0.0 and bw["bw_ratio"] < MIN_BW_RATIO)
            flags["reverberant"].append(rv["rt60_ms"] > MAX_REVERB_RT60_MS)
            flags["clipped"].append(
                cl["clip_ratio"] >= MAX_CLIP_RATIO
                or cl["max_clip_run_ms"] >= MAX_CLIP_RUN_MS)
            flags["dropout"].append(
                cl["peak"] > 0.0 and cl["max_zero_run_ms"] >= MIN_DROPOUT_MS)
            flags["dead_channel"].append(
                stereo and ch["rms_ratio"] < CHAN_DEAD_RATIO)
            flags["fake_stereo"].append(
                stereo and ch["lr_corr"] > CHAN_FAKE_CORR
                and ch["rms_ratio"] > balance)
            flags["phase_inverted"].append(
                stereo and ch["lr_corr"] < CHAN_INVERT_CORR)
            keep.append(not any(flags[k][-1] for k in _QC_FLAGS))
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("sniffed", pa.array(sniffed, pa.string()))
        for k in _QC_FLAGS:
            batch = batch.append_column(k, pa.array(flags[k], pa.bool_()))
        return batch.append_column("keep", pa.array(keep, pa.bool_()))


def audio_qc_stage(ds, cfg: PipelineConfig,
                   concurrency: int | tuple[int, int] = 4):
    """Fused decode-once QC battery over the clip table; actor pool."""
    from .taskmap import stateless_map

    return stateless_map(ds, AudioQcActor, (cfg,),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


class AudioCompressActor:
    """Dynamic-range compression (kernel: functions/audiofp.
    compress_dynamics — Giannoulis et al. 2012 feed-forward design):
    decode once, compress, re-encode pcm_s16le; emits gain_reduction_db
    (the max smoothed reduction applied) and out_rms audit columns;
    undecodable clips pass through with compress_ok=False.  The
    loudness-consistency transform between normalization and the
    trainer."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 threshold_db: float = -24.0, ratio: float = 4.0,
                 attack_ms: float = 10.0, release_ms: float = 100.0,
                 makeup_db: float = 0.0):
        self.cfg = cfg or PipelineConfig()
        self.threshold_db = threshold_db
        self.ratio = ratio
        self.attack_ms = attack_ms
        self.release_ms = release_ms
        self.makeup_db = makeup_db

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import compress_dynamics
        from .multimodal import DecodeUnsupported, _decode_one, _encode_pcm16

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        out_bytes, out_codec, ok, grdb, out_rms = [], [], [], [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                if len(pcm) == 0:
                    raise DecodeUnsupported("empty")
            except DecodeUnsupported:
                out_bytes.append(buf)
                out_codec.append(codec)
                ok.append(False)
                grdb.append(0.0)
                out_rms.append(0.0)
                continue
            y, gr = compress_dynamics(
                pcm, int(sr or 0), threshold_db=self.threshold_db,
                ratio=self.ratio, attack_ms=self.attack_ms,
                release_ms=self.release_ms, makeup_db=self.makeup_db)
            out_bytes.append(_encode_pcm16(y))
            out_codec.append("pcm_s16le")
            ok.append(True)
            grdb.append(gr)
            out_rms.append(float(np.sqrt(np.mean(y.astype(np.float64) ** 2)))
                           if len(y) else 0.0)
        names = batch.column_names
        batch = batch.set_column(names.index(self.cfg.bytes_col),
                                 self.cfg.bytes_col,
                                 pa.array(out_bytes, pa.binary()))
        batch = batch.set_column(names.index(self.cfg.codec_col),
                                 self.cfg.codec_col,
                                 pa.array(out_codec, pa.string()))
        batch = batch.append_column("compress_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("gain_reduction_db",
                                    pa.array(grdb, pa.float32()))
        return batch.append_column("out_rms", pa.array(out_rms, pa.float32()))


def audio_compress_stage(ds, cfg: PipelineConfig,
                         concurrency: int | tuple[int, int] = 4,
                         threshold_db: float = -24.0, ratio: float = 4.0,
                         attack_ms: float = 10.0, release_ms: float = 100.0,
                         makeup_db: float = 0.0):
    """Actor-pool dynamic-range compression over the clip table."""
    from .taskmap import stateless_map

    return stateless_map(ds, AudioCompressActor, (cfg, threshold_db, ratio, attack_ms,
                             release_ms, makeup_db),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


# --------------------------------------------------------------------------
# Music / speech / other content gate
# --------------------------------------------------------------------------

_MUSIC_COLS = ("mod_ratio", "env_depth", "flatness", "flux")


class MusicSpeechActor:
    """Decode + model-free music/speech/other discrimination (kernel:
    functions/audiofp.musicness_stats — Scheirer & Slaney 1997 signals:
    syllabic 2-8 Hz envelope modulation, spectral flatness, spectral flux).

    Scraped "speech" corpora carry music beds, jingles and hold music that
    poison ASR training; this emits the per-clip signals (milli-quantized
    int64 — bit-stable across hosts) plus an ``audio_class`` decision
    column (speech / music / other) for the keep/drop or re-routing
    policy.  Undecodable clips mark ``decode_ok=False``, class
    ``undecodable``, and never crash the task."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import classify_audio_content, musicness_stats
        from .multimodal import DecodeUnsupported, _decode_one

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        cols: dict[str, list] = {k: [] for k in _MUSIC_COLS}
        ok, klass = [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                stats = musicness_stats(pcm, int(sr or 0))
                ok.append(True)
                klass.append(classify_audio_content(stats))
            except DecodeUnsupported:
                stats = {k: 0.0 for k in _MUSIC_COLS}
                ok.append(False)
                klass.append("undecodable")
            for k in _MUSIC_COLS:
                cols[k].append(int(np.floor(stats[k] * 1000 + 0.5)))
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        for k in _MUSIC_COLS:
            batch = batch.append_column(f"{k}_milli",
                                        pa.array(cols[k], pa.int64()))
        return batch.append_column("audio_class", pa.array(klass, pa.string()))


def music_speech_stage(ds, cfg: PipelineConfig,
                       concurrency: int | tuple[int, int] = 4):
    from .taskmap import stateless_map

    return stateless_map(ds, MusicSpeechActor, (cfg,),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


_LOOP_COLS = ("n_frames", "n_voiced", "n_unique_peaks",
              "loop_period_frames", "loop_score_ppm", "loop_overlap")


class AudioLoopActor:
    """Decode + looped-audio columns and the ``is_looped`` gate flag
    (kernel: functions/audiofp.audio_loop_stats — quantized spectral-peak
    track matched against itself at every lag; exact integer ppm).

    The audio sibling of the ASR hallucination-loop gate: hold music,
    loopy jingles and synthetically TILED clips repeat a short segment
    verbatim, inflating duration counts without adding training signal.
    The flag needs all three of: best-lag self-match ≥
    ``min_score_ppm``, melodic variety (≥ ``min_unique_peaks`` distinct
    quantized peaks — a held tone matches at every lag but that is
    stationarity, the content gate's business, not looping), and a real
    overlap behind the winning lag.  Undecodable clips mark
    ``decode_ok=False`` and never flag."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 min_score_ppm: int | None = None,
                 min_unique_peaks: int | None = None):
        from ..functions.audiofp import (
            MIN_LOOP_SCORE_PPM,
            MIN_LOOP_UNIQUE_PEAKS,
        )

        self.cfg = cfg or PipelineConfig()
        self.min_score_ppm = (MIN_LOOP_SCORE_PPM if min_score_ppm is None
                              else min_score_ppm)
        self.min_unique_peaks = (
            MIN_LOOP_UNIQUE_PEAKS if min_unique_peaks is None
            else min_unique_peaks)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import audio_loop_stats
        from .multimodal import DecodeUnsupported, _decode_one

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        cols: dict[str, list] = {k: [] for k in _LOOP_COLS}
        ok, flag = [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                stats = audio_loop_stats(_decode_one(buf or b"", codec or ""),
                                         int(sr or 0))
                ok.append(True)
            except DecodeUnsupported:
                stats = {k: 0 for k in _LOOP_COLS}
                ok.append(False)
            for k in _LOOP_COLS:
                cols[k].append(stats[k])
            flag.append(ok[-1]
                        and stats["loop_score_ppm"] >= self.min_score_ppm
                        and stats["n_unique_peaks"] >= self.min_unique_peaks)
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        for k in _LOOP_COLS:
            batch = batch.append_column(k, pa.array(cols[k], pa.int64()))
        return batch.append_column("is_looped", pa.array(flag, pa.bool_()))


def audio_loop_stage(ds, cfg: PipelineConfig,
                     concurrency: int | tuple[int, int] = 4,
                     min_score_ppm: int | None = None,
                     min_unique_peaks: int | None = None):
    from .taskmap import stateless_map

    return stateless_map(ds, AudioLoopActor, (cfg, min_score_ppm, min_unique_peaks),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


class DtmfActor:
    """Decode + DTMF dialed-digit columns and the ``has_dtmf`` PII flag
    (kernel: functions/audiofp.dtmf_digits — vectorized Goertzel-style
    projection on the ITU-T Q.23 tone grid).

    Dialed phone numbers, PINs and IVR choices are PII that lives in the
    WAVEFORM — every transcript-side scrubber (scrub_email and friends)
    misses them.  Emits the decoded digit string, its length, and flags
    clips with ≥ ``min_digits`` decoded digits (a lone key press is a
    beep; a run is a number being dialed).  Undecodable clips mark
    ``decode_ok=False`` and never flag."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 min_digits: int = 3):
        self.cfg = cfg or PipelineConfig()
        self.min_digits = min_digits

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import dtmf_digits
        from .multimodal import DecodeUnsupported, _decode_one

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        ok, seqs, flags = [], [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                seq = dtmf_digits(_decode_one(buf or b"", codec or ""),
                                  int(sr or 0))
                ok.append(True)
            except DecodeUnsupported:
                seq = ""
                ok.append(False)
            seqs.append(seq)
            flags.append(ok[-1] and len(seq) >= self.min_digits)
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("dtmf_digits", pa.array(seqs, pa.string()))
        batch = batch.append_column(
            "n_digits", pa.array([len(s) for s in seqs], pa.int64()))
        return batch.append_column("has_dtmf", pa.array(flags, pa.bool_()))


def dtmf_stage(ds, cfg: PipelineConfig,
               concurrency: int | tuple[int, int] = 4,
               min_digits: int = 3):
    from .taskmap import stateless_map

    return stateless_map(ds, DtmfActor, (cfg, min_digits),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


_TEMPO_COLS = ("bpm", "tempo_conf_ppm", "onset_ppm", "n_frames")


class TempoActor:
    """Decode + tempo columns and the ``has_beat`` flag (kernel:
    functions/audiofp.tempo_stats — onset-autocorrelation beat tracking
    over the 60–180 BPM range).

    The music-metadata extractor of a scraped-audio pipeline: tempo +
    beat confidence feed catalog search and music routing beside the
    Scheirer-Slaney content gate.  ``has_beat`` needs BOTH the
    autocorrelation share (≥ min_conf_ppm) and real onset energy
    (≥ min_onset_ppm of the envelope) — a steady tone's numerical
    jitter autocorrelates near-perfectly but carries no onset energy.
    Undecodable clips mark ``decode_ok=False`` and never flag."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 min_conf_ppm: int | None = None,
                 min_onset_ppm: int | None = None):
        from ..functions.audiofp import (
            TEMPO_MIN_CONF_PPM,
            TEMPO_MIN_ONSET_PPM,
        )

        self.cfg = cfg or PipelineConfig()
        self.min_conf_ppm = (TEMPO_MIN_CONF_PPM if min_conf_ppm is None
                             else min_conf_ppm)
        self.min_onset_ppm = (TEMPO_MIN_ONSET_PPM if min_onset_ppm is None
                              else min_onset_ppm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import tempo_stats
        from .multimodal import DecodeUnsupported, _decode_one

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        cols: dict[str, list] = {k: [] for k in _TEMPO_COLS}
        ok, flag = [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                stats = tempo_stats(_decode_one(buf or b"", codec or ""),
                                    int(sr or 0))
                ok.append(True)
            except DecodeUnsupported:
                stats = {k: 0 for k in _TEMPO_COLS}
                ok.append(False)
            for k in _TEMPO_COLS:
                cols[k].append(stats[k])
            flag.append(ok[-1]
                        and stats["tempo_conf_ppm"] >= self.min_conf_ppm
                        and stats["onset_ppm"] >= self.min_onset_ppm)
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        for k in _TEMPO_COLS:
            batch = batch.append_column(k, pa.array(cols[k], pa.int64()))
        return batch.append_column("has_beat", pa.array(flag, pa.bool_()))


def tempo_stage(ds, cfg: PipelineConfig,
                concurrency: int | tuple[int, int] = 4,
                min_conf_ppm: int | None = None,
                min_onset_ppm: int | None = None):
    from .taskmap import stateless_map

    return stateless_map(ds, TempoActor, (cfg, min_conf_ppm, min_onset_ppm),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


_TURN_COLS = ("n_windows", "turn_count", "sep_ppm")


class SpeakerTurnActor:
    """Decode + speaker-turn columns and the ``multi_speaker`` flag
    (kernel: functions/audiofp.speaker_turn_stats — adjacent log-mel
    window distances; a turn is a local maximum above 2× the median).

    The conversation-vs-monologue router: multi-speaker clips go to
    diarization before ASR training, monologues skip it.  The flag
    needs ≥ ``min_turns`` detected boundaries — one spurious spectral
    jump (a door slam) is not a conversation.  Undecodable clips mark
    ``decode_ok=False`` and never flag."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 min_turns: int | None = None):
        from ..functions.audiofp import MIN_SPEAKER_TURNS

        self.cfg = cfg or PipelineConfig()
        self.min_turns = (MIN_SPEAKER_TURNS if min_turns is None
                          else min_turns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import speaker_turn_stats
        from .multimodal import DecodeUnsupported, _decode_one

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        srs = batch.column("sr_hz").to_pylist()
        cols: dict[str, list] = {k: [] for k in _TURN_COLS}
        ok, flag = [], []
        for buf, codec, sr in zip(bufs, codecs, srs):
            try:
                stats = speaker_turn_stats(
                    _decode_one(buf or b"", codec or ""), int(sr or 0))
                ok.append(True)
            except DecodeUnsupported:
                stats = {k: 0 for k in _TURN_COLS}
                ok.append(False)
            for k in _TURN_COLS:
                cols[k].append(stats[k])
            flag.append(ok[-1] and stats["turn_count"] >= self.min_turns)
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        for k in _TURN_COLS:
            batch = batch.append_column(k, pa.array(cols[k], pa.int64()))
        return batch.append_column("multi_speaker",
                                   pa.array(flag, pa.bool_()))


def speaker_turn_stage(ds, cfg: PipelineConfig,
                       concurrency: int | tuple[int, int] = 4,
                       min_turns: int | None = None):
    from .taskmap import stateless_map

    return stateless_map(ds, SpeakerTurnActor, (cfg, min_turns),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)


class DeclipActor:
    """Decode + declip repair (kernel: functions/audiofp.declip — cubic
    Hermite interpolation across flat clipped rails) emitting the
    repaired pcm_s16le bytes plus before/after FLAT-RAIL ppm
    (functions/audiofp.flat_clip_ppm — an amplitude-only ratio keeps
    counting a restored crest; the flat-rail measure does not).

    The repair half of the clipping story: AudioDefectActor detects,
    this fixes what interpolation can fix (isolated crests fully;
    saturated walls partially — the metric says which).  Undecodable
    clips mark ``decode_ok=False`` and pass through unchanged."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.audiofp import declip, flat_clip_ppm
        from .multimodal import DecodeUnsupported, _decode_one

        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        codecs = batch.column(self.cfg.codec_col).to_pylist()
        ok, out_b, before, after, runs = [], [], [], [], []
        for buf, codec in zip(bufs, codecs):
            try:
                pcm = _decode_one(buf or b"", codec or "")
            except DecodeUnsupported:
                ok.append(False)
                out_b.append(buf or b"")
                before.append(0)
                after.append(0)
                runs.append(0)
                continue
            ok.append(True)
            before.append(flat_clip_ppm(pcm))
            rep, _n, nr = declip(pcm.astype(np.float64))
            after.append(flat_clip_ppm(rep))
            runs.append(nr)
            q = np.clip(np.floor(rep * 32767.0 + 0.5), -32768, 32767)
            out_b.append(q.astype("<i2").tobytes())
        names = [c for c in batch.column_names
                 if c not in (self.cfg.bytes_col, self.cfg.codec_col)]
        cols = {c: batch.column(c) for c in names}
        cols[self.cfg.bytes_col] = pa.array(out_b, pa.binary())
        cols[self.cfg.codec_col] = pa.array(
            ["pcm_s16le" if o else c for o, c in
             zip(ok, batch.column(self.cfg.codec_col).to_pylist())],
            pa.string())
        cols["decode_ok"] = pa.array(ok, pa.bool_())
        cols["flat_before_ppm"] = pa.array(before, pa.int64())
        cols["flat_after_ppm"] = pa.array(after, pa.int64())
        cols["n_runs_repaired"] = pa.array(runs, pa.int64())
        return pa.table(cols)


def declip_stage(ds, cfg: PipelineConfig,
                 concurrency: int | tuple[int, int] = 4):
    from .taskmap import stateless_map

    return stateless_map(ds, DeclipActor, (cfg,),
                         batch_size=min(cfg.batch_size or 256, 256),
                         concurrency=concurrency)
