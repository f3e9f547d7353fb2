"""Reverb + noise-mixing augmentation (stages/multimodal.AcousticAugmentActor)."""

import numpy as np
import pyarrow as pa

from spiderray.config import PipelineConfig
from spiderray.stages.multimodal import AcousticAugmentActor, _decode_one


def _clip(secs=0.5, sr=16000, f=440):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t) * 32767).astype("<i2").tobytes()


def _batch(ids, secs=0.5):
    return pa.table({
        "clip_id": ids,
        "bytes": [_clip(secs) for _ in ids],
        "codec": ["pcm_s16le"] * len(ids),
        "sr_hz": [16000] * len(ids),
    })


def _measured_snr(clean: np.ndarray, noisy: np.ndarray) -> float:
    n = min(len(clean), len(noisy))
    resid = noisy[:n] - clean[:n]
    return 10 * np.log10((clean[:n] ** 2).mean() / max((resid ** 2).mean(), 1e-12))


class TestAcousticAugment:
    def test_noise_hits_target_snr_without_reverb(self):
        actor = AcousticAugmentActor(PipelineConfig(), salt="s",
                                     reverb_prob_pct=0)
        ids = [f"c{i}" for i in range(24)]
        out_t = actor(_batch(ids, secs=1.0))
        df = out_t.to_pandas()
        assert df["aug_ok"].all()
        assert not df["reverb"].any()
        clean = _decode_one(_clip(1.0), "pcm_s16le").astype(np.float64)
        for row, buf in zip(df.itertuples(), out_t.column("bytes").to_pylist()):
            y = _decode_one(buf, "pcm_s16le").astype(np.float64)
            snr = _measured_snr(clean, y)
            # ±1 dB: pcm16 quantization + clipping at the peaks
            assert abs(snr - row.snr_target_db) < 1.0, (row.snr_target_db, snr)
        assert set(df["snr_target_db"]) == {5, 10, 20}

    def test_reverb_spreads_energy_in_time(self):
        actor = AcousticAugmentActor(PipelineConfig(), salt="s2",
                                     reverb_prob_pct=100,
                                     snr_choices_db=(60,))
        # an impulse train: reverb smears energy into the gaps
        sr = 16000
        x = np.zeros(sr // 2)
        x[::4000] = 0.9
        buf = (x * 32767).astype("<i2").tobytes()
        batch = pa.table({"clip_id": ["imp"], "bytes": [buf],
                          "codec": ["pcm_s16le"], "sr_hz": [sr]})
        out_t = actor(batch)
        assert out_t.to_pandas().loc[0, "reverb"]
        y = _decode_one(out_t.column("bytes").to_pylist()[0], "pcm_s16le")
        gap = np.abs(y[1000:3500]).mean()  # between impulses
        dry_gap = np.abs(x[1000:3500]).mean()
        assert gap > dry_gap + 1e-3  # tail energy landed in the gap

    def test_deterministic_per_salt(self):
        a = AcousticAugmentActor(PipelineConfig(), salt="e1")
        ids = [f"d{i}" for i in range(16)]
        r1 = a(_batch(ids)).to_pandas()
        r2 = a(_batch(ids)).to_pandas()
        assert r1["out_rms"].tolist() == r2["out_rms"].tolist()
        b = AcousticAugmentActor(PipelineConfig(), salt="e2")
        r3 = b(_batch(ids)).to_pandas()
        assert r1["out_rms"].tolist() != r3["out_rms"].tolist()

    def test_undecodable_passthrough(self):
        actor = AcousticAugmentActor(PipelineConfig())
        batch = pa.table({"clip_id": ["bad"], "bytes": [b"junk"],
                          "codec": ["opus"], "sr_hz": [16000]})
        out = actor(batch).to_pandas()
        assert not out.loc[0, "aug_ok"]
