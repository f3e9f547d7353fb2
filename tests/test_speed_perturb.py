"""Speed perturbation (stages/multimodal.SpeedPerturbActor)."""

import numpy as np
import pyarrow as pa

from spiderray.config import PipelineConfig
from spiderray.stages.multimodal import SpeedPerturbActor, _decode_one


def _clip(secs=0.5, sr=16000, f=440):
    t = np.arange(int(sr * secs)) / sr
    x = 0.5 * np.sin(2 * np.pi * f * t)
    return (x * 32767).astype("<i2").tobytes()


def _batch(ids, secs=0.5):
    return pa.table({
        "clip_id": ids,
        "bytes": [_clip(secs) for _ in ids],
        "codec": ["pcm_s16le"] * len(ids),
        "sr_hz": [16000] * len(ids),
    })


class TestSpeedPerturb:
    def test_duration_scales_inverse_of_factor(self):
        actor = SpeedPerturbActor(PipelineConfig(), salt="s")
        ids = [f"c{i}" for i in range(30)]
        out = actor(_batch(ids)).to_pandas()
        assert out["aug_ok"].all()
        n_in = 8000
        for _, r in out.iterrows():
            f = r["speed_bp"] / 10_000.0
            assert abs(r["out_n_samples"] - n_in / f) <= 2, (f, r["out_n_samples"])
        # all three factors appear across 30 clips
        assert set(out["speed_bp"]) == {9000, 10000, 11000}

    def test_pitch_shifts_by_factor(self):
        # a 440 Hz tone sped up by f plays back at 440·f Hz
        actor = SpeedPerturbActor(PipelineConfig(), salt="s2")
        ids = [f"p{i}" for i in range(12)]
        out_t = actor(_batch(ids, secs=1.0))
        df = out_t.to_pandas()
        for row, buf in zip(df.itertuples(), out_t.column("bytes").to_pylist()):
            f = row.speed_bp / 10_000.0
            y = _decode_one(buf, "pcm_s16le").astype(np.float64)
            spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
            peak_hz = np.argmax(spec) * 16000 / len(y)
            assert abs(peak_hz - 440.0 * f) < 5.0, (f, peak_hz)

    def test_deterministic_and_salt_varies(self):
        a1 = SpeedPerturbActor(PipelineConfig(), salt="e1")
        a2 = SpeedPerturbActor(PipelineConfig(), salt="e2")
        ids = [f"d{i}" for i in range(40)]
        r1 = a1(_batch(ids)).to_pandas()["speed_bp"].tolist()
        r1b = a1(_batch(ids)).to_pandas()["speed_bp"].tolist()
        r2 = a2(_batch(ids)).to_pandas()["speed_bp"].tolist()
        assert r1 == r1b
        assert r1 != r2  # different epoch → different assignment

    def test_undecodable_marked_not_crashed(self):
        actor = SpeedPerturbActor(PipelineConfig())
        batch = pa.table({
            "clip_id": ["bad"], "bytes": [b"junk"],
            "codec": ["opus"], "sr_hz": [16000],
        })
        out = actor(batch).to_pandas()
        assert not out.loc[0, "aug_ok"]
        assert out.loc[0, "speed_bp"] == 0


class TestTimeStretch:
    def test_pitch_preserved_duration_scaled(self):
        from spiderray.functions.resample import time_stretch

        sr = 16000
        t = np.arange(sr) / sr
        x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        for r in (0.5, 0.9, 1.1, 2.0):
            y = time_stretch(x, r)
            assert abs(len(y) - sr / r) < 1600, r  # within 10% of target
            spec = np.abs(np.fft.rfft(y.astype(np.float64)))
            peak_hz = spec.argmax() * sr / len(y)
            assert abs(peak_hz - 440.0) < 5.0, r   # pitch unchanged
            rms = float(np.sqrt((y.astype(np.float64) ** 2).mean()))
            # energy preserved up to the tapered OLA edges (one frame per
            # side — a larger fraction of the short rate-2.0 output)
            assert abs(rms - 0.3535) < 0.04, r

    def test_identity_and_short_input(self):
        from spiderray.functions.resample import time_stretch

        x = (0.1 * np.ones(500)).astype(np.float32)
        assert np.array_equal(time_stretch(x, 1.0), x)
        assert np.array_equal(time_stretch(x, 2.0), x)  # < one frame
        import pytest as _pytest

        with _pytest.raises(ValueError):
            time_stretch(x, 0.0)

    def test_actor_determinism_and_rate_key(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import (TimeStretchActor,
                                                 time_stretch_stage)

        sr = 16000
        t = np.arange(sr // 2) / sr
        pcm = ((0.4 * np.sin(2 * np.pi * 600.0 * t)) * 32767).astype(
            "<i2").tobytes()
        tbl = pa.table({
            "clip_id": pa.array([f"c{i}" for i in range(12)], pa.string()),
            "bytes": pa.array([pcm] * 11 + [b"xx"], pa.binary()),
            "codec": pa.array(["pcm_s16le"] * 11 + ["opus"], pa.string()),
            "sr_hz": pa.array([sr] * 12, pa.int32()),
        })
        serial = TimeStretchActor(PipelineConfig(), salt="s")(tbl)
        dist = (time_stretch_stage(rd.from_arrow(tbl).repartition(3),
                                   PipelineConfig(), salt="s")
                .to_pandas().sort_values("clip_id").reset_index(drop=True))
        ser = serial.to_pandas().sort_values("clip_id").reset_index(drop=True)
        assert dist[["clip_id", "aug_ok", "rate_bp",
                     "out_n_samples"]].values.tolist() == \
            ser[["clip_id", "aug_ok", "rate_bp",
                 "out_n_samples"]].values.tolist()
        assert not dist[dist["clip_id"] == "c0"].empty
        assert set(dist[dist["aug_ok"]]["rate_bp"]) <= {9000, 10000, 11000}
        assert not dist[dist["clip_id"] == "c11"]["aug_ok"].iloc[0]


class TestPitchShift:
    def test_pitch_scaled_duration_held(self):
        from spiderray.functions.resample import pitch_shift

        sr = 16000
        t = np.arange(sr) / sr
        x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        for st in (-2.0, 2.0, 5.0):
            y = pitch_shift(x, sr, st)
            assert abs(len(y) - sr) < 800, st  # duration within 5%
            spec = np.abs(np.fft.rfft(y.astype(np.float64)))
            peak_hz = spec.argmax() * sr / len(y)
            assert abs(peak_hz - 440.0 * 2 ** (st / 12)) < 5.0, st
        assert np.array_equal(pitch_shift(x, sr, 0.0), x)

    def test_actor_matches_serial(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import (PitchShiftActor,
                                                 pitch_shift_stage)

        sr = 16000
        t = np.arange(sr // 2) / sr
        pcm = ((0.4 * np.sin(2 * np.pi * 500.0 * t)) * 32767).astype(
            "<i2").tobytes()
        tbl = pa.table({
            "clip_id": pa.array([f"p{i}" for i in range(10)], pa.string()),
            "bytes": pa.array([pcm] * 9 + [b"xx"], pa.binary()),
            "codec": pa.array(["pcm_s16le"] * 9 + ["opus"], pa.string()),
            "sr_hz": pa.array([sr] * 10, pa.int32()),
        })
        ser = (PitchShiftActor(PipelineConfig(), salt="s")(tbl)
               .to_pandas().sort_values("clip_id").reset_index(drop=True))
        dist = (pitch_shift_stage(rd.from_arrow(tbl).repartition(2),
                                  PipelineConfig(), salt="s")
                .to_pandas().sort_values("clip_id").reset_index(drop=True))
        cols = ["clip_id", "aug_ok", "semi_cents", "out_n_samples"]
        assert dist[cols].values.tolist() == ser[cols].values.tolist()
        assert set(dist[dist["aug_ok"]]["semi_cents"]) <= {-200, 0, 200}


class TestAugmentNoopHonesty:
    def test_short_clip_passes_through_with_honest_params(self, ray_session):
        import pyarrow as pa

        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import (PitchShiftActor,
                                                 TimeStretchActor)

        # 800 samples < one vocoder frame: neither stretch nor shift can
        # apply — output must be the input and the audit param identity
        pcm = ((0.3 * np.sin(2 * np.pi * 500.0 * np.arange(800) / 16000))
               * 32767).astype("<i2")
        tbl = pa.table({
            "clip_id": pa.array(["s0"], pa.string()),
            "bytes": pa.array([pcm.tobytes()], pa.binary()),
            "codec": pa.array(["pcm_s16le"], pa.string()),
            "sr_hz": pa.array([16000], pa.int32()),
        })
        ts = TimeStretchActor(PipelineConfig(), salt="s")(tbl)
        assert ts.column("rate_bp").to_pylist() == [10_000]
        assert ts.column("out_n_samples").to_pylist() == [800]
        ps = PitchShiftActor(PipelineConfig(), salt="zz")(tbl)
        assert ps.column("semi_cents").to_pylist() == [0]
        assert ps.column("out_n_samples").to_pylist() == [800]

    def test_pitch_shift_short_clip_duration_held(self):
        from spiderray.functions.resample import pitch_shift

        x = (0.3 * np.sin(2 * np.pi * 500.0 * np.arange(800) / 16000)
             ).astype(np.float32)
        y = pitch_shift(x, 16000, 2.0)
        assert len(y) == 800  # review finding: must NOT shrink to 713
        assert np.array_equal(y, x)
