"""Kaiser windowed-sinc resampler (functions/resample) — physics tests."""

import numpy as np
import pytest

from spiderray.functions.resample import resample_sinc
from spiderray.stages.multimodal import resample_linear


def _snr_db(sig, ref):
    err = np.asarray(sig, np.float64) - np.asarray(ref, np.float64)
    return 10 * np.log10(np.sum(np.asarray(ref, np.float64) ** 2)
                         / max(np.sum(err ** 2), 1e-30))


def _tone(freq, sr, seconds=1.0):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_upsample_tone_snr():
    # north-rule invariant number: decoded-PCM SNR >= 30 dB; the sinc path
    # clears it by ~4 orders of magnitude
    y = resample_sinc(_tone(440, 8000), 8000, 16000)
    ref = _tone(440, 16000)[: len(y)]
    m = slice(500, len(y) - 500)  # edge transients excluded
    assert _snr_db(y[m], ref[m]) > 90


def test_downsample_tone_snr_rational_441_160():
    y = resample_sinc(_tone(440, 44100), 44100, 16000)
    t = np.arange(len(y)) / 16000
    ref = np.sin(2 * np.pi * 440 * t)
    m = slice(500, len(y) - 500)
    assert _snr_db(y[m], ref[m]) > 80


def test_alias_rejection_beats_linear():
    # 10 kHz tone downsampled to 16 kHz (Nyquist 8 kHz) must VANISH; linear
    # interpolation folds it to 6 kHz instead
    x = _tone(10_000, 44100)
    sinc_out = resample_sinc(x, 44100, 16000)
    lin_out = resample_linear(x, 44100, 16000)
    m = slice(500, len(sinc_out) - 500)
    sinc_rms = float(np.sqrt(np.mean(sinc_out[m] ** 2)))
    lin_rms = float(np.sqrt(np.mean(lin_out[m] ** 2)))
    assert sinc_rms < 1e-3          # > 55 dB below the 0.707 input rms
    assert lin_rms > 0.1            # linear folds the energy, not removes it


def test_dc_and_identity():
    x = np.full(8000, 0.5, np.float32)
    y = resample_sinc(x, 8000, 16000)
    assert abs(float(y[len(y) // 2]) - 0.5) < 1e-4
    x = np.random.RandomState(0).randn(1234).astype(np.float32)
    same = resample_sinc(x, 16000, 16000)
    assert np.array_equal(same, x)
    assert len(resample_sinc(np.zeros(0, np.float32), 8000, 16000)) == 0


def test_length_contract():
    y = resample_sinc(np.zeros(44100, np.float32), 44100, 16000)
    assert len(y) == 16000
    y = resample_sinc(np.zeros(8000, np.float32), 8000, 22050)
    assert len(y) == int(round(8000 * 22050 / 8000))


def test_determinism_and_dtype():
    x = np.random.RandomState(1).randn(5000).astype(np.float32) * 0.3
    a = resample_sinc(x, 22050, 16000)
    b = resample_sinc(x, 22050, 16000)
    assert a.dtype == np.float32 and np.array_equal(a, b)


def test_transform_actor_sinc_and_linear_paths(ray_session):
    import pyarrow as pa

    from spiderray.config import PipelineConfig
    from spiderray.stages.multimodal import AudioTransformActor, _encode_pcm16

    pcm = _tone(440, 8000, 0.25)
    batch = pa.table(
        {
            "clip_id": pa.array(["a"], pa.string()),
            "bytes": pa.array([_encode_pcm16(pcm)], pa.binary()),
            "sr_hz": pa.array([8000], pa.int32()),
            "codec": pa.array(["pcm_s16le"], pa.string()),
        }
    )
    for method in ("sinc", "linear"):
        out = AudioTransformActor(PipelineConfig(), 16000, None, method)(batch)
        assert out.column("sr_hz").to_pylist() == [16000]
        assert out.column("codec").to_pylist() == ["pcm_s16le"]
        assert out.column("transform_ok").to_pylist() == [True]
        y = np.frombuffer(out.column("bytes")[0].as_py(), "<i2") / 32767.0
        ref = _tone(440, 16000, 0.25)[: len(y)]
        m = slice(200, len(y) - 200)
        assert _snr_db(y[m], ref[m]) > 30  # the north-rule bar
    with pytest.raises(ValueError):
        AudioTransformActor(PipelineConfig(), 16000, None, "cubic")
