"""Music/speech/other gate (functions/audiofp.musicness_stats +
stages/audioquality.music_speech_stage)."""

import numpy as np
import pyarrow as pa

from spiderray.functions.audiofp import (
    MUSIC_FLATNESS_MAX,
    SPEECH_DEPTH_MIN,
    SPEECH_MOD_MIN,
    classify_audio_content,
    musicness_stats,
)

SR = 16000


def _speech(i=0, dur=1.0):
    n = int(SR * dur)
    t = np.arange(n) / SR
    carrier = (0.6 * np.sin(2 * np.pi * (300 + (i % 7) * 90) * t)
               + 0.3 * np.sin(2 * np.pi * (1200 + (i % 5) * 60) * t))
    syl = 0.5 + 0.5 * np.sin(2 * np.pi * (3.0 + (i % 5) * 0.8) * t + i)
    return carrier * (0.1 + 0.9 * syl * syl)


def _music(i=0, dur=1.0):
    n = int(SR * dur)
    t = np.arange(n) / SR
    f = 220.0 * 2 ** ((i % 12) / 12)
    return (0.5 * np.sin(2 * np.pi * f * t) + 0.3 * np.sin(2 * np.pi * 2 * f * t)
            + 0.2 * np.sin(2 * np.pi * 3 * f * t))


def _noise(i=0, dur=1.0):
    return 0.4 * np.random.RandomState(i).randn(int(SR * dur))


def test_speech_has_syllabic_modulation():
    for i in range(5):
        s = musicness_stats(_speech(i), SR)
        assert s["mod_ratio"] >= SPEECH_MOD_MIN
        assert s["env_depth"] >= SPEECH_DEPTH_MIN
        assert classify_audio_content(s) == "speech"


def test_steady_chord_is_music_not_speech():
    for i in range(5):
        s = musicness_stats(_music(i), SR)
        # steady tone: whatever the RATIO does, the DEPTH guard holds
        assert s["env_depth"] < SPEECH_DEPTH_MIN
        assert s["flatness"] <= MUSIC_FLATNESS_MAX
        assert classify_audio_content(s) == "music"


def test_noise_is_other():
    for i in range(5):
        s = musicness_stats(_noise(i), SR)
        assert s["flatness"] > MUSIC_FLATNESS_MAX
        assert classify_audio_content(s) == "other"


def test_empty_and_silent_inputs():
    assert musicness_stats(np.zeros(0), SR) == {
        "mod_ratio": 0.0, "env_depth": 0.0, "flatness": 0.0, "flux": 0.0}
    s = musicness_stats(np.zeros(SR), SR)
    assert s["mod_ratio"] == 0.0 and s["env_depth"] == 0.0
    assert classify_audio_content(s) == "other"
    assert musicness_stats(_speech(), 0)["mod_ratio"] == 0.0


def test_flux_higher_for_noise_than_tone():
    assert (musicness_stats(_noise(3), SR)["flux"]
            > musicness_stats(_music(3), SR)["flux"])


def test_stage_marks_undecodable_and_classifies(ray_session):
    import ray

    from spiderray.config import PipelineConfig
    from spiderray.stages.audioquality import music_speech_stage

    def pcm16(x):
        return np.clip(x * 32767, -32768, 32767).astype("<i2").tobytes()

    t = pa.table({
        "clip_id": pa.array(["a", "b", "c", "d"]),
        "bytes": pa.array([pcm16(_speech(1)), pcm16(_music(1)),
                           pcm16(_noise(1)), b"\x00junk"], pa.binary()),
        "codec": pa.array(["pcm_s16le"] * 3 + ["opus"]),
        "sr_hz": pa.array([SR] * 4, pa.int32()),
    })
    out = (music_speech_stage(ray.data.from_arrow(t).repartition(2),
                              PipelineConfig(), concurrency=2)
           .to_pandas().set_index("clip_id"))
    assert out.loc["a", "audio_class"] == "speech"
    assert out.loc["b", "audio_class"] == "music"
    assert out.loc["c", "audio_class"] == "other"
    assert out.loc["d", "audio_class"] == "undecodable"
    assert not bool(out.loc["d", "decode_ok"])
    assert out["mod_ratio_milli"].dtype == np.int64
