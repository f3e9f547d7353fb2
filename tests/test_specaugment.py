"""SpecAugment (stages/audioquality.SpecAugmentActor)."""

import numpy as np
import pyarrow as pa

from spiderray.config import PipelineConfig
from spiderray.functions.audiofp import log_mel_spectrogram
from spiderray.stages.audioquality import SpecAugmentActor


def _clip(secs=1.0, sr=16000):
    t = np.arange(int(sr * secs)) / sr
    x = 0.4 * np.sin(2 * np.pi * 300 * t) + 0.2 * np.sin(2 * np.pi * 1700 * t)
    return (x * 32767).astype("<i2").tobytes()


def _batch(ids):
    return pa.table({
        "clip_id": ids,
        "bytes": [_clip() for _ in ids],
        "codec": ["pcm_s16le"] * len(ids),
        "sr_hz": [16000] * len(ids),
    })


class TestSpecAugment:
    def test_masks_blank_to_mean_and_count_cells(self):
        actor = SpecAugmentActor(PipelineConfig(), salt="s")
        out = actor(_batch(["a"]))
        df = out.to_pandas()
        assert df.loc[0, "aug_ok"]
        n_frames = int(df.loc[0, "n_frames"])
        mel = np.frombuffer(out.column("spec").to_pylist()[0],
                            dtype=np.float32).reshape(n_frames, 24)
        # masked cells share one exact value (the float32 of the mean)
        vals, counts = np.unique(mel, return_counts=True)
        assert counts.max() >= int(df.loc[0, "masked_cells"]) > 0

    def test_deterministic_per_salt_and_varies_across(self):
        ids = [f"c{i}" for i in range(10)]
        a = SpecAugmentActor(PipelineConfig(), salt="e1")
        r1 = a(_batch(ids)).to_pandas()["spec_md5"].tolist()
        r2 = a(_batch(ids)).to_pandas()["spec_md5"].tolist()
        r3 = SpecAugmentActor(PipelineConfig(), salt="e2")(
            _batch(ids)).to_pandas()["spec_md5"].tolist()
        assert r1 == r2 and r1 != r3

    def test_unmasked_cells_untouched(self):
        actor = SpecAugmentActor(PipelineConfig(), salt="s3",
                                 n_freq_masks=1, max_f=2,
                                 n_time_masks=0)
        out = actor(_batch(["u"]))
        df = out.to_pandas()
        n_frames = int(df.loc[0, "n_frames"])
        masked = np.frombuffer(out.column("spec").to_pylist()[0],
                               dtype=np.float32).reshape(n_frames, 24)
        pcm = np.frombuffer(_clip(), dtype="<i2").astype(np.float32) / 32767.0
        clean = log_mel_spectrogram(pcm, 16000).astype(np.float32)
        diff_cols = np.where((masked != clean).any(axis=0))[0]
        assert 0 < len(diff_cols) <= 3  # only the ≤2+1-wide freq band differs
        untouched = np.setdiff1d(np.arange(24), diff_cols)
        assert np.array_equal(masked[:, untouched], clean[:, untouched])

    def test_undecodable_and_short_marked(self):
        actor = SpecAugmentActor(PipelineConfig())
        batch = pa.table({
            "clip_id": ["bad", "short"],
            "bytes": [b"junk", (np.zeros(10, "<i2")).tobytes()],
            "codec": ["opus", "pcm_s16le"],
            "sr_hz": [16000, 16000],
        })
        out = actor(batch).to_pandas()
        assert not out["aug_ok"].any()
