"""Composed audio corpus-prep pipeline (pipelines/prepare_audio.py)."""

import os

import numpy as np


class TestPrepareAudio:
    def test_end_to_end_at_sf0001(self, ray_session, tmp_path):
        from spiderray.config import PipelineConfig
        from spiderray.pipelines.prepare_audio import prepare_audio_corpus
        from spiderray.sources.clips import clips_from_documents
        from spiderray.sources.wds import read_tar_shards

        ds = clips_from_documents("/root/testdata/sf0.001")
        out, man = prepare_audio_corpus(
            ds, PipelineConfig(), trim=True, normalize_lufs=-16.0,
            fp_dedup=True, augment_salts=("e1", "e2"),
            shards_dir=str(tmp_path), n_shards=4)
        mdf = man.to_pandas()
        assert mdf["n_samples"].sum() > 0
        back = read_tar_shards(str(tmp_path)).to_pandas()
        assert len(back) == mdf["n_samples"].sum()
        # two epochs: every base key appears once per salt
        keys = back["key"].tolist()
        assert all("@e1" in k or "@e2" in k for k in keys)
        e1 = {k[: -3] for k in keys if k.endswith("@e1")}
        e2 = {k[: -3] for k in keys if k.endswith("@e2")}
        assert e1 == e2  # same kept set in both epochs

    def test_steps_off_passthrough_schema(self, ray_session):
        from spiderray.config import PipelineConfig
        from spiderray.pipelines.prepare_audio import prepare_audio_corpus
        from spiderray.pipelines.quality_filter import kept_only
        from spiderray.sources.clips import clips_from_documents

        ds = clips_from_documents("/root/testdata/sf0.001")
        plain = kept_only(ds, PipelineConfig()).to_pandas()
        composed = prepare_audio_corpus(ds, PipelineConfig()).to_pandas()
        assert sorted(plain.columns) == sorted(composed.columns)
        assert len(plain) == len(composed)
