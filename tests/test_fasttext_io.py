"""fastText .bin format I/O (functions/fasttext_io.py) — roundtrip,
format-guard, and the model-file-through-actor-pool path (the langid side
of the ARPA-fixture precedent; round-4 verdict item #3)."""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from spiderray.functions.fasttext_io import (
    EOS,
    FASTTEXT_MAGIC,
    FASTTEXT_VERSION,
    build_lid_model,
    load_model,
    write_fasttext_bin,
)
from spiderray.stages.langid_stage import LangIdModelActor, default_lid_model_path

FIXTURE = os.path.join(os.path.dirname(__file__), os.pardir,
                       "fixtures", "models", "lid_tiny_ft.bin")


class TestFormatRoundtrip:
    def _tiny(self, tmp_path):
        path = str(tmp_path / "tiny.bin")
        words = ["hello", "bonjour", "hallo", EOS]
        inp = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                        [0.0, 0.0, 1.0], [0.0, 0.0, 0.0]], dtype=np.float32)
        out = (4.0 * np.eye(3)).astype(np.float32)
        write_fasttext_bin(
            path, words=words, counts=[3, 2, 1, 3],
            labels=["__label__en", "__label__fr", "__label__de"],
            label_counts=[1, 1, 1], input_mat=inp, output_mat=out)
        return path

    def test_roundtrip_fields(self, tmp_path):
        m = load_model(self._tiny(tmp_path))
        assert m.args["dim"] == 3 and m.args["minn"] == 0
        assert m.words == ["hello", "bonjour", "hallo", EOS]
        assert m.labels == ["__label__en", "__label__fr", "__label__de"]
        assert m.counts == [3, 2, 1, 3]
        assert m.input.shape == (4, 3) and m.output.shape == (3, 3)

    def test_predict_rule(self, tmp_path):
        m = load_model(self._tiny(tmp_path))
        labels, probs = m.predict("hello")
        # hidden = mean of the word row and the zero EOS row -> scores
        # [2,0,0] -> softmax ~0.787
        assert labels[0] == "__label__en" and probs[0] > 0.7
        labels, probs = m.predict("bonjour bonjour hallo")
        assert labels[0] == "__label__fr"
        # unknown-only text: only the implicit EOS is known, and its row is
        # zero -> uniform softmax over the 3 labels
        labels, probs = m.predict("zzz qqq")
        assert len(labels) == 1
        np.testing.assert_allclose(probs[0], 1.0 / 3.0, rtol=1e-6)
        # top-k ordering
        labels, probs = m.predict("hello bonjour", k=3)
        assert len(labels) == 3 and probs[0] >= probs[1] >= probs[2]

    def test_magic_and_version_guards(self, tmp_path):
        bad = tmp_path / "bad.bin"
        bad.write_bytes(struct.pack("<ii", 123, FASTTEXT_VERSION))
        with pytest.raises(ValueError, match="magic"):
            load_model(str(bad))
        bad.write_bytes(struct.pack("<ii", FASTTEXT_MAGIC, 99))
        with pytest.raises(ValueError, match="version"):
            load_model(str(bad))

    def test_ngram_bucket_guard(self, tmp_path):
        """A lid.176-style file (minn=2 maxn=4 bucket>0) must refuse loudly,
        not mis-predict."""
        path = str(tmp_path / "ngram.bin")
        with open(path, "wb") as f:
            f.write(struct.pack("<ii", FASTTEXT_MAGIC, FASTTEXT_VERSION))
            f.write(struct.pack("<12id", 16, 5, 5, 1, 5, 1, 3, 3,
                                2_000_000, 2, 4, 100, 1e-4))
        with pytest.raises(NotImplementedError, match="ngram"):
            load_model(path)

    def test_missing_file_is_loud(self):
        with pytest.raises(FileNotFoundError):
            load_model("/tmp/definitely_not_a_model_zzz.bin")


class TestVersionedLidFixture:
    def test_fixture_committed_and_rebuildable(self):
        """The committed file must regenerate bit-identically from the seed
        corpora (tools/make_lid_fixture.py is deterministic)."""
        assert os.path.isfile(FIXTURE), "lid fixture missing"
        dict_data, inp, out, _, _ = build_lid_model(LangIdModelActor._SEEDS)
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".bin") as tf:
            write_fasttext_bin(tf.name, input_mat=inp, output_mat=out,
                               **dict_data)
            assert open(tf.name, "rb").read() == open(FIXTURE, "rb").read()

    def test_loads_through_actor_init(self):
        """Opt-out: the actor's __init__ loads the model FILE (not the
        embedded profiles) whenever the path is configured — every suite
        run exercises the models-from-shared-storage contract."""
        from spiderray.config import PipelineConfig

        actor = LangIdModelActor(PipelineConfig(
            text_col="text", extra={"fasttext_model_path": FIXTURE}))
        assert actor._ft is not None
        lang, conf = actor._score(
            "le gouvernement a annoncé une série de mesures")
        assert lang == "fr" and conf > 0.5
        lang, conf = actor._score(
            "the government announced today a series of measures")
        assert lang == "en" and conf > 0.5

    def test_agreement_matrix_pinned_through_file_path(self, ray_session):
        """The q_langid_agreement pool routes through the file by default;
        the matrix must match a serial pass over the same file model."""
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.stages.langid_stage import (
            batch_detect_lang,
            langid_model_stage,
        )

        texts = [
            "le gouvernement a annoncé une série de mesures pour la ville",
            "the government announced today a series of measures",
            "el gobierno anunció hoy una serie de medidas",
            "die regierung hat heute eine reihe von maßnahmen",
            "",
        ] * 8
        t = pa.table({"text": pa.array(texts, pa.string())})
        cfg = PipelineConfig(text_col="text", langid_concurrency=2,
                             extra={"fasttext_model_path": FIXTURE})

        def heur(b):
            langs, poss = batch_detect_lang(b.column("text").to_pylist())
            b = b.append_column("lang", pa.array(list(langs), pa.string()))
            return b.append_column("lang_pos", pa.array(list(poss),
                                                        pa.string()))

        got = (langid_model_stage(
            rd.from_arrow(t).map_batches(heur, batch_format="pyarrow"),
            cfg).to_pandas()
            .groupby(["lang", "lang_pos", "lang_model"]).size())
        actor = LangIdModelActor(cfg)
        langs, poss = batch_detect_lang(texts)
        exp = {}
        for text, lang, pos in zip(texts, langs, poss):
            model = actor._score(text or "")[0] if pos in ("", "lingua") \
                else ""
            exp[(lang, pos, model)] = exp.get((lang, pos, model), 0) + 1
        assert dict(got) == exp

    def test_default_path_resolves(self):
        """The default ships as repo:// (worker-relative under ray job
        submit --working-dir) and resolves to the committed fixture."""
        from spiderray.stages.langid_stage import resolve_repo_path

        p = default_lid_model_path()
        assert p == "repo://fixtures/models/lid_tiny_ft.bin"
        assert resolve_repo_path(p) == os.path.abspath(
            os.path.join(os.path.dirname(__file__), os.pardir,
                         "fixtures", "models", "lid_tiny_ft.bin"))
        # absolute paths pass through untouched
        assert resolve_repo_path("/abs/x.bin") == "/abs/x.bin"
