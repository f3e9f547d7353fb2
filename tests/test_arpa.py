"""ARPA model file round-trip (functions/arpa)."""

import math

import pyarrow as pa
import pytest

from spiderray.functions.arpa import quantize_lm, read_arpa, write_arpa
from spiderray.stages.perplexity_stage import CharLM


def test_roundtrip_equals_quantization_exactly(tmp_path):
    """write→read is EXACTLY quantize_lm (the documented ≤1-ulp log10
    representation effect) — the invariant the serial oracle relies on."""
    lm = CharLM("the quick brown fox jumps over the lazy dog " * 3)
    path = str(tmp_path / "model.arpa")
    write_arpa(lm, path)
    lm2 = read_arpa(path)
    q = quantize_lm(lm)
    assert lm2.tri_lp == q.tri_lp
    assert lm2.ctx_miss_lp == q.ctx_miss_lp
    assert lm2.uni_lp == q.uni_lp
    assert lm2.oov_lp == q.oov_lp
    # and the quantization is ≤ ~1 ulp of the in-memory model
    for g, v in lm.tri_lp.items():
        assert math.isclose(lm2.tri_lp[g], v, rel_tol=1e-14), g
    for text in ("the quick fox", "zzz unseen", "", "mixed 中文 text", "   "):
        a, b = lm.perplexity(text), lm2.perplexity(text)
        assert (math.isinf(a) and math.isinf(b)) or math.isclose(a, b, rel_tol=1e-12), text


def test_arpa_handles_whitespace_and_unicode_chars(tmp_path):
    # chars that break naive whitespace-delimited formats: space, tab,
    # newline, CJK, emoji — all hex-escaped tokens
    lm = CharLM("a b\tc\nd 中文 🎉 e")
    path = str(tmp_path / "ws.arpa")
    write_arpa(lm, path)
    lm2 = read_arpa(path)
    assert lm2.uni_lp == quantize_lm(lm).uni_lp
    assert set(lm2.uni_lp) == set(lm.uni_lp)
    assert math.isclose(lm2.perplexity("a b c 中"), lm.perplexity("a b c 中"),
                        rel_tol=1e-12)


def test_arpa_file_is_standard_syntax(tmp_path):
    lm = CharLM("abc abc")
    path = str(tmp_path / "syn.arpa")
    write_arpa(lm, path)
    text = open(path, encoding="ascii").read()
    assert text.startswith("\\data\\\n")
    assert "\\1-grams:" in text and "\\3-grams:" in text
    assert text.rstrip().endswith("\\end\\")
    assert "<unk>" in text
    # declared counts match section sizes
    import re

    n1 = int(re.search(r"ngram 1=(\d+)", text).group(1))
    sec1 = text.split("\\1-grams:")[1].split("\\2-grams:")[0].strip().splitlines()
    assert len(sec1) == n1


def test_from_counts_through_arpa(tmp_path):
    # the distributed-training shape: from_counts → arpa → load
    tri = {"abc": 3, "bcd": 2}
    bi = {"ab": 3, "bc": 5, "cd": 2}
    uni = {"a": 3, "b": 5, "c": 5, "d": 2}
    lm = CharLM.from_counts(tri, bi, uni, 15)
    path = str(tmp_path / "fc.arpa")
    write_arpa(lm, path)
    lm2 = read_arpa(path)
    assert lm2.perplexity("abcd") == quantize_lm(lm).perplexity("abcd")
    assert math.isclose(lm2.perplexity("abcd"), lm.perplexity("abcd"), rel_tol=1e-12)


def test_perplexity_actor_arpa_hook(tmp_path, ray_session):
    from spiderray.config import PipelineConfig
    from spiderray.stages.perplexity_stage import PerplexityActor

    lm = CharLM("hello world hello world")
    path = str(tmp_path / "en.arpa")
    write_arpa(lm, path)
    cfg = PipelineConfig(extra={"arpa_model_paths": {"en": path}})
    actor = PerplexityActor(cfg)
    assert actor.models["en"].perplexity("hello") == quantize_lm(lm).perplexity("hello")
    # missing file fails loudly
    cfg_bad = PipelineConfig(extra={"arpa_model_paths": {"en": str(tmp_path / "nope.arpa")}})
    with pytest.raises(FileNotFoundError):
        PerplexityActor(cfg_bad)
    # '*' replaces the fallback model
    cfg_star = PipelineConfig(extra={"arpa_model_paths": {"*": path}})
    actor2 = PerplexityActor(cfg_star)
    assert actor2.fallback.perplexity("hello") == quantize_lm(lm).perplexity("hello")


def test_versioned_arpa_fixture_through_actor_pool(ray_session):
    """Round-4: a real model FILE committed to the repo
    (fixtures/models/char_lm_sf01.arpa, distributed-trained at sf0.1)
    loads through the actor ``__init__`` path and scores a distributed
    dataset — opt-out, so every suite run exercises the models-from-
    shared-storage contract with a versioned artifact, not a temp file."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from spiderray.config import PipelineConfig
    from spiderray.stages.perplexity_stage import PerplexityActor, perplexity_stage

    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "fixtures", "models", "char_lm_sf01.arpa")
    assert os.path.isfile(path), "versioned ARPA fixture missing"
    cfg = PipelineConfig(extra={"arpa_model_paths": {"*": path}},
                         perplexity_actor_pool=True,
                         perplexity_concurrency=2)
    t = pa.table({
        "clip_id": list(range(8)),
        "transcript": ["the quick brown fox jumps over the lazy dog"] * 4
                      + ["zzzzqqqqxxxx jjjj wwww"] * 4,
        "lang": [""] * 8,  # route every row through the '*' fallback model
    })
    out = perplexity_stage(rd.from_arrow(t), cfg).to_pandas()
    assert len(out) == 8 and "ppl" in out.columns
    # file-loaded model must equal a driver-side load of the same file
    expect = PerplexityActor(cfg).fallback.perplexity(
        "the quick brown fox jumps over the lazy dog")
    got = float(out.sort_values("clip_id")["ppl"].iloc[0])
    # the ppl column is float32; equality at float32 precision
    import numpy as np

    assert got == float(np.float32(expect))
    # natural text scores lower than letter noise (the model is real)
    noise = float(out.sort_values("clip_id")["ppl"].iloc[7])
    assert got < noise
