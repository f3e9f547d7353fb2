"""ARPA n-gram model file I/O for the char-LM stack.

The north rule names "a KenLM-style n-gram perplexity scorer ... models
loaded once per actor".  This module makes the model-FILE half of that
real inside this container: the distributed-trained ``CharLM``
(stages/lm_train.py) serializes to the standard ARPA text format
(`\\data\\` header, per-order sections, ``log10(prob) tokens [log10(bow)]``
lines), and ``read_arpa`` reconstructs a CharLM that scores
**bit-identically** to the in-memory model — so an actor pool can load its
model from a path on shared storage exactly like a production KenLM
deployment (see PerplexityActor's ``arpa_model_paths`` hook).

Conventions (documented, since a char-LM over raw text needs them):

* **Tokens are hex codepoints** (``U+0041`` → ``41``): ARPA is a
  whitespace-delimited format and our "words" are single characters that
  can BE whitespace.  Hex-escaping keeps every line parseable by any ARPA
  reader; a word-level KenLM consumer would apply its own vocabulary
  mapping anyway.
* **Backoff semantics are the CharLM's constant-context-penalty scheme**,
  not Katz: an unseen trigram with a listed context scores the context
  bigram's backoff weight alone (our 2-gram lines carry that penalty in
  the standard backoff slot and a placeholder 0 prob — the bigram's own
  probability is never used by the scorer).  A stock KenLM loading this
  file parses fine but would combine backoff(w1w2)+p(w3|w2) per the
  standard recursion; the file format is interchange, the smoothing
  contract is this module's loader.
* ``<unk>`` carries the OOV log-prob (standard ARPA practice).

Floats print as ``repr``-exact ``%.17g`` so the log10 FIELD round-trips its
exact float64 bits.  The natural-log scores the scorer uses pass through
one ln→log10→ln conversion, a deterministic ≤1-ulp quantization
(``quantize_lm`` reproduces it without touching disk — the serial oracle
applies the same single quantization, so engine-vs-oracle comparison stays
EXACT while "loaded model vs in-memory model" is equal to ~1e-15 relative).
"""

from __future__ import annotations

import math

_LN10 = math.log(10.0)


def _tok(ch: str) -> str:
    return format(ord(ch), "x")


def _untok(tok: str) -> str:
    return chr(int(tok, 16))


def _f(lp_e: float) -> str:
    """natural-log prob → exact-printing log10 field."""
    return format(lp_e / _LN10, ".17g")


def _e(field: str) -> float:
    """log10 field → natural-log prob."""
    return float(field) * _LN10


def _q(lp_e: float) -> float:
    """The exact float the scorer sees after one write→read cycle: natural
    log → printed log10 (exact round-trip) → natural log."""
    return float(format(lp_e / _LN10, ".17g")) * _LN10


def quantize_lm(lm):
    """Apply the ARPA representation's ≤1-ulp quantization to a CharLM
    without touching disk.  Invariant (tested): ``read_arpa(write_arpa(lm))``
    is EXACTLY ``quantize_lm(lm)``."""
    from ..stages.perplexity_stage import CharLM

    out = CharLM.__new__(CharLM)
    out.tri_lp = {g: _q(v) for g, v in lm.tri_lp.items()}
    out.ctx_miss_lp = {g: _q(v) for g, v in lm.ctx_miss_lp.items()}
    out.uni_lp = {g: _q(v) for g, v in lm.uni_lp.items()}
    out.oov_lp = _q(lm.oov_lp)
    return out


def write_arpa(lm, path: str) -> str:
    """Serialize a CharLM (tri_lp / ctx_miss_lp / uni_lp / oov_lp) to ARPA.

    1-grams: unigram backoff distribution (+ ``<unk>`` for OOV).
    2-grams: placeholder prob 0, backoff = the context-miss penalty.
    3-grams: the seen-trigram conditional log-probs.
    """
    uni = sorted(lm.uni_lp.items())
    bi = sorted(lm.ctx_miss_lp.items())
    tri = sorted(lm.tri_lp.items())
    lines = [
        "\\data\\",
        f"ngram 1={len(uni) + 1}",
        f"ngram 2={len(bi)}",
        f"ngram 3={len(tri)}",
        "",
        "\\1-grams:",
        f"{format(lm.oov_lp / _LN10, '.17g')}\t<unk>",
    ]
    for ch, lp in uni:
        lines.append(f"{_f(lp)}\t{_tok(ch)}")
    lines.append("")
    lines.append("\\2-grams:")
    for ctx, lp in bi:
        lines.append(f"0\t{_tok(ctx[0])} {_tok(ctx[1])}\t{_f(lp)}")
    lines.append("")
    lines.append("\\3-grams:")
    for g, lp in tri:
        lines.append(f"{_f(lp)}\t{_tok(g[0])} {_tok(g[1])} {_tok(g[2])}")
    lines.append("")
    lines.append("\\end\\")
    with open(path, "w", encoding="ascii") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def read_arpa(path: str):
    """Load an ARPA file written by write_arpa into a scoring-ready CharLM
    (constructed directly from the log-prob tables — no re-smoothing, so
    the round-trip is bit-exact)."""
    from ..stages.perplexity_stage import CharLM

    tri_lp: dict[str, float] = {}
    ctx_miss_lp: dict[str, float] = {}
    uni_lp: dict[str, float] = {}
    oov_lp = math.log(1e-12)

    section = 0
    with open(path, encoding="ascii") as fh:
        for raw in fh:
            line = raw.rstrip("\n")
            if not line or line.startswith("\\data\\") or line.startswith("ngram "):
                continue
            if line == "\\1-grams:":
                section = 1
                continue
            if line == "\\2-grams:":
                section = 2
                continue
            if line == "\\3-grams:":
                section = 3
                continue
            if line == "\\end\\":
                break
            parts = line.split("\t")
            if section == 1:
                lp, word = parts[0], parts[1]
                if word == "<unk>":
                    oov_lp = _e(lp)
                else:
                    uni_lp[_untok(word)] = _e(lp)
            elif section == 2:
                toks = parts[1].split(" ")
                ctx_miss_lp["".join(_untok(t) for t in toks)] = _e(parts[2])
            elif section == 3:
                toks = parts[1].split(" ")
                tri_lp["".join(_untok(t) for t in toks)] = _e(parts[0])

    lm = CharLM.__new__(CharLM)
    lm.tri_lp = tri_lp
    lm.ctx_miss_lp = ctx_miss_lp
    lm.uni_lp = uni_lp
    lm.oov_lp = oov_lp
    return lm
