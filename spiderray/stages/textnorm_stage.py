"""Unicode normalization stage (corpus-prep hygiene).

Every large text corpus mixes composed and decomposed forms (NFC vs NFD
— "é" as one codepoint or e+U+0301) and compatibility variants (NFKC:
ligatures, full-width forms); dedup fingerprints, tokenizers and language
ID all fracture on the distinction, so normalizing early is a standard
pipeline step (the reference normalizes whitespace/signs via go-fun,
/root/reference/lang.go:277-287; codepoint-form normalization is the
engine's corpus-scale extension).

Kernel note: this pyarrow build's ``pc.utf8_normalize`` does NOT perform
canonical COMPOSITION (NFC of 'e'+U+0301 comes back decomposed; NFD and
the NFKC compat mappings work) — measured, not assumed.  The stage
therefore normalizes through CPython's ``unicodedata.normalize`` (a C
call, ~1 µs/row) guarded by a vectorized ASCII fast path: pure-ASCII
rows (the vast majority of web text) are provably normalization-fixed
points in every form and skip the per-row call entirely.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def unicode_normalize_batch(batch: pa.Table, text_col: str, form: str = "NFC",
                            flag_col: str | None = "was_denormalized") -> pa.Table:
    """One batch → same batch with ``text_col`` normalized to ``form`` and
    (optionally) a bool column marking rows the normalization changed."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    col = batch.column(text_col)
    ascii_only = pc.fill_null(pc.string_is_ascii(col), False).to_numpy(
        zero_copy_only=False
    )
    if ascii_only.all() and col.null_count == 0:
        # whole-batch fast path: pure-ASCII text is a fixed point of every
        # normalization form — no per-row materialization at all
        if flag_col:
            batch = batch.append_column(
                flag_col, pa.array([False] * len(batch), pa.bool_())
            )
        return batch
    texts = col.to_pylist()
    norm_fn = unicodedata.normalize
    out = [
        t if (a or t is None) else norm_fn(form, t)
        for t, a in zip(texts, ascii_only)
    ]
    norm = pa.array(out, pa.string())
    if flag_col:
        changed = pc.invert(pc.equal(norm, col))
        batch = batch.append_column(flag_col, changed)
    return batch.set_column(batch.column_names.index(text_col), text_col, norm)


def unicode_normalize_stage(ds, text_col: str = "text", form: str = "NFC",
                            flag_col: str | None = "was_denormalized"):
    """Stateless fused stage: normalize ``text_col`` to the given Unicode
    form.  ``flag_col`` (None to skip) marks changed rows so a corpus
    report can quantify how denormalized the input was."""
    return ds.map_batches(
        lambda b: unicode_normalize_batch(b, text_col, form, flag_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def fix_mojibake_batch(batch: pa.Table, text_col: str,
                       max_passes: int = 3) -> pa.Table:
    """One batch → same batch with UTF-8-misdecoded-as-latin-1/cp1252 text
    repaired (functions/charset.fix_mojibake — the ftfy recipe) plus
    ``moji_passes`` (int32 repair iterations, 0 = untouched) and
    ``was_mojibake`` columns.  Mojibake is impossible in pure-ASCII text,
    so the vectorized ASCII fast path skips the per-row kernel for the
    vast majority of web rows."""
    from ..functions.charset import fix_mojibake

    col = batch.column(text_col)
    ascii_only = pc.fill_null(pc.string_is_ascii(col), False).to_numpy(
        zero_copy_only=False
    )
    if ascii_only.all() and col.null_count == 0:
        zeros = pa.array([0] * len(batch), pa.int32())
        batch = batch.append_column("moji_passes", zeros)
        return batch.append_column(
            "was_mojibake", pa.array([False] * len(batch), pa.bool_()))
    texts = col.to_pylist()
    out, passes = [], []
    for t, a in zip(texts, ascii_only):
        if a or t is None:
            out.append(t)
            passes.append(0)
        else:
            fixed, n = fix_mojibake(t, max_passes=max_passes)
            out.append(fixed)
            passes.append(n)
    batch = batch.set_column(batch.column_names.index(text_col), text_col,
                             pa.array(out, pa.string()))
    batch = batch.append_column("moji_passes", pa.array(passes, pa.int32()))
    return batch.append_column(
        "was_mojibake", pa.array([p > 0 for p in passes], pa.bool_()))


def fix_mojibake_stage(ds, text_col: str = "text", max_passes: int = 3):
    """Stateless fused stage: detect and unwind double-encoding damage
    ("Ã©", "â€™") before dedup/langid/tokenizers see the text — the
    corpus-hygiene sibling of unicode_normalize_stage, and the engine's
    corpus-scale extension of the reference's charset cascade
    (/root/reference/charset.go:79-117)."""
    return ds.map_batches(
        lambda b: fix_mojibake_batch(b, text_col, max_passes),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
