"""Distributed char-LM training: corpus n-gram counts → CharLM.

The engine-side answer to "the perplexity model should come from MY corpus,
not a seed string": one pass over the documents computes per-batch trigram/
bigram/unigram partial counts, a keyed groupby-Sum merges them (one row per
DISTINCT gram crosses the shuffle — the gram domain is alphabet-bounded,
not row-bounded), and the driver assembles a ``CharLM.from_counts`` whose
smoothing math is identical to the in-memory constructor (parity-tested).

Per-document boundary padding matches the single-string constructor: each
document contributes grams of ``f"  {doc}  "``, so documents are independent
(no cross-document phantom grams — a *better* definition than concatenating
the corpus, and the one the distributed shape forces anyway).

Cap discipline: ``max_grams`` keeps only the most frequent trigrams when the
gram domain explodes (mixed-script corpora); dropped grams fall through to
the bigram/unigram backoff exactly like unseen grams, so the cap degrades
smoothly instead of failing.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa


def _count_batch(batch: pa.Table, text_col: str) -> pa.Table:
    tri: Counter = Counter()
    bi: Counter = Counter()
    uni: Counter = Counter()
    n_chars = 0
    for doc in batch.column(text_col).to_pylist():
        text = f"  {doc or ''}  "
        n_chars += len(text)
        tri.update(text[i : i + 3] for i in range(len(text) - 2))
        bi.update(text[i : i + 2] for i in range(len(text) - 1))
        uni.update(text)
    kinds, grams, ns = [], [], []
    for kind, counter in (("3", tri), ("2", bi), ("1", uni)):
        for g, c in counter.items():
            kinds.append(kind)
            grams.append(g)
            ns.append(c)
    # total char count rides as a special row
    kinds.append("N")
    grams.append("")
    ns.append(n_chars)
    return pa.table(
        {
            "kind": pa.array(kinds, pa.string()),
            "gram": pa.array(grams, pa.string()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def train_char_lm(ds, text_col: str = "text", max_grams: int = 500_000):
    """One distributed pass over ``ds[text_col]`` → CharLM.  Returns the
    model (driver-side dicts, broadcastable via ray.put / actor ctor)."""
    from ray.data.aggregate import Sum

    from .perplexity_stage import CharLM

    partials = ds.map_batches(
        lambda b: _count_batch(b, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged = partials.groupby(["kind", "gram"]).aggregate(Sum("n", alias_name="n"))
    df = merged.to_pandas()
    if df.empty:
        return CharLM("")
    tri = dict(
        df[df["kind"] == "3"].nlargest(max_grams, "n")[["gram", "n"]].itertuples(index=False)
    )
    bi = dict(df[df["kind"] == "2"][["gram", "n"]].itertuples(index=False))
    uni = dict(df[df["kind"] == "1"][["gram", "n"]].itertuples(index=False))
    n_chars = int(df[df["kind"] == "N"]["n"].sum())
    return CharLM.from_counts(tri, bi, uni, n_chars)


def train_langid_profiles(ds, text_col: str = "text", lang_col: str = "lang",
                          max_grams_per_lang: int = 20_000):
    """Distributed training of per-language char-trigram profiles from a
    LABELED corpus: one pass of per-batch (lang, gram) partial counts, a
    keyed groupby-Sum (domain-bounded shuffle), then driver-side
    normalisation to frequency profiles — the dict shape
    ``LangIdModelActor`` consumes via ``cfg.extra['langid_profiles']``.
    The corpus-trained upgrade of the embedded seed profiles."""
    from ray.data.aggregate import Sum

    def count(batch: pa.Table) -> pa.Table:
        per_lang: dict[str, Counter] = {}
        for text, lang in zip(
            batch.column(text_col).to_pylist(), batch.column(lang_col).to_pylist()
        ):
            if not lang:
                continue
            s = f"  {(text or '').lower()[:2048]}  "
            c = per_lang.setdefault(lang, Counter())
            c.update(s[i : i + 3] for i in range(len(s) - 2))
        langs, grams, ns = [], [], []
        for lang, c in per_lang.items():
            for g, n in c.items():
                langs.append(lang)
                grams.append(g)
                ns.append(n)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "gram": pa.array(grams, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    partials = ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby(["lang", "gram"]).aggregate(Sum("n", alias_name="n"))
    df = merged.to_pandas()
    profiles: dict[str, dict[str, float]] = {}
    if df.empty:
        return profiles
    for lang, g in df.groupby("lang"):
        top = g.nlargest(max_grams_per_lang, "n")
        total = float(top["n"].sum())
        profiles[str(lang)] = {gr: c / total for gr, c in zip(top["gram"], top["n"])}
    return profiles
