"""C4 cleaning stages (functions/c4.py rule bank): the line/page filter as
a stateless fused map_batches, and C4's signature GLOBAL three-sentence-span
deduplication as a two-exchange distributed operator.

Span-dedup shape (designed for 10^12 docs): the corpus explodes into
20-byte span rows (hash, id, start) — never the text — shuffled once by
hash(span) to resolve losers vectorized per hash partition (winner = global
min (id, start), deterministic under any partitioning); loser rows then
shuffle once by hash(id) into the same buckets as the documents, and each
document's text crosses the exchange exactly once to be rebuilt.  Nothing
corpus-sized reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import c4

N_PARTS = 64


def c4_filter_stage(ds, text_col: str = "text", badwords: tuple[str, ...] = (),
                    mode: str = "flag"):
    """Line + page filter: appends ``c4_text`` (line-cleaned), ``c4_keep``
    and ``c4_reason``; ``mode="filter"`` keeps passing rows only."""
    if mode not in ("flag", "filter"):
        raise ValueError(f"mode must be 'flag' or 'filter', got {mode!r}")

    def fn(batch: pa.Table) -> pa.Table:
        cleaned, keeps, reasons = [], [], []
        for t in batch.column(text_col).to_pylist():
            c = c4.clean_lines(t or "")
            keep, reason = c4.page_keep(c, badwords)
            cleaned.append(c)
            keeps.append(keep)
            reasons.append(reason)
        batch = batch.append_column("c4_text", pa.array(cleaned, pa.string()))
        batch = batch.append_column("c4_keep", pa.array(keeps, pa.bool_()))
        batch = batch.append_column("c4_reason", pa.array(reasons, pa.string()))
        if mode == "filter":
            batch = batch.filter(batch.column("c4_keep").combine_chunks())
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def c4_span_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  n_parts: int = N_PARTS):
    """Remove all but one occurrence of any three-sentence span occurring
    more than once in the corpus (C4 §2.2).  The retained occurrence is the
    global minimum (id, start) — deterministic under any partitioning.
    Documents that lose a span are rebuilt from their surviving sentences
    (single-space joined, the convention of the line-cleaned C4 text);
    untouched documents pass through byte-identical."""
    from .substring_dedup import _id_field_type

    id_type = _id_field_type(ds, id_col)

    def spans(batch: pa.Table) -> pa.Table:
        ids_out, hashes, starts = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for h, s in c4.doc_span_hashes(t or ""):
                ids_out.append(i)
                hashes.append(h)
                starts.append(s)
        h = np.asarray(hashes, dtype=np.uint64)
        return pa.table({
            id_col: pa.array(ids_out, id_type),
            "start": pa.array(starts, pa.int32()),
            "__part": pa.array((h % n_parts).astype(np.int32)),
            "h": pa.array(h, pa.uint64()),
        })

    def losers_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col, "start"], kind="mergesort")
        dup = g.duplicated("h", keep="first")  # first (min id,start) wins
        return g.loc[dup, [id_col, "start"]]

    losers = (
        ds.map_batches(spans, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(losers_in_part, batch_format="pandas")
    )

    return _rebuild_minus_losers(
        ds, losers, id_col, text_col, n_parts,
        lambda t, starts: c4.remove_spans(t, starts))


def _rebuild_minus_losers(ds, losers, id_col: str, text_col: str,
                          n_parts: int, rebuild_doc):
    """Second exchange shared by the global-unit dedup family (C4 spans,
    Dolma paragraphs): bucket doc payloads and (id, start) loser rows
    identically on hash(id), then rebuild each touched document with
    ``rebuild_doc(text, starts: list[int]) -> str``; untouched documents
    pass through byte-identical.  Text crosses the wire exactly once."""

    def _id_part(ids: pa.ChunkedArray) -> pa.Array:
        # same integer-or-crc32 bucketing as windows._add_part so string
        # ids (urls, uuids) work; both sides of the second exchange share it
        if pa.types.is_integer(ids.type):
            part = (ids.to_numpy(zero_copy_only=False).astype(np.int64)
                    % n_parts).astype(np.int32)
        else:
            import zlib

            part = np.fromiter(
                (zlib.crc32(str(k).encode()) % n_parts
                 for k in ids.to_pylist()),
                dtype=np.int32, count=len(ids))
        return pa.array(part)

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        return pa.table({
            id_col: ids,
            text_col: batch.column(text_col),
            "start": pa.array(np.full(len(batch), -1, np.int32)),
            "__part": _id_part(ids),
        })

    def tag_losers(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        return pa.table({
            id_col: ids,
            text_col: pa.array([None] * len(batch), pa.string()),
            "start": batch.column("start"),
            "__part": _id_part(ids),
        })

    tagged = ds.map_batches(
        tag_docs, batch_format="pyarrow", zero_copy_batch=True
    ).union(losers.map_batches(
        tag_losers, batch_format="pyarrow", zero_copy_batch=True))

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["start"] < 0]
        rem = g[g["start"] >= 0]
        starts_by_id = rem.groupby(id_col)["start"].apply(list).to_dict()
        out_texts = []
        for i, t in zip(docs[id_col], docs[text_col]):
            starts = starts_by_id.get(i)
            out_texts.append(
                rebuild_doc(t or "", starts) if starts else (t or ""))
        return pd.DataFrame({id_col: docs[id_col].to_numpy(),
                             text_col: out_texts})

    return tagged.groupby("__part").map_groups(rebuild, batch_format="pandas")


def paragraph_hash(para: str) -> int:
    """uint64 blake2b of the EXACT paragraph bytes — Dolma deduplicates
    verbatim paragraphs, unlike C4's normalized sentence spans."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(para.encode(), digest_size=8).digest(), "big")


def paragraph_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                    n_parts: int = N_PARTS):
    """Dolma-style GLOBAL paragraph deduplication (Soldaini et al. 2024
    §2.3: duplicate paragraphs removed corpus-wide): every
    newline-delimited paragraph occurring more than once keeps only its
    global-minimum (id, index) occurrence; empty paragraphs are never
    candidates (they are structure, not content).  Documents are rebuilt
    from surviving paragraphs newline-joined in original order; untouched
    documents pass through byte-identical.

    Same two-exchange scale shape as ``c4_span_dedup``: 20-byte
    (hash, id, idx) rows shuffle by hash(paragraph) to resolve losers,
    loser (id, idx) rows shuffle by hash(id) into the documents' buckets,
    text crosses once.  Dolma implements this with a Bloom filter (false
    positives drop extra paragraphs); the exchange here is exact UP TO
    64-bit fingerprint collisions — expected collisions ≈ P²/2^65 for P
    distinct paragraphs, i.e. material only beyond ~10^9 paragraphs
    (same boundary as ``c4.span_hash``; widen the digest or add a
    content-verify pass in the loser partition past that)."""

    def paras(batch: pa.Table) -> pa.Table:
        ids_out, hashes, idxs = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for j, p in enumerate((t or "").split("\n")):
                if p:
                    ids_out.append(i)
                    hashes.append(paragraph_hash(p))
                    idxs.append(j)
        h = np.asarray(hashes, dtype=np.uint64)
        id_type = batch.column(id_col).type
        return pa.table({
            id_col: pa.array(ids_out, id_type),
            "start": pa.array(idxs, pa.int32()),
            "__part": pa.array((h % n_parts).astype(np.int32)),
            "h": pa.array(h, pa.uint64()),
        })

    def losers_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col, "start"], kind="mergesort")
        dup = g.duplicated("h", keep="first")  # first (min id, idx) wins
        return g.loc[dup, [id_col, "start"]]

    losers = (
        ds.map_batches(paras, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(losers_in_part, batch_format="pandas")
    )

    def rebuild_doc(t: str, starts: list[int]) -> str:
        drop = set(starts)
        return "\n".join(p for j, p in enumerate(t.split("\n"))
                         if j not in drop)

    return _rebuild_minus_losers(ds, losers, id_col, text_col, n_parts,
                                 rebuild_doc)


def paragraph_dedup_bloom(ds, prior_ds, text_col: str = "text",
                          id_col: str = "doc_id",
                          bits_per_key: int = 12, n_hashes: int = 7):
    """Cross-release paragraph dedup — Dolma's ACTUAL mechanism (Soldaini
    et al. 2024 use a Bloom filter, accepting false-positive drops): cut
    every paragraph of THIS corpus that already appears in a PRIOR
    release.  ``paragraph_dedup`` handles within-corpus duplicates
    exactly; this operator handles the incremental/cross-run direction
    where the prior side is too large to exchange.

    Scale shape: prior text NEVER shuffles — each prior block explodes its
    paragraphs locally into a partial Bloom filter of shared geometry and
    only fixed-size bit arrays reach the driver for the OR-merge
    (functions/bloom.build_bloom_distributed); the new corpus then streams
    through ONE pure map (membership + rebuild).  Results are
    deterministic (the filter is a pure function of geometry + key set),
    and the false-positive rate is the standard (1-e^(-kn/m))^k ≈ 0.03%
    at the default 12 bits/key — each FP drops one extra paragraph, the
    accepted Dolma trade.  Emits the rebuilt ``text_col`` plus
    ``n_cut_paras`` and ``had_prior_para``."""
    import ray

    from ..functions.bloom import build_bloom_distributed

    def explode(batch: pa.Table) -> pa.Table:
        paras = [p for t in batch.column(text_col).to_pylist()
                 for p in (t or "").split("\n") if p]
        return pa.table({"para": pa.array(paras, pa.string())})

    prior_paras = prior_ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # two passes follow (count + build); prior-sized, spillable
    n_prior = max(prior_paras.count(), 1)
    bf = build_bloom_distributed(prior_paras, "para", n_prior,
                                 bits_per_key=bits_per_key,
                                 n_hashes=n_hashes)
    ref = ray.put(bf)

    def cut(batch: pa.Table) -> pa.Table:
        import ray as _ray

        f = _ray.get(ref)
        out_texts, n_cut = [], []
        for t in batch.column(text_col).to_pylist():
            t = t or ""
            parts = t.split("\n")
            nonempty = [p for p in parts if p]
            if not nonempty:
                out_texts.append(t)
                n_cut.append(0)
                continue
            hit = dict(zip(nonempty, f.contains_many(nonempty)))
            kept = [p for p in parts if not p or not hit[p]]
            out_texts.append("\n".join(kept))
            n_cut.append(len(parts) - len(kept))
        batch = batch.set_column(
            batch.column_names.index(text_col), text_col,
            pa.array(out_texts, pa.string()))
        batch = batch.append_column(
            "n_cut_paras", pa.array(n_cut, pa.int64()))
        return batch.append_column(
            "had_prior_para", pa.array([c > 0 for c in n_cut], pa.bool_()))

    return ds.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)


def line_dedup_within_doc(ds, text_col: str = "text"):
    """INTRA-document repeated-line removal — the boilerplate trim
    (navigation menus, cookie banners, signature blocks repeated inside
    one page) that the published C4/Dolma pipelines apply per document,
    complementing paragraph_dedup's GLOBAL first-occurrence rule: each
    document keeps only the first occurrence of every exact line; empty
    lines are structure, never candidates, and are always kept.

    Scale shape: a pure stateless map — no shuffle, no state, no
    cross-row dependency; the cheapest possible operator shape at any
    corpus size.  Appends ``n_lines`` (original) and ``n_dropped``
    (repeats removed) audit columns."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        out, n_lines, n_drop = [], [], []
        for t in texts:
            if t is None:
                out.append(None)
                n_lines.append(0)
                n_drop.append(0)
                continue
            lines = t.split("\n")
            seen: set[str] = set()
            kept = []
            for ln in lines:
                if ln == "" or ln not in seen:
                    kept.append(ln)
                    if ln != "":
                        seen.add(ln)
            out.append("\n".join(kept))
            n_lines.append(len(lines))
            n_drop.append(len(lines) - len(kept))
        names = batch.column_names
        batch = batch.set_column(names.index(text_col), text_col,
                                 pa.array(out, pa.string()))
        batch = batch.append_column("n_lines", pa.array(n_lines, pa.int64()))
        return batch.append_column("n_dropped",
                                   pa.array(n_drop, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def boilerplate_strip(ds, min_frac_ppm: int = 300_000, min_docs: int = 5,
                      text_col: str = "text", id_col: str = "doc_id",
                      source_col: str = "source",
                      max_boiler_lines: int = 5_000_000):
    """Cross-document boilerplate-line removal per source — the
    jusText/CCNet rule that line_dedup_within_doc (per page) and
    paragraph_dedup (global content) bracket: a line appearing in ≥
    ``min_frac_ppm`` of a SOURCE's documents is navigation / footer /
    cookie-banner chrome, not content, and is stripped from every doc
    of that source (sources with < ``min_docs`` docs are exempt — no
    frequency evidence).  Empty lines always survive.

    Shape: one (source, line)-keyed doc-frequency exchange (per-batch
    partials count each line ONCE per doc), one #sources-bounded doc
    total, then ONLY the qualifying boilerplate lines land on the
    driver under a LOUD cap (boilerplate sets are chrome-sized by
    definition) and broadcast once; the strip is a pure streamed map.
    Integer ppm threshold (n·1e6 ≥ ppm·total) — SQL-restatable.
    Output: (id, text, n_lines, n_stripped)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def line_partials(batch: pa.Table) -> pa.Table:
        counts: dict = {}
        doc_counts: dict = {}
        for src, txt in zip(batch.column(source_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
            doc_counts[src] = doc_counts.get(src, 0) + 1
            for line in set((txt or "").split("\n")):
                if line:
                    key = (src, line)
                    counts[key] = counts.get(key, 0) + 1
        srcs = [k[0] for k in counts] + list(doc_counts)
        lines = [k[1] for k in counts] + [""] * len(doc_counts)
        ns = list(counts.values()) + [0] * len(doc_counts)
        nd = [0] * len(counts) + list(doc_counts.values())
        return pa.table({source_col: pa.array(srcs, pa.string()),
                         "line": pa.array(lines, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "nd": pa.array(nd, pa.int64())})

    agg = (ds.map_batches(line_partials, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby([source_col, "line"])
           .aggregate(Sum("n", alias_name="n"), Sum("nd", alias_name="nd"))
           # scanned twice below (totals first, then the threshold);
           # materialize so the counting pass runs once — the table is
           # distinct-(source, line)-sized in the object store, never
           # concentrated on the driver
           .materialize())

    totals: dict = {}
    boiler: set = set()
    for b in agg.iter_batches(batch_format="pyarrow"):
        for src, line, nd in zip(b.column(source_col).to_pylist(),
                                 b.column("line").to_pylist(),
                                 b.column("nd").to_pylist()):
            if line == "":
                totals[src] = totals.get(src, 0) + int(nd)
    # second scan of the SAME aggregate for the threshold (the aggregate
    # is materialized by its execution; totals must be complete first)
    for b in agg.iter_batches(batch_format="pyarrow"):
        for src, line, n in zip(b.column(source_col).to_pylist(),
                                b.column("line").to_pylist(),
                                b.column("n").to_pylist()):
            if line == "":
                continue
            t = totals.get(src, 0)
            if t >= min_docs and int(n) * 1_000_000 >= min_frac_ppm * t:
                boiler.add((src, line))
                if len(boiler) > max_boiler_lines:
                    raise ValueError(
                        f"boilerplate set exceeds {max_boiler_lines}; "
                        f"raise min_frac_ppm")
    b_ref = ray.put(boiler)

    def strip(batch: pa.Table) -> pa.Table:
        bset = ray.get(b_ref)
        ids = batch.column(id_col)
        out_t, out_n, out_s = [], [], []
        for src, txt in zip(batch.column(source_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
            lines = (txt or "").split("\n")
            kept = [ln for ln in lines
                    if ln == "" or (src, ln) not in bset]
            out_t.append("\n".join(kept))
            out_n.append(len(lines))
            out_s.append(len(lines) - len(kept))
        return pa.table({
            id_col: ids,
            text_col: pa.array(out_t, pa.string()),
            "n_lines": pa.array(out_n, pa.int64()),
            "n_stripped": pa.array(out_s, pa.int64()),
        })

    return ds.map_batches(strip, batch_format="pyarrow",
                          zero_copy_batch=True)
