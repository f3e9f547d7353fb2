"""ExactSubstr duplicate-substring removal (Lee et al. 2021) for Ray Data.

Same two-exchange shape as stages/c4.c4_span_dedup (which dedups
three-SENTENCE spans): the corpus explodes into 20-byte window rows
(hash, id, start) — never the text — shuffled once by hash(window) to
resolve losers vectorized per partition (winner = global min (id,
start), deterministic under any partitioning); loser rows then shuffle
once by hash(id) into the documents' buckets, and each document's text
crosses the exchange exactly once to have its losing token spans cut.
Nothing corpus-sized reaches the driver.

Window rows are one per TOKEN position (the paper's suffix array also
indexes every position) — the heaviest-but-honest cost of exact
substring dedup; W bounds the gram length the way the paper's 50-token
threshold does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import leespan

N_PARTS = 64


def _id_field_type(ds, id_col: str):
    """Arrow type of ``id_col`` for Arrow AND pandas-block datasets (the
    from_pandas schema has no .field — same dual handling as
    stats._require_integer_domain)."""
    schema = ds.schema(fetch_if_missing=True)
    base = getattr(schema, "base_schema", schema)
    if hasattr(base, "field"):
        return base.field(id_col).type
    np_t = dict(zip(base.names, base.types)).get(id_col)
    try:
        return pa.from_numpy_dtype(np_t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()


def substring_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                    window: int = 25, n_parts: int = N_PARTS):
    """Remove all but one occurrence of every ``window``-token substring
    that occurs more than once in the corpus.  The retained occurrence is
    the global minimum (id, start).  Returns (id, text) with losing token
    spans removed (single-space joined); untouched documents keep their
    token stream intact."""
    id_type = _id_field_type(ds, id_col)

    def windows(batch: pa.Table) -> pa.Table:
        ids_out, hash_parts, start_parts = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            h, s = leespan.doc_window_hashes(t or "", window)
            ids_out.extend([i] * len(h))
            hash_parts.append(h)
            start_parts.append(s)
        h = (np.concatenate(hash_parts) if hash_parts
             else np.empty(0, np.uint64))
        s = (np.concatenate(start_parts) if start_parts
             else np.empty(0, np.int32))
        return pa.table({
            id_col: pa.array(ids_out, id_type),
            "start": pa.array(s, pa.int32()),
            "__part": pa.array((h % n_parts).astype(np.int32)),
            "h": pa.array(h, pa.uint64()),
        })

    def losers_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col, "start"], kind="mergesort")
        dup = g.duplicated("h", keep="first")  # first (min id,start) wins
        return g.loc[dup, [id_col, "start"]]

    losers = (
        ds.map_batches(windows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(losers_in_part, batch_format="pandas")
    )

    def _id_part(ids: pa.ChunkedArray) -> pa.Array:
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
                leespan.remove_token_spans(t or "", starts, window)
                if starts else (t or ""))
        return pd.DataFrame({id_col: docs[id_col].to_numpy(),
                             text_col: out_texts})

    return tagged.groupby("__part").map_groups(rebuild, batch_format="pandas")
