"""Deduplication suite (SURVEY.md §2.7 D2 + engine additions).

Exact dedup is the crawler seen-set (A5/D2, /root/reference/spider_news.go:
163-166, 202-205) re-expressed as a native hash-partitioned groupby-min: the
mutable shared ``seen`` map (a latent race in the reference) becomes a
shuffle on the content fingerprint — every duplicate lands in one group, the
aggregate picks the winner.  No per-group Python.

Near-dup families (MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine)
share one shape: vectorized per-batch signatures → explode to (bucket, id,
sig) rows → ONE coarse repartition by ``bucket % N_PARTS`` (dozens of
groups, not one per bucket — per-group Python overhead stays O(parts)) →
within-partition pandas self-merge on the exact bucket → vectorized
verification.  Only (key, id, signature) columns ever shuffle — never
payloads; at 10^12 scale the payload table is re-joined by id afterwards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.arrowutil import pa_from_pandas

from ..functions import fingerprint as fp

N_PARTS = 64          # coarse bucket partitions (per-group python is O(this))
MAX_BUCKET = 256      # cap degenerate mega-buckets (all-identical corpora)
EMBED_MAX_GROUP = 65536   # skip hot label/bucket groups beyond this (O(n²) guard)
EMBED_BLOCK_ROWS = 256    # similarity row-block: peak extra mem = block × n doubles


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int | None = None):
    """Keep the row with the smallest id per distinct normalized text.
    Shuffle key = md5 fingerprint (uniform; no salting needed — every group
    is tiny).  Native Min aggregate: zero per-group Python.

    ``num_partitions=None`` lets Ray size the shuffle (each hash-shuffle
    partition costs one aggregator actor — 32 explicit partitions on a
    6k-row input spent 4s on actor startup vs 0.8s sized automatically).
    Set explicitly on a real cluster where partitions ≈ total cores."""
    from ray.data.aggregate import Min

    def add_fp(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "fingerprint": pa.array(
                    [fp.md5_fingerprint(t or "") for t in texts], pa.string()
                ),
            }
        )

    out = (
        ds.map_batches(add_fp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fingerprint", num_partitions=num_partitions)
        .aggregate(Min(id_col, alias_name=id_col))
    )
    return out


def _dedup_pairs(pairs_ds):
    """Pairs can surface from several bands/chunks; the result set is tiny
    relative to the corpus, so distinct-ing is left to the consumer
    (driver-side drop_duplicates at this scale; a keyed groupby with a small
    num_partitions when pair volume is itself large)."""
    return pairs_ds


def _merge_pairs_in_part(
    g: pd.DataFrame, bucket_cols: list[str], id_col: str, sig_col: str, verify_vec
) -> pd.DataFrame:
    """Within one coarse partition: self-merge on the exact bucket columns →
    candidate pairs → vectorized verification.  ``verify_vec(sig_a: list,
    sig_b: list) -> np.ndarray score`` returns NaN to reject."""
    g = g.drop_duplicates(subset=bucket_cols + [id_col])
    sizes = g.groupby(bucket_cols)[id_col].transform("size")
    g = g[sizes <= MAX_BUCKET]
    m = g.merge(g, on=bucket_cols, suffixes=("_a", "_b"))
    m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
    if m.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "score": []})
    m = m.drop_duplicates(subset=[f"{id_col}_a", f"{id_col}_b"])
    scores = verify_vec(m[f"{sig_col}_a"].to_list(), m[f"{sig_col}_b"].to_list())
    ok = ~np.isnan(scores)
    return pd.DataFrame(
        {
            "id_a": m[f"{id_col}_a"].to_numpy()[ok],
            "id_b": m[f"{id_col}_b"].to_numpy()[ok],
            "score": scores[ok],
        }
    )


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    bands: int = 32,
    verify: str = "auto",
    join_partitions: int = 8,
    broadcast_max_docs: int = 200_000,
    sig_store_dir: str | None = None,
):
    """MinHash+LSH near-dup candidate pairs with signature-Jaccard >=
    threshold (b=32, r=4 → collision threshold ~0.42).

    ``sig_store_dir``: when set, the (id, sig) table is written to
    partitioned parquet there and re-read for the band explode and the
    verify joins, instead of being pinned in the object store via
    ``materialize()`` — at 10^12 docs the signature table (~512 B/doc)
    is corpus-sized, and persisting it makes the object-store footprint
    independent of corpus size (round-2 verdict's residual minhash note).
    The store also doubles as a reusable artifact across runs.

    Two-phase shape: the exploded band rows carry ONLY (part, band, key, id)
    — 20 bytes, not the 512-byte signature duplicated x bands — so the
    bucket shuffle stays tiny.  Verification is a hash-partitioned join of
    (candidate pairs ⋈ sigs) on id_a then id_b — signatures never leave the
    distributed store, so nothing whole-dataset ever lands on the driver
    (``verify="join"``, the 10^12-doc shape).  ``verify="broadcast"`` is
    the small-side variant (driver collects id→sig, ships ONCE via
    ``ray.put``); ``verify="auto"`` (default) broadcasts when the corpus is
    ≤ ``broadcast_max_docs`` (≈100 MB of signatures) and joins beyond —
    the standard broadcast-small-sides / shuffle-large-sides rule.  The
    join path is the one that must hold at 10^12 docs; auto only spares
    small corpora two shuffle fleets."""

    def _sigs(b: pa.Table) -> pa.Table:
        S = fp.minhash_signature_batch(b.column(text_col).to_pylist())
        return pa.table(
            {
                id_col: b.column(id_col),
                "sig": pa.array([S[i].tobytes() for i in range(len(S))], pa.binary()),
            }
        )

    sig_ds = ds.map_batches(_sigs, batch_format="pyarrow", zero_copy_batch=True)
    if sig_store_dir:
        import ray.data as rd

        sig_ds.write_parquet(sig_store_dir)
        sig_ds = rd.read_parquet(sig_store_dir)
    else:
        sig_ds = sig_ds.materialize()  # computed once; reused for explode + verify

    def explode(batch: pa.Table) -> pa.Table:
        sig_bytes = batch.column("sig").to_pylist()
        n = len(sig_bytes)
        if n == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "band": pa.array([], pa.int32()),
                    "band_key": pa.array([], pa.int64()),
                    id_col: pa.array([], batch.schema.field(id_col).type),
                }
            )
        S = np.frombuffer(b"".join(sig_bytes), dtype=np.uint32).reshape(n, -1)
        keys = fp.minhash_band_matrix(S, bands)  # (n, bands), fully vectorized
        flat = keys.ravel()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((flat % N_PARTS).astype(np.int32)),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                "band_key": pa.array(flat),
                id_col: pa.array(np.repeat(ids, bands)),
            }
        )

    def candidates_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["band", "band_key", id_col])
        sizes = g.groupby(["band", "band_key"])[id_col].transform("size")
        g = g[sizes <= MAX_BUCKET]
        m = g.merge(g, on=["band", "band_key"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        m = m.drop_duplicates(subset=[f"{id_col}_a", f"{id_col}_b"])
        # built from m even when empty so id dtypes survive (schema unify)
        return pd.DataFrame(
            {"id_a": m[f"{id_col}_a"].to_numpy(), "id_b": m[f"{id_col}_b"].to_numpy()}
        )

    cands = (
        sig_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(candidates_in_part, batch_format="pandas")
    ).materialize()  # small (pairs only); also needed to inspect the schema

    schema = cands.schema(fetch_if_missing=True)
    if schema is None or "id_a" not in schema.names or cands.count() == 0:
        # zero candidates: a zero-block dataset breaks the native join's
        # aggregator (acero sees no id_a field on the left side) even when
        # the schema is known.  Emit a correctly-typed empty pair set.
        # count() is free here — cands is already materialized.
        import ray.data as rd

        id_type = sig_ds.schema().base_schema.field(id_col).type
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], id_type),
                    "id_b": pa.array([], id_type),
                    "score": pa.array([], pa.float64()),
                }
            )
        )

    def sig_score(blobs_a: list, blobs_b: list) -> np.ndarray:
        n = len(blobs_a)
        A = np.frombuffer(b"".join(blobs_a), dtype=np.uint32).reshape(n, -1)
        B = np.frombuffer(b"".join(blobs_b), dtype=np.uint32).reshape(n, -1)
        est = (A == B).mean(axis=1)
        return np.where(est >= threshold, est, np.nan)

    return _dedup_pairs(
        _verify_candidate_pairs(
            cands, sig_ds, id_col, "sig", sig_score,
            verify=verify, join_partitions=join_partitions,
            broadcast_max_docs=broadcast_max_docs,
        )
    )


def _verify_candidate_pairs(
    cands,
    feat_ds,
    id_col: str,
    feat_col: str,
    score_vec,
    *,
    verify: str = "auto",
    join_partitions: int = 8,
    broadcast_max_docs: int = 200_000,
):
    """Shared exact-verify tail of the LSH families: candidate (id_a, id_b)
    pairs re-acquire their verification payload (signature / gram set —
    a binary column of ``feat_ds``) and are scored by ``score_vec(blobs_a,
    blobs_b) -> float64 array`` (NaN = reject).

    verify="join" (the 10^12-doc shape): candidates ⋈ feats ⋈ feats via
    hash_join — payloads never leave the distributed store, and crucially
    never ride the BAND explosion (band rows stay ~20 B regardless of
    payload size).  verify="broadcast": driver collects id→blob and ships
    ONCE via ray.put — the small-corpus fast path.  verify="auto" picks by
    corpus size."""
    import ray

    if verify == "auto":
        verify = "broadcast" if feat_ds.count() <= broadcast_max_docs else "join"

    def _empty(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pa.array([], b.schema.field("id_a").type),
                "id_b": pa.array([], b.schema.field("id_b").type),
                "score": pa.array([], pa.float64()),
            }
        )

    def _score_and_filter(b: pa.Table, blobs_a: list, blobs_b: list) -> pa.Table:
        scores = score_vec(blobs_a, blobs_b)
        ok = ~np.isnan(scores)
        kept = b.select(["id_a", "id_b"]).filter(pa.array(ok))
        return kept.append_column("score", pa.array(scores[ok], pa.float64()))

    if verify == "broadcast":
        feat_map: dict = {}
        for batch in feat_ds.iter_batches(batch_format="pyarrow"):
            for i, s in zip(
                batch.column(id_col).to_pylist(), batch.column(feat_col).to_pylist()
            ):
                feat_map[i] = s
        feat_ref = ray.put(feat_map)

        def verify_batch(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return _empty(b)
            feats = ray.get(feat_ref)
            return _score_and_filter(
                b,
                [feats[i] for i in b.column("id_a").to_pylist()],
                [feats[i] for i in b.column("id_b").to_pylist()],
            )

        return cands.map_batches(verify_batch, batch_format="pyarrow", zero_copy_batch=True)

    if verify != "join":
        raise ValueError(f"unknown verify mode {verify!r}")

    from .joins import hash_join

    def tag(suffix: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {f"__k_{suffix}": b.column(id_col), f"feat_{suffix}": b.column(feat_col)}
            )

        return fn

    # two sequential joins; materialize between them so only ONE join's
    # aggregator-actor fleet is alive at a time (they deadlock-compete for
    # CPU slots on small clusters otherwise)
    feats_a = feat_ds.map_batches(tag("a"), batch_format="pyarrow", zero_copy_batch=True)
    feats_b = feat_ds.map_batches(tag("b"), batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(
        cands, feats_a, on="id_a", right_on="__k_a", num_partitions=join_partitions
    ).materialize()
    j = hash_join(j, feats_b, on="id_b", right_on="__k_b", num_partitions=join_partitions)

    def verify_batch(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty(b)
        return _score_and_filter(
            b, b.column("feat_a").to_pylist(), b.column("feat_b").to_pylist()
        )

    return j.map_batches(verify_batch, batch_format="pyarrow", zero_copy_batch=True)


def hamming64_pairs(
    hash_ds,
    id_col: str = "doc_id",
    hash_col: str = "sim",
    max_hamming: int = 3,
):
    """Pairs within hamming distance <= max_hamming over a 64-bit hash
    column via the 4-chunk pigeonhole LSH: split each hash into four 16-bit
    chunks — any pair with <= 3 differing bits must agree on at least one
    chunk, so the collection is EXACT for max_hamming <= 3 (modulo the
    MAX_BUCKET degenerate-bucket cap, which the serial twins mirror).

    Shared kernel for every 64-bit fingerprint family: text SimHash
    (``simhash_pairs``) and perceptual image hashes
    (stages/image.image_near_dup_pairs).  Only (bucket, id, hash) rows
    shuffle — 64-bit hashes, never payloads."""
    if max_hamming > 3:
        raise ValueError(
            f"4-chunk pigeonhole guarantees completeness only for "
            f"max_hamming <= 3 (got {max_hamming})")

    def add_chunks(batch: pa.Table) -> pa.Table:
        h = batch.column(hash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(h)
        # explode the 4 pigeonhole chunks per row vectorized
        chunk_ids = np.tile(np.arange(4, dtype=np.int32), n)
        shifts = (np.uint64(16) * chunk_ids.astype(np.uint64))
        h_rep = np.repeat(h, 4)
        chunks = ((h_rep >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        parts = ((chunks * 4 + chunk_ids) % N_PARTS).astype(np.int32)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array(parts),
                "chunk_id": pa.array(chunk_ids),
                "chunk": pa.array(chunks),
                id_col: pa.array(np.repeat(ids, 4)),
                "sim": pa.array(h_rep, pa.uint64()),
            }
        )

    def verify_vec(sims_a, sims_b):
        A = np.asarray(sims_a, dtype=np.uint64)
        B = np.asarray(sims_b, dtype=np.uint64)
        x = A ^ B
        d = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            d += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
            if not x.any():
                break
        return np.where(d <= max_hamming, d.astype(np.float64), np.nan)

    pairs = (
        hash_ds.map_batches(add_chunks, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(
            lambda g: _merge_pairs_in_part(g, ["chunk_id", "chunk"], id_col, "sim", verify_vec),
            batch_format="pandas",
        )
    )
    return _dedup_pairs(pairs)


def simhash_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
):
    """SimHash near-dup pairs within hamming distance <= max_hamming via the
    4-chunk pigeonhole LSH (any pair within distance 3 shares a 16-bit
    chunk).  Hash computation here, pair collection in the shared
    ``hamming64_pairs`` kernel (bit-identical to the pre-refactor fused
    form: same chunk/part arithmetic, same verification)."""

    def add_sim(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        sims = fp.simhash64_batch(texts)  # vectorized batch kernel
        return pa.table(
            {
                id_col: batch.column(id_col),
                "sim": pa.array(sims, pa.uint64()),
            }
        )

    hashed = ds.map_batches(add_sim, batch_format="pyarrow", zero_copy_batch=True)
    return hamming64_pairs(hashed, id_col=id_col, hash_col="sim",
                           max_hamming=max_hamming)


def ngram_jaccard_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    bands: int = 16,
    verify: str = "auto",
    join_partitions: int = 8,
    broadcast_max_docs: int = 200_000,
):
    """Word n-gram Jaccard pairs >= threshold: LSH on a minhash of the
    n-gram set for candidates, then EXACT Jaccard on the gram sets.

    Same two-phase shape as minhash_lsh_pairs (the round-2 verdict's n-gram
    finding): band rows carry ONLY (part, band, band_key, id) — the gram
    sets are computed once into a materialized (id, grams) table and joined
    back for the exact verify (``verify="join"``) or broadcast once for
    small corpora (``"broadcast"``/``"auto"``).  Shuffle bytes per doc are
    independent of ``bands``; previously the gram blob rode every one of
    the 16 exploded band rows."""

    def add_grams(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "grams": pa.array(
                    [
                        fp.ngram_set(t or "", n).tobytes()
                        for t in batch.column(text_col).to_pylist()
                    ],
                    pa.binary(),
                ),
            }
        )

    gram_ds = ds.map_batches(
        add_grams, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # computed once; reused for band explode + verification

    def explode(batch: pa.Table) -> pa.Table:
        blobs = batch.column("grams").to_pylist()
        m = len(blobs)
        if m == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "band": pa.array([], pa.int32()),
                    "band_key": pa.array([], pa.int64()),
                    id_col: pa.array([], batch.schema.field(id_col).type),
                }
            )
        sigs = np.zeros((m, bands * 4), dtype=np.uint32)
        for i, blob in enumerate(blobs):
            grams = np.frombuffer(blob, dtype=np.uint64)
            if len(grams):
                prod = (
                    fp._PERM_A[: bands * 4, None] * grams[None, :]
                    + fp._PERM_B[: bands * 4, None]
                )
                sigs[i] = (prod >> np.uint64(32)).min(axis=1).astype(np.uint32)
        keys = fp.minhash_band_matrix(sigs, bands)  # (m, bands) vectorized
        flat = keys.ravel()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((flat % N_PARTS).astype(np.int32)),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), m)),
                "band_key": pa.array(flat),
                id_col: pa.array(np.repeat(ids, bands)),
            }
        )

    def candidates_in_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["band", "band_key", id_col])
        sizes = g.groupby(["band", "band_key"])[id_col].transform("size")
        g = g[sizes <= MAX_BUCKET]
        m = g.merge(g, on=["band", "band_key"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        m = m.drop_duplicates(subset=[f"{id_col}_a", f"{id_col}_b"])
        return pd.DataFrame(
            {"id_a": m[f"{id_col}_a"].to_numpy(), "id_b": m[f"{id_col}_b"].to_numpy()}
        )

    cands = (
        gram_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(candidates_in_part, batch_format="pandas")
    ).materialize()

    schema = cands.schema(fetch_if_missing=True)
    if schema is None or "id_a" not in schema.names or cands.count() == 0:
        import ray.data as rd

        id_type = gram_ds.schema().base_schema.field(id_col).type
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], id_type),
                    "id_b": pa.array([], id_type),
                    "score": pa.array([], pa.float64()),
                }
            )
        )

    def gram_score(blobs_a: list, blobs_b: list) -> np.ndarray:
        out = np.empty(len(blobs_a))
        for i, (ba, bb) in enumerate(zip(blobs_a, blobs_b)):
            ga = np.frombuffer(ba, dtype=np.uint64)
            gb = np.frombuffer(bb, dtype=np.uint64)
            j = fp.jaccard(ga, gb)
            out[i] = j if j >= threshold else np.nan
        return out

    return _dedup_pairs(
        _verify_candidate_pairs(
            cands, gram_ds, id_col, "grams", gram_score,
            verify=verify, join_partitions=join_partitions,
            broadcast_max_docs=broadcast_max_docs,
        )
    )


def embedding_near_dup_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    part_col: str = "label",
    threshold: float = 0.4,
    max_group: int = EMBED_MAX_GROUP,
    block_rows: int = EMBED_BLOCK_ROWS,
):
    """Embedding-cosine near-dup pairs within a partition column (the
    documented partitioning assumption: candidates must share ``part_col``;
    cross-partition near-dups are out of contract — at scale the partition
    key is an LSH hyperplane bucket, see ann.lsh_buckets).  Cosine computed
    in float64; emits (id_a, id_b, cos) with id_a < id_b.

    Memory discipline: similarity is computed in row blocks (peak extra
    memory ``block_rows × n`` doubles, never a dense n×n), and groups larger
    than ``max_group`` are skipped entirely — the MAX_BUCKET analog of the
    text LSH paths (one hot label/bucket must not O(n²) a worker; re-bucket
    hot partitions with ann.lsh_buckets instead)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": np.array([], dtype=g[id_col].dtype),
             "id_b": np.array([], dtype=g[id_col].dtype),
             "cos": np.array([], dtype=np.float64)}
        )
        if len(g) > max_group or len(g) < 2:
            return empty
        g = g.sort_values(id_col)
        V = np.array(g[vec_col].to_list(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Vn = V / norms
        ids = g[id_col].to_numpy()
        n = len(ids)
        out_a, out_b, out_c = [], [], []
        for s in range(0, n, block_rows):
            e = min(s + block_rows, n)
            # rows s..e vs all columns > row index (upper triangle only)
            S = Vn[s:e] @ Vn[s:].T  # (e-s) × (n-s) block, not n × n
            bi, bj = np.nonzero(S >= threshold)
            keep = (bj + s) > (bi + s)  # strict upper triangle
            bi, bj = bi[keep], bj[keep]
            out_a.append(ids[bi + s])
            out_b.append(ids[bj + s])
            out_c.append(S[bi, bj])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos": np.concatenate(out_c),
            }
        )

    return ds.groupby(part_col).map_groups(per_group, batch_format="pandas")


def embedding_near_dup_lsh(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
):
    """Embedding near-dup pairs WITHOUT a label partition: random-hyperplane
    LSH buckets (ann.lsh_buckets — fixed planes, identical on every worker)
    are the partition key; near-identical vectors share a bucket with high
    probability.  Approximate: pairs split across buckets are missed —
    recall rises with fewer planes or multi-probe (documented tradeoff; the
    exact-within-`label` variant above is the recall=1 contract)."""
    from .ann import lsh_buckets

    bucketed = lsh_buckets(ds, vec_col).select_columns([id_col, vec_col, "bucket"])
    return embedding_near_dup_pairs(
        bucketed, vec_col=vec_col, id_col=id_col, part_col="bucket", threshold=threshold
    )


def incremental_exact_dedup(
    new_ds,
    prior_fp_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "auto",
    broadcast_max: int = 1_000_000,
):
    """Cross-run dedup: winners of the NEW corpus (exact_dedup) minus rows
    whose fingerprint already exists in a PRIOR run's output — the shape of
    "crawl N+1 against the committed corpus".  ``prior_fp_ds`` is a Dataset
    with a ``fingerprint`` column (e.g. read back from the previous run's
    partitioned parquet).

    method="broadcast": prior fingerprints are collected once and shipped
    via ray.put — right for priors up to ~1e6 fps (~50 MB).  method="anti":
    an explicit bucketed anti-join (tag sides → groupby crc32 bucket → keep
    left-only) — nothing whole-corpus touches the driver.  method="bloom":
    the composite scale path — a ~10-bit/key Bloom filter of the prior
    (1e9 keys ≈ 1.2 GB vs ~50 GB as a set) broadcast as a PRE-FILTER;
    Bloom-negative rows are definitively new and skip the shuffle entirely,
    only Bloom-positives (≈ dup rate + ~1% FP) pay the exact anti-join.
    "auto" picks broadcast for small priors, bloom beyond."""
    import zlib

    import ray

    winners = exact_dedup(new_ds, text_col=text_col, id_col=id_col)
    # exact_dedup emits (fingerprint, id_col)

    if method == "auto":
        method = "broadcast" if prior_fp_ds.count() <= broadcast_max else "bloom"

    if method == "broadcast":
        seen: set = set()
        for b in prior_fp_ds.select_columns(["fingerprint"]).iter_batches(
            batch_format="pyarrow"
        ):
            seen.update(b.column("fingerprint").to_pylist())
        seen_ref = ray.put(seen)

        def drop_seen(batch: pa.Table) -> pa.Table:
            s = ray.get(seen_ref)
            mask = [fp_ not in s for fp_ in batch.column("fingerprint").to_pylist()]
            return batch.filter(pa.array(mask))

        return winners.map_batches(drop_seen, batch_format="pyarrow", zero_copy_batch=True)

    if method == "bloom":
        from ..functions.bloom import build_bloom_distributed

        n_prior = prior_fp_ds.count()
        # distributed build: every block adds into a partial filter of
        # identical geometry inside map_batches; only fixed-size bit arrays
        # reach the driver for the OR-merge (bit-identical to a driver-
        # streamed build, but driver traffic is n_blocks x bits/8 instead
        # of every key)
        bf = build_bloom_distributed(
            prior_fp_ds.select_columns(["fingerprint"]), "fingerprint",
            max(n_prior, 1),
        )
        bf_ref = ray.put(bf)

        def flag(batch: pa.Table) -> pa.Table:
            f = ray.get(bf_ref)
            mask = f.contains_many(batch.column("fingerprint").to_pylist())
            return batch.append_column("__maybe_dup", pa.array(mask))

        flagged = winners.map_batches(
            flag, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()  # ids+fps+flag only; reused by both branches

        import pyarrow.compute as pc

        definite_new = flagged.map_batches(
            lambda t: t.filter(pc.equal(t["__maybe_dup"], False)).drop_columns(["__maybe_dup"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        candidates = flagged.map_batches(
            lambda t: t.filter(pc.equal(t["__maybe_dup"], True)).drop_columns(["__maybe_dup"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        if candidates.count() == 0:
            return definite_new
        survivors = _anti_join_fps(candidates, prior_fp_ds, id_col)
        return definite_new.union(survivors)

    if method != "anti":
        raise ValueError(f"unknown method {method!r}")

    return _anti_join_fps(winners, prior_fp_ds, id_col)


def _anti_join_fps(winners, prior_fp_ds, id_col: str):
    """Bucketed anti-join of (fingerprint, id) winners against prior
    fingerprints — the shuffle half of incremental_exact_dedup.  Works for
    any id dtype: the prior side's null ids are typed from the winners
    schema (winners is materialized here — ids+fps only, bounded)."""
    import zlib

    winners = winners.materialize()
    id_type = winners.schema(fetch_if_missing=True).base_schema.field(id_col).type

    n_buckets = 64

    def tag(side: int, with_ids: bool):
        def fn(batch: pa.Table) -> pa.Table:
            fps = batch.column("fingerprint").to_pylist()
            bucket = pa.array(
                np.fromiter(
                    (zlib.crc32(f.encode()) % n_buckets for f in fps),
                    dtype=np.int64,
                    count=len(fps),
                )
            )
            # identical schema on both sides (null ids on the prior side) so
            # the union never schema-unifies
            ids = (
                batch.column(id_col)
                if with_ids
                else pa.nulls(len(batch), id_type)
            )
            return pa.table(
                {
                    "fingerprint": batch.column("fingerprint"),
                    id_col: ids,
                    "__bucket": bucket,
                    "__side": pa.array([side] * len(batch), pa.int8()),
                }
            )

        return fn

    left = winners.map_batches(
        tag(0, True), batch_format="pyarrow", zero_copy_batch=True
    )
    right = prior_fp_ds.select_columns(["fingerprint"]).map_batches(
        tag(1, False), batch_format="pyarrow", zero_copy_batch=True
    )

    def anti_in_bucket(g: pa.Table) -> pa.Table:
        # pure-Arrow group fn: pandas would round-trip int ids through
        # float64 (typed nulls on the prior side) and corrupt ids > 2^53
        import pyarrow.compute as pc

        side = g.column("__side")
        prior_fps = g.filter(pc.equal(side, 1)).column("fingerprint")
        lhs = g.filter(pc.equal(side, 0))
        if len(prior_fps) == 0:
            keep = lhs
        else:
            mask = pc.invert(pc.is_in(lhs.column("fingerprint"), value_set=prior_fps))
            keep = lhs.filter(mask)
        return keep.select(["fingerprint", id_col])

    return left.union(right).groupby("__bucket").map_groups(
        anti_in_bucket, batch_format="pyarrow"
    )


def chunk_dedup_stats(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    join_partitions: int = 8,
    **cdc_kwargs,
):
    """Sub-document (CDC chunk-level) duplication stats: each document is
    content-defined-chunked (functions/fingerprint.cdc_chunks — boundaries
    survive edits), chunks are fingerprinted, and a corpus-wide chunk-count
    shuffle reveals how much of each document is duplicated ELSEWHERE.

    Emits (id, n_chunks, dup_chunk_ratio) where dup_chunk_ratio is the
    char-weighted fraction of the document covered by chunks occurring in
    more than one document.  Shape: explode → groupby(chunk_fp) count (one
    row per DISTINCT chunk crosses the shuffle) → join counts back → per-doc
    aggregate.  The SlimPajama-style sub-document dedup signal."""
    from ray.data.aggregate import Sum

    from ..functions.fingerprint import cdc_chunks, md5_fingerprint

    def explode(batch: pa.Table) -> pa.Table:
        ids, fps, lens, firsts = [], [], [], []
        for i, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            seen: set = set()
            for chunk in cdc_chunks(text or "", **cdc_kwargs):
                f = md5_fingerprint(chunk)
                ids.append(i)
                fps.append(f)
                lens.append(len(chunk))
                # per-document first-occurrence flag, computed HERE where
                # document boundaries are guaranteed: downstream batches may
                # be re-blocked mid-document (Ray dynamic block splitting),
                # so a per-batch drop_duplicates there could double-count an
                # intra-document repeat straddling a split as 2 docs
                firsts.append(f not in seen)
                seen.add(f)
        return pa.table(
            {
                # typed explicitly: an all-empty batch would otherwise emit
                # a NULL-typed id column that breaks schema unification
                id_col: pa.array(ids, batch.schema.field(id_col).type),
                "chunk_fp": pa.array(fps, pa.string()),
                "chunk_len": pa.array(lens, pa.int64()),
                "first_in_doc": pa.array(firsts, pa.bool_()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def ones(batch: pa.Table) -> pa.Table:
        # count DISTINCT docs per chunk: a doc repeating its own chunk is
        # not cross-document duplication.  The per-document dedup is the
        # first_in_doc flag computed inside explode() (where document
        # boundaries are guaranteed — batches here may split a document).
        t = batch.filter(batch.column("first_in_doc"))
        return pa.table(
            {
                "chunk_fp": t.column("chunk_fp"),
                "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    counts = (
        exploded.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("chunk_fp")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )

    # explicit bucketed join, Arrow-native inside each bucket: Ray 2.49's
    # hash-shuffle join raises ArrowInvalid when a ZERO-ROW block reaches a
    # partition (reproduced minimally; batches whose documents are all
    # empty naturally emit zero chunks here), and a pandas merge would
    # degrade int ids to float64 via the union's nulls
    import zlib

    n_buckets = max(join_partitions, 8)

    def _fp_buckets(fps):
        return pa.array(np.fromiter(
            (zlib.crc32(f.encode()) % n_buckets for f in fps),
            dtype=np.int64, count=len(fps),
        ))

    def tag0(batch: pa.Table) -> pa.Table:
        fps = batch.column("chunk_fp").to_pylist()
        bucket = _fp_buckets(fps)
        return pa.table({
            id_col: batch.column(id_col),
            "chunk_fp": batch.column("chunk_fp"),
            "chunk_len": batch.column("chunk_len"),
            "n_docs": pa.nulls(len(batch), pa.int64()),
            "__bucket": bucket,
            "__side": pa.array(np.zeros(len(batch), dtype=np.int8)),
        })

    left_id_type = exploded.schema(fetch_if_missing=True).base_schema.field(id_col).type

    def tag1(batch: pa.Table) -> pa.Table:
        fps = batch.column("chunk_fp").to_pylist()
        bucket = _fp_buckets(fps)
        return pa.table({
            id_col: pa.nulls(len(batch), left_id_type),
            "chunk_fp": batch.column("chunk_fp"),
            "chunk_len": pa.nulls(len(batch), pa.int64()),
            "n_docs": batch.column("n_docs"),
            "__bucket": bucket,
            "__side": pa.array(np.ones(len(batch), dtype=np.int8)),
        })

    tagged = exploded.map_batches(tag0, batch_format="pyarrow", zero_copy_batch=True).union(
        counts.map_batches(tag1, batch_format="pyarrow", zero_copy_batch=True)
    )

    def join_in_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g.column("__side")
        lhs = g.filter(pc.equal(side, 0)).select([id_col, "chunk_fp", "chunk_len"])
        rhs = g.filter(pc.equal(side, 1)).select(["chunk_fp", "n_docs"])
        if lhs.num_rows == 0 or rhs.num_rows == 0:
            return pa.table({
                id_col: pa.array([], left_id_type),
                "chunk_fp": pa.array([], pa.string()),
                "chunk_len": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
            })
        return lhs.join(rhs, keys=["chunk_fp"], join_type="inner")

    joined = tagged.groupby("__bucket").map_groups(join_in_bucket, batch_format="pyarrow")

    def per_doc_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # typed empty output: empty pandas frames lose dtypes and the
            # resulting empty-schema blocks spam unify warnings
            return pa.table(
                {
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    "n_chunks": pa.array([], pa.int64()),
                    "total_len": pa.array([], pa.int64()),
                    "dup_len": pa.array([], pa.int64()),
                }
            )
        df = batch.to_pandas()
        df["dup_len"] = df["chunk_len"].where(df["n_docs"] > 1, 0)
        g = df.groupby(id_col, as_index=False).agg(
            n_chunks=("chunk_len", "size"),
            total_len=("chunk_len", "sum"),
            dup_len=("dup_len", "sum"),
        )
        return pa_from_pandas(g)

    agg = (
        joined.map_batches(per_doc_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(id_col)
        .aggregate(
            Sum("n_chunks", alias_name="n_chunks"),
            Sum("total_len", alias_name="total_len"),
            Sum("dup_len", alias_name="dup_len"),
        )
    )

    def ratio(batch: pa.Table) -> pa.Table:
        tot = batch.column("total_len").to_numpy(zero_copy_only=False).astype(np.float64)
        dup = batch.column("dup_len").to_numpy(zero_copy_only=False).astype(np.float64)
        r = np.where(tot > 0, dup / np.maximum(tot, 1.0), 0.0)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_chunks": batch.column("n_chunks"),
                "dup_chunk_ratio": pa.array(r, pa.float64()),
            }
        )

    return agg.map_batches(ratio, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# connected components over dup pairs → clusters → near-dedup
# ---------------------------------------------------------------------------

CC_BUCKETS = 64       # hash buckets per label-lookup shuffle
CC_MAX_ROUNDS = 48    # backstop; min-label + pointer jumping is O(log n) rounds


def _cc_int_buckets(col: pa.ChunkedArray | pa.Array, n: int) -> pa.Array:
    v = col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return pa.array(v % n)


def _cc_lookup_min(refs, labels, n_buckets: int = CC_BUCKETS,
                   num_partitions: int | None = None):
    """For every (a, b) row of ``refs``: look up b's current label in
    ``labels`` (node, label) and emit (node=a, label=label(b)), pre-reduced
    to the per-bucket min per node.

    Explicit bucket-union-groupby join (hash(b) % B co-locates reference
    rows with the label rows they need) — only (int64, int64) pairs ever
    shuffle.  Refs whose b has no label entry are dropped; CC's callers
    never produce one (every b is a node of the graph, and every label
    value is itself a node id)."""

    def tag_refs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "__bucket": _cc_int_buckets(batch.column("b"), n_buckets),
                "__side": pa.array(np.zeros(len(batch), dtype=np.int8)),
            }
        )

    def tag_labels(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("node"),
                "b": batch.column("label"),
                "__bucket": _cc_int_buckets(batch.column("node"), n_buckets),
                "__side": pa.array(np.ones(len(batch), dtype=np.int8)),
            }
        )

    def lookup_in_bucket(g: pd.DataFrame) -> pa.Table:
        # emit Arrow so the downstream union with Arrow-block datasets never
        # mixes block types (Ray's sort/groupby asserts homogeneous blocks)
        lhs = g[g["__side"] == 0]
        rhs = g[g["__side"] == 1]
        m = lhs.merge(rhs, left_on="b", right_on="a", suffixes=("", "_r"))
        if m.empty:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                }
            )
        out = m.groupby("a", as_index=False)["b_r"].min()
        return pa.table(
            {
                "node": pa.array(out["a"].to_numpy(dtype=np.int64)),
                "label": pa.array(out["b_r"].to_numpy(dtype=np.int64)),
            }
        )

    tagged = refs.map_batches(
        tag_refs, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        labels.map_batches(tag_labels, batch_format="pyarrow", zero_copy_batch=True)
    )
    return tagged.groupby("__bucket", num_partitions=num_partitions).map_groups(
        lookup_in_bucket, batch_format="pandas"
    )


def dup_connected_components(
    pairs_ds,
    id_a: str = "id_a",
    id_b: str = "id_b",
    n_buckets: int = CC_BUCKETS,
    max_rounds: int = CC_MAX_ROUNDS,
):
    """Dup-pair edge list → (node, cluster_id) where ``cluster_id`` is the
    minimum node id of the connected component — the pairs→clusters step a
    near-dedup pipeline needs before it can pick winners (the reference's
    seen-set dedup has no analog; this serves the engine's MinHash/SimHash/
    Jaccard/embedding pair producers).

    Algorithm: iterative min-label propagation with pointer jumping — each
    round ONE bucketed label-lookup shuffle over (edges ∪ current labels)
    computes min(label(neighbor)) per node AND label(label(node)) (the jump
    rides the same shuffle), merged with the node's own label through a
    keyed groupby-min.  Labels are monotone non-increasing and bounded, so
    the global label sum (a one-scalar aggregate) is a sound convergence
    signal: unchanged sum ⇒ fixpoint ⇒ labels constant per component and
    equal to the component minimum.  Pointer jumping makes rounds
    O(log diameter); LSH dup graphs are clique-ish, so 2-4 rounds typical.

    Scale: only (int64, int64) rows shuffle; the per-round materialize holds
    the label table — O(nodes touched by any pair), far smaller than the
    corpus (at 10^12-doc scale, persist labels to parquet per round exactly
    like minhash's ``sig_store_dir``).  Node ids must be integers (hash
    string ids to int64 first).  Nodes in no pair are absent from the
    output — they are their own singleton clusters by definition."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column(id_a).cast(pa.int64()).combine_chunks()
        b = batch.column(id_b).cast(pa.int64()).combine_chunks()
        return pa.table(
            {
                "a": pa.concat_arrays([a, b]),
                "b": pa.concat_arrays([b, a]),
            }
        )

    edges = pairs_ds.map_batches(
        both_dirs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        import ray

        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        )

    # shuffle width scales with the edge volume: tiny label tables must
    # not pay hundreds of fixed-cost shuffle tasks per round (the measured
    # ~40-70 ms Ray task floor dominates below ~200k rows/partition); on a
    # real cluster this grows to ~total cores at large n_edges
    parts = max(2, min(n_buckets, n_edges // 200_000 + 1))
    edges = edges.repartition(parts).materialize()

    # round 0: label(v) = min(v, min neighbor)
    def with_self(batch: pa.Table) -> pa.Table:
        node = batch.column("a")
        lab = pc.min_element_wise(batch.column("label"), node)
        return pa.table({"node": node, "label": lab})

    # NB: repartition before every materialize — groupby's shuffle emits
    # ~3x the input block count regardless of num_partitions, and block
    # counts compound across rounds (measured 6→18→54→162… without this,
    # turning O(log n) rounds into exponential wall time)
    labels = (
        edges.groupby("a", num_partitions=parts)
        .aggregate(Min("b", alias_name="label"))
        .map_batches(with_self, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(parts)
        .materialize()
    )

    def labels_as_refs(batch: pa.Table) -> pa.Table:
        # (node, label) → lookup label(label): the pointer jump
        return pa.table({"a": batch.column("node"), "b": batch.column("label")})

    def rename_out(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("a"), "label": batch.column("label")})

    prev_sum = None
    for _ in range(max_rounds):
        refs = edges.union(
            labels.map_batches(
                labels_as_refs, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        looked = _cc_lookup_min(refs, labels, n_buckets, num_partitions=parts)
        labels = (
            looked.union(labels)
            .groupby("node", num_partitions=parts)
            .aggregate(Min("label", alias_name="label"))
            .map_batches(
                lambda t: pa.table({"node": t.column("node"), "label": t.column("label")}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .repartition(parts)
            .materialize()
        )
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    else:
        raise RuntimeError(
            f"dup_connected_components did not converge in {max_rounds} rounds"
        )

    return labels.map_batches(
        lambda t: pa.table(
            {"node": t.column("node"), "cluster_id": t.column("label")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _drop_ids_join(ds, drop_ids, id_col: str, n_buckets: int = CC_BUCKETS):
    """Bucketed anti-filter: drop every ``ds`` row whose id appears in
    ``drop_ids`` (a Dataset with column ``id_col``).  The payload shuffles
    ONCE by hash(id); drop ids shuffle alongside; each bucket filters
    Arrow-natively (no pandas: typed nulls must not float-corrupt int
    ids).  The large-loser twin of the broadcast path in ``near_dedup``."""
    import zlib

    import pyarrow.compute as pc

    schema = ds.schema(fetch_if_missing=True).base_schema

    def _id_buckets(col) -> pa.Array:
        vals = col.to_pylist()
        return pa.array(
            np.fromiter(
                (
                    v % n_buckets
                    if isinstance(v, int)
                    else zlib.crc32(str(v).encode()) % n_buckets
                    for v in vals
                ),
                dtype=np.int64,
                count=len(vals),
            )
        )

    def tag_payload(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("__bucket", _id_buckets(batch.column(id_col)))
        return batch.append_column(
            "__side", pa.array(np.zeros(len(batch), dtype=np.int8))
        )

    def tag_drops(batch: pa.Table) -> pa.Table:
        cols = {}
        for field in schema:
            if field.name == id_col:
                cols[field.name] = batch.column(id_col).cast(field.type)
            else:
                cols[field.name] = pa.nulls(len(batch), field.type)
        t = pa.table(cols)
        t = t.append_column("__bucket", _id_buckets(batch.column(id_col)))
        return t.append_column("__side", pa.array(np.ones(len(batch), dtype=np.int8)))

    tagged = ds.map_batches(
        tag_payload, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        drop_ids.select_columns([id_col]).map_batches(
            tag_drops, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    out_names = schema.names

    def filter_in_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        bad = g.filter(pc.equal(side, 1)).column(id_col)
        lhs = g.filter(pc.equal(side, 0)).select(out_names)
        if len(bad) == 0:
            return lhs
        return lhs.filter(
            pc.invert(pc.is_in(lhs.column(id_col), value_set=bad.combine_chunks()))
        )

    return tagged.groupby("__bucket").map_groups(
        filter_in_bucket, batch_format="pyarrow"
    )


def near_dedup(
    ds,
    pairs_ds,
    id_col: str = "doc_id",
    broadcast_max_losers: int = 1_000_000,
):
    """Near-duplicate removal: given the corpus and a dup-pair Dataset from
    any pair producer (minhash_lsh_pairs / simhash_pairs /
    ngram_jaccard_pairs / embedding_near_dup_pairs), resolve pairs into
    connected components and drop every member except the min-id
    representative.

    Loser ids (node ≠ cluster_id) broadcast once via ray.put below
    ``broadcast_max_losers`` (vectorized pc.is_in filter — the payload
    never shuffles); above it the payload shuffles ONCE through the
    bucketed anti-filter.  Nothing corpus-sized ever reaches the driver."""
    import ray

    import pyarrow.compute as pc

    cc = dup_connected_components(pairs_ds)

    def losers_only(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(batch.column("node"), batch.column("cluster_id")))
        return pa.table({id_col: batch.filter(keep).column("node")})

    losers = cc.map_batches(
        losers_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    return _drop_losers(ds, losers, id_col, broadcast_max_losers)


def _drop_losers(ds, losers, id_col: str, broadcast_max_losers: int):
    """Drop ``losers`` (a materialized single-column id Dataset) from
    ``ds``: broadcast-filter below the cap, bucketed anti-join above —
    shared by near_dedup and near_dedup_best."""
    import ray

    import pyarrow.compute as pc

    n_losers = losers.count()
    if n_losers == 0:
        return ds
    if n_losers > broadcast_max_losers:
        return _drop_ids_join(ds, losers, id_col)

    id_type = ds.schema(fetch_if_missing=True).base_schema.field(id_col).type
    chunks = [
        b.column(id_col).cast(id_type).combine_chunks()
        for b in losers.iter_batches(batch_format="pyarrow")
    ]
    loser_arr = pa.concat_arrays(chunks) if chunks else pa.array([], id_type)
    ref = ray.put(loser_arr)

    def drop(batch: pa.Table) -> pa.Table:
        import ray as _ray

        arr = _ray.get(ref)
        return batch.filter(
            pc.invert(pc.is_in(batch.column(id_col), value_set=arr))
        )

    return ds.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)


def near_dedup_best(
    ds,
    pairs_ds,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
    broadcast_max_losers: int = 1_000_000,
):
    """Near-duplicate removal keeping the BEST-scoring member of each
    cluster (ties → min id) instead of the min-id member — the curation
    policy a corpus publisher actually wants ("keep the longest / cleanest
    copy"; the reference's longest-title dedup, link.go D1, is the same
    rule at title scale).

    Scale shape: connected components are pair-sized; member scores are
    acquired by a broadcast id-set filter over the corpus below the cap
    (only (id, score) columns ever leave the scan) or a bucketed semi-join
    above it; the per-cluster argmax is a bounded keyed groupby over
    member rows.  The final drop reuses the shared loser plumbing —
    nothing corpus-sized reaches the driver."""
    import ray

    import pyarrow.compute as pc

    cc = dup_connected_components(pairs_ds).materialize()
    n_members = cc.count()
    if n_members == 0:
        return ds

    proj = ds.map_batches(
        lambda b: b.select([id_col, score_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    from .joins import bucketed_join

    id_type = ds.schema(fetch_if_missing=True).base_schema.field(id_col).type
    if n_members <= broadcast_max_losers:
        member_arr = pa.concat_arrays([
            b.column("node").cast(id_type).combine_chunks()
            for b in cc.iter_batches(batch_format="pyarrow")
        ])
        mref = ray.put(member_arr)

        def member_scores(batch: pa.Table) -> pa.Table:
            import ray as _ray

            return batch.filter(
                pc.is_in(batch.column(id_col), value_set=_ray.get(mref))
            )

        scored = proj.map_batches(
            member_scores, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        scored = bucketed_join(
            proj,
            cc.map_batches(lambda b: pa.table({id_col: b.column("node")}),
                           batch_format="pyarrow", zero_copy_batch=True),
            on=id_col,
        ).map_batches(lambda b: b.select([id_col, score_col]),
                      batch_format="pyarrow", zero_copy_batch=True)

    members = bucketed_join(
        scored,
        cc.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "cluster_id": b.column("cluster_id")}),
            batch_format="pyarrow", zero_copy_batch=True),
        on=id_col, right_on="node",
    )

    from .stats import top_k_per_group

    winners = top_k_per_group(
        members.select_columns(["cluster_id", id_col, score_col]),
        ["cluster_id"], score_col, k=1, descending=True, tie_col=id_col,
    )

    w = winners.map_batches(
        lambda b: b.select([id_col]), batch_format="pyarrow", zero_copy_batch=True
    )
    # losers = members minus winners, via a broadcast winner-id filter —
    # winners are one per cluster, always far smaller than the member set
    # (the documented partitioning assumption: #clusters fits one object).
    # Empty winners (pair ids disjoint from ds — e.g. a re-run over an
    # already-filtered corpus) must not crash concat_arrays (review
    # finding): every member then counts as a loser, and dropping ids
    # absent from ds is a no-op.
    w_chunks = [
        b.column(id_col).cast(id_type).combine_chunks()
        for b in w.iter_batches(batch_format="pyarrow")
    ]
    winner_arr = (pa.concat_arrays(w_chunks) if w_chunks
                  else pa.array([], id_type))
    wtype = winner_arr.type  # plain type in the closure, NOT the array —
    # capturing winner_arr would pickle the whole id set into the UDF and
    # defeat the ray.put broadcast (review finding)
    wref = ray.put(winner_arr)

    def losers_only(batch: pa.Table) -> pa.Table:
        import ray as _ray

        keep = pc.invert(
            pc.is_in(batch.column("node").cast(wtype),
                     value_set=_ray.get(wref))
        )
        return pa.table({id_col: batch.filter(keep).column("node")})

    loser_ds = cc.map_batches(
        losers_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    return _drop_losers(ds, loser_ds, id_col, broadcast_max_losers)


def semantic_dedup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    iters: int = 4,
    threshold: float = 0.95,
    max_group: int = EMBED_MAX_GROUP,
    init: "np.ndarray | None" = None,
):
    """SemDeDup-style semantic deduplication (the public recipe: cluster the
    embedding space, then search for near-duplicates only WITHIN a cluster):
    distributed k-means (ann.kmeans_fit_distributed — bit-deterministic
    integer micro-unit Lloyd, only k×d counters per block) partitions the
    corpus; embedding_near_dup_pairs finds within-cluster cosine pairs;
    connected components resolve them; each component keeps its min-id
    representative (near_dedup).

    Scale shape: the cluster partition bounds the O(n²) pair search to
    cluster size (plus the max_group hot-cluster guard), one keyed shuffle
    for the cluster groupby, and the loser set follows near_dedup's
    broadcast-or-anti-join auto mode.  Documented SemDeDup tradeoff:
    near-dups straddling a cluster boundary are out of contract."""
    from .ann import kmeans_assign, kmeans_fit_distributed

    C = kmeans_fit_distributed(ds, n_centroids=n_clusters, iters=iters,
                               vec_col=vec_col, init=init)
    assigned = kmeans_assign(ds, C, vec_col=vec_col)
    pairs = embedding_near_dup_pairs(
        assigned, vec_col=vec_col, id_col=id_col, part_col="cluster",
        threshold=threshold, max_group=max_group)
    return near_dedup(ds, pairs, id_col=id_col)


def decontaminate(
    ds,
    bench_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    mode: str = "flag",
    max_bench_grams: int = 5_000_000,
    only_col: str | None = None,
):
    """Benchmark decontamination — the training-corpus hygiene operator of
    the published GPT-3 / Pile methodology: find (``mode="flag"``) or drop
    (``mode="filter"``) training documents that share any word ``n``-gram
    with an evaluation/benchmark set.

    Scale shape: the benchmark side is SMALL by contract (an eval set, not
    a second corpus).  Its distinct gram hashes are reduced per block
    (map_batches partial-unique), unioned on the driver under a hard cap,
    and broadcast ONCE via ray.put; the corpus then streams through a
    single vectorized membership map_batches (np.searchsorted against the
    sorted gram array + np.add.reduceat per-doc overlap counts).  The
    corpus is never shuffled and nothing corpus-sized reaches the driver.
    A benchmark exceeding ``max_bench_grams`` distinct grams raises — at
    that size it is a corpus, and the pair-shaped ngram_jaccard_pairs path
    applies instead.  ``only_col`` names a boolean column: rows where it is
    false skip the n-gram hashing entirely (overlap 0) — the composed
    pipeline uses it so already-dropped rows never pay the dominant
    per-row cost."""
    import ray

    import pyarrow.compute as pc

    if mode not in ("flag", "filter"):
        raise ValueError(f"mode must be 'flag' or 'filter', got {mode!r}")

    def partial_grams(batch: pa.Table) -> pa.Table:
        arrs = [fp.ngram_set(t or "", n)
                for t in batch.column(text_col).to_pylist()]
        arrs = [a for a in arrs if len(a)]
        grams = (np.unique(np.concatenate(arrs)) if arrs
                 else np.zeros(0, dtype=np.uint64))
        return pa.table({"gram": pa.array(grams, pa.uint64())})

    chunks, total = [], 0
    for b in bench_ds.map_batches(
        partial_grams, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        a = b.column("gram").to_numpy()
        total += len(a)
        if total > max_bench_grams:
            raise ValueError(
                f"benchmark exceeds {max_bench_grams} distinct {n}-grams; "
                "that is a corpus, not an eval set — use ngram_jaccard_pairs")
        chunks.append(a)
    bench = (np.unique(np.concatenate(chunks)) if chunks
             else np.zeros(0, dtype=np.uint64))
    ref = ray.put(bench)

    def mark(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bg = _ray.get(ref)
        texts = batch.column(text_col).to_pylist()
        if only_col is not None:
            active = batch.column(only_col).to_numpy(zero_copy_only=False)
            texts = [t if a else "" for t, a in zip(texts, active)]
        counts = np.zeros(len(texts), dtype=np.int64)
        if len(bg) and texts:
            arrs = [fp.ngram_set(t or "", n) for t in texts]
            lens = np.array([len(a) for a in arrs], dtype=np.int64)
            if lens.sum():
                flat = np.concatenate([a for a in arrs if len(a)])
                idx = np.searchsorted(bg, flat)
                # idx == len(bg) means gram > every bench gram: clamping to 0
                # cannot false-positive because then gram > bg[0] too
                idx[idx == len(bg)] = 0
                hits = (bg[idx] == flat).astype(np.int64)
                starts = np.concatenate(
                    ([0], np.cumsum(lens[lens > 0])[:-1]))
                counts[lens > 0] = np.add.reduceat(hits, starts)
        batch = batch.append_column(
            "overlap_grams", pa.array(counts, pa.int64()))
        batch = batch.append_column(
            "contaminated", pa.array(counts > 0, pa.bool_()))
        if mode == "filter":
            batch = batch.filter(
                pc.invert(batch.column("contaminated").combine_chunks()))
        return batch

    return ds.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)


def apply_deletions(ds, deleted_ids_ds, id_col: str = "doc_id",
                    method: str = "auto", broadcast_max: int = 1_000_000,
                    mode: str = "filter"):
    """Right-to-be-forgotten delete pass: remove (or mark) every corpus
    row whose id appears in a deletion list — the GDPR/takedown
    maintenance op every long-lived corpus needs.  Same scale machinery
    as incremental_exact_dedup: ``broadcast`` ships the id set once via
    ray.put (≤ ``broadcast_max`` ids), ``anti`` runs the bucketed
    anti-join so nothing list-sized touches the driver; ``auto`` picks
    by a cheap count.  ``mode="mark"`` appends a ``deleted`` bool
    instead of filtering (audit trails want the tombstone visible)."""
    import ray

    if mode not in ("filter", "mark"):
        raise ValueError(f"mode must be 'filter' or 'mark', got {mode!r}")
    n_del = deleted_ids_ds.count()
    use_broadcast = (method == "broadcast"
                     or (method == "auto" and n_del <= broadcast_max))
    if method not in ("auto", "broadcast", "anti"):
        raise ValueError(f"unknown method {method!r}")
    if use_broadcast:
        ids = set()
        for b in deleted_ids_ds.iter_batches(batch_format="pyarrow"):
            ids.update(b.column(id_col).to_pylist())
        ref = ray.put(ids)

        def tag(batch: pa.Table) -> pa.Table:
            dead = ray.get(ref)
            flags = [i in dead for i in batch.column(id_col).to_pylist()]
            if mode == "mark":
                return batch.append_column("deleted",
                                           pa.array(flags, pa.bool_()))
            return batch.filter(pa.array([not f for f in flags]))

        return ds.map_batches(tag, batch_format="pyarrow",
                              zero_copy_batch=True)
    # anti-join path: tag sides, bucket by id hash, keep left-only
    import zlib

    n_parts = 64

    def _part(ids_arr) -> pa.Array:
        if pa.types.is_integer(ids_arr.type):
            part = (ids_arr.to_numpy(zero_copy_only=False).astype(np.int64)
                    % n_parts).astype(np.int32)
        else:
            part = np.fromiter(
                (zlib.crc32(str(k).encode()) % n_parts
                 for k in ids_arr.to_pylist()),
                dtype=np.int32, count=len(ids_arr))
        return pa.array(part)

    def tag_del(batch: pa.Table) -> pa.Table:
        ids_arr = batch.column(id_col)
        return pa.table({id_col: ids_arr, "__part": _part(ids_arr)})

    dead_parts = deleted_ids_ds.map_batches(
        tag_del, batch_format="pyarrow", zero_copy_batch=True)

    def tag_rows(batch: pa.Table) -> pa.Table:
        return batch.append_column("__part", _part(batch.column(id_col)))

    rows = ds.map_batches(tag_rows, batch_format="pyarrow",
                          zero_copy_batch=True)

    import pandas as pd

    # the union below pads the deletion side's missing columns with nulls,
    # which promotes integer dtypes to float in the pandas bucket frame —
    # record the corpus dtypes so the merge casts them back
    schema = ds.schema(fetch_if_missing=True)
    base = getattr(schema, "base_schema", schema)
    if hasattr(base, "names") and hasattr(base, "types")             and not hasattr(base, "field"):
        orig_dtypes = {n: t for n, t in zip(base.names, base.types)}
    else:
        orig_dtypes = {f.name: f.type.to_pandas_dtype() for f in base}

    # mark per bucket: rows join the bucket's deletion ids
    def mark_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dead = set(g.loc[g["__side"] == 1, id_col])
        out = g[g["__side"] == 0].drop(columns=["__side", "__part"])
        out = out.copy()
        for c, t in orig_dtypes.items():
            if c in out.columns and str(out[c].dtype) != str(t):
                try:
                    out[c] = out[c].astype(t)
                except (TypeError, ValueError):
                    pass  # genuinely nullable column: keep the promotion
        out["deleted"] = out[id_col].isin(dead)
        if mode == "filter":
            out = out[~out["deleted"]].drop(columns=["deleted"])
        return out

    def side(ds_, s):
        return ds_.map_batches(
            lambda t, s=s: t.append_column(
                "__side", pa.array(np.full(len(t), s, np.int8))),
            batch_format="pyarrow", zero_copy_batch=True)

    # union pads missing columns with nulls; dedup-side rows only carry
    # (id, part, side) and are dropped inside mark_bucket
    both = side(rows, 0).union(side(dead_parts, 1))
    return both.groupby("__part").map_groups(mark_bucket,
                                             batch_format="pandas")


def decontaminate_spans(ds, bench_ds, text_col: str = "text", n: int = 8,
                        max_bench_grams: int = 50_000_000):
    """Span-level decontamination: instead of dropping a contaminated
    document wholesale (``decontaminate(mode="filter")``), cut ONLY the
    words covered by a benchmark n-gram — the salvage variant of the
    GPT-3 appendix-C methodology (and the span-surgery spirit of Lee et
    al. 2022): a 10k-word document touching one eval question loses ~n
    words, not its entire signal.

    Same scale shape as ``decontaminate``: the eval side's distinct gram
    hashes broadcast once (hard cap raises loudly), the corpus streams
    through one vectorized membership map (positional
    ``fp.ngram_seq`` hashes via searchsorted); covered word windows
    [i, i+n) are removed and the text rebuilt space-joined (the C4
    ``remove_spans`` whitespace convention).  Emits the rebuilt
    ``text_col`` plus ``n_cut_words`` and ``decontaminated``."""
    import ray

    def partial_grams(batch: pa.Table) -> pa.Table:
        arrs = [fp.ngram_set(t or "", n)
                for t in batch.column(text_col).to_pylist()]
        arrs = [a for a in arrs if len(a)]
        grams = (np.unique(np.concatenate(arrs)) if arrs
                 else np.zeros(0, dtype=np.uint64))
        return pa.table({"gram": pa.array(grams, pa.uint64())})

    chunks, total = [], 0
    for b in bench_ds.map_batches(
        partial_grams, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        a = b.column("gram").to_numpy()
        total += len(a)
        if total > max_bench_grams:
            raise ValueError(
                f"benchmark exceeds {max_bench_grams} distinct {n}-grams; "
                "that is a corpus, not an eval set")
        chunks.append(a)
    bench = (np.unique(np.concatenate(chunks)) if chunks
             else np.zeros(0, dtype=np.uint64))
    ref = ray.put(bench)

    def cut(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bg = _ray.get(ref)
        texts = batch.column(text_col).to_pylist()
        out_texts, n_cut = [], []
        for t in texts:
            t = t or ""
            words = t.split()
            seq = fp.ngram_seq(t, n) if len(bg) else np.zeros(0, np.uint64)
            if len(seq) == 0:
                out_texts.append(t)
                n_cut.append(0)
                continue
            idx = np.searchsorted(bg, seq)
            idx[idx == len(bg)] = 0  # clamp cannot false-positive (sorted)
            hits = bg[idx] == seq
            if not hits.any():
                out_texts.append(t)
                n_cut.append(0)
                continue
            covered = np.zeros(len(words), dtype=bool)
            if len(words) < n:
                covered[:] = True  # the single whole-text gram hit
            else:
                for i in np.nonzero(hits)[0]:  # loops over HITS only
                    covered[i: i + n] = True
            out_texts.append(
                " ".join(w for w, c in zip(words, covered) if not c))
            n_cut.append(int(covered.sum()))
        batch = batch.set_column(
            batch.column_names.index(text_col), text_col,
            pa.array(out_texts, pa.string()))
        batch = batch.append_column(
            "n_cut_words", pa.array(n_cut, pa.int64()))
        return batch.append_column(
            "decontaminated", pa.array([c > 0 for c in n_cut], pa.bool_()))

    return ds.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)


def embedding_decontaminate(ds, eval_vectors, id_col: str = "vec_id",
                            emb_col: str = "embedding",
                            tau_milli: int = 950, scale: int = 1000,
                            max_eval: int = 2_000_000):
    """Semantic (embedding-space) decontamination: flag training vectors
    whose cosine similarity against ANY benchmark vector reaches
    ``tau_milli``/1000 — the paraphrase-robust companion to the n-gram
    ``decontaminate`` (a reworded eval question shares no 8-gram but
    sits at cosine ≈ 1).

    Exactness: embeddings quantize to ``scale`` units and every dot /
    norm is a sum of integer-valued doubles far below 2⁵³, so the
    cosine expression ``dot / sqrt(max(n_t,1)·max(n_e,1))`` evaluates
    bit-identically in ANY summation order — an independent SQL
    restatement (DuckDB list_dot_product over the same quantized lists)
    reproduces max_sim_milli and the flag exactly.

    Scale shape: the quantized eval matrix broadcasts ONCE via ray.put
    (hard cap ``max_eval`` rows — loud raise beyond it, mirroring
    decontaminate's n-gram cap); the pass is one stateless vectorized
    map (int64 matmul per batch), no corpus shuffle, nothing corpus-
    sized on the driver.  Output: input rows + (max_sim_milli int64,
    contaminated bool)."""
    import ray

    if len(eval_vectors) > max_eval:
        raise ValueError(
            f"embedding_decontaminate: eval set has {len(eval_vectors)} "
            f"rows > max_eval={max_eval} — the broadcast matrix would "
            "not fit; shard the eval set or raise max_eval explicitly.")
    ev = np.asarray(
        [np.floor(np.asarray(v, np.float64) * scale + 0.5)
         for v in eval_vectors], dtype=np.int64)
    if ev.ndim != 2 or ev.shape[0] == 0:
        raise ValueError("embedding_decontaminate: empty/ragged eval set")
    ev_ref = ray.put(ev)
    tau = tau_milli / 1000.0

    def flag(batch: pa.Table) -> pa.Table:
        import ray as _ray

        e = _ray.get(ev_ref)
        ne = np.maximum((e * e).sum(axis=1), 1).astype(np.float64)
        rows = batch.column(emb_col).to_pylist()
        if not rows:
            return (batch.append_column("max_sim_milli",
                                        pa.array([], pa.int64()))
                    .append_column("contaminated", pa.array([], pa.bool_())))
        q = np.floor(np.asarray(rows, np.float64) * scale + 0.5).astype(
            np.int64)
        nt = np.maximum((q * q).sum(axis=1), 1).astype(np.float64)
        # float64 BLAS matmul is EXACT here: every partial sum is an
        # integer below 2^53, so summation order cannot change the result
        # — and it is ~10x the int64 non-BLAS path
        dots = q.astype(np.float64) @ e.T.astype(np.float64)
        sim = dots / np.sqrt(nt[:, None] * ne[None, :])
        best = sim.max(axis=1)
        batch = batch.append_column(
            "max_sim_milli",
            pa.array(np.floor(best * 1000.0 + 0.5).astype(np.int64)))
        return batch.append_column("contaminated",
                                   pa.array(best >= tau, pa.bool_()))

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def prototype_prune(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    iters: int = 4,
    drop_frac: float = 0.25,
    mode: str = "flag",
    init: "np.ndarray | None" = None,
):
    """D4-style prototypicality pruning (Sorscher et al. 2022 "Beyond
    neural scaling laws"; Tirumala et al. 2023 "D4"): cluster the
    embedding space, score every example by its cosine to the assigned
    centroid (its PROTOTYPICALITY — how redundant/easy it is), and drop
    the most prototypical ``drop_frac`` of EVERY cluster.  The published
    result: pruning easy/redundant examples beats random subsampling at
    equal token budget — this is the data-SELECTION member of the family
    next to semantic_dedup's pair-based removal.

    Exactness: scoring is per-row float64 (identical serially and
    distributed — no cross-row float reduction); the per-cluster
    threshold comes from an INTEGER histogram of milli-quantized scores
    (``proto_milli = floor(1000·cos + 0.5)``), so the cutoff is a pure
    function of the (cluster, proto_milli) multiset — partition- and
    order-invariant.  Ties AT the cutoff bin are all kept, so the
    realized drop count is the largest achievable ≤
    ``floor(drop_frac·n_c)`` per cluster (documented boundary).

    Scale shape: k-means via the bit-deterministic integer-micro-unit
    Lloyd (ann.kmeans_fit_distributed — k×d counters per block); the
    histogram pass pre-aggregates per batch then runs ONE keyed Sum
    groupby bounded by n_clusters×2001 rows; cutoffs (k ints) ship in
    the closure; the apply pass is a stateless map.  The corpus is
    scanned twice (histogram, then score+flag) and never materialized —
    the two-pass corpus-statistics shape of the reference's link
    classifier (link.go:276-364, G1-G3 relabel).  Pass an explicit
    ``init`` (e.g. ann.smallest_id_vectors) when oracle-exact
    conformance is required (see the kmeans init caveat).

    Output: input rows + (cluster int32, proto_milli int64, pruned
    bool); ``mode="filter"`` drops pruned rows instead."""
    from ray.data.aggregate import Sum

    from .ann import kmeans_fit_distributed

    if mode not in ("flag", "filter"):
        raise ValueError(f"mode must be 'flag' or 'filter', got {mode!r}")
    if not 0.0 <= drop_frac < 1.0:
        raise ValueError(f"drop_frac must be in [0, 1), got {drop_frac}")

    C = kmeans_fit_distributed(ds, n_centroids=n_clusters, iters=iters,
                               vec_col=vec_col, init=init)

    def _score(batch: pa.Table):
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if len(V) == 0:
            return (np.zeros(0, np.int32), np.zeros(0, np.int64))
        n = np.linalg.norm(V, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sims = (V / n) @ C.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(V)), assign]
        return (assign.astype(np.int32),
                np.floor(best * 1000.0 + 0.5).astype(np.int64))

    def partial_hist(batch: pa.Table) -> pa.Table:
        assign, milli = _score(batch)
        # combined key: cluster · 4096 + (milli + 1000) — milli ∈ [-1000, 1000]
        key, cnt = np.unique(assign.astype(np.int64) * 4096 + milli + 1000,
                             return_counts=True)
        return pa.table({"key": pa.array(key, pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())})

    hist = (ds.map_batches(partial_hist, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("key").aggregate(Sum("cnt", alias_name="n"))
            .to_pandas())  # ≤ n_clusters × 2001 rows

    per_cluster: dict[int, list[tuple[int, int]]] = {}
    for key, n in zip(hist["key"].to_numpy(), hist["n"].to_numpy()):
        per_cluster.setdefault(int(key) // 4096, []).append(
            (int(key) % 4096 - 1000, int(n)))
    cutoffs = np.full(n_clusters, 1002, dtype=np.int64)  # default: drop none
    for c, bins in per_cluster.items():
        total = sum(n for _, n in bins)
        drop_n = int(drop_frac * total)
        acc = 0
        for v, n in sorted(bins, reverse=True):
            if acc + n <= drop_n:
                acc += n
            else:
                cutoffs[c] = v  # rows strictly above v are dropped
                break

    def apply(batch: pa.Table) -> pa.Table:
        assign, milli = _score(batch)
        pruned = milli > cutoffs[assign] if len(milli) else \
            np.zeros(0, dtype=bool)
        batch = batch.append_column("cluster", pa.array(assign, pa.int32()))
        batch = batch.append_column("proto_milli",
                                    pa.array(milli, pa.int64()))
        batch = batch.append_column("pruned", pa.array(pruned, pa.bool_()))
        if mode == "filter":
            import pyarrow.compute as pc
            batch = batch.filter(pc.invert(batch.column("pruned")))
        return batch

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Fuzzy (edit-distance) near-dup pairs — the short-string dedup member
# ---------------------------------------------------------------------------

LEV_MAX_GROUP = 4096  # O(group²) verify guard (embedding-family convention)


def levenshtein_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_d: int = 3,
    max_group: int = LEV_MAX_GROUP,
):
    """All pairs with Levenshtein distance <= ``max_d`` — the typo/OCR-noise
    near-dup detector for SHORT strings (titles, transcripts, entity names;
    the n-gram/minhash families target long documents).

    Blocking is EXACT-recall length banding: distance <= max_d forces
    ``|len_a - len_b| <= max_d``, so with band width ``max_d + 1`` the two
    length floors differ by at most 1 — each row is emitted to its own
    floor and the floor below, guaranteeing every qualifying pair shares a
    bucket.  A pair is verified only in bucket ``min(floor_a, floor_b)``
    (single emission), with the banded Ukkonen kernel
    (functions/similarity.banded_levenshtein, O(len · max_d)).

    Scale: the exchange carries (bucket, id, text) twice per row.  Within a
    group the quadratic candidate space is crossed by a VECTORIZED
    char-frequency prune first (one edit moves the hashed-class-count L1 by
    at most 2, so L1 <= 2·max_d is a necessary condition — blocked numpy,
    never a dense m×m×classes tensor); only survivors pay the Python DP.
    Groups beyond ``max_group`` are skipped (the EMBED_MAX_GROUP
    convention: a degenerate all-same-length all-same-histogram corpus must
    not O(n²) one worker; pre-partition such corpora by a content key
    first)."""
    import pandas as pd

    from ..functions.similarity import banded_levenshtein

    width = max_d + 1

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        floors = [len(t) // width for t in texts]
        out_b, out_i, out_t = [], [], []
        for i, t, f in zip(ids, texts, floors):
            for b in (f, f - 1):
                if b >= 0:
                    out_b.append(b)
                    out_i.append(i)
                    out_t.append(t)
        return pa.table(
            {
                "bucket": pa.array(out_b, pa.int64()),
                id_col: pa.array(out_i),
                text_col: pa.array(out_t, pa.string()),
            }
        )

    n_classes = 4  # hashed char classes: few enough that the m×m L1 is
    # four numpy passes, partitioned enough that random non-dups blow the
    # 2·max_d budget almost surely (survivors go straight to the DP, whose
    # row-min early exit kills them in ~max_d rows)

    def per_group(g: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {"id_a": np.array([], dtype=g[id_col].dtype),
             "id_b": np.array([], dtype=g[id_col].dtype),
             "dist": np.array([], dtype=np.int64)}
        )
        if len(g) > max_group or len(g) < 2:
            return empty
        g = g.sort_values(id_col)
        bucket = int(g["bucket"].iloc[0])
        ids = g[id_col].to_numpy()
        texts = g[text_col].to_list()
        m = len(ids)
        lens = np.fromiter((len(t) for t in texts), np.int64, count=m)
        floors = lens // width
        # char-frequency prune matrix: one edit changes the class-count L1
        # by at most 2 (substitution: two counts move 1 each; indel: one),
        # so qualifying pairs satisfy L1 <= 2*max_d — a NECESSARY condition
        # that lets numpy discard the quadratic bulk before any DP runs
        counts = np.zeros((m, n_classes), dtype=np.int32)
        for i, t in enumerate(texts):
            if t:
                cps = np.frombuffer(t.encode("utf-32-le"), np.uint32)
                counts[i] = np.bincount(cps % n_classes, minlength=n_classes)
        out_a, out_b, out_d = [], [], []
        block = 512  # rows per L1 block: peak extra memory block × m int32
        for s in range(0, m, block):
            e = min(s + block, m)
            l1 = np.zeros((e - s, m), dtype=np.int32)
            for c in range(n_classes):
                l1 += np.abs(counts[s:e, c:c + 1] - counts[None, :, c])
            cand = (
                (l1 <= 2 * max_d)
                & (np.abs(lens[s:e, None] - lens[None, :]) <= max_d)
                & (np.minimum(floors[s:e, None], floors[None, :]) == bucket)
            )
            # strict upper triangle in GLOBAL index space (verify once)
            cand &= np.arange(m)[None, :] > np.arange(s, e)[:, None]
            for bi, bj in zip(*np.nonzero(cand)):
                i, j = s + int(bi), int(bj)
                if ids[i] == ids[j]:
                    continue  # the same row met through both its buckets
                d = banded_levenshtein(texts[i], texts[j], max_d)
                if d <= max_d:
                    a, b = sorted((ids[i], ids[j]))
                    out_a.append(a)
                    out_b.append(b)
                    out_d.append(d)
        if not out_a:
            return empty
        return pd.DataFrame(
            {"id_a": out_a, "id_b": out_b, "dist": np.asarray(out_d, np.int64)}
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return exploded.groupby("bucket").map_groups(per_group, batch_format="pandas")


def url_canonical_dedup(ds, url_col: str = "url", id_col: str = "doc_id"):
    """Canonical-URL dedup — the crawl-frontier key (reference context:
    the seen-set the crawler checks, /root/reference/spider.go wave
    loop, generalized from exact string match to RFC 3986 §6 syntax
    normalization): syntactic variants of one resource (host case,
    tracking params, param order, fragments, default ports, duplicate /
    trailing slashes) collapse to one canonical string BEFORE the dedup
    exchange, so a 100 TB crawl does not refetch or double-count the
    utm-tagged copy of every page.

    One pure map appends the canonical form
    (functions/urlfilter.canonicalize_url), then one keyed shuffle on
    the canonical string (groups are variant-sized, tiny — no salting
    needed) with native Min/Count aggregates: zero per-group Python.
    Returns (canon_url, winner_id = smallest id, n_variants)."""
    from ray.data.aggregate import Count, Min

    from ..functions.urlfilter import canonicalize_url

    def canon(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        return pa.table({
            id_col: batch.column(id_col),
            "canon_url": pa.array([canonicalize_url(u or "") for u in urls],
                                  pa.string()),
        })

    return (
        ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("canon_url")
        .aggregate(Min(id_col, alias_name="winner_id"),
                   Count(alias_name="n_variants"))
    )


def suffix_prefix_pairs(ds, k: int = 8, text_col: str = "text",
                        id_col: str = "doc_id", max_key_group: int = 1000):
    """Pagination-stitch detection: pairs (a, b) where the LAST ``k``
    whitespace tokens of a equal the FIRST ``k`` tokens of b — the
    signature of one article split across pages (page 1 ends with the
    teaser sentence page 2 opens with).  The chaining companion of the
    near-dup families: those find the same document twice, this finds
    the two halves of one document so a stitcher can rejoin them.

    Shape: one pure map emits per doc its head and tail k-token boundary
    strings (docs with < k tokens emit nothing), then ONE keyed exchange
    on the boundary string pairs tails with heads per key; a boilerplate
    boundary (navigation text) shared by > ``max_key_group`` docs emits
    nothing for that key — the hot-key cap every pair family carries.
    Self-pairs are excluded (a k-token doc is its own head and tail).
    Emits (id_a, id_b, boundary) — a's tail, b's head."""
    import pandas as pd

    def boundaries(batch: pa.Table) -> pa.Table:
        ids_out, keys, sides = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = (t or "").split()
            if len(toks) < k:
                continue
            ids_out.append(i)
            keys.append(" ".join(toks[-k:]))
            sides.append(0)  # tail
            ids_out.append(i)
            keys.append(" ".join(toks[:k]))
            sides.append(1)  # head
        id_t = batch.schema.field(id_col).type
        return pa.table({
            id_col: pa.array(ids_out, id_t),
            "boundary": pa.array(keys, pa.string()),
            "side": pa.array(sides, pa.int8()),
        })

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        """ALL boundary groups of one partition in one vectorized pass
        (sort by boundary, align tails with heads, cumsum-expand each
        group's cartesian product) — a per-boundary map_groups paid
        Ray's per-group machinery on thousands of tiny groups and
        dominated the operator's wall time at sf0.1."""
        empty = pd.DataFrame({
            "id_a": np.array([], dtype=g[id_col].dtype),
            "id_b": np.array([], dtype=g[id_col].dtype),
            "boundary": np.array([], dtype=object)})
        tails = g[g["side"] == 0].sort_values("boundary", kind="mergesort")
        heads = g[g["side"] == 1].sort_values("boundary", kind="mergesort")
        if tails.empty or heads.empty:
            return empty
        t_uniq, t_start, t_cnt = np.unique(tails["boundary"].to_numpy(),
                                           return_index=True,
                                           return_counts=True)
        h_uniq, h_start, h_cnt = np.unique(heads["boundary"].to_numpy(),
                                           return_index=True,
                                           return_counts=True)
        common, ti, hi = np.intersect1d(t_uniq, h_uniq,
                                        return_indices=True)
        if not len(common):
            return empty
        nt, nh = t_cnt[ti], h_cnt[hi]
        ok = (nt + nh) <= max_key_group  # hot boilerplate boundaries
        common, nt, nh = common[ok], nt[ok], nh[ok]
        ts0, hs0 = t_start[ti][ok], h_start[hi][ok]
        ppg = nt * nh
        total = int(ppg.sum())
        if total == 0:
            return empty
        pair_base = np.repeat(np.cumsum(ppg) - ppg, ppg)
        pair_in_g = np.arange(total) - pair_base
        nh_rep = np.repeat(nh, ppg)
        t_idx = np.repeat(ts0, ppg) + pair_in_g // nh_rep
        h_idx = np.repeat(hs0, ppg) + pair_in_g % nh_rep
        A = tails[id_col].to_numpy()[t_idx]
        B = heads[id_col].to_numpy()[h_idx]
        bnd = np.repeat(common, ppg)
        keep = A != B
        if not keep.any():
            return empty
        return pd.DataFrame({"id_a": A[keep], "id_b": B[keep],
                             "boundary": bnd[keep]})

    from .windows import _add_part

    rows = ds.map_batches(boundaries, batch_format="pyarrow",
                          zero_copy_batch=True)
    return (_add_part(rows, "boundary", 32).groupby("__part")
            .map_groups(pairs_in_part, batch_format="pandas"))
