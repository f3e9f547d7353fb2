"""Similarity search over an embedding column (engine addition).

``brute_force_topk``: the baseline — the query matrix is broadcast once via
``ray.put`` and read inside every task (never re-shipped per batch); each
batch computes a float64 matmul and emits only its local top-k, so the
all-reduce is k rows per batch, not the corpus.  Final merge is a tiny
driver-side sort.

``lsh_topk``: the scale path — random-hyperplane sign buckets (fixed seed →
identical planes on every worker) prune the corpus to buckets near the
query's bucket (hamming radius <= 1 over the bucket bits) before the exact
rerank.  Approximate: recall depends on n_planes/radius; documented tradeoff.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

N_PLANES = 12
_PLANE_SEED = 20240817


def _planes(dim: int) -> np.ndarray:
    return np.random.default_rng(_PLANE_SEED).standard_normal((N_PLANES, dim))


def _bucket_of(V: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (V @ planes.T) > 0
    out = np.zeros(len(V), dtype=np.int64)
    for i in range(planes.shape[0]):
        out |= bits[:, i].astype(np.int64) << i
    return out


def brute_force_topk(
    ds,
    query_vec: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k of one query against the corpus → DataFrame
    (vec_id, cos) sorted by (-cos, vec_id)."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        cos = (V @ qv) / norms
        ids = batch.column(id_col).to_numpy()
        order = np.lexsort((ids, -cos))[:k]
        return pa.table({id_col: ids[order], "cos": cos[order]})

    local = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    df = local.to_pandas()  # k rows per block — tiny
    df = df.sort_values(["cos", id_col], ascending=[False, True], kind="mergesort")
    return df.head(k).reset_index(drop=True)


def lsh_buckets(ds, vec_col: str = "embedding"):
    """Append the hyperplane-sign bucket column (the IVF-ish coarse index;
    also the partition key for embedding_near_dup_pairs at scale)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if len(V) == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
        planes = _planes(V.shape[1])
        return batch.append_column("bucket", pa.array(_bucket_of(V, planes), pa.int64()))

    return ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)


def lsh_topk(
    ds,
    query_vec: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    radius: int = 1,
) -> pd.DataFrame:
    """Bucketed approximate top-k: scan only rows whose bucket is within
    hamming ``radius`` of the query bucket, then exact-rerank."""
    q = np.asarray(query_vec, dtype=np.float64)
    dim = len(q)
    planes = _planes(dim)
    qb = int(_bucket_of(q.reshape(1, -1), planes)[0])
    ok_buckets = {qb}
    if radius >= 1:
        for i in range(N_PLANES):
            ok_buckets.add(qb ^ (1 << i))
    ok = pa.array(sorted(ok_buckets), pa.int64())

    import pyarrow.compute as pc

    pruned = lsh_buckets(ds, vec_col).map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=ok)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return brute_force_topk(pruned, q, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# IVF: k-means coarse quantizer (the FAISS-style scale path beside LSH)
# ---------------------------------------------------------------------------

_IVF_SEED = 20250817


def spherical_kmeans(V: np.ndarray, n_centroids: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means over a (normalized) sample matrix —
    the pure-numpy core shared by ``ivf_train`` (distributed sample) and the
    serial oracle path (same matrix → bit-identical centroids)."""
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    V = V / norms
    k = min(n_centroids, len(V))
    rng = np.random.default_rng(_IVF_SEED)
    C = V[rng.choice(len(V), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(V @ C.T, axis=1)  # cosine on unit vectors
        for c in range(k):
            members = V[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[c] = m / n
    return C


def kmeans_fit_distributed(ds, n_centroids: int = 16, iters: int = 5,
                           vec_col: str = "embedding",
                           scale_bits: int = 20,
                           init: "np.ndarray | None" = None) -> np.ndarray:
    """FULL-CORPUS spherical k-means: assignment and per-cluster partial
    sums run distributed (map_batches), only (k × d) counters return per
    block, the driver merges and re-normalizes — Lloyd over the whole
    corpus, unlike ``ivf_train``'s bounded driver sample.

    Bit-deterministic BY CONSTRUCTION: member vectors are accumulated as
    integer micro-units (``round(v_norm · 2^scale_bits)`` in int64), so
    the reduction is exact and ORDER-INDEPENDENT — any block partitioning
    (or a serial pass) produces identical centroids, which makes the
    distributed run oracle-checkable against a serial reference.  Init =
    the first ``n_centroids`` corpus rows (normalized), deterministic.
    Empty clusters keep their previous centroid.

    CAVEAT on the default init: ``limit(k)`` takes the first k rows in
    BLOCK order, which Ray does not guarantee equals file/row order for a
    multi-block read (observed: a sf0.1 parquet read yields block 0
    starting at row 4376).  It is stable per corpus — fine standalone —
    but an external serial twin cannot reproduce it; pass an explicit
    ``init`` (k × d raw vectors, e.g. the k smallest ids' vectors) when
    oracle-exact conformance is required."""
    import ray

    if init is not None:
        C = np.asarray(init, dtype=np.float64).copy()
    else:
        head = ds.limit(n_centroids).to_pandas()
        C = np.array(head[vec_col].to_list(), dtype=np.float64)
    norms = np.linalg.norm(C, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    C = C / norms
    k, d = C.shape
    scale = float(1 << scale_bits)

    for _ in range(iters):
        c_ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            Cc = ray.get(c_ref)
            V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
            if len(V) == 0:
                return pa.table({"cluster": pa.array([], pa.int32()),
                                 "count": pa.array([], pa.int64()),
                                 "sums": pa.array([], pa.list_(pa.int64()))})
            n = np.linalg.norm(V, axis=1, keepdims=True)
            n[n == 0] = 1.0
            Vn = V / n
            assign = np.argmax(Vn @ Cc.T, axis=1)
            q = np.round(Vn * scale).astype(np.int64)  # exact int accumulation
            clusters, counts, sums = [], [], []
            for c in np.unique(assign):
                members = q[assign == c]
                clusters.append(int(c))
                counts.append(int(len(members)))
                sums.append(members.sum(axis=0).tolist())
            return pa.table({"cluster": pa.array(clusters, pa.int32()),
                             "count": pa.array(counts, pa.int64()),
                             "sums": pa.array(sums, pa.list_(pa.int64()))})

        tot_count = np.zeros(k, dtype=np.int64)
        tot_sum = np.zeros((k, d), dtype=np.int64)
        for b in ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow"):
            for c, cnt, s in zip(b.column("cluster").to_pylist(),
                                 b.column("count").to_pylist(),
                                 b.column("sums").to_pylist()):
                tot_count[c] += cnt
                tot_sum[c] += np.asarray(s, dtype=np.int64)

        for c in range(k):
            if tot_count[c]:
                m = tot_sum[c].astype(np.float64) / (tot_count[c] * scale)
                nm = np.linalg.norm(m)
                if nm > 0:
                    C[c] = m / nm
    return C


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Append ``cluster`` = nearest-centroid id (cosine) — same broadcast
    shape as ivf_assign, for corpus-trained centroids."""
    import ray

    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if len(V) == 0:
            return batch.append_column("cluster", pa.array([], pa.int32()))
        n = np.linalg.norm(V, axis=1, keepdims=True)
        n[n == 0] = 1.0
        cl = np.argmax((V / n) @ C.T, axis=1).astype(np.int32)
        return batch.append_column("cluster", pa.array(cl))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def ivf_train(ds, n_centroids: int = 64, sample_size: int = 10_000,
              vec_col: str = "embedding", iters: int = 10) -> np.ndarray:
    """Train a spherical k-means coarse quantizer on a corpus sample
    (driver-side Lloyd iterations — the sample is bounded, the corpus is
    not).  Deterministic: fixed seed + a LIMIT sample, so every run/worker
    agrees on the centroids.  Returns unit-norm centroids (n_centroids × d)
    for ray.put broadcast."""
    sample = ds.limit(sample_size).to_pandas()
    V = np.array(sample[vec_col].to_list(), dtype=np.float64)
    return spherical_kmeans(V, n_centroids, iters)


def ivf_assign(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Append ``ivf_cell`` = nearest-centroid id (cosine).  Centroids are
    broadcast once via ray.put and read per task."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if len(V) == 0:
            return batch.append_column("ivf_cell", pa.array([], pa.int32()))
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cell = np.argmax((V / norms) @ C.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(cell))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# PQ: product quantization with asymmetric-distance (ADC) scan — the
# compressed-vector scale path (Jégou, Douze, Schmid 2011).  At 10^12 rows
# the float corpus cannot be rescanned per query; m uint8 codes per vector
# (64 B float32 → 8 B at m=8) make the scan memory-bound-cheap, and the
# codebooks (m × n_codes × d/m floats) broadcast once via ray.put.
# ---------------------------------------------------------------------------

_PQ_BUCKETS = 10_000


def _pq_member_mask(ids: np.ndarray, cut_buckets: int, salt: str = "pq") -> np.ndarray:
    """Deterministic, partition-invariant sample membership: md5 bucket of
    'salt:id' below ``cut_buckets`` (same arithmetic as stats.split_bucket —
    stable across processes, partitionings and the serial twin)."""
    import hashlib

    out = np.empty(len(ids), dtype=bool)
    for i, v in enumerate(ids):
        h = hashlib.md5(f"{salt}:{v}".encode("utf-8")).hexdigest()[:8]
        out[i] = int(h, 16) % _PQ_BUCKETS < cut_buckets
    return out


def _unit_rows(V: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(V, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return V / n


def _l2_kmeans(V: np.ndarray, n_codes: int, iters: int = 10) -> np.ndarray:
    """Deterministic plain-L2 Lloyd (init = first ``n_codes`` rows, ties →
    lowest code, empty clusters keep their centroid).  Pure-numpy kernel
    shared by the distributed trainer and the serial oracle — same input
    matrix → bit-identical codebook."""
    k = min(n_codes, len(V))
    C = V[:k].copy()
    for _ in range(iters):
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = V[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C


def _pq_split(d: int, m: int) -> list[tuple[int, int]]:
    """Subspace column ranges: d must divide evenly into m (the embeddings
    here are 64-d; pad upstream if you bring an indivisible dim)."""
    if d % m:
        raise ValueError(f"dim {d} not divisible into m={m} subspaces")
    sub = d // m
    return [(j * sub, (j + 1) * sub) for j in range(m)]


def pq_train(ds, m: int = 8, n_codes: int = 16, sample_size: int = 2000,
             iters: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", salt: str = "pq") -> np.ndarray:
    """Train per-subspace L2 codebooks on a DETERMINISTIC bounded corpus
    sample: membership = md5('salt:id') bucket below a cut sized from
    ds.count() (partition-invariant, twin-reproducible — unlike limit(),
    whose block order Ray does not pin; see kmeans_fit_distributed's
    caveat); members collect to the driver (≈4× sample_size rows, bounded),
    sort by id, truncate to ``sample_size``.  Vectors are unit-normalized
    before training so PQ L2 rank ≈ cosine rank (matches brute_force_topk).
    Returns codebooks (m × n_codes × d/m) for ray.put broadcast."""
    n = ds.count()
    frac = min(1.0, (4.0 * sample_size) / max(n, 1))
    cut = min(_PQ_BUCKETS, int(np.ceil(_PQ_BUCKETS * frac)))

    def members(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        mask = _pq_member_mask(ids, cut, salt)
        return batch.filter(pa.array(mask))

    df = ds.map_batches(members, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    df = df.sort_values(id_col, kind="mergesort").head(sample_size)
    V = _unit_rows(np.array(df[vec_col].to_list(), dtype=np.float64))
    ranges = _pq_split(V.shape[1], m)
    return np.stack([_l2_kmeans(V[:, a:b], n_codes, iters)
                     for a, b in ranges])


def pq_encode_matrix(V: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Encode a raw vector matrix to (n × m) uint8 codes (unit-normalizes
    first, same arithmetic as pq_train; ties → lowest code).  Shared
    engine/oracle kernel."""
    V = _unit_rows(np.asarray(V, dtype=np.float64))
    m = codebooks.shape[0]
    ranges = _pq_split(V.shape[1], m)
    codes = np.empty((len(V), m), dtype=np.uint8)
    for j, (a, b) in enumerate(ranges):
        d2 = ((V[:, a:b, None] - codebooks[j].T[None, :, :]) ** 2).sum(axis=1)
        codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def pq_encode(ds, codebooks: np.ndarray, vec_col: str = "embedding",
              code_col: str = "pq_code"):
    """Append the m-byte PQ code column (binary).  Codebooks broadcast once
    via ray.put; the payload column can then be dropped — the scan works
    off codes alone."""
    cb_ref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(code_col, pa.array([], pa.binary()))
        cb = ray.get(cb_ref)
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        codes = pq_encode_matrix(V, cb)
        return batch.append_column(
            code_col, pa.array([r.tobytes() for r in codes], pa.binary()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def adc_lut(query_vec: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Asymmetric-distance lookup table: LUT[j, c] = ||q_j − C[j,c]||² for
    the unit-normalized query.  (m × n_codes) float64; dist(row) =
    Σ_j LUT[j, code_j] — one gather+sum per row, no float payload touched."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    m = codebooks.shape[0]
    ranges = _pq_split(len(q), m)
    return np.stack([((codebooks[j] - q[a:b][None, :]) ** 2).sum(axis=1)
                     for j, (a, b) in enumerate(ranges)])


def adc_distances(codes: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """(n × m) uint8 codes × (m × n_codes) LUT → n float64 ADC distances.
    Fixed gather/sum order — bit-identical across partitionings."""
    m = lut.shape[0]
    return lut[np.arange(m)[None, :], codes].sum(axis=1)


def pq_topk(ds, query_vec: np.ndarray, codebooks: np.ndarray, k: int = 10,
            vec_col: str = "embedding", id_col: str = "vec_id",
            code_col: str | None = None, refine: int = 0) -> pd.DataFrame:
    """PQ-ADC approximate top-k: each batch encodes (or reads ``code_col``
    if pre-encoded), gathers ADC distances from the broadcast LUT and emits
    only its local top rows — k (or ``refine``) rows per batch reach the
    driver regardless of corpus size.  With ``refine`` > k, a second pruned
    pass reranks the ADC candidates by exact cosine (the true vectors never
    leave their blocks)."""
    cb = np.asarray(codebooks, dtype=np.float64)
    lut_ref = ray.put(adc_lut(query_vec, cb))
    cb_ref = ray.put(cb)
    m = cb.shape[0]
    take = max(k, refine)

    def local(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], batch.schema.field(id_col).type),
                             "adc_dist": pa.array([], pa.float64())})
        if code_col is not None:
            codes = np.frombuffer(
                b"".join(batch.column(code_col).to_pylist()), dtype=np.uint8
            ).reshape(-1, m)
        else:
            V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
            codes = pq_encode_matrix(V, ray.get(cb_ref))
        dists = adc_distances(codes, lut)
        ids = batch.column(id_col).to_numpy()
        order = np.lexsort((ids, dists))[:take]
        return pa.table({id_col: pa.array(ids[order]),
                         "adc_dist": pa.array(dists[order], pa.float64())})

    df = ds.map_batches(local, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()  # ≤take rows/block
    df = df.sort_values(["adc_dist", id_col], ascending=[True, True],
                        kind="mergesort").head(take).reset_index(drop=True)
    if refine <= k:
        return df.head(k)
    import pyarrow.compute as pc

    cand = pa.array(sorted(df[id_col].tolist()))
    pruned = ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=cand)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return brute_force_topk(pruned, query_vec, k, vec_col, id_col)


def ivf_topk(
    ds,
    query_vec: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """IVF approximate top-k: scan only the ``n_probe`` cells nearest the
    query, exact-rerank inside them.  Recall rises with n_probe (n_probe =
    n_centroids degenerates to brute force)."""
    import pyarrow.compute as pc

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    C = np.asarray(centroids, dtype=np.float64)
    probe = np.argsort(-(C @ qn))[: max(n_probe, 1)].astype(np.int32)
    ok = pa.array(sorted(int(c) for c in probe), pa.int32())

    pruned = ivf_assign(ds, C, vec_col).map_batches(
        lambda t: t.filter(pc.is_in(t["ivf_cell"], value_set=ok)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return brute_force_topk(pruned, q, k, vec_col, id_col)


def smallest_id_vectors(ds, k: int, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> np.ndarray:
    """Deterministic k-means init: the RAW vectors of the ``k`` smallest
    ids, in id order.  Per-block local bottom-k then a driver merge of
    ≤ k·n_blocks (id, vector) rows — partition-layout-invariant, unlike
    ``limit(k)``'s block-order dependence (the caveat documented on
    kmeans_fit_distributed), so an external serial oracle can reproduce
    the init exactly."""

    def local(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, vec_col])
        ids = t.column(id_col).to_numpy()
        order = np.argsort(ids, kind="stable")[:k]
        return t.take(pa.array(order, pa.int64()))

    df = ds.map_batches(local, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    df = df.sort_values(id_col, kind="mergesort").head(k)
    return np.array(df[vec_col].to_list(), dtype=np.float64)


def mmr_topk(
    ds,
    query_vec: np.ndarray,
    k: int = 10,
    lamb_milli: int = 700,
    n_candidates: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Maximal-Marginal-Relevance diverse top-k (Carbonell & Goldstein
    1998): rank by ``λ·rel(q,i) − (1−λ)·max_{s∈S} sim(i,s)`` so the
    result set trades query relevance against redundancy with what is
    already selected — the retrieval-side counterpart of near-dedup (a
    plain top-k returns five near-copies of the best hit; MMR returns
    one plus four distinct neighborhoods).

    Scale shape: per-block exact top-``n_candidates`` by query cosine
    (the brute_force_topk local stage, query broadcast once) → driver
    merge of ≤ C·n_blocks rows → greedy selection over the C-candidate
    set.  C bounds driver memory and the O(C²) pairwise table + O(k·C)
    greedy selection regardless of
    corpus size; documented approximation — an item outside the top-C
    relevance pool can never be selected.

    Determinism: query and pairwise cosines quantize to milli units
    BEFORE scoring, so the greedy arithmetic is integer-exact
    (``mmr_milli = lamb·rel − (1000−lamb)·red``) and ties break on min
    id — the selection is a pure function of the candidate set, which is
    itself partition-invariant (exact float sort, id tiebreak).  With
    ``lamb_milli=1000`` MMR degenerates to plain top-k over milli sims.

    Returns a DataFrame (rank, vec_id, sim_milli, mmr_milli) in
    selection order."""
    if not 0 <= lamb_milli <= 1000:
        raise ValueError(f"lamb_milli must be in [0, 1000], got {lamb_milli}")
    if k > n_candidates:
        raise ValueError(f"k={k} exceeds n_candidates={n_candidates}")
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)
    C = n_candidates

    def local(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if len(V) == 0:
            return batch.select([id_col, vec_col]).append_column(
                "cos", pa.array([], pa.float64()))
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        cos = (V @ qv) / norms
        ids = batch.column(id_col).to_numpy()
        order = np.lexsort((ids, -cos))[:C]
        t = batch.select([id_col, vec_col]).take(pa.array(order, pa.int64()))
        return t.append_column("cos", pa.array(cos[order], pa.float64()))

    cand = ds.map_batches(local, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    cand = cand.sort_values(["cos", id_col], ascending=[False, True],
                            kind="mergesort").head(C).reset_index(drop=True)
    ids = cand[id_col].to_numpy().astype(np.int64)
    V = np.array(cand[vec_col].to_list(), dtype=np.float64)
    if len(V) == 0:
        return pd.DataFrame({"rank": pd.array([], dtype="int64"),
                             id_col: pd.array([], dtype="int64"),
                             "sim_milli": pd.array([], dtype="int64"),
                             "mmr_milli": pd.array([], dtype="int64")})
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    Vn = V / norms
    rel = np.floor(cand["cos"].to_numpy() * 1000.0 + 0.5).astype(np.int64)
    P = np.floor(Vn @ Vn.T * 1000.0 + 0.5).astype(np.int64)

    selected: list[int] = []
    remaining = np.ones(len(ids), dtype=bool)
    scores: list[int] = []
    for _ in range(min(k, len(ids))):
        red = (P[:, selected].max(axis=1) if selected
               else np.zeros(len(ids), dtype=np.int64))
        mmr = lamb_milli * rel - (1000 - lamb_milli) * red
        mmr_masked = np.where(remaining, mmr, np.iinfo(np.int64).min)
        # min id among the score-tied argmax candidates
        tie_idx = np.nonzero((mmr_masked == mmr_masked.max()) & remaining)[0]
        pick = int(tie_idx[np.argmin(ids[tie_idx])])
        selected.append(pick)
        remaining[pick] = False
        scores.append(int(mmr[pick]))
    return pd.DataFrame({
        "rank": pd.array(range(len(selected)), dtype="int64"),
        id_col: pd.array(ids[selected], dtype="int64"),
        "sim_milli": pd.array(rel[selected], dtype="int64"),
        "mmr_milli": pd.array(scores, dtype="int64"),
    })


def batch_topk(ds, query_matrix: np.ndarray, k: int = 10,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> pd.DataFrame:
    """MULTI-query exact cosine top-k — the batched retrieval shape
    (an eval set, a dedup probe list, a RAG query batch) that
    brute_force_topk's one-query form doesn't cover: the whole query
    matrix broadcasts ONCE via ray.put, each block computes ONE n×q
    matmul and emits its local top-k PER QUERY (≤ q·k rows per block),
    the driver merges per query.  Corpus crosses nothing; driver traffic
    is q·k·n_blocks rows regardless of corpus size.

    Determinism: similarities are computed per query column from the
    shared matmul and quantized to milli units in the output
    (``sim_milli``); ties and the final order break on (query_idx,
    −cos, id) with exact float64 sims internally — the same arithmetic
    a serial pass produces.  Returns (query_idx, rank, vec_id,
    sim_milli) sorted by (query_idx, rank)."""
    Q = np.asarray(query_matrix, dtype=np.float64)
    if Q.ndim != 2 or len(Q) == 0:
        raise ValueError("batch_topk: query_matrix must be (q, d) and "
                         "non-empty")
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn
    q_ref = ray.put(Qn)
    nq = len(Qn)

    def local(batch: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if len(V) == 0:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        S = (V / norms) @ Qm.T                     # n × q
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        qi, oi, oc = [], [], []
        for j in range(Qm.shape[0]):
            order = np.lexsort((ids, -S[:, j]))[:k]
            qi.extend([j] * len(order))
            oi.extend(ids[order].tolist())
            oc.extend(S[order, j].tolist())
        return pa.table({"query_idx": pa.array(qi, pa.int64()),
                         id_col: pa.array(oi, pa.int64()),
                         "cos": pa.array(oc, pa.float64())})

    df = ds.map_batches(local, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    out = []
    for j in range(nq):
        g = (df[df["query_idx"] == j]
             .sort_values(["cos", id_col], ascending=[False, True],
                          kind="mergesort").head(k))
        out.append(pd.DataFrame({
            "query_idx": np.full(len(g), j, dtype=np.int64),
            "rank": np.arange(len(g), dtype=np.int64),
            id_col: g[id_col].to_numpy(),
            "sim_milli": np.floor(g["cos"].to_numpy() * 1000.0
                                  + 0.5).astype(np.int64),
        }))
    return pd.concat(out, ignore_index=True)


def ann_recall(ds, query_matrix: np.ndarray, k: int = 10,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> pd.DataFrame:
    """ANN quality-assurance card: recall@k of the approximate scale
    paths (LSH buckets, IVF probes) against the exact batched top-k
    ground truth, per query — the eval harness that tells a corpus
    owner whether the fast path is safe to switch on.  Sampled-queries
    shape: each approximate method scans the corpus once per query
    through its own pruned path (eval-set sized by contract — this is a
    QA probe, not the production retrieval path).  recall_ppm =
    |approx ∩ exact|·1e6 // k, integer-exact."""
    Q = np.asarray(query_matrix, dtype=np.float64)
    exact = batch_topk(ds, Q, k=k, vec_col=vec_col, id_col=id_col)
    C = ivf_train(ds, n_centroids=16, sample_size=2000, vec_col=vec_col)
    rows = []
    for j in range(len(Q)):
        truth = set(exact[exact["query_idx"] == j][id_col])
        for method in ("lsh", "ivf"):
            if method == "lsh":
                got = set(lsh_topk(ds, Q[j], k=k, vec_col=vec_col,
                                   id_col=id_col)[id_col])
            else:
                got = set(ivf_topk(ds, Q[j], C, k=k, n_probe=4,
                                   vec_col=vec_col, id_col=id_col)[id_col])
            rows.append((method, j,
                         len(got & truth) * 1_000_000 // max(k, 1)))
    return pd.DataFrame({
        "method": pd.array([r[0] for r in rows], dtype="object"),
        "query_idx": pd.array([r[1] for r in rows], dtype="int64"),
        "recall_ppm": pd.array([r[2] for r in rows], dtype="int64"),
    }).sort_values(["method", "query_idx"]).reset_index(drop=True)


def paired_cosine_filter(ds, col_a: str, col_b: str, id_cols: list[str],
                         min_sim: float = 0.9, scale: int = 1000):
    """Cross-modal pair-consistency gate — the CLAP/CLIP-score filter of
    DataComp-style curation: per ROW, the cosine between two embedding
    list columns (audio-vs-transcript, image-vs-caption embeddings from a
    two-tower model actor upstream), flagging pairs whose representations
    disagree (swapped / mislabeled pairs → the drop or re-annotation
    queue).  Purely row-local: zero shuffle, embarrassingly parallel
    map_batches; at 10^12 clips the only cost is the upstream embedding
    actors.

    Integer-exact determinism (the repo's embedding-cosine discipline):
    both vectors quantize to ``scale`` units, so every dot and norm is an
    exact integer-valued double in ANY summation order (BLAS-safe); the
    one inexact product nn_a·nn_b and the sqrt/divide are single
    correctly-rounded IEEE ops, so an independent SQL restatement of the
    same op order reproduces ``sim_milli`` and the flag bit-for-bit.

    Emits (*id_cols, sim_milli:int64, mismatch:bool)."""

    def fn(batch: pa.Table) -> pa.Table:
        A = np.asarray(batch.column(col_a).to_pylist(), dtype=np.float64)
        B = np.asarray(batch.column(col_b).to_pylist(), dtype=np.float64)
        if batch.num_rows == 0:
            return pa.table({**{c: batch.column(c) for c in id_cols},
                             "sim_milli": pa.array([], pa.int64()),
                             "mismatch": pa.array([], pa.bool_())})
        A = np.floor(A * scale + 0.5)
        B = np.floor(B * scale + 0.5)
        dot = (A * B).sum(axis=1)
        nn_a = np.maximum((A * A).sum(axis=1), 1.0)
        nn_b = np.maximum((B * B).sum(axis=1), 1.0)
        sim = dot / np.sqrt(nn_a * nn_b)
        out = {c: batch.column(c) for c in id_cols}
        out["sim_milli"] = pa.array(
            np.floor(sim * 1000 + 0.5).astype(np.int64))
        out["mismatch"] = pa.array(sim < min_sim, pa.bool_())
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


MNN_SCALE = 1000  # milli-unit vector quantization for the integer cosine
MNN_MAX_SIDE = 500_000  # broadcast-side cap (rows) — IVF-bucket beyond


def mutual_nn_pairs(ds_a, ds_b, vec_col: str = "embedding",
                    id_col: str = "vec_id",
                    max_broadcast: int = MNN_MAX_SIDE):
    """Mutual-nearest-neighbor pair mining across two embedding sets —
    the bitext/parallel-corpus mining shape (LASER / CCMatrix: Artetxe &
    Schwenk 2019, simplified from margin scoring to mutual top-1): keep
    (a, b) exactly when b is a's cosine top-1 in B AND a is b's top-1 in
    A.  Mutuality is the cheap high-precision filter that one-directional
    top-1 lacks (a hub vector is many rows' top-1 but reciprocates once).

    Scale shape: the B side (ids + milli-quantized int32 matrix +
    integer squared norms) builds driver-side under a LOUD
    ``max_broadcast`` cap and broadcasts ONCE via ray.put — beyond the
    cap, IVF-bucket both sides (ivf_train/ivf_assign) and mine per
    bucket.  A streams through ONE map emitting (a) its own top-1 row
    per A-row and (b) a |B|-bounded per-block partial of B's best-seen-A
    — then a SINGLE groupby on b resolves both directions at once;
    nothing corpus-sized lands on the driver and the probe pass runs
    exactly once.

    Determinism: cosine is exact-integer ppm — (1e6 · <qa, qb>) //
    isqrt(|qa|² · |qb|²) on milli-quantized vectors (int64-safe to
    d ≈ 10⁵) — ties break to the smallest candidate id on BOTH
    directions.  Zero vectors score 0 against everything.  Returns a
    Dataset (id_a, id_b, cos_ppm)."""
    import ray

    b_tbl = ds_b.select_columns([id_col, vec_col]).to_pandas()
    if len(b_tbl) > max_broadcast:
        raise ValueError(
            f"mutual_nn_pairs: B side has {len(b_tbl)} rows > "
            f"max_broadcast {max_broadcast}; IVF-bucket both sides and "
            f"mine per bucket")
    if len(b_tbl) == 0:
        raise ValueError("mutual_nn_pairs: empty B side")
    b_tbl = b_tbl.sort_values(id_col).reset_index(drop=True)
    B = np.floor(np.array(b_tbl[vec_col].to_list(), dtype=np.float64)
                 * MNN_SCALE + 0.5).astype(np.int64)
    b_ids = b_tbl[id_col].to_numpy()
    b_norm2 = (B * B).sum(axis=1)
    b_ref = ray.put((b_ids, B, b_norm2))

    def probe(batch: pa.Table) -> pa.Table:
        ids_b, Bq, nb2 = ray.get(b_ref)
        a_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        A = np.floor(np.array(batch.column(vec_col).to_pylist(),
                              dtype=np.float64) * MNN_SCALE + 0.5
                     ).astype(np.int64)
        if A.ndim != 2 or len(A) == 0:
            return pa.table({"side": pa.array([], pa.int8()),
                             "a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "cos_ppm": pa.array([], pa.int64())})
        na2 = (A * A).sum(axis=1)
        dots = A @ Bq.T  # exact int64
        # cos_ppm = 1e6·dot // isqrt(na²·nb²).  A per-pair math.isqrt
        # would be O(n·|B|) Python calls — instead take the float sqrt
        # (within 1 ulp for these magnitudes) and fix it to the TRUE
        # integer sqrt with one exact ±1 correction step in int64
        prod = na2[:, None].astype(np.float64) * nb2[None, :].astype(np.float64)
        r = np.sqrt(prod).astype(np.int64)
        P = na2[:, None] * nb2[None, :]  # int64; see docstring dim bound
        r = np.where((r + 1) * (r + 1) <= P, r + 1, r)
        r = np.where(r * r > P, r - 1, r)
        r = np.maximum(r, 1)
        cos = (dots.astype(object) * 1_000_000) // r.astype(object) \
            if P.max() > (1 << 62) else (dots * 1_000_000) // r
        cos = cos.astype(np.int64)
        cos[:, nb2 == 0] = 0
        cos[na2 == 0, :] = 0
        # A -> B top-1 (argmax returns the FIRST max; B is id-sorted)
        top = cos.argmax(axis=1)
        side_a = pa.table({
            "side": pa.array(np.zeros(len(A), np.int8)),
            "a_id": pa.array(a_ids.astype(np.int64)),
            "b_id": pa.array(ids_b[top].astype(np.int64)),
            "cos_ppm": pa.array(cos[np.arange(len(A)), top], pa.int64()),
        })
        # per-block partial of B -> A: column max, tie -> smallest a_id
        cmax = cos.max(axis=0)
        cand = np.where(cos == cmax[None, :],
                        a_ids.astype(np.int64)[:, None],
                        np.iinfo(np.int64).max)
        best_a = cand.min(axis=0)
        side_b = pa.table({
            "side": pa.array(np.ones(len(ids_b), np.int8)),
            "a_id": pa.array(best_a, pa.int64()),
            "b_id": pa.array(ids_b.astype(np.int64)),
            "cos_ppm": pa.array(cmax, pa.int64()),
        })
        return pa.concat_tables([side_a, side_b])

    both = ds_a.map_batches(probe, batch_format="pyarrow",
                            zero_copy_batch=True)

    # ONE keyed exchange resolves mutuality (branching `both` into two
    # filtered consumers would re-execute the probe pass — lineage is
    # re-run per consumer): per b, the side-1 block partials give B→A's
    # global best (max cos, tie → min a_id), and the pair is mutual
    # exactly when that best_a also CLAIMED b with a side-0 row.  Group
    # size = n_blocks partials + #A-rows claiming b; a hub b claimed by
    # everything makes a hot group, bounded here like the other pair
    # families (a >max_group hub emits nothing and cannot be mutual in
    # practice: the hub reciprocates at most one row anyway).
    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": np.array([], np.int64),
                              "id_b": np.array([], np.int64),
                              "cos_ppm": np.array([], np.int64)})
        part = g[g["side"] == 1]
        if part.empty or len(g) > 1_000_000:
            return empty
        m = part["cos_ppm"].max()
        best_a = part[part["cos_ppm"] == m]["a_id"].min()
        claim = g[(g["side"] == 0) & (g["a_id"] == best_a)]
        if claim.empty:
            return empty
        return pd.DataFrame({"id_a": [np.int64(best_a)],
                             "id_b": [np.int64(g["b_id"].iloc[0])],
                             "cos_ppm": [np.int64(claim["cos_ppm"].iloc[0])]})

    return both.groupby("b_id").map_groups(resolve, batch_format="pandas")
