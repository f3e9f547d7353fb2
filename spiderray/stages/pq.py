"""Product quantization (Jégou, Douze & Schmid 2011, "Product
Quantization for Nearest Neighbor Search", IEEE TPAMI) — the
memory-compression path that makes billion-vector ANN feasible: split
each d-dim embedding into ``m`` subspaces, k-means each subspace to
``k`` centroids, store each vector as m uint8 codes (64 float32 dims →
8 bytes at m=8), and answer queries with asymmetric distance (ADC): one
(m × k) table of query-to-centroid distances, then per-row table-lookup
sums — no float math per candidate.

Scale shape mirrors kmeans_fit_distributed (ann.py:141): training moves
only (m·k)-bounded counter partials per block per Lloyd round; codebooks
broadcast once for encode/search; encode and ADC are pure streamed maps.

Determinism: vectors and centroids live in integer micro-units
throughout — assignments, Lloyd partial sums, code picks and ADC sums
are exact int64 arithmetic (round-half-up centroid updates), so train /
encode / search are bit-identical under any partitioning and
serial-twin checkable.  Ties break to the lowest centroid index / the
smallest id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PQ_SCALE = 1_000_000  # micro-units, matching the repo's integer-cosine ops


def _quant(V: np.ndarray) -> np.ndarray:
    return np.floor(np.asarray(V, dtype=np.float64) * PQ_SCALE
                    + 0.5).astype(np.int64)


def _assign(sub: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Nearest centroid per row by exact integer L2; first (lowest) index
    wins ties.  sub: (n, dsub) int64, cb: (k, dsub) int64."""
    # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² is row-constant, so the
    # argmin needs only the exact int64 cross and centroid terms
    cross = sub @ cb.T
    cnorm = (cb * cb).sum(axis=1)
    return (cnorm[None, :] - 2 * cross).argmin(axis=1)


def pq_train(ds, m: int = 8, k: int = 16, iters: int = 5,
             vec_col: str = "embedding", id_col: str = "vec_id",
             init_ids: list | None = None) -> np.ndarray:
    """Train PQ codebooks: returns (m, k, d/m) int64 micro-unit
    centroids.  Init = the subvectors of the ``k`` smallest-id rows
    (or ``init_ids`` explicitly) — declarative, so an external twin
    reproduces it without Ray block-order knowledge (the kmeans
    limit(k) caveat, closed here by construction).

    Each Lloyd round: one map_batches pass emits per-block (subspace,
    cluster, count, sum) partials — (m·k)-bounded rows regardless of
    block size — merged exactly on the driver; centroid update is
    round-half-up integer division.  Empty clusters keep their previous
    centroid."""
    import ray

    if init_ids is None:
        # k smallest ids WITHOUT materializing the id column on the
        # driver: per-block local k-smallest, k·n_blocks rows merged
        def local_min(batch: pa.Table) -> pa.Table:
            ids_ = np.sort(batch.column(id_col).to_numpy(
                zero_copy_only=False))[:k]
            return pa.table({id_col: pa.array(ids_)})

        t = (ds.select_columns([id_col])
             .map_batches(local_min, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas())
        ids = sorted(t[id_col].tolist())[:k]
    else:
        ids = sorted(init_ids)[:k]
    id_set = set(int(i) for i in ids)

    def grab_init(batch: pa.Table) -> pa.Table:
        bi = [j for j, v in enumerate(batch.column(id_col).to_pylist())
              if int(v) in id_set]
        return batch.take(bi) if bi else batch.slice(0, 0)

    head = (ds.select_columns([id_col, vec_col])
            .map_batches(grab_init, batch_format="pyarrow",
                         zero_copy_batch=True)
            .to_pandas().sort_values(id_col))
    V0 = _quant(np.array(head[vec_col].to_list()))
    d = V0.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    if len(V0) < k:
        raise ValueError(f"need >= k={k} rows to init, got {len(V0)}")
    C = np.stack([V0[:, j * dsub:(j + 1) * dsub] for j in range(m)])

    for _ in range(iters):
        c_ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            Cc = ray.get(c_ref)
            V = _quant(np.array(batch.column(vec_col).to_pylist()))
            subs, clusters, counts, sums = [], [], [], []
            if V.ndim == 2 and len(V):
                for j in range(m):
                    sub = V[:, j * dsub:(j + 1) * dsub]
                    a = _assign(sub, Cc[j])
                    for c in np.unique(a):
                        members = sub[a == c]
                        subs.append(j)
                        clusters.append(int(c))
                        counts.append(int(len(members)))
                        sums.append(members.sum(axis=0).tolist())
            return pa.table({"sub": pa.array(subs, pa.int32()),
                             "cluster": pa.array(clusters, pa.int32()),
                             "count": pa.array(counts, pa.int64()),
                             "sums": pa.array(sums, pa.list_(pa.int64()))})

        tot_n = np.zeros((m, k), dtype=np.int64)
        tot_s = np.zeros((m, k, dsub), dtype=object)
        tot_s[...] = 0
        for b in ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True
                                ).iter_batches(batch_format="pyarrow"):
            for j, c, n, s in zip(b.column("sub").to_pylist(),
                                  b.column("cluster").to_pylist(),
                                  b.column("count").to_pylist(),
                                  b.column("sums").to_pylist()):
                tot_n[j, c] += n
                for t in range(dsub):
                    tot_s[j, c, t] += int(s[t])
        for j in range(m):
            for c in range(k):
                n = int(tot_n[j, c])
                if n:
                    C[j, c] = np.array(
                        [(2 * int(tot_s[j, c, t]) + n) // (2 * n)
                         for t in range(dsub)], dtype=np.int64)
    return C


def pq_encode(ds, codebooks: np.ndarray, vec_col: str = "embedding"):
    """Append ``pq_code`` (list<uint8>, length m): each subvector's
    nearest-centroid index by exact integer L2.  Codebooks broadcast
    once; pure streamed map."""
    import ray

    m, k, dsub = codebooks.shape
    c_ref = ray.put(codebooks)

    def fn(batch: pa.Table) -> pa.Table:
        Cc = ray.get(c_ref)
        V = _quant(np.array(batch.column(vec_col).to_pylist()))
        if V.ndim != 2 or len(V) == 0:
            return batch.append_column(
                "pq_code", pa.array([], pa.list_(pa.uint8())))
        codes = np.empty((len(V), m), dtype=np.uint8)
        for j in range(m):
            codes[:, j] = _assign(V[:, j * dsub:(j + 1) * dsub], Cc[j])
        return batch.append_column(
            "pq_code", pa.array(codes.tolist(), pa.list_(pa.uint8())))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pq_adc_topk(ds_codes, codebooks: np.ndarray, query_vec,
                topk: int = 10, id_col: str = "vec_id") -> pd.DataFrame:
    """Asymmetric-distance top-k: ONE (m × k) exact-integer table of
    query-to-centroid squared L2 distances broadcasts; each row's
    distance is m table lookups summed in int64 (no per-candidate float
    math — the PQ payoff).  Per-block local top-k, driver merges
    k·n_blocks rows.  Returns (id, adc_dist) sorted by (dist, id)."""
    import ray

    m, k, dsub = codebooks.shape
    q = _quant(np.asarray(query_vec, dtype=np.float64))
    table = np.empty((m, k), dtype=np.int64)
    for j in range(m):
        diff = codebooks[j] - q[j * dsub:(j + 1) * dsub][None, :]
        table[j] = (diff * diff).sum(axis=1)
    t_ref = ray.put(table)

    def local_topk(batch: pa.Table) -> pa.Table:
        T = ray.get(t_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        codes = np.array(batch.column("pq_code").to_pylist(),
                         dtype=np.int64)
        if codes.ndim != 2 or len(codes) == 0:
            return pa.table({id_col: pa.array([], batch.schema.field(
                id_col).type), "adc_dist": pa.array([], pa.int64())})
        dist = T[np.arange(m)[None, :], codes].sum(axis=1)
        order = np.lexsort((ids, dist))[:topk]
        return pa.table({
            id_col: pa.array(ids[order], batch.schema.field(id_col).type),
            "adc_dist": pa.array(dist[order], pa.int64()),
        })

    out = ds_codes.map_batches(local_topk, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    out = out.sort_values(["adc_dist", id_col]).head(topk)
    out["adc_dist"] = out["adc_dist"].astype("int64")
    return out.reset_index(drop=True)


def sq8_fit(ds, vec_col: str = "embedding") -> tuple:
    """Per-dimension (min, max) over the corpus for 8-bit scalar
    quantization — ONE pass of per-block float min/max partials (exact
    and order-independent: min/max need no arithmetic).  Returns two
    float64[d] arrays."""
    def partial(batch: pa.Table) -> pa.Table:
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if V.ndim != 2 or len(V) == 0:
            return pa.table({"lo": pa.array([], pa.list_(pa.float64())),
                             "hi": pa.array([], pa.list_(pa.float64()))})
        return pa.table({"lo": pa.array([V.min(axis=0).tolist()],
                                        pa.list_(pa.float64())),
                         "hi": pa.array([V.max(axis=0).tolist()],
                                        pa.list_(pa.float64()))})

    lo = hi = None
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True
                            ).iter_batches(batch_format="pyarrow"):
        for lo_r, hi_r in zip(b.column("lo").to_pylist(),
                              b.column("hi").to_pylist()):
            lo_a = np.asarray(lo_r)
            hi_a = np.asarray(hi_r)
            lo = lo_a if lo is None else np.minimum(lo, lo_a)
            hi = hi_a if hi is None else np.maximum(hi, hi_a)
    if lo is None:
        raise ValueError("sq8_fit: empty input")
    return lo, hi


def sq8_encode(ds, lo: np.ndarray, hi: np.ndarray,
               vec_col: str = "embedding"):
    """Append ``sq8_code`` (list<uint8>): round(255·(v−lo)/(hi−lo))
    clamped — elementwise float with no reductions, so every engine
    computes the identical code; constant dimensions (hi == lo) encode
    to 0.  Model broadcast once; pure streamed map."""
    import ray

    span = np.asarray(hi, dtype=np.float64) - np.asarray(lo, dtype=np.float64)
    span[span == 0] = 1.0
    m_ref = ray.put((np.asarray(lo, dtype=np.float64), span))

    def fn(batch: pa.Table) -> pa.Table:
        lo_b, span_b = ray.get(m_ref)
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if V.ndim != 2 or len(V) == 0:
            return batch.append_column(
                "sq8_code", pa.array([], pa.list_(pa.uint8())))
        codes = np.clip(np.floor(255.0 * (V - lo_b) / span_b + 0.5),
                        0, 255).astype(np.uint8)
        return batch.append_column(
            "sq8_code", pa.array(codes.tolist(), pa.list_(pa.uint8())))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sq8_recall_card(ds, query_vec, k: int = 10,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id"):
    """8-bit quantization QA card: exact top-``k`` by milli-integer
    cosine on the RAW vectors vs top-k on the DEQUANTIZED codes
    (lo + code·span/255), reporting the overlap — the drop-in check
    before swapping a float32 store for int8 (4× smaller).  One fit
    pass, one streamed scoring pass emitting per-block local top-k for
    BOTH representations; the driver merges 2·k·n_blocks rows.
    Returns a one-row frame (recall_at_k, k)."""
    import math

    import ray

    lo, hi = sq8_fit(ds, vec_col)
    span = hi - lo
    span[span == 0] = 1.0
    q = np.asarray(query_vec, dtype=np.float64)
    qq = np.floor(q * 1000.0 + 0.5).astype(np.int64)
    qn = int((qq * qq).sum())
    m_ref = ray.put((lo, span, qq, qn))

    def local_topk(batch: pa.Table) -> pa.Table:
        lo_b, span_b, qq_b, qn_b = ray.get(m_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if V.ndim != 2 or len(V) == 0:
            return pa.table({"side": pa.array([], pa.int8()),
                             id_col: pa.array([], pa.int64()),
                             "cos_ppm": pa.array([], pa.int64())})
        codes = np.clip(np.floor(255.0 * (V - lo_b) / span_b + 0.5),
                        0, 255)
        D = lo_b + codes * span_b / 255.0
        out_side, out_id, out_cos = [], [], []
        for side, M in ((0, V), (1, D)):
            Mq = np.floor(M * 1000.0 + 0.5).astype(np.int64)
            dots = Mq @ qq_b
            n2 = (Mq * Mq).sum(axis=1)
            prod = n2.astype(np.float64) * float(qn_b)
            r = np.sqrt(prod).astype(np.int64)
            P = n2 * qn_b
            r = np.where((r + 1) * (r + 1) <= P, r + 1, r)
            r = np.where(r * r > P, r - 1, r)
            r = np.maximum(r, 1)
            cos = (dots * 1_000_000) // r
            cos[n2 == 0] = 0
            order = np.lexsort((ids, -cos))[:k]
            out_side.extend([side] * len(order))
            out_id.extend(ids[order].tolist())
            out_cos.extend(cos[order].tolist())
        return pa.table({"side": pa.array(out_side, pa.int8()),
                         id_col: pa.array(out_id, pa.int64()),
                         "cos_ppm": pa.array(out_cos, pa.int64())})

    import pandas as pd

    rows = ds.map_batches(local_topk, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    tops = {}
    for side in (0, 1):
        s = rows[rows["side"] == side].sort_values(
            ["cos_ppm", id_col], ascending=[False, True]).head(k)
        tops[side] = set(s[id_col].tolist())
    return pd.DataFrame({
        "recall_at_k": [np.int64(len(tops[0] & tops[1]))],
        "k": [np.int64(k)],
    }).astype("int64")


def matryoshka_recall_card(ds, query_vec, dims: tuple = (8, 16, 32),
                           k: int = 10, vec_col: str = "embedding",
                           id_col: str = "vec_id"):
    """Matryoshka truncation QA card (Kusupati et al. 2022, "Matryoshka
    Representation Learning"): top-``k`` recall when ranking by only the
    first ``p`` dimensions, for each p in ``dims``, against the
    full-dimension milli-integer-cosine ground truth — the check before
    serving truncated prefixes of an embedding store (MRL-trained models
    degrade gracefully; arbitrary embeddings often do not, and this card
    is how you find out).  One streamed pass scores every prefix AND the
    full vector per block (local top-k each, (len(dims)+1)·k·n_blocks
    driver rows).  Returns (dims, recall_at_k, k) rows sorted by dims."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    qq = np.floor(q * 1000.0 + 0.5).astype(np.int64)
    m_ref = ray.put(qq)
    # the full dimension joins the scored set exactly once, even when a
    # caller also requests it as a prefix (p == d would otherwise emit
    # duplicate rows and halve its own recall)
    req = tuple(sorted(set(int(p) for p in dims)))
    all_dims = tuple(sorted(set(req) | {len(q)}))

    def local_topk(batch: pa.Table) -> pa.Table:
        qq_b = ray.get(m_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if V.ndim != 2 or len(V) == 0:
            return pa.table({"p": pa.array([], pa.int32()),
                             id_col: pa.array([], pa.int64()),
                             "cos_ppm": pa.array([], pa.int64())})
        Vq = np.floor(V * 1000.0 + 0.5).astype(np.int64)
        out_p, out_id, out_cos = [], [], []
        for p in all_dims:
            Mq = Vq[:, :p]
            qp = qq_b[:p]
            qn = int((qp * qp).sum())
            dots = Mq @ qp
            n2 = (Mq * Mq).sum(axis=1)
            prod = n2.astype(np.float64) * float(qn)
            r = np.sqrt(prod).astype(np.int64)
            P = n2 * qn
            r = np.where((r + 1) * (r + 1) <= P, r + 1, r)
            r = np.where(r * r > P, r - 1, r)
            r = np.maximum(r, 1)
            cos = (dots * 1_000_000) // r
            cos[(n2 == 0)] = 0
            if qn == 0:
                cos[:] = 0
            order = np.lexsort((ids, -cos))[:k]
            out_p.extend([p] * len(order))
            out_id.extend(ids[order].tolist())
            out_cos.extend(cos[order].tolist())
        return pa.table({"p": pa.array(out_p, pa.int32()),
                         id_col: pa.array(out_id, pa.int64()),
                         "cos_ppm": pa.array(out_cos, pa.int64())})

    rows = ds.map_batches(local_topk, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    tops = {}
    for p in all_dims:
        s = rows[rows["p"] == p].sort_values(
            ["cos_ppm", id_col], ascending=[False, True]).head(k)
        tops[p] = set(s[id_col].tolist())
    full = tops[len(q)]
    return pd.DataFrame({
        "dims": np.asarray(req, dtype=np.int64),
        "recall_at_k": np.asarray(
            [len(tops[p] & full) for p in req], dtype=np.int64),
        "k": np.int64(k),
    }).astype("int64")
