"""Serial (no-Ray) oracles for the non-SQL-expressible contract queries.

The driver compares every ``queries()`` entry against its ``oracle_sql()``
SQL via DuckDB.  The LSH/DSP/model pipelines are not SQL-expressible, so
their oracle is a FIXTURE: an independent serial computation — plain Python
loops over the raw parquet, reusing the same per-row function bank the
stages share with the row oracle (the repo's established oracle pattern,
e.g. q_doc_keepdrop) — written to ``fixtures/<query>.parquet``, which the
registered SQL reads back with ``SELECT * FROM read_parquet(...)``.

What this verifies: the entire distributed machinery — band-explode
shuffles, coarse-partition groupbys, hash-join verification, actor pools,
batch boundaries, block ordering, schema flow — against a single-threaded
reference executed in one pass over one table.  The per-row math is shared
by construction (same function bank), exactly like the keep/drop oracle.

Each fixture-backed query calls ``ensure_fixture(name, sf_dir)`` on entry,
(re)writing its fixture for the corpus it is about to run on — so fixtures
self-heal if the testdata changes — and the repo also ships fixtures
pre-generated at sf0.01 (the driver's correctness scale) in case the SQL
side runs first.  ``SPIDERRAY_SKIP_FIXTURES=1`` (set by bench.py) skips
generation so benchmark timings measure only the engine.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import fingerprint as fp

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
)

# engine constants the serial candidate generation must mirror
from ..stages.dedup import MAX_BUCKET  # noqa: E402


def fixture_path(name: str) -> str:
    return os.path.join(FIXTURE_DIR, f"{name}.parquet")


def fixture_sql(name: str) -> str:
    return f"SELECT * FROM read_parquet('{fixture_path(name)}')"


def write_fixture(name: str, table: pa.Table) -> str:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = fixture_path(name)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)  # atomic: a concurrent reader never sees a torn file
    return path


def _docs(sf_dir: str, columns=("doc_id", "text")) -> pa.Table:
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=list(columns))


def _augmented_docs(sf_dir: str, mod: int, id_offset: int, suffix: str):
    """Serial twin of the q_*_pairs augment step: every ``mod``-th doc gets
    a near-identical twin with ``suffix`` appended and id += id_offset."""
    t = _docs(sf_dir)
    ids = t.column("doc_id").to_numpy().astype(np.int64)
    texts = t.column("text").to_pylist()
    out_ids = list(ids)
    out_texts = list(texts)
    for i, x in zip(ids, texts):
        if i % mod == 0:
            out_ids.append(int(i) + id_offset)
            out_texts.append(f"{x}{suffix}")
    return np.asarray(out_ids, dtype=np.int64), out_texts


def _pairs_table(pairs: set[tuple[int, int]]) -> pa.Table:
    rows = sorted(pairs)
    return pa.table(
        {
            "id_a": pa.array([a for a, _ in rows], pa.int64()),
            "id_b": pa.array([b for _, b in rows], pa.int64()),
        }
    )


def _bucket_pairs(ids: np.ndarray, keys_per_doc) -> set[tuple[int, int]]:
    """Candidate pairs from LSH buckets with the engine's MAX_BUCKET cap:
    ``keys_per_doc[row]`` yields hashable bucket keys for that row."""
    buckets: dict = defaultdict(list)
    for row in range(len(ids)):
        for key in keys_per_doc(row):
            buckets[key].append(row)
    cand: set[tuple[int, int]] = set()
    for rows in buckets.values():
        if len(rows) > MAX_BUCKET:
            continue  # engine skips degenerate mega-buckets
        rows = sorted(set(rows))
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = int(ids[rows[i]]), int(ids[rows[j]])
                if a != b:
                    cand.add((min(a, b), max(a, b)))
    return cand


# ---------------------------------------------------------------------------
# near-dup pair oracles
# ---------------------------------------------------------------------------


def so_minhash_pairs(sf_dir: str) -> pa.Table:
    ids, texts = _augmented_docs(sf_dir, 10, 2_000_000, " extra trailing token")
    sigs = np.stack([fp.minhash_signature(t or "") for t in texts])
    keys = fp.minhash_band_matrix(sigs, 32)  # (n, 32)

    cand = _bucket_pairs(ids, lambda r: ((b, int(keys[r, b])) for b in range(32)))
    id_to_row = {int(i): r for r, i in enumerate(ids)}
    ok = {
        (a, b)
        for a, b in cand
        if (sigs[id_to_row[a]] == sigs[id_to_row[b]]).mean() >= 0.7
    }
    return _pairs_table(ok)


def so_simhash_pairs(sf_dir: str) -> pa.Table:
    ids, texts = _augmented_docs(sf_dir, 10, 3_000_000, " tail")
    sims = [fp.simhash64(t or "") for t in texts]
    chunk_lists = [fp.simhash_chunks(h) for h in sims]

    cand = _bucket_pairs(
        ids, lambda r: ((ci, c) for ci, c in enumerate(chunk_lists[r]))
    )
    id_to_row = {int(i): r for r, i in enumerate(ids)}
    ok = {
        (a, b)
        for a, b in cand
        if fp.hamming64(sims[id_to_row[a]], sims[id_to_row[b]]) <= 3
    }
    return _pairs_table(ok)


def so_ngram_jaccard_pairs(sf_dir: str) -> pa.Table:
    ids, texts = _augmented_docs(sf_dir, 10, 4_000_000, " one more")
    bands = 16
    grams = [fp.ngram_set(t or "", 3) for t in texts]
    sigs = np.zeros((len(texts), bands * 4), dtype=np.uint32)
    for r, g in enumerate(grams):
        if len(g):
            prod = fp._PERM_A[: bands * 4, None] * g[None, :] + fp._PERM_B[: bands * 4, None]
            sigs[r] = (prod >> np.uint64(32)).min(axis=1).astype(np.uint32)
    keys = fp.minhash_band_matrix(sigs, bands)

    cand = _bucket_pairs(ids, lambda r: ((b, int(keys[r, b])) for b in range(bands)))
    id_to_row = {int(i): r for r, i in enumerate(ids)}
    ok = {
        (a, b)
        for a, b in cand
        if fp.jaccard(grams[id_to_row[a]], grams[id_to_row[b]]) >= 0.5
    }
    return _pairs_table(ok)


# ---------------------------------------------------------------------------
# connected components / near-dedup oracles
# ---------------------------------------------------------------------------


def _union_find(pairs) -> dict[int, int]:
    """Serial union-find: node → min id of its connected component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _minhash_pair_labels(sf_dir: str) -> dict[int, int]:
    t = so_minhash_pairs(sf_dir)
    return _union_find(
        zip(t.column("id_a").to_pylist(), t.column("id_b").to_pylist())
    )


def so_dup_clusters(sf_dir: str) -> pa.Table:
    labels = _minhash_pair_labels(sf_dir)
    nodes = sorted(labels)
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "cluster_id": pa.array([labels[n] for n in nodes], pa.int64()),
        }
    )


def so_near_dedup(sf_dir: str) -> pa.Table:
    ids, _ = _augmented_docs(sf_dir, 10, 2_000_000, " extra trailing token")
    labels = _minhash_pair_labels(sf_dir)
    losers = {n for n, c in labels.items() if n != c}
    kept = [int(i) for i in ids if int(i) not in losers]
    return pa.table(
        {
            "n_total": pa.array([len(ids)], pa.int64()),
            "n_kept": pa.array([len(kept)], pa.int64()),
            "n_dropped": pa.array([len(ids) - len(kept)], pa.int64()),
            "kept_id_sum": pa.array([sum(kept)], pa.int64()),
        }
    )


def so_near_dedup_best(sf_dir: str) -> pa.Table:
    """Serial twin of near_dedup_best: union-find labels, then per cluster
    keep the (longest text, min id) member."""
    ids, texts = _augmented_docs(sf_dir, 10, 2_000_000, " extra trailing token")
    labels = _minhash_pair_labels(sf_dir)
    lengths = {int(i): len(t or "") for i, t in zip(ids, texts)}
    best: dict[int, tuple[int, int]] = {}
    for n, c in labels.items():
        cand = (-lengths.get(n, 0), n)
        if c not in best or cand < best[c]:
            best[c] = cand
    losers = {n for n, c in labels.items() if n != best[c][1]}
    kept = [int(i) for i in ids if int(i) not in losers]
    return pa.table(
        {
            "n_total": pa.array([len(ids)], pa.int64()),
            "n_kept": pa.array([len(kept)], pa.int64()),
            "n_dropped": pa.array([len(ids) - len(kept)], pa.int64()),
            "kept_id_sum": pa.array([sum(kept)], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# chunk dedup
# ---------------------------------------------------------------------------


def so_chunk_dedup(sf_dir: str) -> pa.Table:
    from ..functions.fingerprint import cdc_chunks, md5_fingerprint

    t = _docs(sf_dir)
    rows = list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    # serial twin of the augment step: every 5th doc re-emitted with a new
    # head but the same body (its body chunks duplicate)
    rows += [
        (int(i) + 700_000, f"new head {i} " + (x or ""))
        for i, x in rows
        if i % 5 == 0
    ]
    per_doc: list[tuple[int, list[tuple[str, int]]]] = []
    chunk_docs: dict[str, set[int]] = defaultdict(set)
    for i, text in rows:
        chunks = [(md5_fingerprint(c), len(c)) for c in cdc_chunks(
            text or "", min_size=32, avg_size=64, max_size=256)]
        per_doc.append((i, chunks))
        for f, _ in chunks:
            chunk_docs[f].add(i)
    ids, n_chunks, ratios = [], [], []
    for i, chunks in per_doc:
        if not chunks:
            continue  # no exploded rows → absent from the engine output too
        total = sum(ln for _, ln in chunks)
        dup = sum(ln for f, ln in chunks if len(chunk_docs[f]) > 1)
        ids.append(i)
        n_chunks.append(len(chunks))
        ratios.append(dup / max(total, 1) if total > 0 else 0.0)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chunks": pa.array(n_chunks, pa.int64()),
            "dup_chunk_ratio": pa.array(ratios, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# ANN oracles
# ---------------------------------------------------------------------------


def _embeddings(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, V


def _serial_topk(ids: np.ndarray, V: np.ndarray, q: np.ndarray, k: int) -> np.ndarray:
    qn = q / (np.linalg.norm(q) or 1.0)
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0] = 1.0
    cos = (V @ qn) / norms
    order = np.lexsort((ids, -cos))[:k]
    return ids[order]


def so_lsh_topk(sf_dir: str) -> pa.Table:
    from ..stages.ann import N_PLANES, _bucket_of, _planes

    ids, V = _embeddings(sf_dir)
    q = V[int(np.nonzero(ids == 0)[0][0])]
    planes = _planes(V.shape[1])
    qb = int(_bucket_of(q.reshape(1, -1), planes)[0])
    ok_buckets = {qb} | {qb ^ (1 << i) for i in range(N_PLANES)}
    buckets = _bucket_of(V, planes)
    mask = np.isin(buckets, sorted(ok_buckets))
    top = _serial_topk(ids[mask], V[mask], q, 10)
    return pa.table({"vec_id": pa.array(top, pa.int64())})


def so_ivf_topk(sf_dir: str) -> pa.Table:
    from ..stages.ann import spherical_kmeans

    ids, V = _embeddings(sf_dir)
    q = V[int(np.nonzero(ids == 0)[0][0])]
    # serial twin of ivf_train(sample_size=2000): the LIMIT sample is the
    # parquet head (row order), normalized inside spherical_kmeans
    C = spherical_kmeans(V[:2000].copy(), 16)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(C @ qn))[:4]
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cells = np.argmax((V / norms) @ C.T, axis=1)
    mask = np.isin(cells, probe)
    top = _serial_topk(ids[mask], V[mask], q, 10)
    return pa.table({"vec_id": pa.array(top, pa.int64())})


def _serial_batch_topk(ids, V, Q, k: int):
    """Shared serial arithmetic for batch_topk twins: one full-corpus
    matmul, per-query (−cos, id) ordering, milli-quantized sims."""
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    S = (V / norms) @ Qn.T
    rows = {"query_idx": [], "rank": [], "vec_id": [], "sim_milli": []}
    for j in range(Qn.shape[0]):
        order = np.lexsort((ids, -S[:, j]))[:k]
        rows["query_idx"].extend([j] * len(order))
        rows["rank"].extend(range(len(order)))
        rows["vec_id"].extend(ids[order].tolist())
        rows["sim_milli"].extend(
            np.floor(S[order, j] * 1000.0 + 0.5).astype(np.int64).tolist())
    return rows


def so_count_min(sf_dir: str) -> pa.Table:
    """Serial twin of q_count_min: one serial CMS build (identical md5
    bucket arithmetic — addition-merged partials equal a serial build
    exactly) plus exact Counter counts."""
    from collections import Counter

    from ..functions.sketch import cms_estimate, cms_from_values

    docs = _docs(sf_dir, ("doc_id", "text"))
    toks = []
    for t in docs.column("text").to_pylist():
        toks.extend((t or "").lower().split())
    cms = cms_from_values(toks)
    probes = ["the", "and", "of", "data", "spider", "zzz-absent-term",
              "a", "in", "to", "for"]
    est = cms_estimate(cms, probes)
    exact = Counter(toks)
    rows = sorted(zip(probes, est.tolist()))
    return pa.table({
        "term": pa.array([r[0] for r in rows], pa.string()),
        "est_count": pa.array([int(r[1]) for r in rows], pa.int64()),
        "exact_count": pa.array([int(exact.get(r[0], 0)) for r in rows],
                                pa.int64()),
        "over": pa.array([int(r[1]) - int(exact.get(r[0], 0))
                          for r in rows], pa.int64()),
    })


def so_text_semantic_dedup(sf_dir: str) -> pa.Table:
    """Serial twin of q_text_semantic_dedup: serial feature-hash
    embeddings (same md5 arithmetic), explicit smallest-id init,
    micro-unit Lloyd (3 iters), within-cluster pairs ≥0.9, union-find
    min-id representative."""
    import hashlib

    docs = _docs(sf_dir, ("doc_id", "text"))
    ids, texts = [], []
    for did, t in zip(docs.column("doc_id").to_pylist(),
                      docs.column("text").to_pylist()):
        ids.append(int(did))
        texts.append(t or "")
    for did, t in zip(list(ids), list(texts)):
        if did % 10 == 0:
            ids.append(did + 7000000)
            texts.append(f"{t} extra")

    dim, n = 64, 3
    V = np.zeros((len(texts), dim), dtype=np.float64)
    for r, t in enumerate(texts):
        toks = t.split()
        for i in range(max(len(toks) - n + 1, 0)):
            h = hashlib.md5(" ".join(toks[i:i + n]).encode()).digest()
            V[r, int.from_bytes(h[:8], "big") % dim] += \
                1.0 if h[8] & 1 else -1.0
        nrm = np.linalg.norm(V[r])
        if nrm > 0:
            V[r] /= nrm
    # the engine embeds as float32 lists; round-trip to match exactly
    V = V.astype(np.float32).astype(np.float64)

    ids_a = np.array(ids, dtype=np.int64)
    order = np.argsort(ids_a, kind="stable")[:8]
    init = V[order]
    ninit = np.linalg.norm(init, axis=1, keepdims=True)
    ninit[ninit == 0] = 1.0
    out = _serial_semdedup_core(ids_a, V, k=8, iters=3, threshold=0.9,
                                init=init / ninit)
    # rename the semdedup summary to the doc_id-sum shape
    return out


def so_batch_topk(sf_dir: str) -> pa.Table:
    """Serial twin for q_batch_topk."""
    ids, V = _embeddings(sf_dir)
    order = np.argsort(ids, kind="stable")[:8]
    rows = _serial_batch_topk(ids, V, V[order], 10)
    return pa.table({
        "query_idx": pa.array(rows["query_idx"], pa.int64()),
        "rank": pa.array(rows["rank"], pa.int64()),
        "vec_id": pa.array(rows["vec_id"], pa.int64()),
        "sim_milli": pa.array(rows["sim_milli"], pa.int64()),
    })


def so_ann_recall(sf_dir: str) -> pa.Table:
    """Serial twin for q_ann_recall: exact ground truth via
    _serial_batch_topk, LSH via the plane/bucket helpers, IVF via the
    head-sample spherical k-means — each method's serial restatement."""
    from ..stages.ann import N_PLANES, _bucket_of, _planes, spherical_kmeans

    ids, V = _embeddings(sf_dir)
    order = np.argsort(ids, kind="stable")[:8]
    Q = V[order]
    k = 10
    exact = _serial_batch_topk(ids, V, Q, k)
    truth = {}
    for qi, vid in zip(exact["query_idx"], exact["vec_id"]):
        truth.setdefault(qi, set()).add(vid)

    planes = _planes(V.shape[1])
    buckets = _bucket_of(V, planes)
    C = spherical_kmeans(V[:2000].copy(), 16)
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cells = np.argmax((V / norms) @ C.T, axis=1)

    rows = []
    for j in range(len(Q)):
        q = Q[j]
        qn = q / (np.linalg.norm(q) or 1.0)
        qb = int(_bucket_of(q.reshape(1, -1), planes)[0])
        ok = {qb} | {qb ^ (1 << i) for i in range(N_PLANES)}
        mask = np.isin(buckets, sorted(ok))
        lsh_ids = set(_serial_topk(ids[mask], V[mask], q, k))
        probe = np.argsort(-(C @ qn))[:4]
        m2 = np.isin(cells, probe)
        ivf_ids = set(_serial_topk(ids[m2], V[m2], q, k))
        rows.append(("ivf", j, len(ivf_ids & truth[j]) * 1_000_000 // k))
        rows.append(("lsh", j, len(lsh_ids & truth[j]) * 1_000_000 // k))
    rows.sort()
    return pa.table({
        "method": pa.array([r[0] for r in rows], pa.string()),
        "query_idx": pa.array([r[1] for r in rows], pa.int64()),
        "recall_ppm": pa.array([r[2] for r in rows], pa.int64()),
    })


def so_kmeans_clusters(sf_dir: str) -> pa.Table:
    """Serial twin of q_kmeans_clusters: same init (first 8 rows), same
    Lloyd iterations with integer micro-unit accumulation (exact and
    order-independent, so serial ≡ any distributed block partitioning)."""
    ids, V = _embeddings(sf_dir)
    k, iters, scale_bits = 8, 4, 20
    scale = float(1 << scale_bits)
    n = np.linalg.norm(V, axis=1, keepdims=True)
    n[n == 0] = 1.0
    Vn = V / n
    C = Vn[:k].copy()
    for _ in range(iters):
        assign = np.argmax(Vn @ C.T, axis=1)
        q = np.round(Vn * scale).astype(np.int64)
        for c in range(k):
            members = q[assign == c]
            if len(members):
                m = members.sum(axis=0).astype(np.float64) / (len(members) * scale)
                nm = np.linalg.norm(m)
                if nm > 0:
                    C[c] = m / nm
    assign = np.argmax(Vn @ C.T, axis=1)
    clusters, n_vecs, id_sums = [], [], []
    for c in range(k):
        mask = assign == c
        if mask.any():
            clusters.append(c)
            n_vecs.append(int(mask.sum()))
            id_sums.append(int(ids[mask].sum()))
    return pa.table({
        "cluster": pa.array(clusters, pa.int64()),
        "n_vecs": pa.array(n_vecs, pa.int64()),
        "id_sum": pa.array(id_sums, pa.int64()),
    })


# ---------------------------------------------------------------------------
# perplexity oracles
# ---------------------------------------------------------------------------


def so_perplexity(sf_dir: str) -> pa.Table:
    from ..stages.perplexity_stage import _SEEDS, CharLM

    models = {lang: CharLM(seed) for lang, seed in _SEEDS.items()}
    fallback = CharLM(" ".join(_SEEDS.values()))
    t = _docs(sf_dir, ("doc_id", "text", "lang"))
    ppls = [
        models.get(lang, fallback).perplexity(text or "")
        for text, lang in zip(t.column("text").to_pylist(), t.column("lang").to_pylist())
    ]
    return pa.table(
        {"doc_id": t.column("doc_id"), "ppl": pa.array(ppls, pa.float32())}
    )


def so_corpus_ppl(sf_dir: str) -> pa.Table:
    import math

    from ..stages.lm_train import _count_batch
    from ..stages.perplexity_stage import CharLM

    t = _docs(sf_dir)
    counts = _count_batch(t, "text")  # whole corpus in one serial pass
    kinds = counts.column("kind").to_pylist()
    grams = counts.column("gram").to_pylist()
    ns = counts.column("n").to_pylist()
    tri = {g: n for k, g, n in zip(kinds, grams, ns) if k == "3"}
    bi = {g: n for k, g, n in zip(kinds, grams, ns) if k == "2"}
    uni = {g: n for k, g, n in zip(kinds, grams, ns) if k == "1"}
    n_chars = sum(n for k, _, n in zip(kinds, grams, ns) if k == "N")
    if len(tri) > 500_000:
        # the engine's max_grams cap would truncate by count with pandas
        # nlargest tie-order — refuse to fixture that nondeterminism
        raise RuntimeError("corpus trigram domain exceeds the fixture-safe cap")
    lm = CharLM.from_counts(tri, bi, uni, n_chars)
    milli = []
    for text in t.column("text").to_pylist():
        p = lm.perplexity(text or "")
        milli.append(int(p * 1000) if math.isfinite(p) else -1)
    return pa.table(
        {"doc_id": t.column("doc_id"), "ppl_milli": pa.array(milli, pa.int64())}
    )


def so_ccnet_buckets(sf_dir: str) -> pa.Table:
    """Serial twin of q_ccnet_buckets: the so_corpus_ppl CharLM path for
    milli perplexities, then per-language tercile cuts with the SAME rank
    definition as grouped_quantiles_exact (value at 1-based rank
    ceil(q·n) of the sorted non-sentinel column), label by x <= cut."""
    ppl_t = so_corpus_ppl(sf_dir)
    ids = ppl_t.column("doc_id").to_numpy()
    milli = ppl_t.column("ppl_milli").to_numpy()
    lang_t = pq.read_table(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    lang_map = dict(zip(lang_t.column("doc_id").to_pylist(),
                        lang_t.column("lang").to_pylist()))
    langs = np.asarray([lang_map[int(i)] for i in ids])
    qs, labels = [1.0 / 3.0, 2.0 / 3.0], ["head", "middle", "tail"]
    cuts: dict = {}
    for g in np.unique(langs):
        v = np.sort(milli[(langs == g) & (milli != -1)])
        if len(v) == 0:
            continue
        cuts[g] = [int(v[max(int(np.ceil(q * len(v))), 1) - 1]) for q in qs]
    buckets = []
    for g, x in zip(langs, milli):
        edges = cuts.get(g)
        if edges is None or x == -1:
            buckets.append("na")
            continue
        buckets.append(labels[int(np.searchsorted(np.asarray(edges), x,
                                                  side="left"))])
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array(langs, pa.string()),
        "ppl_milli": pa.array(milli, pa.int64()),
        "bucket": pa.array(buckets, pa.string()),
    })


# ---------------------------------------------------------------------------
# audio / image / video oracles — serial input synthesis + the SAME batch
# callables the stages run, applied once to the whole table
# ---------------------------------------------------------------------------


def _clips(sf_dir: str) -> pa.Table:
    from ..sources.clips import clips_table_from_documents

    return clips_table_from_documents(sf_dir)


def so_audio_features(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import AudioFeatureActor

    out = AudioFeatureActor(PipelineConfig())(_clips(sf_dir))
    return out.select(
        ["clip_id", "codec", "decode_ok", "n_samples", "audio_rms", "clip_ratio"]
    )


def so_audio_spectral(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import AudioSpectralActor

    out = AudioSpectralActor(PipelineConfig())(_clips(sf_dir))
    return out.select(
        ["clip_id", "decode_ok", "centroid_hz", "bandwidth_hz", "rolloff_hz",
         "dominant_hz", "zcr"]
    )


def so_vad_stats(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import AudioFeatureActor, vad_stats_batch

    feats = AudioFeatureActor(PipelineConfig())(_clips(sf_dir))
    out = vad_stats_batch(feats)
    return out.select(
        ["clip_id", "silence_ratio", "lead_silence_ms", "trail_silence_ms",
         "n_speech_segments"]
    )


def so_audio_transform(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import AudioTransformActor

    out = AudioTransformActor(PipelineConfig())(_clips(sf_dir))
    return out.select(["clip_id", "sr_hz", "codec", "transform_ok"])


def so_vad_segments(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import VadSegmentActor, gapped_clips_batch

    gapped = gapped_clips_batch(_clips(sf_dir))
    out = VadSegmentActor(PipelineConfig(), emit_audio=False)(gapped)
    df = out.to_pandas()
    df["seg_rms_milli"] = np.floor(
        df["seg_rms"].to_numpy().astype(np.float64) * 1000 + 0.5
    ).astype(np.int64)
    for c in ("seg_idx", "start_ms", "end_ms", "dur_ms"):
        df[c] = df[c].astype(np.int64)
    df = df[["clip_id", "seg_idx", "start_ms", "end_ms", "dur_ms",
             "seg_rms_milli"]]
    return pa.Table.from_pandas(
        df.sort_values(["clip_id", "seg_idx"]).reset_index(drop=True),
        preserve_index=False,
    )


def so_adpcm_roundtrip(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import AudioFeatureActor
    from .queries import _adpcmify_batch

    out = AudioFeatureActor(PipelineConfig())(_adpcmify_batch(_clips(sf_dir)))
    return out.select(["clip_id", "codec", "decode_ok", "n_samples", "audio_rms"])


def so_flac_roundtrip(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import AudioFeatureActor
    from .queries import _flacify_batch

    out = AudioFeatureActor(PipelineConfig())(_flacify_batch(_clips(sf_dir)))
    return out.select(["clip_id", "codec", "decode_ok", "n_samples", "audio_rms"])


def so_image_features(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.image import ImageFeatureActor
    from .queries import _synth_image_rows

    imgs = _synth_image_rows(_docs(sf_dir, ("doc_id",)))
    out = ImageFeatureActor(PipelineConfig(), (12, 16))(imgs)
    return out.select(
        ["clip_id", "format", "decode_ok", "width", "height", "mean_lum", "std_lum"]
    )


def so_image_near_dup(sf_dir: str) -> pa.Table:
    """Serial twin for q_image_near_dup: same decode + dHash bank
    (established shared-bank pattern), INDEPENDENT pair orchestration —
    dict-bucketed 16-bit pigeonhole chunks via ``_bucket_pairs`` (with the
    engine's MAX_BUCKET cap) + per-pair popcount verification, no Ray, no
    pandas self-merge."""
    from ..functions.imagehash import dhash64, hamming64_u64
    from ..stages.image import ImageDecodeUnsupported, decode_image
    from .queries import _synth_neardup_image_rows

    imgs = _synth_neardup_image_rows(_docs(sf_dir, ("doc_id",)))
    ids_raw = imgs.column("img_id").to_numpy()
    bufs = imgs.column("bytes").to_pylist()
    fmts = imgs.column("format").to_pylist()
    kept_ids, hashes = [], []
    for i, buf, fmt in zip(ids_raw, bufs, fmts):
        try:
            img = decode_image(buf or b"", fmt or "")
        except (ImageDecodeUnsupported, ValueError, IndexError, MemoryError):
            continue  # the truncated stratum: engine filters decode_ok=False
        kept_ids.append(int(i))
        hashes.append(dhash64(img))
    ids = np.asarray(kept_ids, dtype=np.int64)
    cand = _bucket_pairs(
        ids,
        lambda r: ((ci, (hashes[r] >> (16 * ci)) & 0xFFFF) for ci in range(4)),
    )
    id_to_row = {int(i): r for r, i in enumerate(ids)}
    ok = {
        (a, b)
        for a, b in cand
        if hamming64_u64(hashes[id_to_row[a]], hashes[id_to_row[b]]) <= 3
    }
    return _pairs_table(ok)


def so_pq_topk(sf_dir: str) -> pa.Table:
    """Serial twin for q_pq_topk: same md5-bucket sample, per-subspace
    Lloyd, encode and ADC-LUT kernels (shared bank), plain-numpy
    orchestration over the raw parquet — bit-identical distances."""
    from ..stages.ann import (_PQ_BUCKETS, _l2_kmeans, _pq_member_mask,
                              _pq_split, _unit_rows, adc_distances, adc_lut,
                              pq_encode_matrix)

    ids, V = _embeddings(sf_dir)
    q = V[int(np.nonzero(ids == 0)[0][0])]
    frac = min(1.0, (4.0 * 2000) / max(len(ids), 1))
    cut = min(_PQ_BUCKETS, int(np.ceil(_PQ_BUCKETS * frac)))
    mask = _pq_member_mask(ids, cut)
    s_ids, s_V = ids[mask], V[mask]
    order = np.argsort(s_ids, kind="mergesort")
    S = _unit_rows(s_V[order][:2000])
    cb = np.stack([_l2_kmeans(S[:, a:b], 16)
                   for a, b in _pq_split(S.shape[1], 8)])
    codes = pq_encode_matrix(V, cb)
    d = adc_distances(codes, adc_lut(q, cb))
    top = np.lexsort((ids, d))[:20]
    return pa.table({
        "vec_id": pa.array(ids[top], pa.int64()),
        "adc_micro": pa.array(np.round(d[top] * 1e6).astype(np.int64),
                              pa.int64()),
    })


def so_halluc_loops(sf_dir: str) -> pa.Table:
    """Serial twin for q_halluc_loops: same planted strata + loop kernel
    per row, plain loop, no Ray."""
    from ..functions.halluc import loop_stats
    from .queries import _halluc_texts

    t = _docs(sf_dir)
    ids = t.column("doc_id").to_numpy()
    texts = _halluc_texts(ids, t.column("text").to_pylist())
    stats = [loop_stats(x) for x in texts]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_words": pa.array([s["n_words"] for s in stats], pa.int64()),
        "loop_period": pa.array([s["loop_period"] for s in stats], pa.int64()),
        "loop_len": pa.array([s["loop_len"] for s in stats], pa.int64()),
        "loop_ratio_milli": pa.array(
            [int(np.floor(s["loop_ratio"] * 1000 + 0.5)) for s in stats],
            pa.int64()),
        "dup3_ratio_milli": pa.array(
            [int(np.floor(s["dup3_ratio"] * 1000 + 0.5)) for s in stats],
            pa.int64()),
        "halluc": pa.array([s["halluc"] for s in stats], pa.bool_()),
    })


def so_music_detect(sf_dir: str) -> pa.Table:
    """Serial twin for q_music_detect: same corpus generator + decode +
    musicness kernel + decision per row, plain loop, no Ray."""
    from ..functions.audiofp import classify_audio_content, musicness_stats
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _musicmix_clips_batch

    clips = _musicmix_clips_batch(_docs(sf_dir, ("doc_id",)))
    keys = ("mod_ratio", "env_depth", "flatness", "flux")
    out = {"clip_id": [], "decode_ok": [], "audio_class": []}
    milli = {k: [] for k in keys}
    for cid, buf, codec, sr in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(), clips.column("sr_hz").to_pylist(),
    ):
        try:
            stats = musicness_stats(_decode_one(buf or b"", codec or ""),
                                    int(sr or 0))
            ok, klass = True, classify_audio_content(stats)
        except DecodeUnsupported:
            stats = {k: 0.0 for k in keys}
            ok, klass = False, "undecodable"
        out["clip_id"].append(cid)
        out["decode_ok"].append(ok)
        out["audio_class"].append(klass)
        for k in keys:
            milli[k].append(int(np.floor(stats[k] * 1000 + 0.5)))
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
        "mod_ratio_milli": pa.array(milli["mod_ratio"], pa.int64()),
        "env_depth_milli": pa.array(milli["env_depth"], pa.int64()),
        "flatness_milli": pa.array(milli["flatness"], pa.int64()),
        "flux_milli": pa.array(milli["flux"], pa.int64()),
        "audio_class": pa.array(out["audio_class"], pa.string()),
    })


def so_audio_bandwidth(sf_dir: str) -> pa.Table:
    """Serial twin for q_audio_bandwidth: same corpus generator + decode +
    rolloff kernel per row, plain loop, no Ray."""
    from ..functions.audiofp import MIN_BW_RATIO, bandwidth_stats
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _bandlimited_clips_batch

    clips = _bandlimited_clips_batch(_docs(sf_dir, ("doc_id",)))
    out = {"clip_id": [], "decode_ok": [], "bw_hz": [], "bw_ratio": [],
           "upsampled": []}
    for cid, buf, codec, sr in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(), clips.column("sr_hz").to_pylist(),
    ):
        try:
            stats = bandwidth_stats(_decode_one(buf or b"", codec or ""),
                                    int(sr or 0))
            ok = True
        except DecodeUnsupported:
            stats = {"bw_hz": 0.0, "bw_ratio": 0.0}
            ok = False
        out["clip_id"].append(cid)
        out["decode_ok"].append(ok)
        out["bw_hz"].append(stats["bw_hz"])
        out["bw_ratio"].append(stats["bw_ratio"])
        out["upsampled"].append(ok and stats["bw_ratio"] > 0.0
                                and stats["bw_ratio"] < MIN_BW_RATIO)
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
        "bw_hz": pa.array(out["bw_hz"], pa.float32()),
        "bw_ratio": pa.array(out["bw_ratio"], pa.float32()),
        "upsampled": pa.array(out["upsampled"], pa.bool_()),
    })


def so_audio_humdc(sf_dir: str) -> pa.Table:
    """Serial twin for q_audio_humdc: same corpus generator + decode +
    hum/DC kernel per row, plain loop, no Ray."""
    from ..functions.audiofp import MAX_DC_RATIO, MAX_HUM_RATIO, hum_stats
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _humdc_clips_batch

    clips = _humdc_clips_batch(_docs(sf_dir, ("doc_id",)))
    out = {"clip_id": [], "decode_ok": [], "dc_ratio": [], "hum_ratio": [],
           "dc_offset": [], "hum": []}
    for cid, buf, codec, sr in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(), clips.column("sr_hz").to_pylist(),
    ):
        try:
            stats = hum_stats(_decode_one(buf or b"", codec or ""),
                              int(sr or 0))
            ok = True
        except DecodeUnsupported:
            stats = {"dc_ratio": 0.0, "hum_ratio": 0.0}
            ok = False
        out["clip_id"].append(cid)
        out["decode_ok"].append(ok)
        out["dc_ratio"].append(stats["dc_ratio"])
        out["hum_ratio"].append(stats["hum_ratio"])
        out["dc_offset"].append(ok and stats["dc_ratio"] > MAX_DC_RATIO)
        out["hum"].append(ok and stats["hum_ratio"] > MAX_HUM_RATIO)
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
        "dc_ratio": pa.array(out["dc_ratio"], pa.float32()),
        "hum_ratio": pa.array(out["hum_ratio"], pa.float32()),
        "dc_offset": pa.array(out["dc_offset"], pa.bool_()),
        "hum": pa.array(out["hum"], pa.bool_()),
    })


def so_audio_reverb(sf_dir: str) -> pa.Table:
    """Serial twin for q_audio_reverb: same corpus generator + decode +
    reverb kernel per row, plain loop, no Ray."""
    from ..functions.audiofp import MAX_REVERB_RT60_MS, reverb_stats
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _reverb_clips_batch

    clips = _reverb_clips_batch(_docs(sf_dir, ("doc_id",)))
    out = {"clip_id": [], "decode_ok": [], "rt60_ms": [], "decay_db_s": [],
           "reverberant": []}
    for cid, buf, codec, sr in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(), clips.column("sr_hz").to_pylist(),
    ):
        try:
            stats = reverb_stats(_decode_one(buf or b"", codec or ""),
                                 int(sr or 0))
            ok = True
        except DecodeUnsupported:
            stats = {"rt60_ms": 0.0, "decay_db_s": 0.0}
            ok = False
        out["clip_id"].append(cid)
        out["decode_ok"].append(ok)
        out["rt60_ms"].append(stats["rt60_ms"])
        out["decay_db_s"].append(stats["decay_db_s"])
        out["reverberant"].append(ok and stats["rt60_ms"] > MAX_REVERB_RT60_MS)
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
        "rt60_ms": pa.array(out["rt60_ms"], pa.float32()),
        "decay_db_s": pa.array(out["decay_db_s"], pa.float32()),
        "reverberant": pa.array(out["reverberant"], pa.bool_()),
    })


def so_prepare_speech(sf_dir: str) -> pa.Table:
    """Serial twin for q_prepare_speech: the same four actors chained on
    one table, no Ray — checks the distributed plumbing end to end."""
    import hashlib

    from ..config import PipelineConfig
    from ..stages.audioquality import (AudioDenoiseActor,
                                       AudioQcActor, LoudnessNormalizeActor)
    from ..stages.multimodal import VadSegmentActor
    from .queries import _qc_clips_batch

    cfg = PipelineConfig()
    clips = _qc_clips_batch(_docs(sf_dir, ("doc_id",)))
    qc = AudioQcActor(cfg)(clips)
    kept = qc.filter(qc.column("keep")).select(
        [cfg.id_col, cfg.bytes_col, cfg.codec_col, "sr_hz"])
    den = AudioDenoiseActor(cfg)(kept)
    norm = LoudnessNormalizeActor(cfg)(den)
    segs = VadSegmentActor(cfg, threshold=0.01, min_seg_ms=100,
                           emit_audio=True)(norm)
    md5s = [hashlib.md5(b or b"").hexdigest()
            for b in segs.column("bytes").to_pylist()]
    tbl = segs.select(["clip_id", "seg_idx", "start_ms", "end_ms", "dur_ms"])
    tbl = tbl.append_column("seg_md5", pa.array(md5s, pa.string()))
    import pandas as pd

    df = tbl.to_pandas().sort_values(["clip_id", "seg_idx"]).reset_index(
        drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def so_audio_qc(sf_dir: str) -> pa.Table:
    """Serial twin for q_audio_qc: same corpus generator + the SAME
    fused actor run serially per batch (the actor is deterministic and
    stateless; the twin checks the distributed plumbing)."""
    from ..config import PipelineConfig
    from ..stages.audioquality import AudioQcActor
    from .queries import _qc_clips_batch

    clips = _qc_clips_batch(_docs(sf_dir, ("doc_id",)))
    out = AudioQcActor(PipelineConfig())(clips)
    return out.select(
        ["clip_id", "decode_ok", "sniffed", "codec_mismatch", "dc_offset",
         "hum", "upsampled", "reverberant", "clipped", "dropout",
         "dead_channel", "fake_stereo", "phase_inverted", "keep"])


def so_lang_consistency(sf_dir: str) -> pa.Table:
    """Serial twin for q_lang_consistency: identical injection + the same
    window/majority arithmetic applied serially (shared langid bank —
    the injection and orchestration are independent)."""
    from collections import Counter

    from ..functions.langid import lang_from_text

    docs = _docs(sf_dir, ("doc_id", "text"))
    zh = "这是一个中文段落，用来测试语言一致性检测器的窗口投票机制。" * 10
    W = 256
    out = {k: [] for k in ("doc_id", "doc_lang", "n_windows",
                           "n_classified", "n_disagree", "switch_ppm",
                           "code_switched")}
    for did, t in zip(docs.column("doc_id").to_pylist(),
                      docs.column("text").to_pylist()):
        t = ((t or "") + zh) if int(did) % 6 == 0 else (t or "")
        dl = lang_from_text(t)[0]
        wins = [t[i:i + W] for i in range(0, len(t), W)]
        cls = [x for x in (lang_from_text(w)[0] for w in wins) if x]
        if cls:
            counts = Counter(cls)
            best = max(counts.values())
            anchor = min(k for k, v in counts.items() if v == best)
            dis = [x for x in cls if x != anchor]
        else:
            dis = []
        p = (len(dis) * 1_000_000 // len(cls)) if cls else 0
        out["doc_id"].append(did)
        out["doc_lang"].append(dl)
        out["n_windows"].append(len(wins))
        out["n_classified"].append(len(cls))
        out["n_disagree"].append(len(dis))
        out["switch_ppm"].append(p)
        out["code_switched"].append(p > 200_000 and len(cls) >= 2)
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "doc_lang": pa.array(out["doc_lang"], pa.string()),
        "n_windows": pa.array(out["n_windows"], pa.int64()),
        "n_classified": pa.array(out["n_classified"], pa.int64()),
        "n_disagree": pa.array(out["n_disagree"], pa.int64()),
        "switch_ppm": pa.array(out["switch_ppm"], pa.int64()),
        "code_switched": pa.array(out["code_switched"], pa.bool_()),
    })


def so_flac_transcode(sf_dir: str) -> pa.Table:
    """Serial twin for q_flac_transcode: same actor applied to the serial
    clip table."""
    from ..config import PipelineConfig
    from ..stages.multimodal import FlacTranscodeActor

    out = FlacTranscodeActor(PipelineConfig())(_clips(sf_dir))
    return out.select(["clip_id", "flac_ok", "lossless", "n_bytes_in",
                       "n_bytes_flac"])


def so_utterance_pack(sf_dir: str) -> pa.Table:
    """Serial twin for q_utterance_pack: serial VAD explode (same actor)
    then the serial FFD of so_pack_bins at capacity 30 000 / 8 buckets."""
    import pandas as pd

    from ..config import PipelineConfig
    from ..stages.multimodal import VadSegmentActor, gapped_clips_batch
    from ..stages.stats import split_bucket

    gapped = gapped_clips_batch(_clips(sf_dir))
    segs = VadSegmentActor(PipelineConfig(), emit_audio=False)(gapped)
    df = segs.to_pandas()
    df["seg_id"] = [f"{c}:{i}" for c, i in zip(df["clip_id"],
                                               df["seg_idx"])]
    df["dur_ms"] = df["dur_ms"].astype("int64")
    df = df[["seg_id", "dur_ms"]]
    df["bucket"] = [split_bucket(str(i), 8) for i in df["seg_id"]]
    capacity = 30_000
    parts = []
    for b, g in df.groupby("bucket"):
        g = g.copy()
        g = g.sort_values(["dur_ms", "seg_id"], ascending=[False, True],
                          kind="mergesort")
        bins, assign, oversize = [], [], []
        for s in g["dur_ms"]:
            s = int(s)
            if s > capacity:
                assign.append(len(bins))
                bins.append(0)
                oversize.append(True)
                continue
            oversize.append(False)
            for j, rem in enumerate(bins):
                if rem >= s:
                    assign.append(j)
                    bins[j] = rem - s
                    break
            else:
                assign.append(len(bins))
                bins.append(capacity - s)
        g["bin"] = assign
        g["oversize"] = oversize
        g["bin_fill"] = g.groupby("bin")["dur_ms"].transform("sum")
        parts.append(g)
    out = pd.concat(parts).sort_values("seg_id").reset_index(drop=True)
    return pa.table({
        "seg_id": pa.array(out["seg_id"], pa.string()),
        "dur_ms": pa.array(out["dur_ms"].astype("int64")),
        "bucket": pa.array(out["bucket"].astype("int64")),
        "bin": pa.array(out["bin"].astype("int64")),
        "bin_fill": pa.array(out["bin_fill"].astype("int64")),
        "oversize": pa.array(out["oversize"].astype(bool)),
    })


def so_audio_compress(sf_dir: str) -> pa.Table:
    """Serial twin for q_audio_compress: same corpus generator + decode +
    compressor kernel per row, no Ray."""
    from ..functions.audiofp import compress_dynamics
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _noisy_clips_batch

    clips = _noisy_clips_batch(_docs(sf_dir, ("doc_id",)))
    out = {"clip_id": [], "compress_ok": [], "gain_reduction_db": [],
           "out_rms": []}
    for cid, buf, codec, sr in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(), clips.column("sr_hz").to_pylist(),
    ):
        try:
            pcm = _decode_one(buf or b"", codec or "")
            if len(pcm) == 0:
                raise DecodeUnsupported("empty")
            y, gr = compress_dynamics(pcm, int(sr or 0))
            ok, rms = True, float(np.sqrt(np.mean(y.astype(np.float64) ** 2)))
        except DecodeUnsupported:
            ok, gr, rms = False, 0.0, 0.0
        out["clip_id"].append(cid)
        out["compress_ok"].append(ok)
        out["gain_reduction_db"].append(gr)
        out["out_rms"].append(rms)
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "compress_ok": pa.array(out["compress_ok"], pa.bool_()),
        "gain_reduction_db": pa.array(out["gain_reduction_db"],
                                      pa.float32()),
        "out_rms": pa.array(out["out_rms"], pa.float32()),
    })


def so_audio_denoise(sf_dir: str) -> pa.Table:
    """Serial twin for q_audio_denoise: same corpus generator + decode +
    spectral-subtraction kernel per row, no Ray."""
    from ..functions.audiofp import denoise_spectral
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _noisy_clips_batch

    clips = _noisy_clips_batch(_docs(sf_dir, ("doc_id",)))
    out = {"clip_id": [], "denoise_ok": [], "noise_floor_db": [],
           "out_rms": []}
    for cid, buf, codec, sr in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(), clips.column("sr_hz").to_pylist(),
    ):
        try:
            pcm = _decode_one(buf or b"", codec or "")
            if len(pcm) == 0:
                raise DecodeUnsupported("empty")
            y, fdb = denoise_spectral(pcm, int(sr or 0))
            ok, rms = True, float(np.sqrt(np.mean(y.astype(np.float64) ** 2)))
        except DecodeUnsupported:
            ok, fdb, rms = False, 0.0, 0.0
        out["clip_id"].append(cid)
        out["denoise_ok"].append(ok)
        out["noise_floor_db"].append(fdb)
        out["out_rms"].append(rms)
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "denoise_ok": pa.array(out["denoise_ok"], pa.bool_()),
        "noise_floor_db": pa.array(out["noise_floor_db"], pa.float32()),
        "out_rms": pa.array(out["out_rms"], pa.float32()),
    })


def so_audio_channels(sf_dir: str) -> pa.Table:
    """Serial twin for q_audio_channels: same corpus generator +
    channel-preserving decode + kernel + flag rules per row, no Ray."""
    from ..functions.audiofp import (CHAN_BALANCE_DB, CHAN_DEAD_RATIO,
                                     CHAN_FAKE_CORR, CHAN_INVERT_CORR,
                                     channel_stats)
    from ..stages.multimodal import DecodeUnsupported, _decode_one_multi
    from .queries import _channel_clips_batch

    clips = _channel_clips_batch(_docs(sf_dir, ("doc_id",)))
    balance = 10.0 ** (-CHAN_BALANCE_DB / 20.0)
    out = {k: [] for k in ("clip_id", "decode_ok", "n_channels", "lr_corr",
                           "rms_ratio", "dead_channel", "fake_stereo",
                           "phase_inverted")}
    for cid, buf, codec in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(),
    ):
        try:
            stats = channel_stats(_decode_one_multi(buf or b"", codec or ""))
            ok = True
        except DecodeUnsupported:
            stats = {"n_channels": 0, "lr_corr": 0.0, "rms_ratio": 1.0}
            ok = False
        stereo = ok and stats["n_channels"] >= 2
        out["clip_id"].append(cid)
        out["decode_ok"].append(ok)
        out["n_channels"].append(stats["n_channels"])
        out["lr_corr"].append(stats["lr_corr"])
        out["rms_ratio"].append(stats["rms_ratio"])
        out["dead_channel"].append(
            stereo and stats["rms_ratio"] < CHAN_DEAD_RATIO)
        out["fake_stereo"].append(
            stereo and stats["lr_corr"] > CHAN_FAKE_CORR
            and stats["rms_ratio"] > balance)
        out["phase_inverted"].append(
            stereo and stats["lr_corr"] < CHAN_INVERT_CORR)
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
        "n_channels": pa.array(out["n_channels"], pa.int32()),
        "lr_corr": pa.array(out["lr_corr"], pa.float32()),
        "rms_ratio": pa.array(out["rms_ratio"], pa.float32()),
        "dead_channel": pa.array(out["dead_channel"], pa.bool_()),
        "fake_stereo": pa.array(out["fake_stereo"], pa.bool_()),
        "phase_inverted": pa.array(out["phase_inverted"], pa.bool_()),
    })


def so_codec_sniff(sf_dir: str) -> pa.Table:
    """Serial twin for q_codec_sniff: same corpus generator + sniff
    kernel per row, no Ray."""
    from ..functions.audiofp import codec_mismatch
    from .queries import _sniff_clips_batch

    clips = _sniff_clips_batch(_docs(sf_dir, ("doc_id",)))
    out = {"clip_id": [], "codec": [], "sniffed": [], "codec_mismatch": []}
    for cid, buf, codec in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(),
    ):
        s, m = codec_mismatch(buf or b"", codec or "")
        out["clip_id"].append(cid)
        out["codec"].append(codec)
        out["sniffed"].append(s or "")
        out["codec_mismatch"].append(m)
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "codec": pa.array(out["codec"], pa.string()),
        "sniffed": pa.array(out["sniffed"], pa.string()),
        "codec_mismatch": pa.array(out["codec_mismatch"], pa.bool_()),
    })


def so_pack_bins(sf_dir: str) -> pa.Table:
    """Serial twin for q_pack_bins: same md5 bucketing and FFD, one
    plain-pandas loop per bucket, no Ray."""
    import pandas as pd

    from ..stages.stats import split_bucket

    docs = _docs(sf_dir, ("doc_id", "text"))
    ids = docs.column("doc_id").to_pylist()
    n_tok = [len((t or "").split()) for t in docs.column("text").to_pylist()]
    df = pd.DataFrame({"doc_id": ids, "n_tok": n_tok})
    df["bucket"] = [split_bucket(str(i), 8) for i in df["doc_id"]]
    capacity = 512
    parts = []
    for b, g in df.groupby("bucket"):
        g = g.copy()
        g["_id_s"] = g["doc_id"].astype(str)
        g = g.sort_values(["n_tok", "_id_s"], ascending=[False, True],
                          kind="mergesort")
        bins, assign, oversize = [], [], []
        for s in g["n_tok"]:
            s = int(s)
            if s > capacity:
                assign.append(len(bins))
                bins.append(0)
                oversize.append(True)
                continue
            oversize.append(False)
            for j, rem in enumerate(bins):
                if rem >= s:
                    assign.append(j)
                    bins[j] = rem - s
                    break
            else:
                assign.append(len(bins))
                bins.append(capacity - s)
        g["bin"] = assign
        g["oversize"] = oversize
        g["bin_fill"] = g.groupby("bin")["n_tok"].transform("sum")
        parts.append(g.drop(columns="_id_s"))
    out = pd.concat(parts).sort_values("doc_id").reset_index(drop=True)
    return pa.table({
        "doc_id": pa.array(out["doc_id"].astype("int64")),
        "n_tok": pa.array(out["n_tok"].astype("int64")),
        "bucket": pa.array(out["bucket"].astype("int64")),
        "bin": pa.array(out["bin"].astype("int64")),
        "bin_fill": pa.array(out["bin_fill"].astype("int64")),
        "oversize": pa.array(out["oversize"], pa.bool_()),
    })


def so_unimax_resample(sf_dir: str) -> pa.Table:
    """Serial twin for q_unimax_resample: same lang derivation, waterfall
    and md5-bucket membership (shared bank), plain-pandas orchestration."""
    import math

    from ..stages.stats import _unimax_waterfall, split_bucket
    from .queries import _unimax_langs_batch

    t = _unimax_langs_batch(_docs(sf_dir, ("doc_id",)))
    ids = t.column("doc_id").to_numpy()
    langs = t.column("lang").to_pylist()
    cmap: dict = {}
    for k in langs:
        cmap[k] = cmap.get(k, 0) + 1
    quotas = _unimax_waterfall(cmap, 0.4 * len(ids), 3.0)
    thresholds = {
        k: int(math.floor(min(1.0, quotas[k] / n) * 10_000 + 0.5))
        for k, n in cmap.items()
    }
    keep_ids, keep_langs = [], []
    for i, k in zip(ids, langs):
        if split_bucket(str(i), 10_000, "") < thresholds[k]:
            keep_ids.append(int(i))
            keep_langs.append(k)
    return pa.table({"doc_id": pa.array(keep_ids, pa.int64()),
                     "lang": pa.array(keep_langs, pa.string())})


def so_prepare_image(sf_dir: str) -> pa.Table:
    """Serial twin for q_prepare_image: same decode/stats/hash/resize bank
    (ImageFeatureActor applied serially, dHash), INDEPENDENT gate / pair /
    union-find / winner orchestration."""
    import hashlib as _h

    from ..config import PipelineConfig
    from ..functions.imagehash import dhash64, hamming64_u64
    from ..stages.image import (ImageDecodeUnsupported, ImageFeatureActor,
                                decode_image, image_stats)
    from .queries import _prepimg_rows

    imgs = _prepimg_rows(_docs(sf_dir, ("doc_id",)))
    ids_raw = imgs.column("img_id").to_numpy()
    bufs = imgs.column("bytes").to_pylist()
    fmts = imgs.column("format").to_pylist()
    kept_ids, kept_rows, hashes = [], {}, []
    for i, buf, fmt in zip(ids_raw, bufs, fmts):
        try:
            img = decode_image(buf or b"", fmt or "")
        except (ImageDecodeUnsupported, ValueError, IndexError, MemoryError):
            continue
        s = image_stats(img)
        if s["width"] < 8 or s["height"] < 8 or np.float32(s["std_lum"]) < 1.0:
            continue
        kept_ids.append(int(i))
        kept_rows[int(i)] = (buf, fmt)
        hashes.append(dhash64(img))
    ids = np.asarray(kept_ids, dtype=np.int64)
    cand = _bucket_pairs(
        ids,
        lambda r: ((ci, (hashes[r] >> (16 * ci)) & 0xFFFF) for ci in range(4)),
    )
    id_to_row = {int(i): r for r, i in enumerate(ids)}
    pairs = {
        (a, b)
        for a, b in cand
        if hamming64_u64(hashes[id_to_row[a]], hashes[id_to_row[b]]) <= 3
    }
    labels = _union_find(pairs)
    losers = {n for n, c in labels.items() if n != c}
    survivors = [i for i in kept_ids if i not in losers]

    actor = ImageFeatureActor(PipelineConfig(id_col="img_id"), (12, 16))
    rows = {"img_id": [], "width": [], "height": [], "mean_lum": [],
            "std_lum": [], "bytes_md5": []}
    for i in survivors:
        buf, fmt = kept_rows[i]
        t = actor(pa.table({
            "img_id": pa.array([i], pa.int64()),
            "bytes": pa.array([buf], pa.binary()),
            "format": pa.array([fmt], pa.string()),
        }))
        rows["img_id"].append(i)
        rows["width"].append(t.column("width")[0].as_py())
        rows["height"].append(t.column("height")[0].as_py())
        rows["mean_lum"].append(t.column("mean_lum")[0].as_py())
        rows["std_lum"].append(t.column("std_lum")[0].as_py())
        rows["bytes_md5"].append(
            _h.md5(t.column("bytes")[0].as_py() or b"").hexdigest())
    return pa.table({
        "img_id": pa.array(rows["img_id"], pa.int64()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "mean_lum": pa.array(rows["mean_lum"], pa.float32()),
        "std_lum": pa.array(rows["std_lum"], pa.float32()),
        "bytes_md5": pa.array(rows["bytes_md5"], pa.string()),
    })


def so_decontaminate_spans(sf_dir: str) -> pa.Table:
    """Serial twin for q_decontaminate_spans: same gram hash bank
    (ngram_set for the bench union, ngram_seq for positions), independent
    per-row coverage loop."""
    t_docs = _docs(sf_dir)
    ids = t_docs.column("doc_id").to_numpy()
    texts = t_docs.column("text").to_pylist()
    bench_chunks = [
        fp.ngram_set(" ".join((t or "").split()[:12]), 8)
        for i, t in zip(ids, texts) if int(i) % 17 == 0
    ]
    bench_chunks = [a for a in bench_chunks if len(a)]
    bg = (np.unique(np.concatenate(bench_chunks)) if bench_chunks
          else np.zeros(0, dtype=np.uint64))
    bench_set = set(int(g) for g in bg)
    out = {"doc_id": [], "text": [], "n_cut_words": [],
           "decontaminated": []}
    for i, t in zip(ids, texts):
        t = t or ""
        words = t.split()
        seq = fp.ngram_seq(t, 8)
        covered = [False] * len(words)
        for pos, g in enumerate(seq):
            if int(g) in bench_set:
                if len(words) < 8:
                    covered = [True] * len(words)
                else:
                    for j in range(pos, min(pos + 8, len(words))):
                        covered[j] = True
        kept = [w for w, c in zip(words, covered) if not c]
        out["doc_id"].append(int(i))
        out["text"].append(" ".join(kept) if any(covered) else t)
        out["n_cut_words"].append(sum(covered))
        out["decontaminated"].append(any(covered))
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
        "n_cut_words": pa.array(out["n_cut_words"], pa.int64()),
        "decontaminated": pa.array(out["decontaminated"], pa.bool_()),
    })


def so_paragraph_dedup_bloom(sf_dir: str) -> pa.Table:
    """Serial twin for q_paragraph_dedup_bloom: an identically-sized
    BloomFilter built by one add_many over the prior paragraphs (the
    distributed OR-merge is bit-identical by construction), then a plain
    per-row cut loop."""
    from ..functions.bloom import BloomFilter

    t_docs = _docs(sf_dir)
    ids = t_docs.column("doc_id").to_numpy()
    texts = t_docs.column("text").to_pylist()
    injected = {
        int(i): f"boiler {int(i) % 17}\n{t or ''}\nfooter {int(i) % 23}"
        for i, t in zip(ids, texts)
    }
    prior_paras = [p for i, t in injected.items() if i % 4 == 0
                   for p in t.split("\n") if p]
    bf = BloomFilter(max(len(prior_paras), 1), bits_per_key=12, n_hashes=7)
    bf.add_many(prior_paras)
    out = {"doc_id": [], "text": [], "n_cut_paras": [], "had_prior_para": []}
    for i in sorted(injected):
        parts = injected[i].split("\n")
        nonempty = [p for p in parts if p]
        hit = dict(zip(nonempty, bf.contains_many(nonempty))) if nonempty else {}
        kept = [p for p in parts if not p or not hit[p]]
        out["doc_id"].append(i)
        out["text"].append("\n".join(kept))
        out["n_cut_paras"].append(len(parts) - len(kept))
        out["had_prior_para"].append(len(kept) < len(parts))
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "text": pa.array(out["text"], pa.string()),
        "n_cut_paras": pa.array(out["n_cut_paras"], pa.int64()),
        "had_prior_para": pa.array(out["had_prior_para"], pa.bool_()),
    })


def so_video_frames(sf_dir: str) -> pa.Table:
    from ..stages.image import frame_sample_batch
    from .queries import _synth_video_rows

    vids = _synth_video_rows(_docs(sf_dir, ("doc_id",)))
    out = frame_sample_batch(vids, "clip_id", "bytes", 4)
    return out.select(["clip_id", "frame_index", "decode_ok"])


_ORACLE_CACHE: dict = {}


def _oracle_decisions(sf_dir: str, cfg=None):
    """Serial row-oracle decisions over the clips table, memoized per
    (sf_dir, cfg identity) — the conformance trio shares two of three
    passes, and a full clips synthesis + oracle pass is the expensive part
    of fixture generation."""
    from ..config import DEFAULT_CONFIG
    from ..oracle import oracle_rows

    cfg = cfg or DEFAULT_CONFIG
    key = (sf_dir, id(cfg) if cfg is not DEFAULT_CONFIG else "default")
    if key not in _ORACLE_CACHE:
        rows = _clips(sf_dir).to_pylist()
        _ORACLE_CACHE.clear()  # bound: one corpus's decisions at a time
        _ORACLE_CACHE[key] = oracle_rows(rows, cfg)
    return _ORACLE_CACHE[key]


def so_clips_keep_stats(sf_dir: str) -> pa.Table:
    """Serial (keep, drop_reason) histogram from the row oracle — pins the
    flagship pipeline's drop-reason distribution exactly (the oracle and
    the engine share the function bank, so any engine deviation shows up
    as a histogram shift)."""
    counts: dict[tuple, int] = defaultdict(int)
    for r in _oracle_decisions(sf_dir):
        counts[(bool(r["keep"]), r["drop_reason"])] += 1
    keys = sorted(counts)
    return pa.table({
        "keep": pa.array([k for k, _ in keys], pa.bool_()),
        "drop_reason": pa.array([d for _, d in keys], pa.string()),
        "n": pa.array([counts[k] for k in keys], pa.int64()),
    })


def _f1_fixture(decisions, n_audio_dropped: bool) -> pa.Table:
    n = len(decisions)
    tp = sum(1 for r in decisions if r["keep"])
    cols = {
        "n_rows": pa.array([n], pa.int64()),
        "tp": pa.array([tp], pa.int64()),
        "fp": pa.array([0], pa.int64()),
        "fn": pa.array([0], pa.int64()),
    }
    if n_audio_dropped:
        gate = sum(1 for r in decisions
                   if r["drop_reason"] in ("silent_audio", "speech_rate"))
        cols["n_audio_dropped"] = pa.array([gate], pa.int64())
        cols["f1"] = pa.array([1.0], pa.float64())
    else:
        cols["precision"] = pa.array([1.0], pa.float64())
        cols["recall"] = pa.array([1.0], pa.float64())
        cols["f1"] = pa.array([1.0], pa.float64())
    return pa.table(cols)


def so_keepdrop_f1(sf_dir: str) -> pa.Table:
    """The conformance join's expected outcome: the engine must agree with
    the oracle on every row (fp = fn = 0, F1 = 1.0) and tp must equal the
    serial oracle's keep count — a deviation in EITHER direction fails."""
    return _f1_fixture(_oracle_decisions(sf_dir), n_audio_dropped=False)


def so_keepdrop_f1_audio(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig

    cfg = PipelineConfig(audio_gates=True, min_wps=0.5, max_wps=80.0,
                         with_perplexity=False)
    return _f1_fixture(_oracle_decisions(sf_dir, cfg), n_audio_dropped=True)


# ---------------------------------------------------------------------------
# registry + entry point
# ---------------------------------------------------------------------------

def so_semantic_dedup(sf_dir: str) -> pa.Table:
    """Serial twin of q_semantic_dedup: same augmentation helper, same
    micro-unit Lloyd (k=8, iters=4, init = first 8 rows — copies are
    appended after the originals, matching the distributed union order),
    serial within-cluster O(n²) cosine pairs ≥0.95, union-find, min-id
    representative kept."""
    from .queries import _semdedup_copies

    ids, V = _embeddings(sf_dir)
    cid, W = _semdedup_copies(ids, V)
    ids_a = np.concatenate([ids, cid])
    V_a = np.concatenate([V, W.astype(np.float64)])

    return _serial_semdedup_core(ids_a, V_a)


def _serial_microunit_kmeans(Vn: np.ndarray, k: int = 8, iters: int = 4,
                             init: np.ndarray | None = None,
                             return_centroids: bool = False):
    """The distributed kmeans_fit_distributed's exact serial twin (init =
    first k rows per the order contract, or an explicit init matrix;
    micro-unit integer accumulation): returns the final assignment, or
    (assignment, centroids) with ``return_centroids=True``."""
    scale_bits = 20
    scale = float(1 << scale_bits)
    C = (np.asarray(init, dtype=np.float64).copy() if init is not None
         else Vn[:k].copy())
    for _ in range(iters):
        assign = np.argmax(Vn @ C.T, axis=1)
        q = np.round(Vn * scale).astype(np.int64)
        for c in range(k):
            members = q[assign == c]
            if len(members):
                m = members.sum(axis=0).astype(np.float64) / (len(members) * scale)
                nm = np.linalg.norm(m)
                if nm > 0:
                    C[c] = m / nm
    assign = np.argmax(Vn @ C.T, axis=1)
    return (assign, C) if return_centroids else assign


def _serial_semdedup_core(ids_a, V_a, k: int = 8, iters: int = 4,
                          threshold: float = 0.95,
                          init: "np.ndarray | None" = None) -> pa.Table:
    """Shared serial SemDeDup twin: micro-unit Lloyd (init = first k rows,
    matching the distributed order contract), within-cluster O(n²) cosine
    pairs ≥ threshold, union-find, min-id representative kept.  Summary
    table in the q_semantic_dedup shape."""
    nrm = np.linalg.norm(V_a, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    Vn = V_a / nrm
    assign = _serial_microunit_kmeans(Vn, k, iters, init=init)

    parent = {int(i): int(i) for i in ids_a}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in range(k):
        idx = np.nonzero(assign == c)[0]
        if len(idx) < 2:
            continue
        S = Vn[idx] @ Vn[idx].T
        ii, jj = np.nonzero(np.triu(S >= threshold, 1))
        for a, b in zip(idx[ii], idx[jj]):
            ra, rb = find(int(ids_a[a])), find(int(ids_a[b]))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    comps: dict[int, list[int]] = {}
    for i in parent:
        comps.setdefault(find(i), []).append(i)
    losers = {i for members in comps.values() if len(members) > 1
              for i in members if i != min(members)}
    kept = [int(i) for i in ids_a if int(i) not in losers]
    return pa.table({
        "n_total": pa.array([len(ids_a)], pa.int64()),
        "n_kept": pa.array([len(kept)], pa.int64()),
        "n_dropped": pa.array([len(ids_a) - len(kept)], pa.int64()),
        "kept_id_sum": pa.array([sum(kept)], pa.int64()),
    })


def so_audio_semantic_dedup(sf_dir: str) -> pa.Table:
    """Serial twin of q_audio_semantic_dedup: the SAME mfcc_vector_batch
    bank over the serially-built note-clip table (planted acoustic twins),
    the SAME micro-unit Lloyd assignment, and the SAME integer-dot
    similarity rule (2^10-quantized unit vectors, threshold ≈ cos 0.99) —
    exact by construction at any corpus density."""
    from ..sources.clips import note_clips_table_from_documents
    from ..stages.audioquality import mfcc_vector_batch
    from .queries import _AUDIO_SEM_QBITS, _AUDIO_SEM_THRESH_INT

    t = mfcc_vector_batch(note_clips_table_from_documents(sf_dir))
    ids = np.asarray(t.column("clip_id").to_pylist(), dtype=np.int64)
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    nrm = np.linalg.norm(V, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    Vn = V / nrm
    # explicit init = the 8 smallest ids' vectors ascending, matching the
    # query (block order ≠ file order, so the default head init would not)
    order = np.argsort(ids, kind="stable")[:8]
    init = V[order]
    ninit = np.linalg.norm(init, axis=1, keepdims=True)
    ninit[ninit == 0] = 1.0
    assign = _serial_microunit_kmeans(Vn, init=init / ninit)
    Q = np.round(Vn * (1 << _AUDIO_SEM_QBITS)).astype(np.int64)

    parent = {int(i): int(i) for i in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in range(8):
        idx = np.nonzero(assign == c)[0]
        if len(idx) < 2:
            continue
        S = Q[idx] @ Q[idx].T
        ii, jj = np.nonzero(np.triu(S >= _AUDIO_SEM_THRESH_INT, 1))
        for a, b in zip(idx[ii], idx[jj]):
            ra, rb = find(int(ids[a])), find(int(ids[b]))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    comps: dict[int, list[int]] = {}
    for i in parent:
        comps.setdefault(find(i), []).append(i)
    losers = {i for members in comps.values() if len(members) > 1
              for i in members if i != min(members)}
    kept = [int(i) for i in ids if int(i) not in losers]
    return pa.table({
        "n_total": pa.array([len(ids)], pa.int64()),
        "n_kept": pa.array([len(kept)], pa.int64()),
        "n_dropped": pa.array([len(ids) - len(kept)], pa.int64()),
        "kept_id_sum": pa.array([sum(kept)], pa.int64()),
    })


def so_decontaminate(sf_dir: str) -> pa.Table:
    """Serial twin of q_decontaminate: same bench construction (first 12
    words of every 17th doc) and the same ngram_set function bank, computed
    single-threaded over the raw parquet."""
    from ..functions.fingerprint import ngram_set

    t = _docs(sf_dir)
    ids = t.column("doc_id").to_numpy().astype(np.int64)
    texts = t.column("text").to_pylist()
    bench_arrs = [ngram_set(" ".join((txt or "").split()[:12]), 8)
                  for i, txt in zip(ids, texts) if i % 17 == 0]
    bench_arrs = [a for a in bench_arrs if len(a)]
    bench = (np.unique(np.concatenate(bench_arrs)) if bench_arrs
             else np.zeros(0, dtype=np.uint64))
    counts = []
    for txt in texts:
        g = ngram_set(txt or "", 8)
        if len(g) and len(bench):
            idx = np.searchsorted(bench, g)
            idx[idx == len(bench)] = 0
            counts.append(int((bench[idx] == g).sum()))
        else:
            counts.append(0)
    order = np.argsort(ids, kind="stable")
    counts = np.array(counts, dtype=np.int64)[order]
    return pa.table({
        "doc_id": pa.array(ids[order], pa.int64()),
        "overlap_grams": pa.array(counts, pa.int64()),
        "contaminated": pa.array(counts > 0, pa.bool_()),
    })




def so_gopher_quality(sf_dir: str) -> pa.Table:
    """Serial twin of q_gopher_quality: the same gopher_doc function bank
    applied single-threaded over the raw parquet (the fixture pins the
    distributed stage's batch/column plumbing; float columns are
    bit-identical because both sides share the pure function)."""
    from ..functions.gopher import gopher_doc
    from .queries import _GOPHER_COLS, _gopher_augment

    t = _docs(sf_dir)
    aug_ids, aug_texts = _gopher_augment(
        t.column("doc_id").to_numpy().astype(np.int64),
        t.column("text").to_pylist())
    ids = np.asarray(aug_ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    rows = [gopher_doc(txt or "") for txt in aug_texts]
    cols: dict[str, pa.Array] = {"doc_id": pa.array(ids[order], pa.int64())}
    for name in _GOPHER_COLS[1:]:
        vals = [rows[i][name] for i in order]
        if name in ("n_words", "n_stopwords"):
            cols[name] = pa.array(vals, pa.int64())
        elif name == "gopher_keep":
            cols[name] = pa.array(vals, pa.bool_())
        elif name == "gopher_reason":
            cols[name] = pa.array(vals, pa.string())
        else:
            cols[name] = pa.array(vals, pa.float64())
    return pa.table(cols)


def so_c4_filters(sf_dir: str) -> pa.Table:
    """Serial twin of q_c4_filters: same corpus construction and the same
    clean_lines/page_keep function bank, single-threaded."""
    from ..functions.c4 import clean_lines, page_keep
    from .queries import _c4_corpus

    t = _docs(sf_dir)
    ids, texts = _c4_corpus(t.column("doc_id").to_numpy().astype(np.int64),
                            t.column("text").to_pylist())
    rows = []
    for i, txt in zip(ids, texts):
        c = clean_lines(txt)
        keep, reason = page_keep(c)
        rows.append((int(i), keep, reason, len(c)))
    rows.sort()
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "c4_keep": pa.array([r[1] for r in rows], pa.bool_()),
        "c4_reason": pa.array([r[2] for r in rows], pa.string()),
        "c4_len": pa.array([r[3] for r in rows], pa.int64()),
    })


def so_c4_span_dedup(sf_dir: str) -> pa.Table:
    """Serial twin of q_c4_span_dedup: global span occurrence map, winner =
    min (id, start) per hash, losers' sentences removed — one pass, one
    process."""
    from ..functions.c4 import doc_span_hashes, remove_spans
    from .queries import _c4_corpus

    t = _docs(sf_dir)
    ids, texts = _c4_corpus(t.column("doc_id").to_numpy().astype(np.int64),
                            t.column("text").to_pylist())
    occ: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for i, txt in zip(ids, texts):
        for h, s in doc_span_hashes(txt):
            occ[h].append((int(i), s))
    loser_starts: dict[int, list[int]] = defaultdict(list)
    for h, lst in occ.items():
        if len(lst) > 1:
            lst.sort()
            for i, s in lst[1:]:
                loser_starts[i].append(s)
    rows = sorted(
        (int(i), remove_spans(txt, loser_starts[int(i)])
         if int(i) in loser_starts else txt)
        for i, txt in zip(ids, texts))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


def so_substring_dedup(sf_dir: str) -> pa.Table:
    """Serial twin of q_substring_dedup: global window occurrence map,
    winner = min (id, start) per hash, losers\' token spans removed."""
    from ..functions.leespan import doc_window_hashes, remove_token_spans
    from .queries import _leespan_corpus

    w = 20
    t = _docs(sf_dir)
    ids, texts = _leespan_corpus(t.column("doc_id").to_numpy().astype(np.int64),
                                 t.column("text").to_pylist())
    occ: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for i, txt in zip(ids, texts):
        hs, ss = doc_window_hashes(txt, w)
        for h, st in zip(hs.tolist(), ss.tolist()):
            occ[h].append((int(i), st))
    loser_starts: dict[int, list[int]] = defaultdict(list)
    for h, lst in occ.items():
        if len(lst) > 1:
            lst.sort()
            for i, st in lst[1:]:
                loser_starts[i].append(st)
    rows = sorted(
        (int(i), remove_token_spans(txt, loser_starts[int(i)], w)
         if int(i) in loser_starts else txt)
        for i, txt in zip(ids, texts))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


def so_grouped_quantiles_approx(sf_dir: str) -> pa.Table:
    """Serial twin of q_grouped_quantiles_approx: identical float64
    binning arithmetic (lo/width, clip, rank=ceil(q·n), upper bin edge)
    computed single-threaded per group — integer histogram merge makes the
    distributed result bit-identical."""
    n_bins, qs = 1024, [0.25, 0.5, 0.9]
    t = pq.read_table(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_extendedprice"])
    keys = np.asarray(t.column("l_returnflag").to_pylist())
    vals = t.column("l_extendedprice").to_numpy().astype(np.float64)
    fin = np.isfinite(vals)
    keys, vals = keys[fin], vals[fin]
    rows = []
    for k in sorted(set(keys)):
        v = vals[keys == k]
        lo, hi = float(v.min()), float(v.max())
        width = (hi - lo) / n_bins
        if width == 0.0:
            for q in qs:
                rows.append((k, int(round(q * 100)), lo))
            continue
        bins = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
        counts = np.bincount(bins, minlength=n_bins)
        present = np.nonzero(counts)[0]
        cum = counts[present].cumsum()
        n = int(cum[-1])
        for q in qs:
            rank = max(int(np.ceil(q * n)), 1)
            idx = int(np.searchsorted(cum, rank, side="left"))
            b = int(present[idx])
            rows.append((k, int(round(q * 100)), lo + (b + 1) * width))
    return pa.table({
        "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
        "q_pct": pa.array([r[1] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
    })


def so_audio_loudness(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.audioquality import AudioLoudnessActor

    out = AudioLoudnessActor(PipelineConfig())(_clips(sf_dir))
    return out.select(
        ["clip_id", "decode_ok", "lufs_integrated", "lufs_range",
         "clip_ratio", "dc_offset", "too_quiet", "clipped"]
    )


def so_audio_mfcc(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.audioquality import AudioMfccActor

    out = AudioMfccActor(PipelineConfig())(_clips(sf_dir))
    return out.select(["clip_id", "decode_ok"] + [f"mfcc_{k}" for k in range(13)])


def so_audio_snr(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.audioquality import AudioSnrPitchActor

    out = AudioSnrPitchActor(PipelineConfig())(_clips(sf_dir))
    return out.select(
        ["clip_id", "decode_ok", "snr_db", "noise_floor_db", "active_ratio",
         "f0_hz", "voiced_ratio", "noisy", "unvoiced"]
    )


def so_audio_defects(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.audioquality import AudioDefectActor, distorted_clips_batch

    out = AudioDefectActor(PipelineConfig())(distorted_clips_batch(_clips(sf_dir)))
    return out.select(
        ["clip_id", "decode_ok", "clip_ratio", "max_clip_run_ms",
         "max_zero_run_ms", "peak", "clipped", "dropout"]
    )


def so_compression_quality(sf_dir: str) -> pa.Table:
    from ..stages.quality_stage import (compression_signals_batch,
                                        degraded_docs_batch)

    docs = _docs(sf_dir).select(["doc_id", "text"])
    out = compression_signals_batch(degraded_docs_batch(docs))
    return out.select(
        ["doc_id", "n_bytes", "comp_len", "comp_ratio", "char_entropy",
         "too_repetitive", "too_random"]
    )


def so_audio_windows(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import WindowChunkActor

    out = WindowChunkActor(PipelineConfig(), win_ms=100, hop_ms=50,
                           min_tail_ms=30, emit_audio=False)(_clips(sf_dir))
    return out.select(
        ["clip_id", "win_idx", "start_ms", "end_ms", "dur_ms", "win_rms"]
    )


def so_audio_augment(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import AudioAugmentActor

    out = AudioAugmentActor(PipelineConfig(), salt="e1")(_clips(sf_dir))
    return out.select(
        ["clip_id", "aug_ok", "gain_milli", "n_masks", "masked_ms", "out_rms"]
    )


def so_speed_perturb(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import SpeedPerturbActor

    out = SpeedPerturbActor(PipelineConfig(), salt="e1")(_clips(sf_dir))
    return out.select(
        ["clip_id", "aug_ok", "speed_bp", "out_n_samples", "out_rms"]
    )


def so_time_stretch(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import TimeStretchActor

    out = TimeStretchActor(PipelineConfig(), salt="e1")(_clips(sf_dir))
    return out.select(
        ["clip_id", "aug_ok", "rate_bp", "out_n_samples", "out_rms"]
    )


def so_pitch_shift(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import PitchShiftActor

    out = PitchShiftActor(PipelineConfig(), salt="e1")(_clips(sf_dir))
    return out.select(
        ["clip_id", "aug_ok", "semi_cents", "out_n_samples", "out_rms"]
    )


def so_acoustic_augment(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.multimodal import AcousticAugmentActor

    out = AcousticAugmentActor(PipelineConfig(), salt="e1")(_clips(sf_dir))
    return out.select(
        ["clip_id", "aug_ok", "rt60_ms", "snr_target_db", "reverb", "out_rms"]
    )


def so_wds_shards(sf_dir: str) -> pa.Table:
    """Serial twin of q_wds_shards: identical md5 shard routing and the
    shared deterministic tar builder, packed single-threaded — every
    shard checksum must match the distributed writers\' output."""
    import hashlib as _h
    import json as _json

    from ..sources.wds import _pack_shard, shard_of

    t = _clips(sf_dir)
    keys = [str(k) for k in t.column("clip_id").to_pylist()]
    payloads = t.column("bytes").to_pylist()
    codecs = t.column("codec").to_pylist()
    srs = t.column("sr_hz").to_pylist()
    n_shards = 16
    by_shard: dict[int, list[int]] = defaultdict(list)
    for j, k in enumerate(keys):
        by_shard[shard_of(k, n_shards)].append(j)
    rows = []
    for shard in sorted(by_shard):
        idx = by_shard[shard]
        metas = [_json.loads(_json.dumps(
            {"codec": codecs[j], "sr_hz": srs[j]}, sort_keys=True,
            ensure_ascii=False, default=str)) for j in idx]
        blob = _pack_shard([keys[j] for j in idx],
                           [payloads[j] or b"" for j in idx], metas)
        rows.append((shard, len(idx), _h.md5(blob).hexdigest()))
    return pa.table({
        "shard": pa.array([r[0] for r in rows], pa.int64()),
        "n_samples": pa.array([r[1] for r in rows], pa.int64()),
        "tar_md5": pa.array([r[2] for r in rows], pa.string()),
    })


def so_specaugment(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.audioquality import SpecAugmentActor

    out = SpecAugmentActor(PipelineConfig(), salt="e1")(_clips(sf_dir))
    return out.select(
        ["clip_id", "aug_ok", "n_frames", "masked_cells", "spec_md5"]
    )


def so_grouped_hll(sf_dir: str) -> pa.Table:
    """Serial twin of q_grouped_hll: one sketch per group over the raw
    parquet — register max-merge makes the distributed partials collapse
    to exactly this."""
    from ..functions.sketch import hll_estimate, hll_from_values

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_type", "user_id"])
    types = np.asarray(t.column("event_type").to_pylist())
    users = t.column("user_id").to_numpy()
    rows = []
    for g in sorted(set(types.tolist())):
        est = hll_estimate(hll_from_values(users[types == g].tolist()))
        rows.append((g, int(round(est))))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "est_distinct": pa.array([r[1] for r in rows], pa.int64()),
    })


def so_loudness_normalize(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.audioquality import LoudnessNormalizeActor

    out = LoudnessNormalizeActor(PipelineConfig())(_clips(sf_dir))
    return out.select(["clip_id", "norm_ok", "gain_db_milli", "lufs_out"])


def so_silence_trim(sf_dir: str) -> pa.Table:
    from ..config import PipelineConfig
    from ..stages.audioquality import SilenceTrimActor

    out = SilenceTrimActor(PipelineConfig())(_clips(sf_dir))
    return out.select(["clip_id", "trim_ok", "trimmed_ms", "out_n_samples"])


def so_sliding_chunks(sf_dir: str) -> pa.Table:
    """Serial twin of q_sliding_chunks: an INDEPENDENT loop stating the
    window rule (starts every stride, keep tails adding new tokens)."""
    size, stride = 64, 48
    t = _docs(sf_dir)
    ids_out, idxs, starts, lens, texts = [], [], [], [], []
    for i, txt in zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()):
        tokens = (txt or "").split()
        n = len(tokens)
        start = 0
        while start < max(n, 1):
            window = tokens[start : start + size]
            new_tokens = (start + len(window)) - ((start - stride) + size) \
                if start > 0 else len(window)
            if len(window) >= 1 and new_tokens > 0:
                ids_out.append(int(i))
                idxs.append(start // stride)
                starts.append(start)
                lens.append(len(window))
                texts.append(" ".join(window))
            if start + size >= n:
                break
            start += stride
    return pa.table({
        "doc_id": pa.array(ids_out, pa.int64()),
        "chunk_idx": pa.array(idxs, pa.int32()),
        "chunk_start": pa.array(starts, pa.int32()),
        "n_tokens": pa.array(lens, pa.int32()),
        "chunk_text": pa.array(texts, pa.string()),
    })


def so_quarantine(sf_dir: str) -> pa.Table:
    """Serial twin of q_quarantine: the poison rule decides directly —
    doc_id % 97 == 13 rows are quarantined (n_tokens −1), everything
    else token-counts."""
    t = _docs(sf_dir)
    ids = t.column("doc_id").to_numpy().astype(np.int64)
    texts = t.column("text").to_pylist()
    n_tok, status = [], []
    for i, txt in zip(ids, texts):
        if int(i) % 97 == 13:
            n_tok.append(-1)
            status.append("quarantined")
        else:
            n_tok.append(len((txt or "").split()))
            status.append("ok")
    order = np.argsort(ids, kind="stable")
    return pa.table({
        "doc_id": pa.array(ids[order], pa.int64()),
        "n_tokens": pa.array(np.asarray(n_tok, np.int64)[order], pa.int64()),
        "status": pa.array(np.asarray(status, object)[order], pa.string()),
    })


def so_prepare_audio(sf_dir: str) -> pa.Table:
    """Serial twin of q_prepare_audio: the INDEPENDENT row oracle decides
    keep/drop, then the shared stage actors (trim → normalize → fp-dedup
    loser drop → augment@e1 with id suffix) run single-threaded and the
    shared deterministic tar packer reproduces every shard checksum."""
    import hashlib as _h
    import json as _json

    from ..config import DEFAULT_CONFIG
    from ..sources.wds import _pack_shard, shard_of
    from ..stages.audiodedup import serial_audio_fingerprint_pairs
    from ..stages.audioquality import (LoudnessNormalizeActor,
                                       SilenceTrimActor)
    from ..stages.multimodal import AudioAugmentActor

    t = _clips(sf_dir)
    keep = np.asarray([bool(r["keep"]) for r in _oracle_decisions(sf_dir)])
    kept = t.filter(pa.array(keep))
    kept = SilenceTrimActor(DEFAULT_CONFIG)(kept)
    kept = LoudnessNormalizeActor(DEFAULT_CONFIG)(kept)
    pairs = serial_audio_fingerprint_pairs(kept)
    losers = set(pairs.column("id_b").to_pylist())
    ids = kept.column("clip_id").to_pylist()
    kept = kept.filter(pa.array([i not in losers for i in ids]))
    aug = AudioAugmentActor(DEFAULT_CONFIG, salt="e1")(kept)
    keys = [f"{i}@e1" for i in aug.column("clip_id").to_pylist()]
    payloads = aug.column("bytes").to_pylist()
    codecs = aug.column("codec").to_pylist()
    srs = aug.column("sr_hz").to_pylist()
    n_shards = 8
    by_shard: dict[int, list[int]] = defaultdict(list)
    for j, k in enumerate(keys):
        by_shard[shard_of(k, n_shards)].append(j)
    rows = []
    for shard in sorted(by_shard):
        idx = by_shard[shard]
        metas = [_json.loads(_json.dumps(
            {"codec": codecs[j], "sr_hz": srs[j]}, sort_keys=True,
            ensure_ascii=False, default=str)) for j in idx]
        blob = _pack_shard([keys[j] for j in idx],
                           [payloads[j] or b"" for j in idx], metas)
        rows.append((shard, len(idx), _h.md5(blob).hexdigest()))
    return pa.table({
        "shard": pa.array([r[0] for r in rows], pa.int64()),
        "n_samples": pa.array([r[1] for r in rows], pa.int64()),
        "tar_md5": pa.array([r[2] for r in rows], pa.string()),
    })


def so_windowed_drift(sf_dir: str) -> pa.Table:
    """Serial twin of q_windowed_drift: pandas floor + Counter
    histograms + the shared PSI micro arithmetic."""
    from collections import Counter

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["ts", "event_type"])
    df = t.to_pandas()
    df["w"] = df["ts"].dt.floor("360min")
    ref = Counter(df["event_type"])
    ref_total = sum(ref.values())
    cats = sorted(ref)
    eps = 1e-6
    rows = []
    for w in sorted(df["w"].unique()):
        h = Counter(df.loc[df["w"] == w, "event_type"])
        total = sum(h.values()) or 1
        psi = 0
        for c in cats:
            pw = max(h.get(c, 0) / total, eps)
            pr = max(ref.get(c, 0) / ref_total, eps)
            contrib = (pw - pr) * float(np.log(pw / pr))
            psi += int(np.floor(contrib * 1e6 + 0.5))
        rows.append((w, total, psi))
    return pa.table({
        "window_start": pa.array([r[0] for r in rows],
                                 pa.timestamp("us")),
        "n_events": pa.array([r[1] for r in rows], pa.int64()),
        "psi_micro": pa.array([r[2] for r in rows], pa.int64()),
    })


def so_audio_decontaminate(sf_dir: str) -> pa.Table:
    """Serial twin of q_audio_decontaminate: one-pass landmark union over
    the shared eval set, then the same overlap rule per melody clip."""
    from ..functions.audiofp import spectral_landmarks
    from ..sources.clips import note_clips_table_from_documents
    from ..stages.multimodal import _decode_one
    from .queries import _audio_eval_set

    ev = _audio_eval_set(sf_dir)
    eval_hashes: set[int] = set()
    for buf, sr in zip(ev.column("bytes").to_pylist(),
                       ev.column("sr_hz").to_pylist()):
        pcm = _decode_one(buf or b"", "pcm_s16le")
        eval_hashes.update(int(h) for h in spectral_landmarks(pcm, int(sr)))
    t = note_clips_table_from_documents(sf_dir, twin_mod=1 << 62)
    ids, flags, shared_c = [], [], []
    for cid, buf, sr in zip(t.column("clip_id").to_pylist(),
                            t.column("bytes").to_pylist(),
                            t.column("sr_hz").to_pylist()):
        ids.append(int(cid))
        pcm = _decode_one(buf or b"", "pcm_s16le")
        hashes = [int(h) for h in spectral_landmarks(pcm, int(sr))]
        shared = sum(1 for h in hashes if h in eval_hashes)
        frac = shared / max(len(hashes), 1)
        flags.append(shared >= 2 and frac >= 0.5)
        shared_c.append(shared)
    return pa.table({
        "clip_id": pa.array(ids, pa.int64()),
        "eval_contaminated": pa.array(flags, pa.bool_()),
        "eval_shared": pa.array(shared_c, pa.int32()),
    })


def so_mp3_gate(sf_dir: str) -> pa.Table:
    from ..stages.multimodal import audio_gate_decision
    from .queries import _synth_mp3_rows

    clips = _synth_mp3_rows(_docs(sf_dir, ("doc_id",)))
    oks, reasons = [], []
    for buf, codec, sr, dur, text in zip(
        clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(),
        clips.column("sr_hz").to_pylist(),
        clips.column("dur_ms").to_pylist(),
        clips.column("transcript").to_pylist(),
    ):
        ok, reason = audio_gate_decision(buf, codec, int(sr), int(dur), text)
        oks.append(ok)
        reasons.append(reason)
    return pa.table({
        "clip_id": clips.column("clip_id"),
        "gate_ok": pa.array(oks, pa.bool_()),
        "drop_reason": pa.array(reasons, pa.string()),
    })


def so_lang_drift(sf_dir: str) -> pa.Table:
    """Serial twin of q_lang_drift: plain-Python histograms + the same
    PSI micro arithmetic."""
    from collections import Counter

    from ..stages.stats import split_bucket

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "lang"])
    ids = t.column("doc_id").to_pylist()
    langs = t.column("lang").to_pylist()
    ha = Counter(langs)
    hb = Counter(lg for i, lg in zip(ids, langs)
                 if lg != "zh" or split_bucket(str(i), 2) == 0)
    cats = sorted(set(ha) | set(hb))
    ta, tb = sum(ha.values()) or 1, sum(hb.values()) or 1
    eps = 1e-6
    rows = []
    for c in cats:
        pa_ = max(ha.get(c, 0) / ta, eps)
        pb_ = max(hb.get(c, 0) / tb, eps)
        contrib = (pa_ - pb_) * float(np.log(pa_ / pb_))
        rows.append((c, ha.get(c, 0), hb.get(c, 0),
                     int(np.floor(contrib * 1e6 + 0.5))))
    return pa.table({
        "category": pa.array([r[0] for r in rows], pa.string()),
        "n_a": pa.array([r[1] for r in rows], pa.int64()),
        "n_b": pa.array([r[2] for r in rows], pa.int64()),
        "psi_micro": pa.array([r[3] for r in rows], pa.int64()),
    })


def so_pagerank(sf_dir: str) -> pa.Table:
    from ..stages.graph import pagerank_edge_pairs, serial_pagerank_int

    ids = _docs(sf_dir, columns=("doc_id",)).column("doc_id").to_pylist()
    ranks = serial_pagerank_int(pagerank_edge_pairs(ids))
    nodes = sorted(ranks)
    return pa.table({"node": pa.array(nodes, pa.string()),
                     "rank": pa.array([ranks[n] for n in nodes], pa.int64())})


def so_hits(sf_dir: str) -> pa.Table:
    from ..stages.graph import pagerank_edge_pairs, serial_hits_int

    ids = _docs(sf_dir, columns=("doc_id",)).column("doc_id").to_pylist()
    scores = serial_hits_int(pagerank_edge_pairs(ids))
    nodes = sorted(scores)
    return pa.table({
        "node": pa.array(nodes, pa.string()),
        "hub": pa.array([scores[n][0] for n in nodes], pa.int64()),
        "auth": pa.array([scores[n][1] for n in nodes], pa.int64()),
    })


def so_audio_fp_pairs(sf_dir: str) -> pa.Table:
    """Independent single-threaded constellation-fingerprint pair search
    (dict inverted index) over the note-melody corpus — not the distributed
    code path."""
    from ..sources.clips import note_clips_table_from_documents
    from ..stages.audiodedup import serial_audio_fingerprint_pairs

    return serial_audio_fingerprint_pairs(note_clips_table_from_documents(sf_dir))


# ---------------------------------------------------------------------------
# BPE tokenizer training (q_bpe_vocab / q_bpe_tokens)
# ---------------------------------------------------------------------------

_BPE_MERGES = 200
_BPE_MAX_WORDS = 20_000


def _serial_bpe_train(sf_dir: str):
    """Independent serial BPE trainer: plain-Python word counts over the
    raw parquet, then the NAIVE algorithm — full pair recount every merge,
    no incremental maintenance — against the engine's incremental trainer.
    Shares only the pre-tokenizer regex (the repo's function-bank rule)."""
    from ..functions.tokenize import RE_BPE_TOKEN
    from ..stages.bpe_train import END

    wc = defaultdict(int)
    for text in _docs(sf_dir).column("text").to_pylist():
        for tok in RE_BPE_TOKEN.findall(text or ""):
            wc[tok.lower()] += 1
    rows = sorted(wc.items(), key=lambda t: (-t[1], t[0]))[:_BPE_MAX_WORDS]

    def symbols(word):
        chars = list(word)
        chars[-1] += END
        return tuple(chars)

    words = {symbols(w): n for w, n in rows}
    merges = []
    for _ in range(_BPE_MERGES):
        counts = defaultdict(int)
        for syms, n in words.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] += n
        if not counts:
            break
        best = min(counts.items(), key=lambda t: (-t[1], t[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_words = defaultdict(int)
        for syms, n in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] += n
        words = new_words
    return merges


_WP_MERGES = 200
_WP_MAX_WORDS = 20_000


def _serial_wordpiece_train(sf_dir: str):
    """Independent serial WordPiece trainer: plain-Python word counts
    over the raw parquet, then the NAIVE algorithm — full pair AND unit
    recount every merge, no incremental maintenance — with the same
    integer-cross-multiplication score comparison spec.  Shares only the
    pre-tokenizer regex with the engine."""
    from collections import Counter

    from ..functions.tokenize import RE_BPE_TOKEN

    wc = defaultdict(int)
    for text in _docs(sf_dir).column("text").to_pylist():
        for tok in RE_BPE_TOKEN.findall(text or ""):
            wc[tok.lower()] += 1
    rows = sorted(wc.items(), key=lambda t: (-t[1], t[0]))[:_WP_MAX_WORDS]

    def symbols(word):
        return tuple([word[0]] + ["##" + c for c in word[1:]])

    words = {symbols(w): n for w, n in rows if w}
    merges = []
    for _ in range(_WP_MERGES):
        pc, uc = Counter(), Counter()
        for syms, n in words.items():
            for s in syms:
                uc[s] += n
            for p in zip(syms, syms[1:]):
                pc[p] += n
        best = None
        bc = bl = br = 0
        for p, c in sorted(pc.items()):
            if c <= 0:
                continue
            l_cnt, r_cnt = uc[p[0]], uc[p[1]]
            if best is None or c * bl * br > bc * l_cnt * r_cnt:
                best, bc, bl, br = p, c, l_cnt, r_cnt
        if best is None:
            break
        joined = best[0] + (best[1][2:] if best[1].startswith("##")
                            else best[1])
        merges.append((best[0], best[1], joined))
        nw = defaultdict(int)
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nw[tuple(out)] += n
        words = nw
    alphabet = sorted({s for w, _ in rows if w for s in symbols(w)})
    return merges, alphabet + [m[2] for m in merges]


def so_wordpiece_vocab(sf_dir: str) -> pa.Table:
    merges, _ = _serial_wordpiece_train(sf_dir)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "token": pa.array([m[2] for m in merges], pa.string()),
        }
    )


def so_wordpiece_tokens(sf_dir: str) -> pa.Table:
    """Serial encode with an independently-written greedy
    longest-match-first loop (scans candidate lengths ASCENDING and keeps
    the longest hit, vs the engine's descending-break scan)."""
    from ..functions.tokenize import RE_BPE_TOKEN

    _, vocab = _serial_wordpiece_train(sf_dir)
    vset = set(vocab)

    def encode(word):
        if not word:
            return []
        if len(word) > 100:
            return ["[UNK]"]
        pieces, start = [], 0
        while start < len(word):
            hit = None
            for end in range(start + 1, len(word) + 1):
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in vset:
                    hit = (sub, end)
            if hit is None:
                return ["[UNK]"]
            pieces.append(hit[0])
            start = hit[1]
        return pieces

    docs = _docs(sf_dir, ("doc_id", "text"))
    ids, n_tok, n_unk = [], [], []
    cache = {}
    for did, text in zip(docs.column("doc_id").to_pylist(),
                         docs.column("text").to_pylist()):
        t = u = 0
        for w in RE_BPE_TOKEN.findall(text or ""):
            w = w.lower()
            if w not in cache:
                p = encode(w)
                cache[w] = (len(p), p.count("[UNK]"))
            t += cache[w][0]
            u += cache[w][1]
        ids.append(did)
        n_tok.append(t)
        n_unk.append(u)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_wp_tokens": pa.array(n_tok, pa.int64()),
        "n_unk": pa.array(n_unk, pa.int64()),
    })


def so_tokenizer_fertility(sf_dir: str) -> pa.Table:
    """Serial twin of q_tokenizer_fertility: naive-trained vocab, the
    independently-written ascending-scan greedy encoder (as
    so_wordpiece_tokens), per-language dict aggregation, the same
    integer-ppm arithmetic."""
    from ..functions.tokenize import RE_BPE_TOKEN

    _, vocab = _serial_wordpiece_train(sf_dir)
    vset = set(vocab)

    def encode(word):
        if not word:
            return []
        if len(word) > 100:
            return ["[UNK]"]
        pieces, start = [], 0
        while start < len(word):
            hit = None
            for end in range(start + 1, len(word) + 1):
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in vset:
                    hit = (sub, end)
            if hit is None:
                return ["[UNK]"]
            pieces.append(hit[0])
            start = hit[1]
        return pieces

    docs = _docs(sf_dir, ("doc_id", "text", "lang"))
    agg: dict[str, list[int]] = {}
    cache: dict[str, tuple[int, int]] = {}
    for lang, text in zip(docs.column("lang").to_pylist(),
                          docs.column("text").to_pylist()):
        row = agg.setdefault(lang or "", [0, 0, 0, 0])
        row[0] += 1
        for w in RE_BPE_TOKEN.findall(text or ""):
            w = w.lower()
            if w not in cache:
                p = encode(w)
                cache[w] = (len(p), p.count("[UNK]"))
            row[1] += 1
            row[2] += cache[w][0]
            row[3] += cache[w][1]
    ks = sorted(agg)
    words = [agg[k][1] for k in ks]
    toks = [agg[k][2] for k in ks]
    unk = [agg[k][3] for k in ks]
    return pa.table({
        "lang": pa.array(ks, pa.string()),
        "n_docs": pa.array([agg[k][0] for k in ks], pa.int64()),
        "n_words": pa.array(words, pa.int64()),
        "n_wp_tokens": pa.array(toks, pa.int64()),
        "n_unk": pa.array(unk, pa.int64()),
        "fertility_ppm": pa.array(
            [t * 1_000_000 // w if w else 0 for t, w in zip(toks, words)],
            pa.int64()),
        "unk_ppm": pa.array(
            [u * 1_000_000 // t if t else 0 for u, t in zip(unk, toks)],
            pa.int64()),
    })


def so_bpe_vocab(sf_dir: str) -> pa.Table:
    merges = _serial_bpe_train(sf_dir)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
        }
    )


def so_bpe_tokens(sf_dir: str) -> pa.Table:
    """Serial encode: REPLAY the merge list in rank order over each word
    (vs the engine's greedy lowest-rank-present loop — different algorithm,
    provably the same fixed point because a merge's output symbol can only
    feed merges learned later)."""
    from ..functions.tokenize import RE_BPE_TOKEN
    from ..stages.bpe_train import END

    merges = _serial_bpe_train(sf_dir)

    cache: dict[str, int] = {}

    def encode_len(word: str) -> int:
        hit = cache.get(word)
        if hit is not None:
            return hit
        chars = list(word)
        chars[-1] += END
        syms = chars
        for a, b in merges:
            if len(syms) < 2:
                break
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = len(syms)
        return len(syms)

    t = _docs(sf_dir)
    ids = t.column("doc_id").to_numpy()
    counts = []
    for text in t.column("text").to_pylist():
        counts.append(
            sum(encode_len(tok.lower()) for tok in RE_BPE_TOKEN.findall(text or ""))
        )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_bpe_tokens": pa.array(counts, pa.int64()),
        }
    ).sort_by("doc_id")


# ---------------------------------------------------------------------------
# ARPA model-file perplexity (q_arpa_ppl)
# ---------------------------------------------------------------------------

def so_arpa_ppl(sf_dir: str) -> pa.Table:
    """Serial twin of q_arpa_ppl: serial counts → in-memory CharLM →
    ``quantize_lm`` (the exact ≤1-ulp effect of one ARPA write→read cycle,
    applied WITHOUT the file) → per-doc scores.  The engine side goes
    through the actual file + actor pool; equality proves the distributed
    training AND the file round-trip introduce nothing beyond the
    documented quantization."""
    import math

    from ..functions.arpa import quantize_lm
    from ..stages.lm_train import _count_batch
    from ..stages.perplexity_stage import CharLM

    t = _docs(sf_dir)
    counts = _count_batch(t, "text")
    kinds = counts.column("kind").to_pylist()
    grams = counts.column("gram").to_pylist()
    ns = counts.column("n").to_pylist()
    tri = {g: n for k, g, n in zip(kinds, grams, ns) if k == "3"}
    bi = {g: n for k, g, n in zip(kinds, grams, ns) if k == "2"}
    uni = {g: n for k, g, n in zip(kinds, grams, ns) if k == "1"}
    n_chars = sum(n for k, _, n in zip(kinds, grams, ns) if k == "N")
    if len(tri) > 500_000:
        raise RuntimeError("corpus trigram domain exceeds the fixture-safe cap")
    lm = quantize_lm(CharLM.from_counts(tri, bi, uni, n_chars))
    milli = []
    for text in t.column("text").to_pylist():
        p = lm.perplexity(text or "")
        milli.append(int(p * 1000) if math.isfinite(p) else -1)
    return pa.table(
        {"doc_id": t.column("doc_id"), "ppl_milli": pa.array(milli, pa.int64())}
    ).sort_by("doc_id")


# ---------------------------------------------------------------------------
# Naive Bayes language-ID distillation (q_nb_langid)
# ---------------------------------------------------------------------------

def so_nb_langid(sf_dir: str) -> pa.Table:
    """Serial NB twin: per-class numpy bincounts over the raw parquet (vs
    the engine's per-batch partials + (class × bucket)-bounded groupby-Sum),
    then the SAME model assembly + scoring bank (NaiveBayesModel — the
    function-bank rule, like CharLM.from_counts).  Integer sufficient
    statistics make the comparison exact."""
    from ..stages.dsir import N_BUCKETS, _HashCache, doc_feature_ids
    from ..stages.nbayes import NaiveBayesModel

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    langs = [str(x) for x in t.column("lang").to_pylist()]

    hasher = _HashCache(N_BUCKETS)
    feats = [doc_feature_ids(x, hasher, N_BUCKETS) for x in texts]
    classes = sorted(set(langs))
    cindex = {c: i for i, c in enumerate(classes)}
    feat = np.zeros((len(classes), N_BUCKETS), dtype=np.int64)
    docs = np.zeros(len(classes), dtype=np.int64)
    for f, lang in zip(feats, langs):
        docs[cindex[lang]] += 1
        if len(f):
            feat[cindex[lang]] += np.bincount(f, minlength=N_BUCKETS)
    model = NaiveBayesModel(classes, docs, feat)

    preds, micro, match = [], [], []
    for f, lang in zip(feats, langs):
        label, logp = model.predict_ids(f)
        preds.append(label)
        micro.append(int(np.floor(logp * 1e6 + 0.5)))
        match.append(int(label == lang))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "nb_label": pa.array(preds, pa.string()),
            "nb_logp_micro": pa.array(micro, pa.int64()),
            "is_correct": pa.array(match, pa.int64()),
        }
    ).sort_by("doc_id")


# ---------------------------------------------------------------------------
# Logistic-regression distillation (q_linear_distill)
# ---------------------------------------------------------------------------

def so_linear_distill(sf_dir: str) -> pa.Table:
    """Serial LR twin: the same augment + gopher teacher labels, then the
    full-batch GD loop accumulated single-threaded — int64 gradient sums are
    exactly commutative, so the serial model is bit-identical to the
    distributed trainer's (the machinery under test is the per-epoch
    partial-gradient exchange + groupby-Sum + actor-pool predict)."""
    from ..functions.gopher import gopher_doc
    from ..stages.dsir import N_BUCKETS, _HashCache
    from ..stages.linear import _QUANT, LinearModel, _residual_nano, _unique_ids
    from .queries import _gopher_augment

    t = _docs(sf_dir)
    aug_ids, aug_texts = _gopher_augment(
        t.column("doc_id").to_numpy().astype(np.int64),
        t.column("text").to_pylist())
    ids = np.asarray(aug_ids, dtype=np.int64)
    labels = [int(gopher_doc(txt or "")["gopher_keep"]) for txt in aug_texts]
    hasher = _HashCache(N_BUCKETS)
    feats = [_unique_ids(txt or "", hasher, N_BUCKETS) for txt in aug_texts]

    seed = [(f, y) for i, f, y in zip(ids, feats, labels) if i % 2 == 0]
    lr, l2, epochs = 2.0, 1e-4, 8
    model = LinearModel(np.zeros(N_BUCKETS), 0.0)
    for _ in range(epochs):
        grad = np.zeros(N_BUCKETS, dtype=np.int64)
        bias_g = 0
        for f, y in seed:
            r = _residual_nano(model, f, y)
            bias_g += r
            if len(f):
                grad[f] += r
        scale = lr / (len(seed) * _QUANT)
        w = model.weights * (1.0 - lr * l2) - grad.astype(np.float64) * scale
        b = model.bias - bias_g * scale
        model = LinearModel(w, b)

    order = np.argsort(ids, kind="stable")
    micro, pred_i, agree = [], [], []
    for j in order:
        p = model.prob_ids(feats[j])
        m = int(np.floor(p * 1_000_000 + 0.5))
        micro.append(m)
        pi = int(p >= 0.5)
        pred_i.append(pi)
        agree.append(int(pi == labels[j]))
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "label": pa.array([labels[j] for j in order], pa.int64()),
            "lr_prob_micro": pa.array(micro, pa.int64()),
            "lr_pred_i": pa.array(pred_i, pa.int64()),
            "agree": pa.array(agree, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Edit-distance near-dup pairs (q_fuzzy_pairs)
# ---------------------------------------------------------------------------

def so_fuzzy_pairs(sf_dir: str) -> pa.Table:
    """INDEPENDENT serial orchestration of q_fuzzy_pairs: no length banding
    — a length-sorted two-pointer sweep enumerates every pair with
    |len diff| <= max_d and verifies with the same banded kernel.  Any
    blocking/emission bug in the distributed path (double emission, band
    boundary miss) diverges here."""
    from ..functions.similarity import banded_levenshtein
    from .queries import _fuzzy_corpus

    max_d = 2
    t = _docs(sf_dir)
    base_ids = t.column("doc_id").to_numpy().astype(np.int64)
    keep = base_ids % 20 == 0
    ids_l, texts = _fuzzy_corpus(
        base_ids[keep], [x for x, k in zip(t.column("text").to_pylist(), keep) if k])
    ids = np.asarray(ids_l, dtype=np.int64)
    lens = np.asarray([len(s) for s in texts])
    order = np.lexsort((ids, lens))  # by length, then id
    out_a, out_b, out_d = [], [], []
    n = len(order)
    for x in range(n):
        i = order[x]
        for y in range(x + 1, n):
            j = order[y]
            if lens[j] - lens[i] > max_d:
                break  # sorted by length: nothing further qualifies
            d = banded_levenshtein(texts[i], texts[j], max_d)
            if d <= max_d:
                a, b = sorted((int(ids[i]), int(ids[j])))
                out_a.append(a)
                out_b.append(b)
                out_d.append(d)
    tbl = pa.table(
        {
            "id_a": pa.array(out_a, pa.int64()),
            "id_b": pa.array(out_b, pa.int64()),
            "dist": pa.array(out_d, pa.int64()),
        }
    )
    return tbl.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


# ---------------------------------------------------------------------------
# DSIR importance resampling (q_dsir_scores)
# ---------------------------------------------------------------------------

def _serial_unigram_vocab(sf_dir: str):
    """Serial unigram training: INDEPENDENT plain-Python word counts over
    the raw parquet (the distributed word-frequency pass is what the hash
    verifies), feeding the shared hard-EM trainer (driver-side code on
    both sides by design — same function-bank rule as the keep/drop
    oracle)."""
    from ..functions.tokenize import RE_BPE_TOKEN
    from ..stages.unigram_train import train_unigram
    from .queries import _UNIGRAM_KW

    wc = defaultdict(int)
    for text in _docs(sf_dir).column("text").to_pylist():
        for tok in RE_BPE_TOKEN.findall(text or ""):
            wc[tok.lower()] += 1
    rows = sorted(wc.items(), key=lambda t: (-t[1], t[0]))
    rows = rows[: _UNIGRAM_KW["max_words"]]
    kw = {k: v for k, v in _UNIGRAM_KW.items() if k != "max_words"}
    return train_unigram(rows, **kw)


def so_unigram_vocab(sf_dir: str) -> pa.Table:
    vocab = _serial_unigram_vocab(sf_dir)
    return pa.table(
        {
            "rank": pa.array(range(len(vocab)), pa.int64()),
            "piece": pa.array([p for p, _ in vocab], pa.string()),
            "n_used": pa.array([c for _, c in vocab], pa.int64()),
        }
    )


def so_unigram_tokens(sf_dir: str) -> pa.Table:
    """Serial encode over the raw parquet with the serially-trained piece
    table; per-word segmentation shares the Viterbi kernel (function-bank
    rule) — batch boundaries, actor caching and schema flow are what the
    distributed side adds."""
    from ..functions.tokenize import RE_BPE_TOKEN
    from ..stages.unigram_train import UnigramEncoder

    vocab = _serial_unigram_vocab(sf_dir)
    enc = UnigramEncoder(vocab)
    t = _docs(sf_dir)
    out = enc(t.select(["doc_id", "text"]))
    return out.select(["doc_id", "n_unigram_tokens"]).sort_by("doc_id")


def so_dsir_scores(sf_dir: str) -> pa.Table:
    """Serial DSIR: one numpy bincount per corpus (vs the engine's
    per-batch partials + bounded groupby-Sum), same per-row feature bank
    (doc_feature_ids — the repo's function-bank rule), same smoothing
    formula, same (score desc, id asc) top-200."""
    from ..stages.dsir import (
        N_BUCKETS,
        _HashCache,
        doc_feature_ids,
        log_ratio_vector,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()

    hasher = _HashCache(N_BUCKETS)
    feats = [doc_feature_ids(x, hasher, N_BUCKETS) for x in texts]
    raw = np.zeros(N_BUCKETS, dtype=np.int64)
    tgt = np.zeros(N_BUCKETS, dtype=np.int64)
    for f, lang in zip(feats, langs):
        if len(f):
            c = np.bincount(f, minlength=N_BUCKETS)
            raw += c
            if lang == "en":
                tgt += c
    lr = log_ratio_vector(tgt, raw)
    scores = np.array(
        [float(lr[f].sum()) if len(f) else 0.0 for f in feats], dtype=np.float64
    )
    order = np.lexsort((ids, -scores))[:200]
    micro = np.floor(scores[order] * 1e6 + 0.5).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "score_micro": pa.array(micro, pa.int64()),
        }
    )


def so_cmvn(sf_dir: str) -> pa.Table:
    """Serial twin of q_cmvn: same MFCC actor bank, same speaker keying,
    same milli-scaled integer statistics computed single-threaded with
    Python-int (overflow-free) products."""
    import math

    from ..config import PipelineConfig
    from ..stages.audioquality import AudioMfccActor
    from .queries import _speakerize_batch

    n_mfcc, milli = 13, 1000
    feat = [f"mfcc_{k}" for k in range(n_mfcc)]
    out = AudioMfccActor(PipelineConfig())(_speakerize_batch(_clips(sf_dir)))
    out = out.filter(out.column("decode_ok"))
    spk = np.asarray(out.column("speaker").to_pylist())
    xm = np.stack([
        np.rint(out.column(c).to_numpy(zero_copy_only=False)
                .astype(np.float64) * milli).astype(np.int64)
        for c in feat
    ], axis=1)
    zs = np.empty_like(xm)
    for g in np.unique(spk):
        sel = spk == g
        n = int(sel.sum())
        for k in range(n_mfcc):
            s = int(xm[sel, k].sum())
            ss = int((xm[sel, k].astype(object) ** 2).sum())
            mean = s // n
            std = max(math.isqrt(max((ss * n - s * s) // (n * n), 0)), 1)
            zs[sel, k] = ((xm[sel, k] - mean) * milli) // std
    cols = {"clip_id": out.column("clip_id"),
            "speaker": pa.array(spk, pa.string())}
    for k, c in enumerate(feat):
        cols[f"z_{c}"] = pa.array(zs[:, k], pa.int64())
    return pa.table(cols)


def so_tdigest_quantiles(sf_dir: str) -> pa.Table:
    """Serial twin of q_tdigest_quantiles: identical md5 partition
    routing, per-partition one-shot k1 digest build, and (mean, weight)
    sorted centroid-soup merge — all via the shared functions/tdigest.py
    bank — computed single-threaded over the raw parquet."""
    from ..functions.tdigest import td_build, td_merge, td_quantile
    from ..stages.stats import split_bucket

    num_parts, delta = 64, 200
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    t = pq.read_table(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_extendedprice"])
    ids = t.column("l_orderkey").to_pylist()
    vals = t.column("l_extendedprice").to_numpy().astype(np.float64)
    parts = np.fromiter((split_bucket(str(i), num_parts) for i in ids),
                        dtype=np.int64, count=len(ids))
    fin = np.isfinite(vals)
    parts, vals = parts[fin], vals[fin]
    soup_m, soup_w, los, his = [], [], [], []
    for p in np.unique(parts):
        v = vals[parts == p]
        m, w = td_build(v, None, delta)
        if len(m) == 0:
            continue
        soup_m.append(m)
        soup_w.append(w)
        los.append(float(v.min()))
        his.append(float(v.max()))
    m, w = td_merge(np.concatenate(soup_m), np.concatenate(soup_w), delta)
    vmin, vmax = min(los), max(his)
    return pa.table({
        "q_bp": pa.array([int(round(q * 10_000)) for q in qs], pa.int64()),
        "l_extendedprice": pa.array(
            [td_quantile(m, w, q, vmin, vmax) for q in qs], pa.float64()),
    })




def so_langid_agreement(sf_dir: str) -> pa.Table:
    """Serial twin of q_langid_agreement: heuristic cascade + one actor
    instance over the whole table, pandas groupby counts."""
    from collections import Counter as _Counter

    from ..config import PipelineConfig
    from ..stages.langid_stage import (
        LangIdModelActor,
        batch_detect_lang,
        default_lid_model_path,
    )

    t = _docs(sf_dir)
    texts = t.column("text").to_pylist()
    langs, poss = batch_detect_lang(texts)
    ft = default_lid_model_path()
    actor = LangIdModelActor(PipelineConfig(
        text_col="text", extra={"fasttext_model_path": ft} if ft else {}))
    counts: _Counter = _Counter()
    for text, lang, pos in zip(texts, langs, poss):
        if pos in ("", "lingua"):
            model, _ = actor._score(text or "")
        else:
            model = ""
        counts[(lang, pos, model)] += 1
    keys = sorted(counts)
    return pa.table({
        "lang": pa.array([k[0] for k in keys], pa.string()),
        "lang_pos": pa.array([k[1] for k in keys], pa.string()),
        "lang_model": pa.array([k[2] for k in keys], pa.string()),
        "n": pa.array([counts[k] for k in keys], pa.int64()),
    })




def so_weighted_sample(sf_dir: str) -> pa.Table:
    """Serial twin of q_weighted_sample: identical A-ES arithmetic row by
    row, top-100 by key."""
    import hashlib

    import pyarrow.parquet as pq

    full = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    rows = []
    for i, w in zip(full.column("doc_id").to_pylist(),
                    full.column("n_chars").to_pylist()):
        if w is None or w <= 0:
            continue
        u = (int(hashlib.md5(f"{i}".encode()).hexdigest()[:13], 16) + 1.0) \
            / float(16 ** 13)
        rows.append((np.log(u) / float(w), int(i)))
    rows.sort(reverse=True)
    kept = sorted(i for _, i in rows[:100])
    return pa.table({"doc_id": pa.array(kept, pa.int64())})


def so_fix_mojibake(sf_dir: str) -> pa.Table:
    """Serial twin of q_fix_mojibake: identical injection (shared helper —
    the injection IS the test input, not the kernel under test) + the
    per-row fix_mojibake kernel applied serially with the same ASCII
    skip rule."""
    from ..functions.charset import fix_mojibake
    from .queries import _mojibake_inject

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    injected = _mojibake_inject(t)
    ids = injected.column("doc_id").to_pylist()
    texts = injected.column("text").to_pylist()
    out, passes = [], []
    for s in texts:
        if s is None or s.isascii():
            out.append(s)
            passes.append(0)
        else:
            fixed, n = fix_mojibake(s)
            out.append(fixed)
            passes.append(n)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(out, pa.string()),
        "moji_passes": pa.array(passes, pa.int32()),
        "was_mojibake": pa.array([p > 0 for p in passes], pa.bool_()),
    })


def so_prototype_prune(sf_dir: str) -> pa.Table:
    """Serial twin of q_prototype_prune: identical arithmetic end to end —
    init = the 8 smallest ids' vectors (normalized as the distributed
    fit normalizes its init), micro-unit Lloyd for 3 iters, per-row
    cosine-to-assigned-centroid milli scores, per-cluster integer
    histogram cutoff (ties at the cutoff bin kept), drop_frac=0.25."""
    ids, V = _embeddings(sf_dir)
    k, iters, drop_frac = 8, 3, 0.25
    order = np.argsort(ids, kind="stable")[:k]
    init = V[order]
    ninit = np.linalg.norm(init, axis=1, keepdims=True)
    ninit[ninit == 0] = 1.0
    nrm = np.linalg.norm(V, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    Vn = V / nrm
    _, C = _serial_microunit_kmeans(Vn, k, iters, init=init / ninit,
                                    return_centroids=True)
    sims = Vn @ C.T
    assign = np.argmax(sims, axis=1)
    best = sims[np.arange(len(V)), assign]
    milli = np.floor(best * 1000.0 + 0.5).astype(np.int64)

    cutoffs = np.full(k, 1002, dtype=np.int64)
    for c in range(k):
        vals = milli[assign == c]
        if len(vals) == 0:
            continue
        drop_n = int(drop_frac * len(vals))
        acc = 0
        for v, n in sorted(zip(*np.unique(vals, return_counts=True)),
                           reverse=True):
            if acc + n <= drop_n:
                acc += int(n)
            else:
                cutoffs[c] = v
                break
    pruned = milli > cutoffs[assign]

    order = np.argsort(ids, kind="stable")
    return pa.table({
        "vec_id": pa.array(ids[order], pa.int64()),
        "cluster": pa.array(assign[order].astype(np.int32), pa.int32()),
        "proto_milli": pa.array(milli[order], pa.int64()),
        "pruned": pa.array(pruned[order], pa.bool_()),
    })


def so_mmr_topk(sf_dir: str) -> pa.Table:
    """Serial twin of q_mmr_topk: full-corpus exact top-C candidates by
    (cos desc, id asc), then the identical integer-milli greedy MMR
    (λ=700, k=10, C=64)."""
    ids, V = _embeddings(sf_dir)
    k, lamb, Cn = 10, 700, 64
    q = V[int(np.nonzero(ids == 0)[0][0])]
    qn = q / (np.linalg.norm(q) or 1.0)
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0] = 1.0
    cos = (V @ qn) / norms
    order = np.lexsort((ids, -cos))[:Cn]
    cids, cV, ccos = ids[order].astype(np.int64), V[order], cos[order]
    n2 = np.linalg.norm(cV, axis=1, keepdims=True)
    n2[n2 == 0] = 1.0
    Vn = cV / n2
    rel = np.floor(ccos * 1000.0 + 0.5).astype(np.int64)
    P = np.floor(Vn @ Vn.T * 1000.0 + 0.5).astype(np.int64)

    selected: list[int] = []
    remaining = np.ones(len(cids), dtype=bool)
    scores: list[int] = []
    for _ in range(min(k, len(cids))):
        red = (P[:, selected].max(axis=1) if selected
               else np.zeros(len(cids), dtype=np.int64))
        mmr = lamb * rel - (1000 - lamb) * red
        masked = np.where(remaining, mmr, np.iinfo(np.int64).min)
        tie = np.nonzero((masked == masked.max()) & remaining)[0]
        pick = int(tie[np.argmin(cids[tie])])
        selected.append(pick)
        remaining[pick] = False
        scores.append(int(mmr[pick]))
    return pa.table({
        "rank": pa.array(range(len(selected)), pa.int64()),
        "vec_id": pa.array(cids[selected], pa.int64()),
        "sim_milli": pa.array(rel[selected], pa.int64()),
        "mmr_milli": pa.array(scores, pa.int64()),
    })



def so_audio_search(sf_dir: str) -> pa.Table:
    """Serial twin for q_audio_search: same corpus + query builders and
    timed-landmark kernel, INDEPENDENT dict-based offset voting and
    top-k ranking (plain loops — no searchsorted range expansion, no
    Ray), so the vectorized probe is checked against a naive count."""
    from collections import defaultdict

    from ..functions.audiofp import spectral_landmarks_timed
    from ..sources.clips import note_clips_table_from_documents
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _audio_query_clips

    q = _audio_query_clips(sf_dir)
    qindex: dict[int, list[tuple[int, int]]] = {}
    for qid, buf, sr in zip(q.column("query_id").to_pylist(),
                            q.column("bytes").to_pylist(),
                            q.column("sr_hz").to_pylist()):
        pcm = _decode_one(buf, "pcm_s16le")
        h, t = spectral_landmarks_timed(pcm, int(sr))
        for hh, tt in zip(h.tolist(), t.tolist()):
            qindex.setdefault(int(hh), []).append((int(qid), int(tt)))

    corpus = note_clips_table_from_documents(sf_dir)
    cands = []  # (qid, clip, votes, offset)
    for cid, buf, codec, sr in zip(corpus.column("clip_id").to_pylist(),
                                   corpus.column("bytes").to_pylist(),
                                   corpus.column("codec").to_pylist(),
                                   corpus.column("sr_hz").to_pylist()):
        try:
            pcm = _decode_one(buf or b"", codec or "")
        except DecodeUnsupported:
            continue
        h, t = spectral_landmarks_timed(pcm, int(sr or 0))
        votes: dict[tuple[int, int], int] = {}
        for hh, tc in zip(h.tolist(), t.tolist()):
            for qid, tq in qindex.get(int(hh), ()):
                k = (qid, int(tc) - tq)
                votes[k] = votes.get(k, 0) + 1
        best: dict[int, tuple[int, int]] = {}
        for (qid, off), v in votes.items():
            cur = best.get(qid)
            if cur is None or (-v, off) < (-cur[0], cur[1]):
                best[qid] = (v, off)
        for qid, (v, off) in best.items():
            if v >= 3:
                cands.append((qid, cid, v, off))

    cands.sort(key=lambda r: (r[0], -r[2], r[1]))
    taken: dict[int, int] = defaultdict(int)
    rows = []
    for r in cands:
        if taken[r[0]] < 3:
            rows.append(r)
            taken[r[0]] += 1
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "clip_id": pa.array([r[1] for r in rows], pa.int64()),
        "votes": pa.array([r[2] for r in rows], pa.int64()),
        "offset_frames": pa.array([r[3] for r in rows], pa.int64()),
    })


def _serial_pca(q_rows: list, n_components: int):
    """Independent PCA fit + whiten from micro-quantized rows: plain
    Python-int moment loops, same eigh/sign/floor conventions as
    stages/pca.py.  Returns (mean_q list[int], Wq int64 (d, p), and the
    whitened int columns {wj: [..]})."""
    from ..stages.pca import PCA_SCALE

    d = len(q_rows[0])
    n = len(q_rows)
    S = [0] * d
    XX = [[0] * d for _ in range(d)]
    for row in q_rows:
        for j in range(d):
            S[j] += row[j]
            for k in range(j, d):
                XX[j][k] += row[j] * row[k]
    C = np.zeros((d, d), dtype=np.float64)
    for j in range(d):
        for k in range(j, d):
            C[j, k] = C[k, j] = (XX[j][k] - S[j] * S[k] / n) / n
    eigvals, eigvecs = np.linalg.eigh(C)
    order = np.argsort(eigvals)[::-1]
    eigvals, eigvecs = eigvals[order], eigvecs[:, order]
    for j in range(d):
        i = int(np.argmax(np.abs(eigvecs[:, j])))
        if eigvecs[i, j] < 0:
            eigvecs[:, j] = -eigvecs[:, j]
    lam_f = np.maximum(eigvals, 0.0) / float(PCA_SCALE) ** 2
    lam_f = np.maximum(lam_f, max(float(lam_f.max()), 1e-12) * 1e-6)
    W = eigvecs / np.sqrt(lam_f)[None, :]
    mean_q = [int(np.floor(s / n + 0.5)) for s in S]
    Wq = np.floor(W * PCA_SCALE + 0.5).astype(np.int64)[:, :n_components]
    cols = {f"w{j}": [] for j in range(n_components)}
    for row in q_rows:
        c = [row[k] - mean_q[k] for k in range(d)]
        for j in range(n_components):
            acc = 0
            for k in range(d):
                acc += c[k] * int(Wq[k, j])
            cols[f"w{j}"].append(acc // PCA_SCALE)
    return mean_q, Wq, cols


def so_pca_whiten(sf_dir: str) -> pa.Table:
    """Serial twin for q_pca_whiten: INDEPENDENT moment accumulation
    (plain Python-int loops over rows — no block partials, no numpy
    matmul) and per-row transform dots, sharing only the PCA_SCALE
    constant and the same LAPACK eigh call on what must be the identical
    exact covariance."""
    import pyarrow.parquet as pq

    from ..stages.pca import PCA_SCALE

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = t.column("embedding").to_pylist()
    q_rows = [[int(np.floor(v * PCA_SCALE + 0.5)) for v in row]
              for row in vecs]
    _, _, cols = _serial_pca(q_rows, 8)
    order2 = np.argsort(np.asarray(ids, dtype=np.int64), kind="mergesort")
    return pa.table({
        "vec_id": pa.array([ids[i] for i in order2], pa.int64()),
        **{k: pa.array([v[i] for i in order2], pa.int64())
           for k, v in cols.items()},
    })


def so_audio_stitch(sf_dir: str) -> pa.Table:
    """Serial twin for q_audio_stitch: same corpus + timed-landmark
    kernel, INDEPENDENT dict-based boundary pairing and offset voting
    (plain loops, no numpy repeat/tile)."""
    from ..functions.audiofp import spectral_landmarks_timed
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _stitchmix_clips_batch

    W, MIN_V = 32, 6
    clips = _stitchmix_clips_batch(_docs(sf_dir, ("doc_id",)))
    tails: dict[int, list[tuple[int, int]]] = {}
    heads: dict[int, list[tuple[int, int]]] = {}
    for cid, buf, codec, sr in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(), clips.column("sr_hz").to_pylist(),
    ):
        try:
            pcm = _decode_one(buf or b"", codec or "")
        except DecodeUnsupported:
            continue
        h, t = spectral_landmarks_timed(pcm, int(sr or 0))
        if len(h) == 0:
            continue
        nf = int(t.max()) + 1
        for hh, tt in zip(h.tolist(), t.tolist()):
            if tt >= nf - W:
                tails.setdefault(int(hh), []).append((int(cid), int(tt)))
            if tt < W:
                heads.setdefault(int(hh), []).append((int(cid), int(tt)))
    votes: dict[tuple[int, int], dict[int, int]] = {}
    for hh, tl in tails.items():
        hl = heads.get(hh)
        if not hl or len(tl) + len(hl) > 200:
            continue
        for ia, ta in tl:
            for ib, tb in hl:
                off = ta - tb
                if ia != ib and off > 0:
                    d = votes.setdefault((ia, ib), {})
                    d[off] = d.get(off, 0) + 1
    rows = []
    for (ia, ib), d in votes.items():
        best = max(d.values())
        if best >= MIN_V:
            off = min(o for o, v in d.items() if v == best)
            rows.append((ia, ib, best, off))
    rows.sort()
    return pa.table({
        "id_a": pa.array([r[0] for r in rows], pa.int64()),
        "id_b": pa.array([r[1] for r in rows], pa.int64()),
        "votes": pa.array([r[2] for r in rows], pa.int64()),
        "offset_frames": pa.array([r[3] for r in rows], pa.int64()),
    })


def so_prepare_embeddings(sf_dir: str) -> pa.Table:
    """Serial twin for q_prepare_embeddings, composing the independent
    per-stage twins: Python-int PCA moments (_serial_pca), micro-unit
    Lloyd (_serial_microunit_kmeans — first-k-rows init per the order
    contract), pure-Python PQ (_serial_pq_train), and the sorted-by-id
    block-cosine near-dup pass matching the embedding_near_dup_pairs
    float contract."""
    from ..stages.dedup import EMBED_BLOCK_ROWS
    from ..stages.pca import PCA_SCALE

    ids, V = _embeddings(sf_dir)
    q_rows = [[int(np.floor(v * PCA_SCALE + 0.5)) for v in row]
              for row in V]
    _, _, wcols = _serial_pca(q_rows, 4)

    nrm = np.linalg.norm(V, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    Vn = V / nrm
    assign = _serial_microunit_kmeans(Vn, 8, 4)

    Vq = [[int(np.floor(v * PCA_SCALE + 0.5)) for v in row] for row in V]
    C = _serial_pq_train([int(i) for i in ids], Vq, 8, 16, 5)
    dsub = len(Vq[0]) // 8
    codes = [[_serial_pq_nearest(row[j * dsub:(j + 1) * dsub], C[j])[0]
              for j in range(8)] for row in Vq]

    losers: set = set()
    for c in range(8):
        mask = assign == c
        if mask.sum() < 2:
            continue
        order = np.argsort(ids[mask], kind="mergesort")
        gids = ids[mask][order]
        G = V[mask][order]
        gn = np.linalg.norm(G, axis=1, keepdims=True)
        gn[gn == 0] = 1.0
        Gn = G / gn
        n = len(gids)
        for s in range(0, n, EMBED_BLOCK_ROWS):
            e = min(s + EMBED_BLOCK_ROWS, n)
            S = Gn[s:e] @ Gn[s:].T
            bi, bj = np.nonzero(S >= 0.95)
            keep = (bj + s) > (bi + s)
            losers.update(int(x) for x in gids[bj[keep] + s])

    order2 = np.argsort(ids, kind="mergesort")
    return pa.table({
        "vec_id": pa.array(ids[order2], pa.int64()),
        "cluster": pa.array(assign[order2].astype(np.int64), pa.int64()),
        **{f"pq{j}": pa.array([codes[i][j] for i in order2], pa.int64())
           for j in range(8)},
        **{f"w{j}": pa.array([wcols[f"w{j}"][i] for i in order2], pa.int64())
           for j in range(4)},
        "is_dup": pa.array([int(i) in losers for i in ids[order2]],
                           pa.bool_()),
    })


def _serial_pq_nearest(sub, cb):
    best, bd = 0, None
    for c, cent in enumerate(cb):
        dist = sum((a - b) * (a - b) for a, b in zip(sub, cent))
        if bd is None or dist < bd:
            best, bd = c, dist
    return best, bd


def _serial_pq_train(ids, V, m, k, iters):
    """Independent pure-Python PQ Lloyd (smallest-id init, round-half-up
    centroid update) over micro-quantized rows; returns nested-list
    codebooks C[m][k][dsub]."""
    dsub = len(V[0]) // m
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    init = [V[i] for i in order[:k]]
    C = [[init[c][j * dsub:(j + 1) * dsub] for c in range(k)]
         for j in range(m)]
    for _ in range(iters):
        sums = [[[0] * dsub for _ in range(k)] for _ in range(m)]
        counts = [[0] * k for _ in range(m)]
        for row in V:
            for j in range(m):
                sub = row[j * dsub:(j + 1) * dsub]
                c, _d = _serial_pq_nearest(sub, C[j])
                counts[j][c] += 1
                for tt in range(dsub):
                    sums[j][c][tt] += sub[tt]
        for j in range(m):
            for c in range(k):
                n = counts[j][c]
                if n:
                    C[j][c] = [(2 * sums[j][c][tt] + n) // (2 * n)
                               for tt in range(dsub)]
    return C


def so_pq_search(sf_dir: str) -> pa.Table:
    """Serial twin for q_pq_search: INDEPENDENT pure-Python PQ — plain
    per-row Lloyd assignment loops, Python-int partial sums and the same
    round-half-up centroid update expression, per-row encode and ADC
    table sums; shares only the PQ_SCALE constant and init convention."""
    import pyarrow.parquet as pq_

    from ..stages.pq import PQ_SCALE

    t = pq_.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    ids = [int(i) for i in t.column("vec_id").to_pylist()]
    V = [[int(np.floor(v * PQ_SCALE + 0.5)) for v in row]
         for row in t.column("embedding").to_pylist()]
    m, k, iters = 8, 16, 5
    dsub = len(V[0]) // m
    C = _serial_pq_train(ids, V, m, k, iters)

    def nearest(sub, cb):
        return _serial_pq_nearest(sub, cb)

    q0 = V[ids.index(0)]
    table = [[sum((a - b) * (a - b) for a, b in zip(
        q0[j * dsub:(j + 1) * dsub], C[j][c])) for c in range(k)]
        for j in range(m)]
    scored = []
    for i, row in zip(ids, V):
        dist = 0
        for j in range(m):
            c, _d = nearest(row[j * dsub:(j + 1) * dsub], C[j])
            dist += table[j][c]
        scored.append((dist, i))
    scored.sort()
    top = scored[:10]
    return pa.table({
        "vec_id": pa.array([i for _, i in top], pa.int64()),
        "adc_dist": pa.array([dv for dv, _ in top], pa.int64()),
    })


def so_mutual_nn(sf_dir: str) -> pa.Table:
    """Serial twin for q_mutual_nn: INDEPENDENT exact-integer cosine via
    per-pair Python-int dots and math.isqrt (no numpy matmul, no float
    sqrt correction), dict-based top-1 both ways + mutual check."""
    import math

    import pyarrow.parquet as pq

    from ..stages.ann import MNN_SCALE

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = [int(i) for i in t.column("vec_id").to_pylist()]
    vecs = [[int(np.floor(v * MNN_SCALE + 0.5)) for v in row]
            for row in t.column("embedding").to_pylist()]
    A = [(i, v) for i, v in zip(ids, vecs) if i % 2 == 0]
    B = sorted(((i, v) for i, v in zip(ids, vecs) if i % 2 == 1))

    def cos_ppm(x, y):
        dot = sum(a * b for a, b in zip(x, y))
        nx = sum(a * a for a in x)
        ny = sum(b * b for b in y)
        if nx == 0 or ny == 0:
            return 0
        return (dot * 1_000_000) // math.isqrt(nx * ny)

    top_a = {}   # a_id -> (b_id, cos)
    best_b = {}  # b_id -> (cos, a_id)
    for ai, av in A:
        best = None
        for bi, bv in B:
            c = cos_ppm(av, bv)
            if best is None or c > best[1]:
                best = (bi, c)
            cur = best_b.get(bi)
            if cur is None or (c, -ai) > (cur[0], -cur[1]):
                best_b[bi] = (c, ai)
        top_a[ai] = best
    rows = []
    for ai, (bi, c) in sorted(top_a.items()):
        if best_b.get(bi, (None, None))[1] == ai:
            rows.append((ai, bi, c))
    return pa.table({
        "id_a": pa.array([r[0] for r in rows], pa.int64()),
        "id_b": pa.array([r[1] for r in rows], pa.int64()),
        "cos_ppm": pa.array([r[2] for r in rows], pa.int64()),
    })


def so_url_dedup(sf_dir: str) -> pa.Table:
    """Serial twin for q_url_dedup: same variant corpus + canonicalize
    kernel, INDEPENDENT dict-based grouping (no Ray, no aggregates)."""
    from ..functions.urlfilter import canonicalize_url
    from .queries import _url_variants_batch

    links = _url_variants_batch(_docs(sf_dir, ("doc_id",)))
    groups: dict[str, list[int]] = {}
    for i, u in zip(links.column("doc_id").to_pylist(),
                    links.column("url").to_pylist()):
        groups.setdefault(canonicalize_url(u), []).append(int(i))
    canon = sorted(groups)
    return pa.table({
        "canon_url": pa.array(canon, pa.string()),
        "winner_id": pa.array([min(groups[c]) for c in canon], pa.int64()),
        "n_variants": pa.array([len(groups[c]) for c in canon], pa.int64()),
    })


def so_dtmf_scan(sf_dir: str) -> pa.Table:
    """Serial twin for q_dtmf_scan: same corpus generator + decode + DTMF
    kernel per row, plain loop, no Ray."""
    from ..functions.audiofp import dtmf_digits
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _dtmfmix_clips_batch

    clips = _dtmfmix_clips_batch(_docs(sf_dir, ("doc_id",)))
    out = {"clip_id": [], "decode_ok": [], "dtmf_digits": [],
           "n_digits": [], "has_dtmf": []}
    for cid, buf, codec, sr in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(), clips.column("sr_hz").to_pylist(),
    ):
        try:
            seq = dtmf_digits(_decode_one(buf or b"", codec or ""),
                              int(sr or 0))
            ok = True
        except DecodeUnsupported:
            seq, ok = "", False
        out["clip_id"].append(cid)
        out["decode_ok"].append(ok)
        out["dtmf_digits"].append(seq)
        out["n_digits"].append(len(seq))
        out["has_dtmf"].append(ok and len(seq) >= 3)
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
        "dtmf_digits": pa.array(out["dtmf_digits"], pa.string()),
        "n_digits": pa.array(out["n_digits"], pa.int64()),
        "has_dtmf": pa.array(out["has_dtmf"], pa.bool_()),
    })


def so_audio_tempo(sf_dir: str) -> pa.Table:
    """Serial twin for q_audio_tempo: same corpus generator + decode +
    tempo kernel + flag logic per row, plain loop, no Ray."""
    from ..functions.audiofp import (
        TEMPO_MIN_CONF_PPM,
        TEMPO_MIN_ONSET_PPM,
        tempo_stats,
    )
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _tempomix_clips_batch

    clips = _tempomix_clips_batch(_docs(sf_dir, ("doc_id",)))
    keys = ("bpm", "tempo_conf_ppm", "onset_ppm")
    out = {k: [] for k in ("clip_id", "decode_ok", "has_beat")}
    cols = {k: [] for k in keys}
    for cid, buf, codec, sr, pb in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(), clips.column("sr_hz").to_pylist(),
        clips.column("planted_bpm").to_pylist(),
    ):
        try:
            stats = tempo_stats(_decode_one(buf or b"", codec or ""),
                                int(sr or 0))
            ok = True
        except DecodeUnsupported:
            stats = dict.fromkeys(keys, 0)
            ok = False
        out["clip_id"].append(cid)
        out["decode_ok"].append(ok)
        out["has_beat"].append(
            ok and stats["tempo_conf_ppm"] >= TEMPO_MIN_CONF_PPM
            and stats["onset_ppm"] >= TEMPO_MIN_ONSET_PPM)
        for k in keys:
            cols[k].append(stats[k])
    planted = clips.column("planted_bpm")
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
        **{k: pa.array(cols[k], pa.int64()) for k in keys},
        "planted_bpm": planted,
        "has_beat": pa.array(out["has_beat"], pa.bool_()),
    })


def so_sq8_recall(sf_dir: str) -> pa.Table:
    """Serial twin for q_sq8_recall: INDEPENDENT per-row Python loops —
    min/max fit, elementwise encode/dequant, math.isqrt milli-cosine
    top-10 on both representations, overlap count."""
    import math

    ids, V = _embeddings(sf_dir)
    lo = V.min(axis=0)
    hi = V.max(axis=0)
    span = hi - lo
    span[span == 0] = 1.0
    q = V[list(ids).index(0)]
    qq = [int(np.floor(v * 1000.0 + 0.5)) for v in q]
    qn = sum(x * x for x in qq)

    def topk(M):
        scored = []
        for i, row in zip(ids, M):
            rq = [int(np.floor(v * 1000.0 + 0.5)) for v in row]
            n2 = sum(x * x for x in rq)
            if n2 == 0:
                cos = 0
            else:
                dot = sum(a * b for a, b in zip(rq, qq))
                cos = (dot * 1_000_000) // math.isqrt(n2 * qn)
            scored.append((-cos, int(i)))
        scored.sort()
        return {i for _, i in scored[:10]}

    codes = np.clip(np.floor(255.0 * (V - lo) / span + 0.5), 0, 255)
    D = lo + codes * span / 255.0
    exact = topk(V)
    approx = topk(D)
    return pa.table({
        "recall_at_k": pa.array([len(exact & approx)], pa.int64()),
        "k": pa.array([10], pa.int64()),
    })


def so_matryoshka_recall(sf_dir: str) -> pa.Table:
    """Serial twin for q_matryoshka_recall: independent per-row Python
    prefix cosines (math.isqrt), full-dim ground truth, overlap."""
    import math

    ids, V = _embeddings(sf_dir)
    q = V[list(ids).index(0)]
    d = V.shape[1]

    def topk(p):
        qp = [int(np.floor(v * 1000.0 + 0.5)) for v in q[:p]]
        qn = sum(x * x for x in qp)
        scored = []
        for i, row in zip(ids, V):
            rq = [int(np.floor(v * 1000.0 + 0.5)) for v in row[:p]]
            n2 = sum(x * x for x in rq)
            if n2 == 0 or qn == 0:
                cos = 0
            else:
                dot = sum(a * b for a, b in zip(rq, qp))
                cos = (dot * 1_000_000) // math.isqrt(n2 * qn)
            scored.append((-cos, int(i)))
        scored.sort()
        return {i for _, i in scored[:10]}

    full = topk(d)
    dims = [8, 16, 32]
    return pa.table({
        "dims": pa.array(dims, pa.int64()),
        "recall_at_k": pa.array([len(topk(p) & full) for p in dims],
                                pa.int64()),
        "k": pa.array([10] * len(dims), pa.int64()),
    })


def so_scene_cuts(sf_dir: str) -> pa.Table:
    """Serial twin for q_scene_cuts: same corpus generator + scene-cut
    kernel + flag logic per row, plain loop, no Ray."""
    from ..stages.image import ImageDecodeUnsupported, scene_cut_stats
    from .queries import _scenemix_video_rows

    vids = _scenemix_video_rows(_docs(sf_dir, ("doc_id",)))
    keys = ("n_frames", "n_cuts", "first_cut_frame", "max_diff_milli")
    out = {k: [] for k in ("clip_id", "decode_ok", "has_cuts")}
    cols = {k: [] for k in keys}
    for cid, buf in zip(vids.column("clip_id").to_pylist(),
                        vids.column("bytes").to_pylist()):
        try:
            stats = scene_cut_stats(buf or b"")
            ok = True
        except ImageDecodeUnsupported:
            stats = {"n_frames": 0, "n_cuts": 0, "first_cut_frame": -1,
                     "max_diff_milli": 0}
            ok = False
        out["clip_id"].append(cid)
        out["decode_ok"].append(ok)
        out["has_cuts"].append(ok and stats["n_cuts"] > 0)
        for k in keys:
            cols[k].append(stats[k])
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
        **{k: pa.array(cols[k], pa.int64()) for k in keys},
        "has_cuts": pa.array(out["has_cuts"], pa.bool_()),
    })


def so_audio_declip(sf_dir: str) -> pa.Table:
    """Serial twin for q_audio_declip: same corpus + decode + declip +
    flat-rail kernels per row, plain loop, no Ray; repaired bytes
    md5-pinned like the distributed side."""
    import hashlib

    from ..functions.audiofp import declip, flat_clip_ppm
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _clipmix_clips_batch

    clips = _clipmix_clips_batch(_docs(sf_dir, ("doc_id",)))
    out = {k: [] for k in ("clip_id", "decode_ok", "flat_before_ppm",
                           "flat_after_ppm", "n_runs_repaired",
                           "bytes_md5")}
    for cid, buf, codec in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(),
    ):
        try:
            pcm = _decode_one(buf or b"", codec or "")
            ok = True
        except DecodeUnsupported:
            out["clip_id"].append(cid)
            out["decode_ok"].append(False)
            out["flat_before_ppm"].append(0)
            out["flat_after_ppm"].append(0)
            out["n_runs_repaired"].append(0)
            out["bytes_md5"].append(hashlib.md5(buf or b"").hexdigest())
            continue
        before = flat_clip_ppm(pcm)
        rep, _n, nr = declip(pcm.astype(np.float64))
        q = np.clip(np.floor(rep * 32767.0 + 0.5), -32768, 32767)
        b2 = q.astype("<i2").tobytes()
        out["clip_id"].append(cid)
        out["decode_ok"].append(ok)
        out["flat_before_ppm"].append(before)
        out["flat_after_ppm"].append(flat_clip_ppm(rep))
        out["n_runs_repaired"].append(nr)
        out["bytes_md5"].append(hashlib.md5(b2).hexdigest())
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
        "flat_before_ppm": pa.array(out["flat_before_ppm"], pa.int64()),
        "flat_after_ppm": pa.array(out["flat_after_ppm"], pa.int64()),
        "n_runs_repaired": pa.array(out["n_runs_repaired"], pa.int64()),
        "bytes_md5": pa.array(out["bytes_md5"], pa.string()),
    })


def so_speaker_turns(sf_dir: str) -> pa.Table:
    """Serial twin for q_speaker_turns: same corpus generator + decode +
    turn kernel + flag logic per row, plain loop, no Ray."""
    from ..functions.audiofp import MIN_SPEAKER_TURNS, speaker_turn_stats
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _turnmix_clips_batch

    clips = _turnmix_clips_batch(_docs(sf_dir, ("doc_id",)))
    keys = ("n_windows", "turn_count", "sep_ppm")
    out = {k: [] for k in ("clip_id", "decode_ok", "multi_speaker")}
    cols = {k: [] for k in keys}
    for cid, buf, codec, sr in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(), clips.column("sr_hz").to_pylist(),
    ):
        try:
            stats = speaker_turn_stats(_decode_one(buf or b"", codec or ""),
                                       int(sr or 0))
            ok = True
        except DecodeUnsupported:
            stats = dict.fromkeys(keys, 0)
            ok = False
        out["clip_id"].append(cid)
        out["decode_ok"].append(ok)
        out["multi_speaker"].append(
            ok and stats["turn_count"] >= MIN_SPEAKER_TURNS)
        for k in keys:
            cols[k].append(stats[k])
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
        **{k: pa.array(cols[k], pa.int64()) for k in keys},
        "multi_speaker": pa.array(out["multi_speaker"], pa.bool_()),
    })


def so_audio_loops(sf_dir: str) -> pa.Table:
    """Serial twin for q_audio_loops: same corpus generator + decode +
    peak-track extraction, INDEPENDENT pure-Python lag scoring (list
    comparisons over zip, no numpy boolean algebra) and independent flag
    logic — so the vectorized per-lag kernel is checked against a naive
    count."""
    from ..functions.audiofp import (
        MIN_LOOP_SCORE_PPM,
        MIN_LOOP_UNIQUE_PEAKS,
        _peak_track,
    )
    from ..stages.multimodal import DecodeUnsupported, _decode_one
    from .queries import _loopmix_clips_batch

    clips = _loopmix_clips_batch(_docs(sf_dir, ("doc_id",)))
    keys = ("n_frames", "n_voiced", "n_unique_peaks", "loop_period_frames",
            "loop_score_ppm", "loop_overlap")
    out = {k: [] for k in ("clip_id", "decode_ok", "is_looped")}
    cols = {k: [] for k in keys}
    for cid, buf, codec, sr in zip(
        clips.column("clip_id").to_pylist(), clips.column("bytes").to_pylist(),
        clips.column("codec").to_pylist(), clips.column("sr_hz").to_pylist(),
    ):
        stats = dict.fromkeys(keys, 0)
        try:
            pcm = _decode_one(buf or b"", codec or "")
            ok = True
            if int(sr or 0) > 0 and len(pcm) >= 512 + 256:
                pq_, vc, _, nf = _peak_track(pcm, int(sr), 512, 256,
                                             100.0, 512, 1e-4)
                track = [int(p) for p in pq_]
                voiced = [bool(v) for v in vc]
                stats["n_frames"] = int(nf)
                stats["n_voiced"] = sum(voiced)
                stats["n_unique_peaks"] = len(
                    {p for p, v in zip(track, voiced) if v})
                for p in range(8, min(int(nf) // 2, int(nf) - 8) + 1):
                    pairs = [(a, b) for (a, va), (b, vb) in
                             zip(zip(track[p:], voiced[p:]),
                                 zip(track[:-p], voiced[:-p])) if va and vb]
                    if len(pairs) < 8:
                        continue
                    hits = sum(1 for a, b in pairs if a == b)
                    ppm = 1_000_000 * hits // len(pairs)
                    if ppm > stats["loop_score_ppm"]:
                        stats["loop_score_ppm"] = ppm
                        stats["loop_period_frames"] = p
                        stats["loop_overlap"] = len(pairs)
        except DecodeUnsupported:
            ok = False
        out["clip_id"].append(cid)
        out["decode_ok"].append(ok)
        out["is_looped"].append(
            ok and stats["loop_score_ppm"] >= MIN_LOOP_SCORE_PPM
            and stats["n_unique_peaks"] >= MIN_LOOP_UNIQUE_PEAKS)
        for k in keys:
            cols[k].append(stats[k])
    return pa.table({
        "clip_id": pa.array(out["clip_id"], pa.string()),
        "decode_ok": pa.array(out["decode_ok"], pa.bool_()),
        **{k: pa.array(cols[k], pa.int64()) for k in keys},
        "is_looped": pa.array(out["is_looped"], pa.bool_()),
    })


SERIAL_ORACLES = {
    "q_fix_mojibake": so_fix_mojibake,
    "q_prototype_prune": so_prototype_prune,
    "q_mmr_topk": so_mmr_topk,
    "q_tdigest_quantiles": so_tdigest_quantiles,
    "q_cmvn": so_cmvn,
    "q_speed_perturb": so_speed_perturb,
    "q_acoustic_augment": so_acoustic_augment,
    "q_wds_shards": so_wds_shards,
    "q_specaugment": so_specaugment,
    "q_grouped_hll": so_grouped_hll,
    "q_loudness_normalize": so_loudness_normalize,
    "q_silence_trim": so_silence_trim,
    "q_sliding_chunks": so_sliding_chunks,
    "q_quarantine": so_quarantine,
    "q_prepare_audio": so_prepare_audio,
    "q_lang_drift": so_lang_drift,
    "q_windowed_drift": so_windowed_drift,
    "q_mp3_gate": so_mp3_gate,
    "q_audio_decontaminate": so_audio_decontaminate,
    "q_unigram_vocab": so_unigram_vocab,
    "q_unigram_tokens": so_unigram_tokens,
    "q_ccnet_buckets": so_ccnet_buckets,
    "q_bpe_vocab": so_bpe_vocab,
    "q_wordpiece_vocab": so_wordpiece_vocab,
    "q_wordpiece_tokens": so_wordpiece_tokens,
    "q_tokenizer_fertility": so_tokenizer_fertility,
    "q_bpe_tokens": so_bpe_tokens,
    "q_dsir_scores": so_dsir_scores,
    "q_arpa_ppl": so_arpa_ppl,
    "q_nb_langid": so_nb_langid,
    "q_linear_distill": so_linear_distill,
    "q_fuzzy_pairs": so_fuzzy_pairs,
    "q_vad_segments": so_vad_segments,
    "q_audio_loudness": so_audio_loudness,
    "q_audio_mfcc": so_audio_mfcc,
    "q_audio_snr": so_audio_snr,
    "q_audio_defects": so_audio_defects,
    "q_compression_quality": so_compression_quality,
    "q_audio_windows": so_audio_windows,
    "q_audio_augment": so_audio_augment,
    "q_pagerank": so_pagerank,
    "q_hits": so_hits,
    "q_audio_fp_pairs": so_audio_fp_pairs,
    "q_minhash_pairs": so_minhash_pairs,
    "q_dup_clusters": so_dup_clusters,
    "q_near_dedup": so_near_dedup,
    "q_near_dedup_best": so_near_dedup_best,
    "q_langid_agreement": so_langid_agreement,
    "q_weighted_sample": so_weighted_sample,
    "q_simhash_pairs": so_simhash_pairs,
    "q_ngram_jaccard_pairs": so_ngram_jaccard_pairs,
    "q_chunk_dedup": so_chunk_dedup,
    "q_lsh_topk": so_lsh_topk,
    "q_kmeans_clusters": so_kmeans_clusters,
    "q_clips_keep_stats": so_clips_keep_stats,
    "q_keepdrop_f1": so_keepdrop_f1,
    "q_keepdrop_f1_audio": so_keepdrop_f1_audio,
    "q_ivf_topk": so_ivf_topk,
    "q_count_min": so_count_min,
    "q_text_semantic_dedup": so_text_semantic_dedup,
    "q_batch_topk": so_batch_topk,
    "q_ann_recall": so_ann_recall,
    "q_perplexity": so_perplexity,
    "q_corpus_ppl": so_corpus_ppl,
    "q_audio_features": so_audio_features,
    "q_audio_spectral": so_audio_spectral,
    "q_vad_stats": so_vad_stats,
    "q_audio_transform": so_audio_transform,
    "q_flac_roundtrip": so_flac_roundtrip,
    "q_adpcm_roundtrip": so_adpcm_roundtrip,
    "q_image_features": so_image_features,
    "q_video_frames": so_video_frames,
    "q_image_near_dup": so_image_near_dup,
    "q_audio_bandwidth": so_audio_bandwidth,
    "q_music_detect": so_music_detect,
    "q_halluc_loops": so_halluc_loops,
    "q_pq_topk": so_pq_topk,
    "q_audio_humdc": so_audio_humdc,
    "q_audio_reverb": so_audio_reverb,
    "q_audio_channels": so_audio_channels,
    "q_audio_denoise": so_audio_denoise,
    "q_audio_compress": so_audio_compress,
    "q_utterance_pack": so_utterance_pack,
    "q_flac_transcode": so_flac_transcode,
    "q_lang_consistency": so_lang_consistency,
    "q_audio_qc": so_audio_qc,
    "q_prepare_speech": so_prepare_speech,
    "q_pack_bins": so_pack_bins,
    "q_codec_sniff": so_codec_sniff,
    "q_time_stretch": so_time_stretch,
    "q_pitch_shift": so_pitch_shift,
    "q_unimax_resample": so_unimax_resample,
    "q_prepare_image": so_prepare_image,
    "q_decontaminate_spans": so_decontaminate_spans,
    "q_paragraph_dedup_bloom": so_paragraph_dedup_bloom,
    "q_semantic_dedup": so_semantic_dedup,
    "q_audio_semantic_dedup": so_audio_semantic_dedup,
    "q_decontaminate": so_decontaminate,
    "q_gopher_quality": so_gopher_quality,
    "q_c4_filters": so_c4_filters,
    "q_c4_span_dedup": so_c4_span_dedup,
    "q_substring_dedup": so_substring_dedup,
    "q_grouped_quantiles_approx": so_grouped_quantiles_approx,
    "q_audio_search": so_audio_search,
    "q_audio_loops": so_audio_loops,
    "q_pca_whiten": so_pca_whiten,
    "q_url_dedup": so_url_dedup,
    "q_mutual_nn": so_mutual_nn,
    "q_dtmf_scan": so_dtmf_scan,
    "q_pq_search": so_pq_search,
    "q_audio_stitch": so_audio_stitch,
    "q_prepare_embeddings": so_prepare_embeddings,
    "q_audio_tempo": so_audio_tempo,
    "q_speaker_turns": so_speaker_turns,
    "q_audio_declip": so_audio_declip,
    "q_scene_cuts": so_scene_cuts,
    "q_sq8_recall": so_sq8_recall,
    "q_matryoshka_recall": so_matryoshka_recall,
}


def ensure_fixture(name: str, sf_dir: str) -> None:
    """(Re)write the fixture for ``name`` against ``sf_dir``.  Called by the
    query builders on entry; SPIDERRAY_SKIP_FIXTURES=1 (bench.py) skips it
    so benchmark timings measure the engine, not the oracle."""
    if os.environ.get("SPIDERRAY_SKIP_FIXTURES"):
        return
    write_fixture(name, SERIAL_ORACLES[name](sf_dir))
