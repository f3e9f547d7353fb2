"""prepare_embeddings — the composed EMBEDDING-store preparation
pipeline, completing the corpus-prep trio beside prepare_corpus (text)
and prepare_audio (clips): condition, index and dedup an embedding
column the way a retrieval / semantic-dedup deployment consumes it:

    vectors → PCA whiten (top-p conditioned coordinates)
            → k-means cluster assignment (the IVF routing key)
            → PQ codes (m uint8 per vector — the compressed payload)
            → within-cluster cosine near-dup mark (SemDeDup-shaped)

Scale shape: THREE bounded model fits (each moving only counter-sized
partials per block — the pca/ann/pq stage contracts), every model
broadcast once, then ONE streamed pass appends all per-row columns; the
only corpus-keyed exchange is the within-cluster pair search, whose
groups are cluster-bounded with the hot-group cap.  The loser-id set is
pair-bounded and broadcasts under a loud cap — nothing corpus-sized
lands on the driver.

Determinism: whiten/PQ are exact-integer stages; clustering is the
micro-unit integer Lloyd; the dup mark reuses the near-dup float
contract already pinned by q_embed_near_dup (sorted-by-id block
products).  The whole per-row output is serial-twin checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def prepare_embeddings(ds, *, whiten_dims: int = 4, n_clusters: int = 8,
                       kmeans_iters: int = 4, pq_m: int = 8,
                       pq_k: int = 16, pq_iters: int = 5,
                       dup_threshold: float = 0.95,
                       max_losers: int = 2_000_000,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id"):
    """Returns a Dataset of (id, cluster, w0..w{p-1}, pq0..pq{m-1},
    is_dup) — the conditioned, routed, compressed, dedup-marked
    embedding store."""
    import ray

    from ..stages.ann import kmeans_assign, kmeans_fit_distributed
    from ..stages.dedup import embedding_near_dup_pairs
    from ..stages.pca import pca_fit_distributed, pca_whiten
    from ..stages.pq import pq_encode, pq_train

    model = pca_fit_distributed(ds, vec_col=vec_col)
    C = kmeans_fit_distributed(ds, n_centroids=n_clusters,
                               iters=kmeans_iters, vec_col=vec_col)
    books = pq_train(ds, m=pq_m, k=pq_k, iters=pq_iters,
                     vec_col=vec_col, id_col=id_col)

    out = pca_whiten(ds, model, n_components=whiten_dims, vec_col=vec_col)
    out = kmeans_assign(out, C, vec_col=vec_col)
    out = pq_encode(out, books, vec_col=vec_col)
    # two consumers follow (the pair search, then the final mark pass):
    # materialize once so the append chain never re-executes — the
    # prepare_audio fp_dedup precedent; corpus-sized, object-store-
    # spillable, never on the driver
    out = out.materialize()

    pairs = embedding_near_dup_pairs(
        out, vec_col=vec_col, id_col=id_col, part_col="cluster",
        threshold=dup_threshold)
    losers: set = set()
    for b in pairs.select_columns(["id_b"]).iter_batches(
            batch_format="pyarrow"):
        losers.update(b.column("id_b").to_pylist())
        if len(losers) > max_losers:
            raise ValueError(
                f"near-dup loser set exceeds {max_losers}; raise the "
                f"threshold or mark via the bucketed-join path")
    l_ref = ray.put(losers)

    def finish(batch: pa.Table) -> pa.Table:
        lose = ray.get(l_ref)
        ids = batch.column(id_col).to_pylist()
        codes = np.array(batch.column("pq_code").to_pylist(), dtype=np.int64)
        cols = {id_col: batch.column(id_col),
                "cluster": batch.column("cluster").cast(pa.int64())}
        for j in range(pq_m):
            cols[f"pq{j}"] = pa.array(
                codes[:, j] if len(codes) else np.array([], np.int64),
                pa.int64())
        for j in range(whiten_dims):
            cols[f"w{j}"] = batch.column(f"w{j}")
        cols["is_dup"] = pa.array([i in lose for i in ids], pa.bool_())
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)
