"""Mergeable sketches (engine addition; the reference has no approximate
aggregates, SURVEY.md §2.5 note).  HyperLogLog with 2^P registers and a
fixed 64-bit hash — every worker computes identical register arrays, so
per-batch sketches merge with an elementwise max (the partial+final
combiner shape: one sketch per batch moves, never rows)."""

from __future__ import annotations

import hashlib

import numpy as np

P = 12                      # 4096 registers; ~1.6% standard error
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _hash64(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        b = v if isinstance(v, bytes) else str(v).encode("utf-8")
        out[i] = np.uint64(
            int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")
        )
    return out


def hll_from_values(values) -> np.ndarray:
    """Build a register array (uint8[M]) from a batch of values."""
    regs = np.zeros(M, dtype=np.uint8)
    if not len(values):
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    remaining = h << np.uint64(P)
    # rank = leading zeros of the remaining (64-P)-bit suffix + 1, counted
    # with a done-mask so bits after the first 1 never increment
    rank = np.ones(len(h), dtype=np.uint8)
    done = np.zeros(len(h), dtype=bool)
    for _ in range(64 - P):
        top_set = remaining >= (np.uint64(1) << np.uint64(63))
        done |= top_set
        rank[~done] += 1
        remaining = remaining << np.uint64(1)
        if done.all():
            break
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(M, dtype=np.uint8)
    for s in sketches:
        np.maximum(out, s, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * M * M / float(np.sum(2.0 ** (-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * M and zeros:
        return M * float(np.log(M / zeros))  # linear counting for small n
    return est


def count_distinct_approx(ds, col: str) -> float:
    """Distributed approximate distinct count: one sketch per batch →
    driver-side merge (sketches are 4 KB; 'only counters move')."""
    import pyarrow as pa

    def per_batch(batch: pa.Table) -> pa.Table:
        regs = hll_from_values(batch.column(col).to_pylist())
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
    sketches = [
        np.frombuffer(row["sketch"], dtype=np.uint8)
        for row in parts.take_all()
    ]
    return hll_estimate(hll_merge(sketches))


def grouped_count_distinct_approx(ds, group_col: str, col: str):
    """Per-GROUP approximate distinct count: one (group, 4 KB sketch) row
    per batch-group crosses the keyed shuffle — bounded by groups × blocks
    regardless of value cardinality — then registers max-merge per group
    (order-independent ⇒ bit-deterministic) and estimate.  Returns a
    Dataset of (group, est_distinct int64)."""
    import pandas as pd
    import pyarrow as pa

    def per_batch(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            group_col: batch.column(group_col).to_pylist(),
            col: batch.column(col).to_pylist(),
        })
        groups, sketches = [], []
        for g, sub in df.groupby(group_col, sort=True):
            groups.append(g)
            sketches.append(hll_from_values(sub[col].tolist()).tobytes())
        return pa.table({group_col: pa.array(groups),
                         "sketch": pa.array(sketches, pa.binary())})

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        regs = hll_merge([np.frombuffer(s, dtype=np.uint8)
                          for s in g["sketch"]])
        return pd.DataFrame({
            group_col: [g[group_col].iloc[0]],
            "est_distinct": [int(round(hll_estimate(regs)))],
        })

    return (
        ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(merge_group, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — the point-frequency
# member of the mergeable-sketch family beside HLL (distinct) and
# Misra-Gries (heavy hitters): estimate the count of ANY item with
# one-sided error (est >= true; est <= true + eps*N w.p. 1-delta).
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 8192


def _cms_rows(values, depth: int, width: int) -> np.ndarray:
    """(depth, len(values)) bucket indices from md5(row:value) — the
    same salted-md5 determinism discipline as the rest of the repo, so
    every worker, run, and partitioning agrees."""
    import hashlib

    out = np.empty((depth, len(values)), dtype=np.int64)
    for r in range(depth):
        out[r] = [
            int.from_bytes(
                hashlib.md5(f"{r}:{v}".encode()).digest()[:8], "big")
            % width
            for v in values
        ]
    return out


def cms_from_values(values, depth: int = CMS_DEPTH,
                    width: int = CMS_WIDTH) -> np.ndarray:
    """One batch of items → a (depth, width) int64 count-min table."""
    cms = np.zeros((depth, width), dtype=np.int64)
    if len(values):
        rows = _cms_rows(list(values), depth, width)
        for r in range(depth):
            np.add.at(cms[r], rows[r], 1)
    return cms


def cms_estimate(cms: np.ndarray, items) -> np.ndarray:
    """Point-frequency estimates (min over rows) for ``items``."""
    depth, width = cms.shape
    rows = _cms_rows(list(items), depth, width)
    ests = np.stack([cms[r][rows[r]] for r in range(depth)])
    return ests.min(axis=0)


def count_min_build(ds, col: str, depth: int = CMS_DEPTH,
                    width: int = CMS_WIDTH) -> np.ndarray:
    """Distributed count-min build: each batch emits its (depth×width)
    partial table as one flattened row; tables MERGE BY ADDITION
    (order-independent, exactly deterministic), so the driver reduce is
    a sum of n_blocks fixed-size matrices — nothing corpus-sized moves,
    and the result is identical to a serial build."""

    def partial(batch):
        import pyarrow as pa

        vals = [v for v in batch.column(col).to_pylist() if v is not None]
        cms = cms_from_values(vals, depth, width)
        return pa.table({"cms": pa.array([cms.flatten().tolist()],
                                         pa.list_(pa.int64()))})

    total = np.zeros(depth * width, dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        for row in b.column("cms").to_pylist():
            total += np.asarray(row, dtype=np.int64)
    return total.reshape(depth, width)
