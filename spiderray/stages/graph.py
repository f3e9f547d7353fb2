"""Link-graph authority scoring: distributed PageRank with INTEGER
micro-unit arithmetic.

go-pkg-spider's domain is the web link graph (extract/link.go harvests it;
SURVEY.md §2.4/§3.2 classify it); PageRank is the canonical "which pages
matter" aggregate over exactly that data.  Ray Data has no graph engine —
the iteration is expressed as the join/groupby exchanges it actually is:

    per iteration:  edges(+out-degree) ⋈ ranks on src   (bucketed join)
                    → contribution = rank // out_degree  (exact int)
                    → groupby(dst).Sum                   (exact int)
                    → rank' = teleport + damping·sum//100

Every operation is int64 — no float summation order anywhere — so the
result is bit-identical under any partitioning, batch composition or
execution order, and a serial dict implementation (the fixture oracle)
reproduces it exactly.  Mass bookkeeping: integer floor division sheds
< out_degree micro-units per node per iteration and dangling nodes shed
their full rank (both documented, both deterministic); with base = 1e9
micro-units per node the shed mass is ≤ ppm-scale and the per-dst sums
stay far inside int64 for graphs up to ~1e9 nodes.

Scale shape: ranks and edges stay Datasets end-to-end (nothing node- or
edge-sized lands on the driver); each iteration is one bucketed join +
one keyed groupby — the irreducible PageRank exchange; ranks materialize
per iteration to truncate lineage (re-execution would otherwise replay
every prior iteration).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BASE_RANK = 1_000_000_000  # micro-units per node
DAMPING_PCT = 85           # 0.85, as an integer percentage


def _distinct_nodes(edges, src_col: str, dst_col: str):
    """Distinct node ids from both edge endpoints — one groupby over
    (endpoint) rows, pre-deduped per batch."""
    def explode(batch: pa.Table) -> pa.Table:
        a = batch.column(src_col).to_numpy(zero_copy_only=False)
        b = batch.column(dst_col).to_numpy(zero_copy_only=False)
        u = np.unique(np.concatenate([a, b]))
        return pa.table({"node": pa.array(u.astype(object), pa.string())})

    return (
        edges.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .count()
        .select_columns(["node"])
    )


def _rename_col(ds, old: str, new: str):
    """Arrow-batch rename.  Dataset.rename_columns applies the Arrow method
    name to whatever block format arrives — a pandas block (which groupby
    aggregates emit at scale) raises AttributeError — so rename explicitly
    in pyarrow format (reproduced here at the 300k-edge stress scale)."""
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([new if c == old else c for c in t.column_names])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pagerank_int(edges, src_col: str = "src", dst_col: str = "dst",
                 iterations: int = 5, base: int = BASE_RANK,
                 damping_pct: int = DAMPING_PCT, num_buckets: int = 32,
                 checkpoint_dir: str | None = None):
    """Fixed-iteration integer PageRank.  Returns a Dataset of
    (node, rank) with ranks in micro-units (initial mass ``base`` per
    node, teleport share (100-damping_pct)% of base).  Parallel edges
    count as distinct votes; self-loops participate normally; dangling
    nodes keep receiving teleport but forward nothing.

    ``checkpoint_dir`` makes the iteration RESUMABLE: after each round the
    rank table writes to ``<dir>/iter_<k>/`` (parquet) and an empty
    ``_DONE`` marker promotes it; a rerun scans for the highest complete
    round ≤ iterations and continues from it, so a job killed at round k
    repeats no earlier round.  Because the arithmetic is bit-deterministic,
    a resumed run is EXACTLY the uninterrupted run — tested, not assumed.
    Stale later-round directories (from a longer previous run) are ignored
    rather than trusted, and a partial directory without ``_DONE`` is
    overwritten."""
    import os
    import shutil

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .joins import bucketed_join

    teleport = (100 - damping_pct) * base // 100

    def _ckpt_path(k: int) -> str:
        return os.path.join(checkpoint_dir, f"iter_{k:04d}")

    start_iter = 0
    resume_ranks = None
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        for k in range(iterations, 0, -1):
            p = _ckpt_path(k)
            if os.path.exists(os.path.join(p, "_DONE")):
                resume_ranks = rd.read_parquet(p)
                start_iter = k
                break

    # out-degree attached to edges ONCE (degree counts parallel edges)
    deg = (
        edges.groupby(src_col)
        .aggregate(Count(alias_name="outdeg"))
    )
    edges_deg = bucketed_join(
        edges.select_columns([src_col, dst_col]),
        _rename_col(deg, src_col, "__dsrc"),
        on=src_col, right_on="__dsrc", num_buckets=num_buckets,
    ).select_columns([src_col, dst_col, "outdeg"]).materialize()

    nodes = _distinct_nodes(edges, src_col, dst_col).materialize()
    if resume_ranks is not None:
        ranks = resume_ranks.materialize()
    else:
        ranks = nodes.map_batches(
            lambda t: t.append_column(
                "rank", pa.array(np.full(t.num_rows, base, dtype=np.int64))),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()

    for it in range(start_iter, iterations):
        joined = bucketed_join(
            edges_deg,
            _rename_col(ranks, "node", "__rsrc"),
            on=src_col, right_on="__rsrc", num_buckets=num_buckets,
        )

        def contrib(batch: pa.Table) -> pa.Table:
            # cast defensively: the bucketed-join pandas merge can emit
            # outdeg as float64 (empty-bucket dtype degradation) and a
            # float floor-division would lose exactness past 2^53 mass
            r = batch.column("rank").to_numpy(zero_copy_only=False).astype(np.int64)
            d = batch.column("outdeg").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "node": batch.column(dst_col),
                "c": pa.array(r // d),
            })

        contribs = joined.map_batches(contrib, batch_format="pyarrow",
                                      zero_copy_batch=True)
        # union zero rows so teleport-only nodes (no in-edges) survive
        zeros = nodes.map_batches(
            lambda t: t.append_column(
                "c", pa.array(np.zeros(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        insum = (
            contribs.union(zeros)
            .groupby("node")
            .aggregate(Sum("c", alias_name="in_c"))
        )

        def apply_rank(batch: pa.Table) -> pa.Table:
            s = batch.column("in_c").to_numpy(zero_copy_only=False)
            rank = teleport + (damping_pct * s) // 100
            return pa.table({"node": batch.column("node"),
                             "rank": pa.array(rank.astype(np.int64))})

        ranks = insum.map_batches(apply_rank, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
        if checkpoint_dir:
            p = _ckpt_path(it + 1)
            if os.path.isdir(p):  # partial from a killed run: replace
                shutil.rmtree(p)
            ranks.write_parquet(p)
            with open(os.path.join(p, "_DONE"), "w"):
                pass
    return ranks


def serial_pagerank_int(edge_list, iterations: int = 5, base: int = BASE_RANK,
                        damping_pct: int = DAMPING_PCT) -> dict[str, int]:
    """Independent serial twin (dict arithmetic) — the fixture oracle.
    Must match pagerank_int bit-for-bit on any graph."""
    teleport = (100 - damping_pct) * base // 100
    outdeg: dict[str, int] = {}
    nodes: set[str] = set()
    for s, d in edge_list:
        outdeg[s] = outdeg.get(s, 0) + 1
        nodes.add(s)
        nodes.add(d)
    ranks = {n: base for n in nodes}
    for _ in range(iterations):
        insum = {n: 0 for n in nodes}
        for s, d in edge_list:
            insum[d] += ranks[s] // outdeg[s]
        ranks = {n: teleport + (damping_pct * insum[n]) // 100 for n in nodes}
    return ranks


def pagerank_edge_pairs(ids) -> list[tuple[str, str]]:
    """Deterministic synthetic link graph from document ids (200 core
    nodes, a second modular ring every 3rd doc, a hub edge to n0 every
    5th): parallel edges and dangling nodes both occur.  Pure function
    shared by the distributed edge builder and the serial oracle."""
    out = []
    for i in ids:
        s = f"n{i % 200}"
        out.append((s, f"n{(i * 7 + 13) % 200}"))
        if i % 3 == 0:
            out.append((s, f"n{(i * 11 + 1) % 97}"))
        if i % 5 == 0:
            out.append((s, "n0"))
    return out


def pagerank_edges_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    pairs = pagerank_edge_pairs(batch.column(id_col).to_pylist())
    return pa.table({
        "src": pa.array([p[0] for p in pairs], pa.string()),
        "dst": pa.array([p[1] for p in pairs], pa.string()),
    })


HITS_SCALE = 1_000_000_000


def hits_int(edges, src_col: str = "src", dst_col: str = "dst",
             iterations: int = 3, scale: int = HITS_SCALE,
             num_buckets: int = 32):
    """Kleinberg HITS (hubs & authorities) with integer arithmetic — the
    formal version of go-pkg-spider's hub-vs-content page distinction
    (extract/link.go's list-page heuristics, SURVEY §2.4 G1-G3).

    Per iteration: auth(v) = Σ_{u→v} hub(u) then hub(u) = Σ_{u→v} auth(v),
    each renormalized to max = ``scale`` via integer ``raw·scale//max`` —
    the only global coordination is one scalar max per half-step (a single
    number on the driver, size-independent).  All arithmetic exact-int ⇒
    bit-identical under any partitioning; serial dict twin is an exact
    oracle.  Returns (node, hub, auth); nodes missing a side score 0.
    Raw per-node sums are bounded by in-degree·scale — int64-safe to
    ~9·10^9 in-edges per node at the default scale."""
    from ray.data.aggregate import Sum

    from .joins import bucketed_join

    nodes = _distinct_nodes(edges, src_col, dst_col).materialize()
    e = edges.select_columns([src_col, dst_col]).materialize()

    def const_col(ds, name, value):
        return ds.map_batches(
            lambda t: t.append_column(
                name, pa.array(np.full(t.num_rows, value, dtype=np.int64))),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    hubs = const_col(nodes, "hub", scale).materialize()

    def propagate(scores, score_col, join_on, emit_col):
        """scores keyed by node joined to edges on ``join_on``; sums land
        on the opposite endpoint ``emit_col`` → (node, raw)."""
        joined = bucketed_join(
            e, _rename_col(scores.select_columns(["node", score_col]),
                           "node", "__jn"),
            on=join_on, right_on="__jn", num_buckets=num_buckets,
        )

        def emit(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch.column(emit_col),
                "raw": batch.column(score_col),
            })

        contribs = joined.map_batches(emit, batch_format="pyarrow",
                                      zero_copy_batch=True)
        zeros = nodes.map_batches(
            lambda t: t.append_column(
                "raw", pa.array(np.zeros(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        return (
            contribs.union(zeros).groupby("node")
            .aggregate(Sum("raw", alias_name="raw"))
        )

    def normalize(raw_ds, out_name):
        mx = raw_ds.max("raw")  # one scalar on the driver
        mx = int(mx if mx else 0)

        def fn(batch: pa.Table) -> pa.Table:
            r = batch.column("raw").to_pylist()
            # Python-int multiply: raw·scale reaches ~1e24 on hub nodes,
            # which silently wraps in int64 numpy; the serial twin uses
            # exact ints, so the engine must too (result ≤ scale fits)
            val = [(int(x) * scale) // mx for x in r] if mx > 0 \
                else [0] * len(r)
            return pa.table({"node": batch.column("node"),
                             out_name: pa.array(val, pa.int64())})

        return raw_ds.map_batches(fn, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

    auths = None
    for _ in range(iterations):
        auths = normalize(propagate(hubs, "hub", src_col, dst_col), "auth")
        hubs = normalize(propagate(auths, "auth", dst_col, src_col), "hub")

    out = bucketed_join(hubs, _rename_col(auths, "node", "__an"),
                        on="node", right_on="__an", num_buckets=num_buckets)

    import pyarrow.compute as pc

    def cast_out(t: pa.Table) -> pa.Table:
        # the pandas merge inside bucketed_join can promote int64 → float64
        # (empty-bucket dtype degradation); values stay exact (≤ scale ≪
        # 2^53) but the dtype-sensitive contract hash would not
        return pa.table({
            "node": pc.cast(t.column("node"), pa.string()),
            "hub": pc.cast(t.column("hub"), pa.int64()),
            "auth": pc.cast(t.column("auth"), pa.int64()),
        })

    return out.select_columns(["node", "hub", "auth"]).map_batches(
        cast_out, batch_format="pyarrow", zero_copy_batch=True)


def serial_hits_int(edge_list, iterations: int = 3,
                    scale: int = HITS_SCALE) -> dict[str, tuple[int, int]]:
    """Serial dict twin of hits_int — must match bit-for-bit."""
    nodes = set()
    for s, d in edge_list:
        nodes.add(s)
        nodes.add(d)
    hubs = {n: scale for n in nodes}
    auths = {n: 0 for n in nodes}
    for _ in range(iterations):
        raw_a = {n: 0 for n in nodes}
        for s, d in edge_list:
            raw_a[d] += hubs[s]
        mx = max(raw_a.values(), default=0)
        auths = {n: (v * scale) // mx if mx > 0 else 0
                 for n, v in raw_a.items()}
        raw_h = {n: 0 for n in nodes}
        for s, d in edge_list:
            raw_h[s] += auths[d]
        mx = max(raw_h.values(), default=0)
        hubs = {n: (v * scale) // mx if mx > 0 else 0
                for n, v in raw_h.items()}
    return {n: (hubs[n], auths[n]) for n in nodes}
