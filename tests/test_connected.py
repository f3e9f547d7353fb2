"""Distributed connected components + near-dedup (stages/dedup.py).

Oracle: a serial union-find over the same edge list.  Graph shapes chosen
to stress the algorithm, not just the happy path: random graphs (many
components of mixed size), a long chain (worst-case diameter — exercises
pointer jumping), cliques with shared members, and the empty graph.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from spiderray.stages import dedup


def _uf_clusters(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Serial union-find: node -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _pairs_ds(pairs: list[tuple[int, int]]):
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in pairs], pa.int64()),
                "id_b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )


def _cc_df(pairs: list[tuple[int, int]]) -> pd.DataFrame:
    out = dedup.dup_connected_components(_pairs_ds(pairs))
    return out.to_pandas().sort_values("node").reset_index(drop=True)


def _assert_matches_uf(pairs: list[tuple[int, int]]):
    got = _cc_df(pairs)
    exp = _uf_clusters(pairs)
    assert len(got) == len(exp)
    for node, cid in zip(got["node"], got["cluster_id"]):
        assert exp[int(node)] == int(cid), (node, cid, exp[int(node)])


def test_cc_random_graphs(ray_session):
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = 200 + 50 * trial
        m = 150 + 100 * trial
        pairs = [
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
            if a != b
        ]
        _assert_matches_uf(pairs)


def test_cc_long_chain(ray_session):
    # worst-case diameter: 0-1-2-...-120 must all collapse to cluster 0
    pairs = [(i, i + 1) for i in range(120)]
    got = _cc_df(pairs)
    assert set(got["node"]) == set(range(121))
    assert (got["cluster_id"] == 0).all()


def test_cc_two_cliques_bridged(ray_session):
    # two 5-cliques joined by one bridge edge -> one component
    a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    b = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    _assert_matches_uf(a + b)  # two components
    _assert_matches_uf(a + b + [(4, 10)])  # bridged -> one


def test_cc_duplicate_and_reversed_edges(ray_session):
    pairs = [(3, 9), (9, 3), (3, 9), (9, 12), (50, 40)]
    got = _cc_df(pairs)
    exp = {3: 3, 9: 3, 12: 3, 40: 40, 50: 40}
    assert dict(zip(got["node"].astype(int), got["cluster_id"].astype(int))) == exp


def test_cc_empty_pairs(ray_session):
    out = dedup.dup_connected_components(_pairs_ds([]))
    assert out.count() == 0
    # schema asserted on the Dataset: to_pandas drops columns on 0-row
    # datasets (reproduced Ray 2.49 issue, see ROADMAP.md)
    assert out.schema().names == ["node", "cluster_id"]


def _docs_ds(n: int):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
            }
        )
    )


def test_near_dedup_broadcast_path(ray_session):
    # components {0,5,7} and {2,3}: losers 5,7,3 - representatives 0,2 stay
    pairs = [(0, 5), (5, 7), (2, 3)]
    out = dedup.near_dedup(_docs_ds(10), _pairs_ds(pairs), id_col="doc_id")
    kept = sorted(out.to_pandas()["doc_id"])
    assert kept == [0, 1, 2, 4, 6, 8, 9]


def test_near_dedup_join_path_matches_broadcast(ray_session):
    rng = np.random.default_rng(11)
    pairs = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 60, 40), rng.integers(0, 60, 40))
        if a != b
    ]
    ds = _docs_ds(80)
    kept_b = sorted(
        dedup.near_dedup(ds, _pairs_ds(pairs), id_col="doc_id").to_pandas()["doc_id"]
    )
    kept_j = sorted(
        dedup.near_dedup(
            ds, _pairs_ds(pairs), id_col="doc_id", broadcast_max_losers=0
        ).to_pandas()["doc_id"]
    )
    assert kept_b == kept_j
    # row payloads survive untouched on both paths
    out = dedup.near_dedup(
        ds, _pairs_ds(pairs), id_col="doc_id", broadcast_max_losers=0
    ).to_pandas()
    assert (out["text"] == out["doc_id"].map(lambda i: f"doc {i}")).all()


def test_near_dedup_no_pairs_is_identity(ray_session):
    ds = _docs_ds(5)
    out = dedup.near_dedup(ds, _pairs_ds([]), id_col="doc_id")
    assert sorted(out.to_pandas()["doc_id"]) == [0, 1, 2, 3, 4]


class TestPagerank:
    def test_matches_serial_twin_bitwise(self, ray_session):
        import ray.data as rd

        from spiderray.stages.graph import (pagerank_edge_pairs, pagerank_int,
                                            serial_pagerank_int)

        pairs = pagerank_edge_pairs(range(300))
        edges = rd.from_items([{"src": s, "dst": d} for s, d in pairs]
                              ).repartition(5)
        got = dict(pagerank_int(edges, num_buckets=8, iterations=3)
                   .to_pandas().itertuples(index=False, name=None))
        expect = serial_pagerank_int(pairs, iterations=3)
        assert got == expect  # exact int equality, every node

    def test_structure_sensible(self, ray_session):
        import ray.data as rd

        from spiderray.stages.graph import pagerank_int

        # star: everyone links to hub; hub links to one spoke
        rows = [{"src": f"s{i}", "dst": "hub"} for i in range(10)]
        rows.append({"src": "hub", "dst": "s0"})
        got = pagerank_int(rd.from_items(rows), num_buckets=4,
                           iterations=4).to_pandas().set_index("node")["rank"]
        # hub and s0 trade the mass (hub's single out-edge hands it all to
        # s0 each round); both sit far above the teleport floor
        assert got["hub"] > 10 * 150_000_000
        assert got["s0"] > 10 * 150_000_000
        # spokes without in-edges sit at pure teleport
        assert got["s1"] == got["s2"] == 150_000_000

    def test_dangling_and_self_loop(self, ray_session):
        import ray.data as rd

        from spiderray.stages.graph import pagerank_int, serial_pagerank_int

        # b self-loops; d has no out-edges (dangling mass is shed)
        pairs = [("a", "b"), ("b", "b"), ("c", "a"), ("x", "a"), ("a", "d")]
        edges = rd.from_items([{"src": s, "dst": d} for s, d in pairs])
        got = dict(pagerank_int(edges, num_buckets=4, iterations=3)
                   .to_pandas().itertuples(index=False, name=None))
        assert got == serial_pagerank_int(pairs, iterations=3)


class TestHits:
    def test_matches_serial_twin_bitwise(self, ray_session):
        import ray.data as rd

        from spiderray.stages.graph import (hits_int, pagerank_edge_pairs,
                                            serial_hits_int)

        pairs = pagerank_edge_pairs(range(120))
        edges = rd.from_items([{"src": s, "dst": d} for s, d in pairs]
                              ).repartition(3)
        df = hits_int(edges, num_buckets=2, iterations=2).to_pandas()
        assert str(df["hub"].dtype) == "int64" == str(df["auth"].dtype)
        got = {r.node: (int(r.hub), int(r.auth))
               for r in df.itertuples(index=False)}
        assert got == serial_hits_int(pairs, iterations=2)

    def test_bipartite_hub_authority_separation(self, ray_session):
        import ray.data as rd

        from spiderray.stages.graph import hits_int

        # pure hubs h0-h3 each link every authority a0-a2
        rows = [{"src": f"h{i}", "dst": f"a{j}"}
                for i in range(4) for j in range(3)]
        got = hits_int(rd.from_items(rows), num_buckets=2,
                       iterations=2).to_pandas().set_index("node")
        for i in range(4):
            assert got.loc[f"h{i}", "hub"] == 1_000_000_000
            assert got.loc[f"h{i}", "auth"] == 0
        for j in range(3):
            assert got.loc[f"a{j}", "auth"] == 1_000_000_000
            assert got.loc[f"a{j}", "hub"] == 0


class TestPagerankCheckpoint:
    def test_resume_equals_uninterrupted(self, ray_session, tmp_path):
        import os

        import ray.data as rd

        from spiderray.stages.graph import (pagerank_edge_pairs, pagerank_int,
                                            serial_pagerank_int)

        pairs = pagerank_edge_pairs(range(150))
        def edges():
            # repartition: from_items yields one-row blocks, and 255 blocks
            # × per-op fixed cost turns a 30 s test into minutes
            return rd.from_items([{"src": s, "dst": d} for s, d in pairs]
                                 ).repartition(3)

        ck = str(tmp_path / "pr")
        # run 2 rounds with checkpointing (simulates a job killed after 2)
        pagerank_int(edges(), iterations=2, num_buckets=2,
                     checkpoint_dir=ck).to_pandas()
        assert os.path.exists(os.path.join(ck, "iter_0002", "_DONE"))
        # resumed 4-round run continues from round 2 and matches serial 4
        got = dict(pagerank_int(edges(), iterations=4, num_buckets=2,
                                checkpoint_dir=ck).to_pandas()
                   .itertuples(index=False, name=None))
        assert got == serial_pagerank_int(pairs, iterations=4)
        # a partial (no _DONE) later round is replaced, not trusted
        part = os.path.join(ck, "iter_0005")
        os.makedirs(part)
        got5 = dict(pagerank_int(edges(), iterations=5, num_buckets=2,
                                 checkpoint_dir=ck).to_pandas()
                    .itertuples(index=False, name=None))
        assert got5 == serial_pagerank_int(pairs, iterations=5)
        assert os.path.exists(os.path.join(part, "_DONE"))
