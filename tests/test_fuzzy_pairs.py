"""Edit-distance near-dup pairs (stages/dedup.levenshtein_pairs) and the
banded Ukkonen kernel (functions/similarity.banded_levenshtein)."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.functions.similarity import banded_levenshtein
from spiderray.stages.dedup import levenshtein_pairs


def _brute_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            cur = d[j]
            d[j] = min(prev + (a[i - 1] != b[j - 1]), d[j] + 1, d[j - 1] + 1)
            prev = cur
    return d[lb]


def test_kernel_matches_brute_force():
    rng = np.random.default_rng(11)
    alpha = "abcd"
    for _ in range(500):
        a = "".join(alpha[i] for i in rng.integers(0, 4, rng.integers(0, 10)))
        b = "".join(alpha[i] for i in rng.integers(0, 4, rng.integers(0, 10)))
        for max_d in (0, 1, 2, 4):
            t = _brute_lev(a, b)
            want = t if t <= max_d else max_d + 1
            assert banded_levenshtein(a, b, max_d) == want, (a, b, max_d)


def test_kernel_edges():
    assert banded_levenshtein("", "", 2) == 0
    assert banded_levenshtein("", "ab", 2) == 2
    assert banded_levenshtein("", "abc", 2) == 3  # sentinel
    assert banded_levenshtein("kitten", "sitting", 3) == 3
    assert banded_levenshtein("kitten", "sitting", 2) == 3  # > max_d → sentinel


def _pairs(ray_session, rows, max_d=2, **kw):
    import ray

    ds = ray.data.from_items(rows).repartition(4)
    df = levenshtein_pairs(ds, max_d=max_d, **kw).to_pandas()
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def test_planted_pairs_found_once(ray_session):
    rows = [
        {"doc_id": 1, "text": "hello world this is fine"},
        {"doc_id": 2, "text": "hello world this is finq"},   # dist 1
        {"doc_id": 3, "text": "hello world this is fi"},     # dist 2 vs 1
        {"doc_id": 4, "text": "a completely different one"},
        {"doc_id": 5, "text": "zzzzzzzz"},
    ]
    df = _pairs(ray_session, rows)
    got = set(zip(df["id_a"], df["id_b"], df["dist"]))
    assert (1, 2, 1) in got and (1, 3, 2) in got and (2, 3, 2) in got
    assert len(df) == 3  # single emission per pair, no extras
    assert df["dist"].dtype == np.int64


def test_band_boundary_pair(ray_session):
    # lengths straddle a band boundary (width max_d+1=3): 8//3=2 vs 9//3=3
    rows = [
        {"doc_id": 10, "text": "aaaaaaaa"},    # len 8
        {"doc_id": 11, "text": "aaaaaaaab"},   # len 9, dist 1
    ]
    df = _pairs(ray_session, rows)
    assert list(zip(df["id_a"], df["id_b"], df["dist"])) == [(10, 11, 1)]


def test_identical_texts_distance_zero(ray_session):
    rows = [{"doc_id": i, "text": "same text"} for i in (1, 2, 3)]
    df = _pairs(ray_session, rows)
    assert len(df) == 3 and (df["dist"] == 0).all()


def test_hot_group_cap_skips(ray_session):
    import ray

    rows = [{"doc_id": i, "text": "same text"} for i in range(10)]
    ds = ray.data.from_items(rows).repartition(4)
    df = levenshtein_pairs(ds, max_d=2, max_group=5).to_pandas()
    assert len(df) == 0


def test_partition_invariance(ray_session):
    import ray

    rows = [{"doc_id": i, "text": f"body {'x' * (i % 7)} tail{i % 3}"}
            for i in range(60)]
    a = levenshtein_pairs(ray.data.from_items(rows).repartition(2),
                          max_d=2).to_pandas()
    b = levenshtein_pairs(ray.data.from_items(rows).repartition(9),
                          max_d=2).to_pandas()
    key = lambda d: sorted(map(tuple, d[["id_a", "id_b", "dist"]].to_numpy()))
    assert key(a) == key(b)


def test_char_frequency_prune_boundary(ray_session):
    # L1 of hashed char counts is exactly 2*max_d for one substitution —
    # the prune's boundary case must survive to the DP
    rows = [
        {"doc_id": 1, "text": "abxy"},
        {"doc_id": 2, "text": "acxy"},  # one substitution: L1 = 2 = 2*max_d
    ]
    df = _pairs(ray_session, rows, max_d=1)
    assert list(zip(df["id_a"], df["id_b"], df["dist"])) == [(1, 2, 1)]


class TestPageStitch:
    def test_planted_split_recovered(self, ray_session):
        import ray.data as rd

        from spiderray.stages.dedup import suffix_prefix_pairs

        words = " ".join(f"w{i}" for i in range(40))
        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            # 0's tail == 1's head (planted); 2 unrelated
            "text": pa.array([
                " ".join(f"w{i}" for i in range(0, 24)),
                " ".join(f"w{i}" for i in range(16, 40)),
                words.replace("w", "x"),
            ], pa.string()),
        })
        out = suffix_prefix_pairs(rd.from_arrow(t), k=8).to_pandas()
        assert list(map(tuple, out[["id_a", "id_b"]].values.tolist())) == [(0, 1)]
        assert out.boundary.iloc[0] == " ".join(f"w{i}" for i in range(16, 24))

    def test_self_pair_excluded_and_short_docs_skipped(self, ray_session):
        import ray.data as rd

        from spiderray.stages.dedup import suffix_prefix_pairs

        t = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b c d e f g h",  # exactly 8: head == tail
                              "too short"], pa.string()),
        })
        out = suffix_prefix_pairs(rd.from_arrow(t), k=8).to_pandas()
        assert len(out) == 0

    def test_hot_boundary_capped(self, ray_session):
        import ray.data as rd

        from spiderray.stages.dedup import suffix_prefix_pairs

        nav = "home about contact privacy terms login search help"
        t = pa.table({
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array([f"{nav} body{i} {nav}" for i in range(30)],
                             pa.string()),
        })
        out = suffix_prefix_pairs(rd.from_arrow(t), k=8,
                                  max_key_group=10).to_pandas()
        assert len(out) == 0  # 60 rows share one boundary -> capped
