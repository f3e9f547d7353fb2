"""Opt-in scale stress tests (SPIDERRAY_STRESS=1): exercise the documented
scale paths at 20-100x the driver's correctness scale.  Skipped by default
so the suite stays fast; run results are recorded in BASELINE.md."""

import os

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPIDERRAY_STRESS") != "1",
    reason="set SPIDERRAY_STRESS=1 to run scale stress tests",
)


class TestStressDedup:
    def test_minhash_join_verify_100k(self, ray_session):
        """The JOIN verify path (the 10^12 shape) at 100k docs with 10%
        planted near-dups: every planted pair must be found."""
        import ray.data as rd

        from spiderray.stages import dedup

        rng = np.random.default_rng(17)
        words = [f"w{i}" for i in range(5000)]
        n = 100_000
        texts = [" ".join(rng.choice(words, size=25)) for i in range(n)]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        planted = [
            {"doc_id": n + j, "text": texts[j * 10] + " tail"} for j in range(n // 10 // 10)
        ]
        ds = rd.from_pandas(pd.DataFrame(rows + planted))
        pairs = dedup.minhash_lsh_pairs(ds, threshold=0.6, verify="join").to_pandas()
        found = set(map(tuple, pairs[["id_a", "id_b"]].drop_duplicates().to_numpy()))
        missing = [
            (j * 10, n + j) for j in range(len(planted)) if (j * 10, n + j) not in found
        ]
        assert len(missing) <= len(planted) // 50, f"missing {len(missing)}: {missing[:5]}"

    def test_bloom_incremental_1m_prior(self, ray_session):
        """Bloom prefilter with a 1M-fingerprint prior: survivors exact."""
        import ray.data as rd

        from spiderray.stages import dedup

        prior = pd.DataFrame(
            {"doc_id": range(1_000_000),
             "text": [f"prior doc {i}" for i in range(1_000_000)]}
        )
        new = pd.DataFrame(
            {"doc_id": range(2_000_000, 2_005_000),
             "text": [f"prior doc {i}" for i in range(2500)]
                   + [f"new doc {i}" for i in range(2500)]}
        )
        prior_fps = dedup.exact_dedup(
            rd.from_pandas(prior)
        ).select_columns(["fingerprint"]).materialize()
        out = dedup.incremental_exact_dedup(
            rd.from_pandas(new), prior_fps, method="bloom"
        ).to_pandas()
        assert sorted(out.doc_id) == list(range(2_002_500, 2_005_000))

    def test_embedding_hot_group_50k(self, ray_session):
        """One 50k-vector hot label must be SKIPPED by the max_group cap
        while small labels still verify — no O(n^2) allocation."""
        import ray.data as rd

        from spiderray.stages import dedup

        rng = np.random.default_rng(23)
        hot = rng.standard_normal((50_000, 8)).astype(np.float32)
        cold = rng.standard_normal((20, 8)).astype(np.float32)
        cold[7] = cold[3] * 1.05
        df = pd.DataFrame(
            {
                "vec_id": range(50_020),
                "embedding": list(np.vstack([hot, cold])),
                "label": [0] * 50_000 + [1] * 20,
            }
        )
        pairs = dedup.embedding_near_dup_pairs(
            rd.from_pandas(df), threshold=0.99, max_group=10_000
        ).to_pandas().drop_duplicates(["id_a", "id_b"])
        found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
        assert (50_003, 50_007) in found
        assert all(a >= 50_000 for a, _ in found)
