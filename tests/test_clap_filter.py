"""Cross-modal pair-consistency gate (stages/ann.paired_cosine_filter)."""

import numpy as np
import pyarrow as pa

from spiderray.stages.ann import paired_cosine_filter


def _pairs_ds(rows, parts=2):
    import ray

    lt = pa.list_(pa.float64())
    t = pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "a": pa.array([r[1] for r in rows], lt),
        "b": pa.array([r[2] for r in rows], lt),
    })
    return ray.data.from_arrow(t).repartition(parts)


def test_matched_and_mismatched(ray_session):
    v = [0.5, -0.25, 0.125, 1.0]
    ortho = [1.0, 2.0, 0.0, 0.0]  # dot(v, ortho) = 0.5 - 0.5 = 0 exactly
    rows = [(0, v, v), (1, v, ortho), (2, v, [-x for x in v])]
    df = (paired_cosine_filter(_pairs_ds(rows), "a", "b", ["id"])
          .to_pandas().set_index("id").sort_index())
    assert df.loc[0, "sim_milli"] == 1000 and not df.loc[0, "mismatch"]
    assert df.loc[1, "sim_milli"] == 0 and df.loc[1, "mismatch"]
    assert df.loc[2, "sim_milli"] == -1000 and df.loc[2, "mismatch"]


def test_zero_vector_guard(ray_session):
    # all-zero quantized vector: norm clamps to 1, sim 0 — no NaN/crash
    rows = [(0, [0.0, 0.0], [1.0, 0.0])]
    df = paired_cosine_filter(_pairs_ds(rows, 1), "a", "b", ["id"]).to_pandas()
    assert int(df["sim_milli"].iloc[0]) == 0 and bool(df["mismatch"].iloc[0])


def test_matches_serial_fixed_op_order(ray_session):
    rng = np.random.RandomState(11)
    V = rng.randn(40, 16)
    W = V + 0.3 * rng.randn(40, 16)
    rows = [(i, V[i].tolist(), W[i].tolist()) for i in range(40)]
    df = (paired_cosine_filter(_pairs_ds(rows, 4), "a", "b", ["id"],
                               min_sim=0.8)
          .to_pandas().set_index("id").sort_index())
    A = np.floor(V * 1000 + 0.5)
    B = np.floor(W * 1000 + 0.5)
    sim = (A * B).sum(1) / np.sqrt(
        np.maximum((A * A).sum(1), 1.0) * np.maximum((B * B).sum(1), 1.0))
    exp = np.floor(sim * 1000 + 0.5).astype(np.int64)
    assert df["sim_milli"].to_numpy().tolist() == exp.tolist()
    assert df["mismatch"].to_numpy().tolist() == (sim < 0.8).tolist()
