"""k-anonymity audit (stages/stats.k_anonymity)."""

import pytest

from spiderray.stages.stats import k_anonymity


def _run(ray_session, rows, cols, k):
    import ray

    ds = ray.data.from_items(rows).repartition(3)
    return (
        k_anonymity(ds, cols, k)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )


def test_counts_and_flags(ray_session):
    rows = (
        [{"zip": "94110", "age_band": 3}] * 12
        + [{"zip": "94110", "age_band": 4}] * 2
        + [{"zip": "10001", "age_band": 3}] * 5
    )
    df = _run(ray_session, rows, ["zip", "age_band"], k=5)
    by = {(r["zip"], r["age_band"]): (r["group_n"], r["at_risk"])
          for _, r in df.iterrows()}
    assert by[("94110", 3)] == (12, False)
    assert by[("94110", 4)] == (2, True)
    assert by[("10001", 3)] == (5, False)  # count == k is safe


def test_single_column_and_nulls(ray_session):
    import pyarrow as pa
    import ray

    t = pa.table({"lang": pa.array(["en", "en", "en", None], pa.string())})
    ds = ray.data.from_arrow(t).repartition(2)
    df = k_anonymity(ds, ["lang"], 2).to_pandas()
    d = dict(zip(df["lang"], zip(df["group_n"], df["at_risk"])))
    assert d["en"] == (3, False)
    # the null combination is itself a (risky) group, under the sentinel
    assert d["__NULL__"] == (1, True)


def test_guards(ray_session):
    import ray

    ds = ray.data.from_items([{"a": 1}])
    with pytest.raises(ValueError, match="at least one column"):
        k_anonymity(ds, [], 5)
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity(ds, ["a"], 0)
