"""Local replica of the driver's correctness gate: run every queries() entry
at small scale and compare against oracle_sql() via DuckDB (row count, sorted
column names, order-insensitive values)."""

import importlib.util
import sys

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

import os
SF_DIR = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.01")


def _load_entry():
    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    return _load_entry()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_entry_smoke(entry_mod):
    res = entry_mod.entry()
    df = _to_df(res)
    assert len(df) >= 0
    assert "keep" in df.columns and "scrubbed_transcript" in df.columns


def test_oracle_keys_subset(entry_mod):
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 15


def test_all_queries_against_oracle(entry_mod, con):
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    failures = []
    for name, fn in sorted(q.items()):
        res = _to_df(fn(SF_DIR))
        if name not in o:
            assert len(res) >= 0  # rows-only check
            continue
        got = _canon(res)
        exp = _canon(con.sql(o[name]).df())
        if list(got.columns) != list(exp.columns):
            failures.append((name, "columns", list(got.columns), list(exp.columns)))
            continue
        if len(got) != len(exp):
            failures.append((name, "rowcount", len(got), len(exp)))
            continue
        # dtype-strict: the driver hashes raw values, so engine int64 vs
        # oracle float64 (e.g. DuckDB HUGEINT sums) is a FAIL even when the
        # numbers are equal — exactly the round-1 hash-mismatch class.
        dtype_mismatch = [
            (c, str(got[c].dtype), str(exp[c].dtype))
            for c in got.columns
            if got[c].dtype != exp[c].dtype
        ]
        if dtype_mismatch:
            failures.append((name, "dtype", dtype_mismatch, ""))
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=True, check_exact=True)
        except AssertionError as e:
            failures.append((name, "values", str(e).split("\n")[0], ""))
    assert not failures, failures


class TestNullTextRobustness:
    """The driver corpus never contains null/empty/whitespace/huge texts —
    real corpora do.  Key text queries must not crash on them (fuzz that
    caught the q_corpus_ppl int(inf) overflow)."""

    @pytest.fixture(scope="class")
    def fuzz_dir(self, tmp_path_factory):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        base = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
        base.loc[0, "text"] = None
        base.loc[1, "text"] = ""
        base.loc[2, "text"] = " \t\n "
        base.loc[3, "text"] = "word " * 50_000
        base.loc[4, "text"] = "中文 🎉 mixed"
        d = str(tmp_path_factory.mktemp("fuzzdocs"))
        pq.write_table(pa.Table.from_pandas(base, preserve_index=False),
                       os.path.join(d, "documents.parquet"))
        for t in ["events", "embeddings", "orders", "customer", "lineitem",
                  "nation", "region", "part", "supplier"]:
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet", os.path.join(d, f"{t}.parquet"))
        return d

    @pytest.mark.parametrize("name", [
        "q_doc_keepdrop", "q_token_counts", "q_exact_dedup", "q_corpus_ppl",
        "q_prepare_corpus", "q_chunk_dedup", "q_news_from_html", "q_speech_rate",
        "q_bm25_topk", "q_bpe_tokens",
        # round-5 window rotation: fuzz the new text-consuming
        # representatives too (null/empty/whitespace/huge/mixed texts)
        "q_simhash_pairs", "q_ngram_jaccard_pairs", "q_paragraph_dedup",
        "q_boilerplate_strip", "q_c4_filters", "q_readability",
        "q_nb_langid", "q_wordpiece_tokens",
    ])
    def test_query_survives_fuzz_corpus(self, ray_session, fuzz_dir, name,
                                        monkeypatch):
        import ray.data

        from spiderray.pipelines.queries import QUERIES

        # don't overwrite the committed sf0.01 oracle fixtures with
        # fuzz-corpus content (serial_oracles.ensure_fixture regenerates on
        # query entry; irrelevant here — no oracle compare happens)
        monkeypatch.setenv("SPIDERRAY_SKIP_FIXTURES", "1")
        res = QUERIES[name](fuzz_dir)
        n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
        assert n > 0


def test_dataops_facade_exports():
    """Every __all__ name in the training-data façade imports and is
    callable/class."""
    import spiderray.dataops as d

    for name in d.__all__:
        obj = getattr(d, name)
        assert callable(obj), name
