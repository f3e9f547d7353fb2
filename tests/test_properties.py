"""Hypothesis property tests over the pure kernels — the invariants that
must hold for ARBITRARY input, not just fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# text strategy: printable-ish unicode incl. CJK and whitespace runs
_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4FFF),
        st.sampled_from(" \t\n"),
    ),
    max_size=400,
)


class TestCdcProperties:
    @given(_text)
    @settings(max_examples=60, deadline=None)
    def test_lossless_and_bounded(self, text):
        from spiderray.functions.fingerprint import cdc_chunks

        chunks = cdc_chunks(text)
        assert "".join(chunks) == text
        if len(text) > 64:
            assert all(len(c) <= 1025 for c in chunks)
        assert all(chunks) or text == ""  # no empty chunks

    @given(_text, _text)
    @settings(max_examples=30, deadline=None)
    def test_shared_suffix_shares_chunks(self, prefix, body):
        # content-defined: a long shared suffix yields shared chunks
        from spiderray.functions.fingerprint import cdc_chunks

        if len(body) < 3000:
            body = body + "x y z w " * 400
        c1 = set(cdc_chunks(body))
        c2 = set(cdc_chunks(prefix + " " + body))
        assert len(c1 & c2) >= max(len(c1) - 3, 0)


class TestFingerprintProperties:
    @given(_text)
    @settings(max_examples=60, deadline=None)
    def test_md5_matches_duckdb(self, text):
        import duckdb

        from spiderray.functions.fingerprint import md5_fingerprint

        con = duckdb.connect()
        sql = con.sql("SELECT md5(lower(trim(?)))", params=[text]).fetchone()[0]
        assert md5_fingerprint(text) == sql

    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=50))
    @settings(max_examples=40, deadline=None)
    def test_bloom_never_false_negative(self, keys):
        from spiderray.functions.bloom import BloomFilter

        bf = BloomFilter(max(len(keys), 1))
        bf.add_many(keys)
        if keys:
            assert bf.contains_many(keys).all()


class TestTokenizeProperties:
    @given(_text)
    @settings(max_examples=60, deadline=None)
    def test_ws_tokens_match_duckdb(self, text):
        import duckdb

        from spiderray.functions.tokenize import ws_token_count

        con = duckdb.connect()
        from spiderray.pipelines.queries import _sql_ws_tokens

        sql = con.sql(
            f"SELECT {_sql_ws_tokens('?')}", params=[text, text]
        ).fetchone()[0]
        assert ws_token_count(text) == sql


class TestSplitProperties:
    @given(st.integers(min_value=0, max_value=10**12))
    @settings(max_examples=60, deadline=None)
    def test_bucket_stable_and_in_range(self, doc_id):
        import duckdb

        from spiderray.stages.stats import split_bucket

        b = split_bucket(str(doc_id))
        assert 0 <= b < 10_000
        con = duckdb.connect()
        sql = con.sql(
            "SELECT CAST(('0x' || substr(md5(?), 1, 8)) AS UBIGINT) % 10000",
            params=[str(doc_id)],
        ).fetchone()[0]
        assert b == sql


class TestSimhashBatchParity:
    @given(st.lists(_text, max_size=20))
    @settings(max_examples=40, deadline=None)
    def test_batch_equals_row_kernel(self, texts):
        from spiderray.functions.fingerprint import simhash64, simhash64_batch

        batch = simhash64_batch(texts)
        assert [int(b) for b in batch] == [simhash64(t) for t in texts]
