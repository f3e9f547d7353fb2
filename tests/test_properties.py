"""Hypothesis property tests over the pure kernels — the invariants that
must hold for ARBITRARY input, not just fixtures."""

import numpy as np
import pandas as pd
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


class TestMinhashBatchParity:
    @given(st.lists(_text, max_size=20))
    @settings(max_examples=40, deadline=None)
    def test_batch_equals_row_kernel(self, texts):
        import numpy as np

        from spiderray.functions.fingerprint import (
            minhash_signature,
            minhash_signature_batch,
        )

        batch = minhash_signature_batch(texts, chunk_rows=3, perm_chunk=24)
        assert batch.shape == (len(texts), 128)
        for i, t in enumerate(texts):
            np.testing.assert_array_equal(batch[i], minhash_signature(t))


class TestBucketArrayParity:
    @given(st.lists(st.integers(-2**62, 2**62), max_size=50),
           st.integers(1, 64))
    @settings(max_examples=30, deadline=None)
    def test_int_keys(self, vals, nb):
        import pyarrow as pa

        from spiderray.stages.joins import _bucket_array, _stable_bucket

        got = _bucket_array(pa.chunked_array([pa.array(vals, pa.int64())]), nb)
        assert list(got) == [_stable_bucket(v, nb) for v in vals]

    @given(st.lists(st.text(max_size=30), max_size=50), st.integers(1, 64))
    @settings(max_examples=30, deadline=None)
    def test_string_keys(self, vals, nb):
        import pyarrow as pa

        from spiderray.stages.joins import _bucket_array, _stable_bucket

        for typ in (pa.string(), pa.large_string()):
            got = _bucket_array(pa.chunked_array([pa.array(vals, typ)]), nb)
            assert list(got) == [_stable_bucket(v, nb) for v in vals]

    def test_nullable_and_uint64_keys_match_scalar(self):
        # round-4 review finding: a null used to force the int fast path
        # through float64 (keys >= 2^53 mis-bucketed); uint64 >= 2^63 would
        # wrap under an int64 cast.  Both now match the scalar function.
        import pyarrow as pa

        from spiderray.stages.joins import _bucket_array, _stable_bucket

        vals = [2**53 + 1, None, 5, 2**62 + 7]
        got = _bucket_array(pa.chunked_array([pa.array(vals, pa.int64())]), 97)
        assert list(got) == [_stable_bucket(v, 97) for v in vals]

        uvals = [2**63 + 10, 3, 2**64 - 1]
        got = _bucket_array(pa.chunked_array([pa.array(uvals, pa.uint64())]), 97)
        assert list(got) == [_stable_bucket(v, 97) for v in uvals]

    def test_sliced_offset_chunk(self):
        import pyarrow as pa

        from spiderray.stages.joins import _bucket_array, _stable_bucket

        vals = [f"key-{i}" for i in range(100)]
        arr = pa.array(vals).slice(13, 40)
        got = _bucket_array(pa.chunked_array([arr]), 16)
        assert list(got) == [_stable_bucket(v, 16) for v in vals[13:53]]


class TestPerplexityBatchParity:
    @given(st.lists(_text, max_size=16))
    @settings(max_examples=40, deadline=None)
    def test_batch_equals_scalar_bitwise(self, texts):
        import numpy as np

        from spiderray.stages.perplexity_stage import CharLM

        lm = CharLM("the quick brown fox 你好世界 jumps over the lazy dog")
        batch = lm.perplexity_batch(texts)
        for t, b in zip(texts, batch):
            s = lm.perplexity(t)
            assert (s == b) or (np.isinf(s) and np.isinf(b)), (t, s, b)


class TestJoinModesVsDuckdb:
    """Randomized bucketed_join left/outer vs DuckDB on the same inputs —
    the independent-implementation differential the join family's inner
    mode already has via q_copartitioned_join."""

    @given(st.integers(0, 2**31 - 1), st.sampled_from(["left", "outer"]))
    @settings(max_examples=6, deadline=None)
    def test_matches_duckdb(self, seed, how):
        import duckdb
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.joins import bucketed_join

        rng = np.random.default_rng(seed)
        lk = rng.integers(0, 40, 60)
        rk = rng.integers(20, 60, 50)  # partial overlap + unmatched both sides
        l = pa.table({"k": lk, "lv": rng.integers(0, 1000, 60)})
        r = pa.table({"k2": rk, "rv": rng.integers(0, 1000, 50)})
        got = bucketed_join(rd.from_arrow(l), rd.from_arrow(r),
                            on="k", right_on="k2", how=how).to_pandas()
        con = duckdb.connect()
        con.register("l", l.to_pandas())
        con.register("r", r.to_pandas())
        sql_how = "LEFT" if how == "left" else "FULL OUTER"
        want = con.execute(
            f"SELECT * FROM l {sql_how} JOIN r ON l.k = r.k2").fetchdf()

        def canon(df):
            df = df[sorted(df.columns)].copy()
            for c in df.columns:
                df[c] = df[c].astype("float64")  # null-safe comparison
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        pd.testing.assert_frame_equal(canon(got), canon(want))


class TestCorpusDiffVsDuckdb:
    @given(st.integers(0, 2**31 - 1))
    @settings(max_examples=5, deadline=None)
    def test_matches_duckdb(self, seed):
        import duckdb
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.stats import corpus_diff

        rng = np.random.default_rng(seed)
        ids_a = rng.choice(200, 80, replace=False)
        ids_b = rng.choice(200, 80, replace=False)
        texts = [f"text {i % 37}" for i in range(200)]
        a = pa.table({"doc_id": ids_a,
                      "text": [texts[i] for i in ids_a]})
        # ~25% of shared ids get changed text in b
        b = pa.table({"doc_id": ids_b,
                      "text": [texts[i] + (" v2" if i % 4 == 0 else "")
                               for i in ids_b]})
        got = corpus_diff(rd.from_arrow(a), rd.from_arrow(b)) \
            .set_index("metric")["value"].to_dict()
        con = duckdb.connect()
        con.register("a", a.to_pandas())
        con.register("b", b.to_pandas())
        want = con.execute("""
            WITH v1 AS (SELECT doc_id, md5(lower(trim(coalesce(text,'')))) fp FROM a),
                 v2 AS (SELECT doc_id, md5(lower(trim(coalesce(text,'')))) fp FROM b),
                 j AS (SELECT v1.fp fa, v2.fp fb
                       FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
            SELECT
              count(*) FILTER (fa IS NULL) AS n_added,
              count(*) FILTER (fb IS NULL) AS n_removed,
              count(*) FILTER (fa IS NOT NULL AND fb IS NOT NULL AND fa <> fb) AS n_changed,
              count(*) FILTER (fa IS NOT NULL AND fb IS NOT NULL AND fa = fb) AS n_unchanged
            FROM j""").fetchdf().iloc[0].to_dict()
        assert {k: int(v) for k, v in got.items()} == \
            {k: int(v) for k, v in want.items()}


class TestPslDifferential:
    """The fast public_suffix matcher vs a NAIVE independent evaluator of
    the published PSL algorithm over the same rule tables: enumerate every
    matching rule (exact / '*.parent' wildcard / '!' exception), exception
    wins outright, else most labels."""

    @staticmethod
    def _naive(host):
        from spiderray.functions.domains import _PSL_EXACT, _PSL_EXC, _PSL_WILD

        labels = host.lower().split(".")
        n = len(labels)
        matches = []  # (rule_labels, icann, is_exception)
        for i in range(n):
            cand = ".".join(labels[i:])
            if cand in _PSL_EXC:
                matches.append((n - i, _PSL_EXC[cand], True))
            if cand in _PSL_EXACT:
                matches.append((n - i, _PSL_EXACT[cand], False))
            if i + 1 < n and ".".join(labels[i + 1 :]) in _PSL_WILD:
                matches.append((n - i, _PSL_WILD[".".join(labels[i + 1 :])], False))
        excs = [m for m in matches if m[2]]
        if excs:
            ln, icann, _ = max(excs)
            return ".".join(labels[n - ln + 1 :]), icann
        if not matches:
            return labels[-1], False
        ln, icann, _ = max(matches, key=lambda m: m[0])
        return ".".join(labels[n - ln :]), icann

    @given(st.lists(st.sampled_from(
        ["www", "a", "b2", "co", "com", "gov", "uk", "jp", "ck", "np",
         "kawasaki", "city", "aichi", "pref", "github", "io", "blogspot",
         "amazonaws", "s3", "example", "x", "kh", "er", "bd", "mm"]),
        min_size=1, max_size=6))
    @settings(max_examples=300, deadline=None)
    def test_matches_naive_evaluator(self, labels):
        from spiderray.functions.domains import public_suffix

        host = ".".join(labels)
        assert public_suffix(host) == self._naive(host), host

    def test_suffix_is_suffix_and_shorter_than_host(self):
        from spiderray.functions.domains import public_suffix

        for host in ("a.b.c.com", "x.co.uk", "a.www.ck", "q.z.np"):
            suf, _ = public_suffix(host)
            assert host.endswith(suf)
            assert len(suf.split(".")) <= len(host.split("."))


class TestJoinProperties:
    """Randomized engine-vs-DuckDB equivalence for the round-3 join
    operators (the property-suite pattern: same inputs, independent
    implementations)."""

    @given(st.integers(0, 2**31 - 1))
    @settings(max_examples=8, deadline=None)
    def test_asof_join_matches_duckdb(self, seed):
        import duckdb
        import ray.data as rd

        from spiderray.stages.joins import asof_join

        rng = np.random.default_rng(seed)
        nl, nr = rng.integers(1, 40, 2)
        left = pd.DataFrame({
            "t": rng.integers(0, 50, nl).astype("int64"),
            "k": rng.integers(0, 4, nl).astype("int64"),
            "lid": np.arange(nl, dtype="int64"),
        })
        right = pd.DataFrame({
            "t": rng.integers(0, 50, nr).astype("int64"),
            "k": rng.integers(0, 4, nr).astype("int64"),
            "rid": np.arange(100, 100 + nr, dtype="int64"),
        })
        got = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                         on="t", by="k", right_tiebreak="rid")
               .to_pandas())
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        exp = con.execute("""
            SELECT lid, rid FROM (
              SELECT l.lid, r.rid,
                     row_number() OVER (PARTITION BY l.lid
                                        ORDER BY r.t DESC, r.rid DESC) AS rk
              FROM l JOIN r ON l.k = r.k AND r.t <= l.t
            ) WHERE rk = 1
        """).fetchdf()
        # Ray drops columns on 0-row to_pandas — guard like the range test
        got_pairs = (sorted(zip(got.lid.astype(int), got.rid.astype(int)))
                     if len(got) else [])
        exp_pairs = sorted(zip(exp.lid.astype(int), exp.rid.astype(int)))
        assert got_pairs == exp_pairs, seed

    @given(st.integers(0, 2**31 - 1))
    @settings(max_examples=8, deadline=None)
    def test_range_join_matches_duckdb(self, seed):
        import duckdb
        import ray.data as rd

        from spiderray.stages.joins import range_join

        rng = np.random.default_rng(seed)
        npts, niv = rng.integers(1, 50, 2)
        pts = pd.DataFrame({
            "p": rng.integers(0, 200, npts).astype("int64"),
            "pid": np.arange(npts, dtype="int64"),
        })
        starts = rng.integers(0, 200, niv).astype("int64")
        ivs = pd.DataFrame({
            "s": starts,
            "e": starts + rng.integers(-10, 60, niv).astype("int64"),  # some inverted
            "iid": np.arange(niv, dtype="int64"),
        })
        got = range_join(rd.from_pandas(pts), rd.from_pandas(ivs),
                         "p", "s", "e", bucket_width=17).to_pandas()
        con = duckdb.connect()
        con.register("p", pts)
        con.register("iv", ivs)
        exp = con.execute(
            "SELECT pid, iid FROM p JOIN iv ON p.p BETWEEN iv.s AND iv.e"
        ).fetchdf()
        got_pairs = sorted(zip(got.pid.astype(int), got.iid.astype(int))) if len(got) else []
        exp_pairs = sorted(zip(exp.pid.astype(int), exp.iid.astype(int)))
        assert got_pairs == exp_pairs, seed


class TestTdigestProperties:
    @given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                              allow_nan=False), min_size=1, max_size=500),
           st.integers(min_value=20, max_value=400))
    @settings(max_examples=60, deadline=None)
    def test_weight_conservation_and_mean(self, xs, delta):
        import numpy as np

        from spiderray.functions.tdigest import td_build

        x = np.asarray(xs, dtype=np.float64)
        m, w = td_build(x, None, delta)
        assert int(w.sum()) == len(x)
        # centroid-weighted mean equals the data mean (exact linearity
        # up to float association)
        assert abs(float((m * w).sum()) - float(x.sum())) <= \
            1e-6 * max(abs(x).sum(), 1.0)
        # centroids sorted, all inside [min, max]
        assert (np.diff(m) >= 0).all()
        assert m.min() >= x.min() - 1e-9 and m.max() <= x.max() + 1e-9

    @given(st.lists(st.floats(min_value=0, max_value=1e3,
                              allow_nan=False), min_size=2, max_size=300),
           st.integers(min_value=2, max_value=7))
    @settings(max_examples=40, deadline=None)
    def test_merge_conserves_weight(self, xs, k):
        import numpy as np

        from spiderray.functions.tdigest import td_build, td_merge

        x = np.asarray(xs, dtype=np.float64)
        parts = np.array_split(x, k)
        ms, ws = [], []
        for p in parts:
            if len(p) == 0:
                continue
            a, b = td_build(p)
            ms.append(a)
            ws.append(b)
        m, w = td_merge(np.concatenate(ms), np.concatenate(ws))
        assert int(w.sum()) == len(x)

    @given(st.lists(st.floats(min_value=-100, max_value=100,
                              allow_nan=False), min_size=1, max_size=200),
           st.floats(min_value=0, max_value=1))
    @settings(max_examples=60, deadline=None)
    def test_quantile_within_data_range(self, xs, q):
        import numpy as np

        from spiderray.functions.tdigest import td_build, td_quantile

        x = np.asarray(xs, dtype=np.float64)
        m, w = td_build(x)
        est = td_quantile(m, w, q, float(x.min()), float(x.max()))
        assert x.min() - 1e-9 <= est <= x.max() + 1e-9


class TestLeespanProperties:
    @given(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                    min_size=0, max_size=60),
           st.integers(min_value=2, max_value=6))
    @settings(max_examples=60, deadline=None)
    def test_window_count_and_self_consistency(self, tokens, w):
        from spiderray.functions.leespan import doc_window_hashes

        text = " ".join(tokens)
        h, s = doc_window_hashes(text, w)
        expect = max(len(tokens) - w + 1, 0)
        assert len(h) == expect and len(s) == expect
        # identical windows at different positions hash identically
        windows = {}
        for hh, ss in zip(h.tolist(), s.tolist()):
            key = tuple(tokens[ss : ss + w])
            if key in windows:
                assert windows[key] == hh
            windows[key] = hh

    @given(st.lists(st.sampled_from(["x", "y", "z"]), min_size=0,
                    max_size=40),
           st.lists(st.integers(min_value=0, max_value=39), max_size=5),
           st.integers(min_value=1, max_value=5))
    @settings(max_examples=60, deadline=None)
    def test_remove_spans_monotone(self, tokens, starts, w):
        from spiderray.functions.leespan import remove_token_spans

        text = " ".join(tokens)
        out = remove_token_spans(text, starts, w)
        # output tokens are a subsequence of the input
        it = iter(tokens)
        assert all(any(t == u for u in it) for t in out.split())
        if not starts:
            assert out == text


class TestCodecFuzz:
    """Random/mutated bytes into the new parsers: typed errors only —
    a crash class other than the codec's own error type would kill a
    Ray task instead of marking the row."""

    @given(st.binary(max_size=400))
    @settings(max_examples=150, deadline=None)
    def test_mp3_parse_never_crashes_untyped(self, buf):
        from spiderray.functions.mp3parse import Mp3Error, parse_mp3

        try:
            info = parse_mp3(buf)
            assert info["n_frames"] >= 1
        except Mp3Error:
            pass

    @given(st.binary(max_size=400))
    @settings(max_examples=150, deadline=None)
    def test_gif_decode_never_crashes_untyped(self, buf):
        from spiderray.functions.gifdec import GifError, decode_gif

        try:
            frames = decode_gif(b"GIF89a" + buf)
            assert len(frames) >= 1
        except GifError:
            pass

    @given(st.binary(max_size=300), st.integers(min_value=1, max_value=4))
    @settings(max_examples=150, deadline=None)
    def test_ms_adpcm_decode_never_crashes_untyped(self, buf, n_ch):
        from spiderray.functions.adpcm import AdpcmError, decode_wav_ms

        try:
            out = decode_wav_ms(buf, max(7 * n_ch + 4, 16), n_ch)
            assert len(out) >= 0
        except AdpcmError:
            pass

    @given(st.binary(max_size=300), st.integers(min_value=1, max_value=3))
    @settings(max_examples=150, deadline=None)
    def test_ima_wav_decode_never_crashes_untyped(self, buf, n_ch):
        from spiderray.functions.adpcm import AdpcmError, decode_wav_ima

        try:
            decode_wav_ima(buf, max(4 * n_ch + 4 * n_ch, 16), n_ch)
        except AdpcmError:
            pass

    @given(st.binary(max_size=500))
    @settings(max_examples=100, deadline=None)
    def test_wav_parse_never_crashes_untyped(self, body):
        from spiderray.stages.multimodal import DecodeUnsupported, _parse_wav

        buf = b"RIFF" + (len(body) + 4).to_bytes(4, "little") + b"WAVE" + body
        try:
            _parse_wav(buf)
        except DecodeUnsupported:
            pass


class TestMojibakeProperties:
    @given(st.text(alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.characters(min_codepoint=0xA1, max_codepoint=0x2FF),
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4EFF),
        st.characters(min_codepoint=0x400, max_codepoint=0x45F),
        st.sampled_from(" \n—’“”…"),
    ), max_size=200))
    @settings(max_examples=120, deadline=None)
    def test_mangled_roundtrip_or_clean_noop(self, t):
        from spiderray.functions.charset import fix_mojibake, mojibake_badness

        # clean text with zero badness is NEVER touched
        if mojibake_badness(t) == 0:
            assert fix_mojibake(t) == (t, 0)
        # single latin-1 mangling of text whose mangled form shows
        # evidence always unwinds exactly
        m = t.encode("utf-8").decode("latin-1")
        if m != t and mojibake_badness(m) > 0 and mojibake_badness(t) == 0:
            fixed, n = fix_mojibake(m)
            assert fixed == t and n == 1

    @given(st.text(max_size=100))
    @settings(max_examples=60, deadline=None)
    def test_badness_total_and_idempotent(self, t):
        from spiderray.functions.charset import fix_mojibake

        fixed, n = fix_mojibake(t)
        again, n2 = fix_mojibake(fixed)
        # repair is idempotent: a second pass finds nothing to improve
        assert again == fixed
        assert 0 <= n <= 3 and n2 <= n


class TestCompressorProperties:
    @given(st.integers(min_value=1, max_value=4000),
           st.integers(min_value=0, max_value=2 ** 31 - 1))
    @settings(max_examples=40, deadline=None)
    def test_bounded_and_deterministic(self, n, seed):
        from spiderray.functions.audiofp import compress_dynamics

        rng = np.random.default_rng(seed)
        x = (rng.standard_normal(n) * rng.uniform(0.001, 2.0)).astype(
            np.float32)
        y1, g1 = compress_dynamics(x, 16000)
        y2, g2 = compress_dynamics(x, 16000)
        assert np.array_equal(y1, y2) and g1 == g2
        assert np.all(np.abs(y1) <= 1.0)
        assert g1 >= 0.0
        assert len(y1) == n

    @given(st.integers(min_value=0, max_value=2 ** 31 - 1))
    @settings(max_examples=30, deadline=None)
    def test_never_amplifies_without_makeup(self, seed):
        from spiderray.functions.audiofp import compress_dynamics

        rng = np.random.default_rng(seed)
        x = (rng.standard_normal(2000) * 0.8).astype(np.float32)
        y, _ = compress_dynamics(x, 16000, makeup_db=0.0)
        # per-sample gain is 10^(-sm/20) <= 1: output magnitude never
        # exceeds input magnitude
        assert np.all(np.abs(y) <= np.abs(x.astype(np.float64)) + 1e-12)
