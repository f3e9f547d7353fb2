"""Query-by-example audio retrieval (stages/audiodedup.audio_search):
timed-landmark bit-stability vs the untimed constellation, offset-voting
retrieval of planted excerpts, vote thresholds, and poison tolerance."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.functions.audiofp import (
    spectral_landmarks,
    spectral_landmarks_timed,
)
from spiderray.sources.clips import _SR_CHOICES, note_clips_batch, synth_note_audio


def _pcm(key, sr, n, **kw):
    return np.frombuffer(synth_note_audio(key, sr, n, **kw),
                         dtype="<i2").astype(np.float32) / 32767.0


def _query_table(ids, gain=0.5):
    """Hop-aligned suffix excerpts of the note corpus clips (first ~third
    dropped, rounded down to the 256-sample hop), mirroring
    queries._audio_query_clips."""
    qids, bufs, srs, drops = [], [], [], []
    for i in ids:
        sr = _SR_CHOICES[i % len(_SR_CHOICES)]
        n = sr // 4 + (i % 5) * sr // 100
        pcm = np.frombuffer(synth_note_audio(i, sr, n), dtype="<i2")
        drop = ((n // 3) // 256) * 256
        ex = np.clip(pcm[drop:].astype(np.float64) * gain,
                     -32768, 32767).astype("<i2")
        qids.append(i)
        bufs.append(ex.tobytes())
        srs.append(sr)
        drops.append(drop)
    return pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "bytes": pa.array(bufs, pa.binary()),
        "sr_hz": pa.array(srs, pa.int32()),
        "codec": pa.array(["pcm_s16le"] * len(qids), pa.string()),
    }), drops


class TestTimedLandmarks:
    def test_unique_hashes_match_untimed(self):
        # the timed variant's hash arithmetic is shared (_peak_track);
        # its distinct hash set must equal spectral_landmarks exactly
        for key in (3, 17, 101):
            pcm = _pcm(key, 16000, 12000)
            plain = spectral_landmarks(pcm, 16000)
            h, t = spectral_landmarks_timed(pcm, 16000)
            assert np.array_equal(np.unique(h), plain)
            assert len(t) == len(h)
            assert (t >= 0).all()

    def test_hop_aligned_excerpt_offsets_are_constant(self):
        # a hop-aligned excerpt shares hashes with its source at ONE
        # constant anchor offset = dropped_samples / hop
        sr, n = 16000, 16000
        pcm = _pcm(9, sr, n)
        drop = ((n // 3) // 256) * 256
        h_full, t_full = spectral_landmarks_timed(pcm, sr)
        h_ex, t_ex = spectral_landmarks_timed(pcm[drop:], sr)
        full = {(int(a), int(b)) for a, b in zip(h_full, t_full)}
        offs = [tf - te for he, te in zip(h_ex.tolist(), t_ex.tolist())
                for hf, tf in full if hf == he]
        assert offs, "excerpt shares no landmarks with its source"
        vals, counts = np.unique(offs, return_counts=True)
        assert vals[counts.argmax()] == drop // 256

    def test_empty_and_short(self):
        h, t = spectral_landmarks_timed(np.zeros(100, np.float32), 16000)
        assert len(h) == 0 and len(t) == 0
        h, t = spectral_landmarks_timed(np.zeros(16000, np.float32), 16000)
        assert len(h) == 0


class TestAudioSearch:
    def test_excerpt_retrieval_top1_and_offset(self, ray_session):
        import ray.data as rd

        from spiderray.stages.audiodedup import audio_search

        corpus = note_clips_batch(np.arange(60), twin_mod=1000)
        q, drops = _query_table([5, 12, 33])
        out = (audio_search(rd.from_arrow(corpus), q, top_k=3, min_votes=3)
               .to_pandas())
        for (qid, drop) in zip([5, 12, 33], drops):
            mine = out[out.query_id == qid].sort_values(
                ["votes", "clip_id"], ascending=[False, True])
            assert len(mine) >= 1, f"query {qid} found nothing"
            assert mine.iloc[0].clip_id == qid
            assert mine.iloc[0].offset_frames == drop // 256
        # top_k cap respected
        assert (out.groupby("query_id").size() <= 3).all()

    def test_matches_serial_dict_voting(self, ray_session):
        import ray.data as rd

        from spiderray.stages.audiodedup import audio_search
        from spiderray.stages.multimodal import _decode_one

        corpus = note_clips_batch(np.arange(40), twin_mod=1000)
        q, _ = _query_table([7, 21])
        got = (audio_search(rd.from_arrow(corpus), q, top_k=3, min_votes=3)
               .to_pandas()
               .sort_values(["query_id", "votes", "clip_id"],
                            ascending=[True, False, True])
               .reset_index(drop=True))

        # independent dict-based voting (no searchsorted, no Ray)
        qindex = {}
        for qid, buf, sr in zip(q.column("query_id").to_pylist(),
                                q.column("bytes").to_pylist(),
                                q.column("sr_hz").to_pylist()):
            h, t = spectral_landmarks_timed(
                _decode_one(buf, "pcm_s16le"), int(sr))
            for hh, tt in zip(h.tolist(), t.tolist()):
                qindex.setdefault(int(hh), []).append((int(qid), int(tt)))
        rows = []
        for cid, buf, sr in zip(corpus.column("clip_id").to_pylist(),
                                corpus.column("bytes").to_pylist(),
                                corpus.column("sr_hz").to_pylist()):
            h, t = spectral_landmarks_timed(
                _decode_one(buf, "pcm_s16le"), int(sr))
            votes = {}
            for hh, tc in zip(h.tolist(), t.tolist()):
                for qid, tq in qindex.get(int(hh), ()):
                    k = (qid, int(tc) - tq)
                    votes[k] = votes.get(k, 0) + 1
            best = {}
            for (qid, off), v in votes.items():
                cur = best.get(qid)
                if cur is None or (-v, off) < (-cur[0], cur[1]):
                    best[qid] = (v, off)
            for qid, (v, off) in best.items():
                if v >= 3:
                    rows.append((qid, cid, v, off))
        rows.sort(key=lambda r: (r[0], -r[2], r[1]))
        exp = [r for r in rows
               if sum(1 for s in rows[:rows.index(r)] if s[0] == r[0]) < 3]
        assert got[["query_id", "clip_id", "votes", "offset_frames"]] \
            .values.tolist() == [list(r) for r in exp]

    def test_min_votes_gate_and_empty_query(self, ray_session):
        import ray.data as rd

        from spiderray.stages.audiodedup import audio_search

        corpus = note_clips_batch(np.arange(20), twin_mod=1000)
        q, _ = _query_table([4])
        out = audio_search(rd.from_arrow(corpus), q, top_k=3,
                           min_votes=10_000).to_pandas()
        assert len(out) == 0
        # a silent query yields no landmarks and therefore no matches
        silent = pa.table({
            "query_id": pa.array([1], pa.int64()),
            "bytes": pa.array([b"\x00" * 8000], pa.binary()),
            "sr_hz": pa.array([16000], pa.int32()),
            "codec": pa.array(["pcm_s16le"], pa.string()),
        })
        out = audio_search(rd.from_arrow(corpus), silent,
                           top_k=3, min_votes=1).to_pandas()
        assert len(out) == 0

    def test_undecodable_corpus_rows_skipped(self, ray_session):
        import ray.data as rd

        from spiderray.stages.audiodedup import audio_search

        corpus = note_clips_batch(np.arange(10), twin_mod=1000)
        poison = pa.table({
            "clip_id": pa.array([999], pa.int64()),
            "bytes": pa.array([b"not audio"], pa.binary()),
            "sr_hz": pa.array([16000], pa.int32()),
            "codec": pa.array(["flac"], pa.string()),
        })
        both = pa.concat_tables([corpus, poison])
        q, _ = _query_table([3])
        out = audio_search(rd.from_arrow(both), q, top_k=3,
                           min_votes=3).to_pandas()
        assert 999 not in set(out.clip_id)
        assert 3 in set(out.clip_id)

    def test_query_hash_cap_raises(self, ray_session):
        import ray.data as rd

        from spiderray.stages.audiodedup import audio_search

        corpus = note_clips_batch(np.arange(4), twin_mod=1000)
        q, _ = _query_table([2, 9])
        with pytest.raises(ValueError, match="shard the query set"):
            audio_search(rd.from_arrow(corpus), q, max_query_hashes=1)


class TestAudioStitch:
    def test_planted_split_pair_and_offset(self, ray_session):
        import ray.data as rd

        from spiderray.stages.audiodedup import audio_stitch_pairs

        sr, n = 16000, 16384
        rows = []
        for i in (3, 8, 21):
            pcm = np.frombuffer(synth_note_audio(i, sr, n), dtype="<i2")
            rows.append((i * 10, pcm[:12288].tobytes()))
            rows.append((i * 10 + 1, pcm[4096:].tobytes()))
        clips = pa.table({
            "clip_id": pa.array([r[0] for r in rows], pa.int64()),
            "bytes": pa.array([r[1] for r in rows], pa.binary()),
            "codec": pa.array(["pcm_s16le"] * len(rows), pa.string()),
            "sr_hz": pa.array([sr] * len(rows), pa.int32()),
        })
        out = (audio_stitch_pairs(rd.from_arrow(clips), window_frames=32,
                                  min_votes=6)
               .to_pandas().sort_values("id_a").reset_index(drop=True))
        got = {(int(a), int(b)): int(o) for a, b, o in
               zip(out.id_a, out.id_b, out.offset_frames)}
        for i in (3, 8, 21):
            assert got[(i * 10, i * 10 + 1)] == 16  # cut 4096 / hop 256
        assert (out.votes >= 6).all()

    def test_whole_clips_do_not_pair(self, ray_session):
        import ray.data as rd

        from spiderray.stages.audiodedup import audio_stitch_pairs

        sr, n = 16000, 16384
        rows = [(i, synth_note_audio(i, sr, n)) for i in (2, 7, 11)]
        clips = pa.table({
            "clip_id": pa.array([r[0] for r in rows], pa.int64()),
            "bytes": pa.array([r[1] for r in rows], pa.binary()),
            "codec": pa.array(["pcm_s16le"] * 3, pa.string()),
            "sr_hz": pa.array([sr] * 3, pa.int32()),
        })
        out = audio_stitch_pairs(rd.from_arrow(clips), window_frames=32,
                                 min_votes=6).to_pandas()
        assert len(out) == 0

    def test_undecodable_skipped(self, ray_session):
        import ray.data as rd

        from spiderray.stages.audiodedup import audio_stitch_pairs

        sr, n = 16000, 16384
        pcm = np.frombuffer(synth_note_audio(5, sr, n), dtype="<i2")
        clips = pa.table({
            "clip_id": pa.array([50, 51, 99], pa.int64()),
            "bytes": pa.array([pcm[:12288].tobytes(), pcm[4096:].tobytes(),
                               b"junk"], pa.binary()),
            "codec": pa.array(["pcm_s16le", "pcm_s16le", "flac"],
                              pa.string()),
            "sr_hz": pa.array([sr, sr, sr], pa.int32()),
        })
        out = audio_stitch_pairs(rd.from_arrow(clips), window_frames=32,
                                 min_votes=6).to_pandas()
        assert set(out.id_a) == {50} and set(out.id_b) == {51}
