"""Acoustic near-duplicate detection over audio clips — the constellation
fingerprint method (Wang 2003) in the repo's established LSH pair shape
(stages/dedup.py): explode small fixed-size hash rows, shuffle by hash
partition, self-merge per hash bucket with a hot-bucket cap, then a keyed
count aggregation with a match-fraction verify.

Scale shape (mirrors minhash_lsh_pairs, the 10^12-doc template):

* exploded rows carry (part:int32, lmh:int64, id, n_hashes:int32) — ~24 B
  per landmark regardless of clip size; the audio bytes never cross the
  shuffle.
* all rows of one landmark hash land in ONE partition (part = lmh mod
  N_PARTS), so the MAX_BUCKET hot-hash cap is globally consistent — a hash
  shared by more clips than the cap (a jingle, silence pattern) is skipped
  entirely rather than generating O(n^2) candidate pairs.
* per-partition pair counts are PARTIAL (combiner before the shuffle); the
  global groupby sums them, so the second exchange is pair-sized, not
  landmark-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.audiofp import spectral_landmarks
from .dedup import MAX_BUCKET, N_PARTS


def audio_fingerprint_pairs(
    ds,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    min_shared: int = 2,
    min_fraction: float = 0.6,
    **landmark_kwargs,
):
    """Near-duplicate clip pairs: clips sharing >= ``min_shared`` landmark
    hashes are candidates; a pair is emitted when its shared-hash count is
    at least ``min_fraction`` of the smaller clip's fingerprint (the exact
    verify — a single coincidentally-shared note transition yields a few
    matches but a small fraction).  Output: (id_a, id_b, n_matches,
    match_fraction), id_a < id_b."""
    from ray.data.aggregate import Max, Sum

    from .multimodal import DecodeUnsupported, _decode_one

    def explode(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        ids_out, hashes = [], []
        n_per: list[int] = []
        for i, buf, codec, sr in zip(
            batch.column(id_col).to_pylist(),
            batch.column(bytes_col).to_pylist(),
            batch.column(codec_col).to_pylist(),
            batch.column(sr_col).to_pylist(),
        ):
            try:
                pcm = _decode_one(buf or b"", codec or "")
            except DecodeUnsupported:
                continue
            lms = spectral_landmarks(pcm, int(sr or 0), **landmark_kwargs)
            if len(lms) == 0:
                continue
            ids_out.extend([i] * len(lms))
            hashes.append(lms)
            n_per.extend([len(lms)] * len(lms))
        if not hashes:
            return pa.table({
                "part": pa.array([], pa.int32()),
                "lmh": pa.array([], pa.int64()),
                id_col: pa.array([], id_type),
                "n_hashes": pa.array([], pa.int32()),
            })
        h = np.concatenate(hashes).view(np.int64)
        return pa.table({
            "part": pa.array((h % N_PARTS).astype(np.int32)),
            "lmh": pa.array(h),
            id_col: pa.array(ids_out, id_type),
            "n_hashes": pa.array(np.asarray(n_per, dtype=np.int32)),
        })

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        # the empty frame's id dtype must match non-empty groups' output or
        # Ray's block schema unification fails across groups
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype=g[id_col].dtype),
            "id_b": pd.Series([], dtype=g[id_col].dtype),
            "n_matches": pd.Series([], dtype=np.int64),
            "n_a": pd.Series([], dtype=np.int64),
            "n_b": pd.Series([], dtype=np.int64),
        })
        g = g.drop_duplicates(subset=["lmh", id_col])
        sizes = g.groupby("lmh")[id_col].transform("size")
        g = g[sizes <= MAX_BUCKET]
        if g.empty:
            return empty
        m = g.merge(g, on="lmh", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if m.empty:
            return empty
        # partial per-partition pair counts (combiner); n_hashes is a
        # per-clip constant so any representative value is exact
        agg = (
            m.groupby([f"{id_col}_a", f"{id_col}_b"])
            .agg(
                n_matches=("lmh", "size"),
                n_a=("n_hashes_a", "first"),
                n_b=("n_hashes_b", "first"),
            )
            .reset_index()
        )
        return agg.rename(
            columns={f"{id_col}_a": "id_a", f"{id_col}_b": "id_b"}
        ).astype({"n_matches": np.int64, "n_a": np.int64, "n_b": np.int64})

    partial = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pandas")
    )
    totals = partial.groupby(["id_a", "id_b"]).aggregate(
        Sum("n_matches", alias_name="n_matches"),
        Max("n_a", alias_name="n_a"),
        Max("n_b", alias_name="n_b"),
    )

    def verify(batch: pa.Table) -> pa.Table:
        n = batch.column("n_matches").to_numpy(zero_copy_only=False).astype(np.int64)
        na = batch.column("n_a").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False).astype(np.int64)
        frac = n / np.maximum(np.minimum(na, nb), 1)
        keep = (n >= min_shared) & (frac >= min_fraction)
        out = pa.table({
            "id_a": batch.column("id_a").filter(pa.array(keep)),
            "id_b": batch.column("id_b").filter(pa.array(keep)),
            "n_matches": pa.array(n[keep]),
            "match_fraction": pa.array(frac[keep], pa.float64()),
        })
        return out

    return totals.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


def serial_audio_fingerprint_pairs(
    clips: pa.Table,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    min_shared: int = 2,
    min_fraction: float = 0.6,
    **landmark_kwargs,
) -> pa.Table:
    """Single-threaded oracle twin of ``audio_fingerprint_pairs`` — one pass
    over one table, plain dict inverted index, same per-clip kernel and the
    same global MAX_BUCKET hot-hash skip."""
    from collections import Counter, defaultdict

    from .multimodal import DecodeUnsupported, _decode_one

    fp_sets: dict = {}
    for i, buf, codec, sr in zip(
        clips.column(id_col).to_pylist(),
        clips.column(bytes_col).to_pylist(),
        clips.column(codec_col).to_pylist(),
        clips.column(sr_col).to_pylist(),
    ):
        try:
            pcm = _decode_one(buf or b"", codec or "")
        except DecodeUnsupported:
            continue
        lms = spectral_landmarks(pcm, int(sr or 0), **landmark_kwargs)
        if len(lms):
            fp_sets[i] = lms
    inv = defaultdict(list)
    for i, lms in fp_sets.items():
        for h in lms.tolist():
            inv[h].append(i)
    counts: Counter = Counter()
    for h, ids in inv.items():
        if len(ids) > MAX_BUCKET:
            continue
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                counts[(ids[x], ids[y])] += 1
    rows = []
    for (a, b), n in counts.items():
        frac = n / max(min(len(fp_sets[a]), len(fp_sets[b])), 1)
        if n >= min_shared and frac >= min_fraction:
            rows.append((a, b, n, frac))
    rows.sort()
    id_type = clips.schema.field(id_col).type
    return pa.table({
        "id_a": pa.array([r[0] for r in rows], id_type),
        "id_b": pa.array([r[1] for r in rows], id_type),
        "n_matches": pa.array([r[2] for r in rows], pa.int64()),
        "match_fraction": pa.array([r[3] for r in rows], pa.float64()),
    })


def audio_decontaminate(ds, eval_clips: pa.Table,
                        id_col: str = "clip_id", bytes_col: str = "bytes",
                        codec_col: str = "codec", sr_col: str = "sr_hz",
                        min_shared: int = 2, min_fraction: float = 0.5,
                        **landmark_kwargs):
    """Eval-set decontamination for AUDIO — the acoustic analog of
    stages/dedup.decontaminate: training clips whose constellation
    landmarks overlap an EVAL clip's are flagged before training, so
    benchmark audio (or its re-encodes: the landmarks survive gain and
    codec changes) never leaks into the corpus.

    Shape: the eval set is bounded by definition, so its landmark union
    builds driver-side (one pass over the eval table) and broadcasts
    once via ray.put; the corpus then streams through one pure map —
    no shuffle, nothing corpus-sized anywhere.  Appends
    ``eval_contaminated`` + ``eval_shared`` columns."""
    import ray

    from .multimodal import DecodeUnsupported, _decode_one

    eval_hashes: set[int] = set()
    for buf, codec, sr in zip(eval_clips.column(bytes_col).to_pylist(),
                              eval_clips.column(codec_col).to_pylist(),
                              eval_clips.column(sr_col).to_pylist()):
        try:
            pcm = _decode_one(buf or b"", codec or "")
        except DecodeUnsupported:
            continue
        eval_hashes.update(
            int(h) for h in spectral_landmarks(pcm, int(sr or 0),
                                               **landmark_kwargs))
    eval_ref = ray.put(eval_hashes)

    def flag(batch: pa.Table) -> pa.Table:
        ev = ray.get(eval_ref)
        flags, shared_counts = [], []
        for buf, codec, sr in zip(batch.column(bytes_col).to_pylist(),
                                  batch.column(codec_col).to_pylist(),
                                  batch.column(sr_col).to_pylist()):
            try:
                pcm = _decode_one(buf or b"", codec or "")
                hashes = [int(h) for h in spectral_landmarks(
                    pcm, int(sr or 0), **landmark_kwargs)]
            except DecodeUnsupported:
                flags.append(False)
                shared_counts.append(0)
                continue
            shared = sum(1 for h in hashes if h in ev)
            frac = shared / max(len(hashes), 1)
            flags.append(shared >= min_shared and frac >= min_fraction)
            shared_counts.append(shared)
        batch = batch.append_column("eval_contaminated",
                                    pa.array(flags, pa.bool_()))
        return batch.append_column("eval_shared",
                                   pa.array(shared_counts, pa.int32()))

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def audio_search(ds, query_clips: pa.Table, top_k: int = 3,
                 min_votes: int = 3, max_query_hashes: int = 2_000_000,
                 id_col: str = "clip_id", bytes_col: str = "bytes",
                 codec_col: str = "codec", sr_col: str = "sr_hz",
                 query_id_col: str = "query_id", **landmark_kwargs):
    """Query-by-example audio retrieval — the Shazam shape (Wang 2003):
    which corpus clips contain (an excerpt of) each query clip?  The audio
    sibling of BM25 text retrieval, and the lookup companion of
    ``audio_fingerprint_pairs``'s all-pairs dedup.

    Method: timed constellation landmarks on both sides; a corpus clip
    matching a query at a consistent TIME OFFSET is a hit — votes are the
    largest count of shared hashes agreeing on one (corpus_anchor −
    query_anchor) frame offset, which rejects coincidental single-hash
    collisions that a bag-of-hashes overlap would count.

    Scale shape: the query side is bounded by definition — its timed
    landmark index (hash-sorted arrays) builds driver-side under a LOUD
    ``max_query_hashes`` cap and broadcasts ONCE via ray.put; the corpus
    then streams through one pure map (binary-search probe per clip, all
    voting row-local) emitting only (query, clip, votes, offset) candidate
    rows with votes ≥ ``min_votes``.  The only exchange is the final
    grouped top-k over candidates.  Nothing corpus-sized ever lands on the
    driver or shuffles.

    Determinism: integer votes and frame offsets; per-query ranking by
    (votes desc, clip_id asc); within a clip the winning offset is the
    smallest among max-vote offsets.  Offsets are exact when query and
    corpus share sr (a hop-aligned excerpt ⇒ one constant offset);
    cross-rate queries still match through the hashes with blurred
    offsets (documented boundary)."""
    import ray

    from ..functions.audiofp import spectral_landmarks_timed
    from .multimodal import DecodeUnsupported, _decode_one
    from .stats import top_k_per_group

    q_ids = query_clips.column(query_id_col).to_pylist()
    qh_parts, qi_parts, qt_parts = [], [], []
    for qi, (buf, codec, sr) in enumerate(zip(
            query_clips.column(bytes_col).to_pylist(),
            query_clips.column(codec_col).to_pylist(),
            query_clips.column(sr_col).to_pylist())):
        try:
            pcm = _decode_one(buf or b"", codec or "")
        except DecodeUnsupported:
            continue
        h, t = spectral_landmarks_timed(pcm, int(sr or 0), **landmark_kwargs)
        if len(h) == 0:
            continue
        qh_parts.append(h)
        qi_parts.append(np.full(len(h), qi, dtype=np.int64))
        qt_parts.append(t.astype(np.int64))
    if qh_parts:
        qh = np.concatenate(qh_parts)
        qi = np.concatenate(qi_parts)
        qt = np.concatenate(qt_parts)
    else:
        qh = np.empty(0, np.uint64)
        qi = qt = np.empty(0, np.int64)
    if len(qh) > max_query_hashes:
        raise ValueError(
            f"query landmark index has {len(qh)} hashes > cap "
            f"{max_query_hashes}; shard the query set")
    order = np.argsort(qh, kind="mergesort")
    idx_ref = ray.put((qh[order], qi[order], qt[order]))
    qid_arr = pa.array(q_ids)

    # offsets are bounded by the landmark frame cap (|off| < max_frames
    # ≤ 512 by default); pack (query, offset) into one int64 vote key
    OFF_BIAS = 1 << 12
    OFF_SPAN = 1 << 13

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _ray

        Hq, Qi, Tq = _ray.get(idx_ref)
        out_q, out_c, out_v, out_o = [], [], [], []
        for cid, buf, codec, sr in zip(
                batch.column(id_col).to_pylist(),
                batch.column(bytes_col).to_pylist(),
                batch.column(codec_col).to_pylist(),
                batch.column(sr_col).to_pylist()):
            try:
                pcm = _decode_one(buf or b"", codec or "")
            except DecodeUnsupported:
                continue
            h, t = spectral_landmarks_timed(pcm, int(sr or 0),
                                            **landmark_kwargs)
            if len(h) == 0 or len(Hq) == 0:
                continue
            lo = np.searchsorted(Hq, h, side="left")
            hi = np.searchsorted(Hq, h, side="right")
            lens = hi - lo
            total = int(lens.sum())
            if total == 0:
                continue
            # expand the per-hash [lo, hi) ranges into flat index lists
            base = np.repeat(lo, lens)
            csum = np.cumsum(lens) - lens
            pos = base + (np.arange(total) - np.repeat(csum, lens))
            q_match = Qi[pos]
            off = np.repeat(t.astype(np.int64), lens) - Tq[pos]
            key = q_match * OFF_SPAN + (off + OFF_BIAS)
            uk, cnt = np.unique(key, return_counts=True)
            qpart = uk // OFF_SPAN
            opart = (uk % OFF_SPAN) - OFF_BIAS
            # per query: max votes, tie -> smallest offset
            o = np.lexsort((opart, -cnt, qpart))
            firsts = np.unique(qpart[o], return_index=True)[1]
            win = o[firsts]
            keep = cnt[win] >= min_votes
            for w in win[keep]:
                out_q.append(int(qpart[w]))
                out_c.append(cid)
                out_v.append(int(cnt[w]))
                out_o.append(int(opart[w]))
        id_t = batch.schema.field(id_col).type
        return pa.table({
            query_id_col: qid_arr.take(pa.array(out_q, pa.int64()))
            if out_q else pa.array([], qid_arr.type),
            id_col: pa.array(out_c, id_t),
            "votes": pa.array(out_v, pa.int64()),
            "offset_frames": pa.array(out_o, pa.int64()),
        })

    cands = ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    return top_k_per_group(cands, [query_id_col], "votes", top_k,
                           descending=True, tie_col=id_col)


def audio_stitch_pairs(ds, window_frames: int = 24, min_votes: int = 4,
                       max_hash_group: int = 200,
                       id_col: str = "clip_id", bytes_col: str = "bytes",
                       codec_col: str = "codec", sr_col: str = "sr_hz",
                       **landmark_kwargs):
    """Audio stitch detection — the waveform analog of pagination
    stitching (dedup.suffix_prefix_pairs) and the chaining companion of
    ``audio_fingerprint_pairs``: pairs (a, b) where the TAIL of a is the
    HEAD of b at one consistent time offset — a recording split into
    overlapping uploads, rejoinable by trimming the overlap.

    Method: timed constellation landmarks, but each clip emits only its
    boundary windows — anchors in the last ``window_frames`` frames
    (side=tail, with the clip's frame count riding along) and the first
    ``window_frames`` (side=head) — so emission is bounded per clip no
    matter how long the audio.  One keyed exchange on the hash pairs
    tail rows with head rows (hot hashes capped), then a (pair)-keyed
    vote: the modal (t_tail − t_head) offset must collect ≥
    ``min_votes`` landmarks.  offset_frames = n_frames(a) − overlap, so
    the stitcher knows exactly where to cut.

    Determinism: integer votes/offsets; modal offset ties break to the
    smallest offset; output (id_a, id_b, votes, offset_frames) sorted
    by the caller.  Self-pairs excluded; offsets must be positive (b
    continues a, not the reverse).

    Exchange shape: BOTH keyed steps run as hash-partition shuffles with
    ALL of a partition's groups resolved in one vectorized pandas/numpy
    pass — a per-hash map_groups paid Ray's per-group machinery on ~20
    tiny groups per clip and ran 10× slower at sf0.1 (the sessionize
    lesson, measured again here: 20 s → ~3 s)."""
    import pandas as pd

    from ..functions.audiofp import spectral_landmarks_timed
    from .multimodal import DecodeUnsupported, _decode_one
    from .windows import _add_part

    def boundaries(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        ids_out, hs, ts, sides, nfs = [], [], [], [], []
        for i, buf, codec, sr in zip(
                batch.column(id_col).to_pylist(),
                batch.column(bytes_col).to_pylist(),
                batch.column(codec_col).to_pylist(),
                batch.column(sr_col).to_pylist()):
            try:
                pcm = _decode_one(buf or b"", codec or "")
            except DecodeUnsupported:
                continue
            h, t = spectral_landmarks_timed(pcm, int(sr or 0),
                                            **landmark_kwargs)
            if len(h) == 0:
                continue
            nf = int(t.max()) + 1
            head = t < window_frames
            tail = t >= max(nf - window_frames, 0)
            for mask, side in ((tail, 0), (head, 1)):
                k = int(mask.sum())
                if not k:
                    continue
                ids_out.extend([i] * k)
                hs.extend(h[mask].tolist())
                ts.extend(t[mask].tolist())
                sides.extend([side] * k)
                nfs.extend([nf] * k)
        return pa.table({
            id_col: pa.array(ids_out, id_type),
            "h": pa.array(np.array(hs, dtype=np.uint64), pa.uint64()),
            "t": pa.array(ts, pa.int32()),
            "side": pa.array(sides, pa.int8()),
            "nf": pa.array(nfs, pa.int32()),
        })

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        """ALL hash groups of one partition at once: sort both sides by
        hash, align common hashes, expand every group's tails × heads
        cartesian product with cumsum arithmetic — no per-group calls."""
        empty = pd.DataFrame({"id_a": np.array([], dtype=object),
                              "id_b": np.array([], dtype=object),
                              "off": np.array([], dtype=np.int64)})
        tails = g[g["side"] == 0].sort_values("h", kind="mergesort")
        heads = g[g["side"] == 1].sort_values("h", kind="mergesort")
        if tails.empty or heads.empty:
            return empty
        th = tails["h"].to_numpy()
        hh = heads["h"].to_numpy()
        t_uniq, t_start, t_cnt = np.unique(th, return_index=True,
                                           return_counts=True)
        h_uniq, h_start, h_cnt = np.unique(hh, return_index=True,
                                           return_counts=True)
        common, ti, hi = np.intersect1d(t_uniq, h_uniq,
                                        return_indices=True)
        if not len(common):
            return empty
        nt, nh = t_cnt[ti], h_cnt[hi]
        ok = (nt + nh) <= max_hash_group  # hot-hash cap, per hash
        nt, nh = nt[ok], nh[ok]
        ts0, hs0 = t_start[ti][ok], h_start[hi][ok]
        ppg = nt * nh  # pairs per group
        total = int(ppg.sum())
        if total == 0:
            return empty
        pair_base = np.repeat(np.cumsum(ppg) - ppg, ppg)
        pair_in_g = np.arange(total) - pair_base
        nh_rep = np.repeat(nh, ppg)
        t_idx = np.repeat(ts0, ppg) + pair_in_g // nh_rep
        h_idx = np.repeat(hs0, ppg) + pair_in_g % nh_rep
        ta = tails["t"].to_numpy(np.int64)[t_idx]
        tb = heads["t"].to_numpy(np.int64)[h_idx]
        ia = tails[id_col].to_numpy()[t_idx]
        ib = heads[id_col].to_numpy()[h_idx]
        off = ta - tb
        keep = (off > 0) & (ia != ib)
        if not keep.any():
            return empty
        return pd.DataFrame({"id_a": ia[keep], "id_b": ib[keep],
                             "off": off[keep]})

    def vote_part(g: pd.DataFrame) -> pd.DataFrame:
        """ALL pairs of one partition at once: count (pair, off) votes,
        keep each pair's (max votes, smallest offset) row, gate."""
        c = (g.groupby(["id_a", "id_b", "off"], sort=False)
             .size().rename("votes").reset_index())
        c = c.sort_values(["id_a", "id_b", "votes", "off"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
        c = c.drop_duplicates(["id_a", "id_b"], keep="first")
        c = c[c["votes"] >= min_votes]
        return pd.DataFrame({
            "id_a": c["id_a"].to_numpy(),
            "id_b": c["id_b"].to_numpy(),
            "votes": c["votes"].to_numpy(np.int64),
            "offset_frames": c["off"].to_numpy(np.int64)})

    rows = ds.map_batches(boundaries, batch_format="pyarrow",
                          zero_copy_batch=True)
    cand = (_add_part(rows, "h", 32).groupby("__part")
            .map_groups(pairs_in_part, batch_format="pandas"))
    return (_add_part(cand, "id_a", 32).groupby("__part")
            .map_groups(vote_part, batch_format="pandas"))
