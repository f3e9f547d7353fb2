"""The clips table (BASELINE.json input_hint): schema
(clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32, codec:string,
transcript:string).

``read_clips`` prefers Lance (``ray.data.read_lance``) when the lance package
is available — the target storage format at 10^12-clip scale — and falls back
to Parquet in this container (lance is not installed; the call path is
identical: both yield zero-copy Arrow blocks).

``synth_clips_table`` generates the deterministic test corpus: transcripts
stratified per FIXTURES.md F2 (exercising every branch of the lang cascade
and keep/drop rules) and audio bytes as seeded PCM16 sine/noise mixes that
must survive passthrough with decoded-PCM SNR >= 30 dB (input_hint
invariant).  Seeding is pure ``clip_index`` arithmetic — no RNG state shared
across rows — so any shard of the table can be regenerated independently
(the property that makes the generator usable as a distributed source via
``ray.data.range(n).map_batches(gen)``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CLIP_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
    ]
)

_SR_CHOICES = (8000, 16000, 22050, 44100)
_CODECS = ("pcm_s16le", "flac", "opus", "pcm_s16le", "pcm_s16le", "banned_codec")

# ---------------------------------------------------------------------------
# transcript strata (FIXTURES.md F2). Deterministic templates; stratum chosen
# by clip_index % len(STRATA).
# ---------------------------------------------------------------------------
_ZH_SENT = "今天上午市政府召开了关于城市交通治理的专题会议，与会代表就公共交通优化方案进行了深入讨论。"
_JA_SENT = "政府は今日、新しい交通政策を発表しました。これにより市民の生活は便利になるでしょう。"
_KO_SENT = "정부는 오늘 새로운 교통 정책을 발표했습니다 시민들은 이번 결정을 환영했습니다 "
_EN_SENT = "The committee met this morning to discuss the proposed changes to the public transportation system in detail. "
_FR_SENT = "Le gouvernement a annoncé une série de mesures pour améliorer la qualité de l'air dans les grandes villes. "
_DE_SENT = "Die Regierung hat heute eine Reihe von Maßnahmen zur Verbesserung der Luftqualität in den Städten angekündigt. "
_ES_SENT = "El gobierno anunció hoy una serie de medidas para mejorar la calidad del aire en las grandes ciudades. "
_PT_SENT = "O governo anunciou hoje uma série de medidas para melhorar a qualidade do ar nas grandes cidades. "
_RU_SENT = "Правительство объявило сегодня о новых мерах по улучшению качества воздуха в крупных городах страны. "
_AR_SENT = "أعلنت الحكومة اليوم عن مجموعة من الإجراءات الجديدة لتحسين جودة الهواء في المدن الكبرى. "
_HI_SENT = "सरकार ने आज बड़े शहरों में वायु गुणवत्ता में सुधार के लिए नए उपायों की घोषणा की है। "


def _stratum_transcript(i: int) -> tuple[str, str]:
    """(stratum_name, transcript) for clip index ``i`` — pure arithmetic."""
    k = i % 15
    rep = 2 + (i // 14) % 3
    if k == 0:
        return "zh_good", _ZH_SENT * rep
    if k == 1:
        return "zh_short", "新闻中心"[: 2 + i % 3]
    if k == 2:
        return "zh_blacklist", _ZH_SENT + "增值电信业务经营许可证B2-20090059"
    if k == 3:
        return "ja_mixed", _JA_SENT * rep
    if k == 4:
        return "ko", _KO_SENT * rep
    if k == 5:
        return "en_good", _EN_SENT * rep
    if k == 6:
        # decidable as en (>= 64 runes) but < 5 words → LinkTypeList → "short"
        return "en_short", (
            "Pneumonoultramicroscopicsilicovolcanoconiosis "
            "Antidisestablishmentarianism Floccinaucinihilipilification"
        )
    if k == 7:
        lat = (_FR_SENT, _DE_SENT, _ES_SENT, _PT_SENT)[(i // 15) % 4]
        return "latin_nonEn", lat * rep
    if k == 8:
        nl = (_RU_SENT, _AR_SENT, _HI_SENT)[(i // 15) % 3]
        return "ar_ru_hi", nl * rep
    if k == 9:
        return "too_short", "short clip " + str(i % 97)
    if k == 10:
        return "punct_noise", ("!@#$%^&*()[]<>~" + _EN_SENT[:20]) * rep
    if k == 11:
        return "boiler_repeat", "\n".join(["SUBSCRIBE NOW AND LIKE"] * (6 + i % 4))
    if k == 12:
        return "dynamic", "{a} {b} {c} {d} {e} {f} " + _EN_SENT * rep
    if k == 13:
        return "pii_mix", (
            _EN_SENT
            + f"Contact us at user{i % 7}@example.com or call 138{i % 10}2345678. "
            + "粤ICP备17055554号 "
            + _EN_SENT
        )
    return "toxic", (
        _EN_SENT + "You stupid idiot readers are trash and I hate this garbage. " + _EN_SENT
    )


# fixed noise table (seeded once at import — identical in every process);
# per-clip noise = a slice at a clip-index-derived offset.  Cheap AND
# deterministic per clip index, unlike per-row Generator construction.
_NOISE = np.random.default_rng(42).standard_normal(1 << 17)


# (freq, sr_hz, n_samples) take ≤ 48 x |_SR_CHOICES| x 5 distinct values, so
# the sine term is memoized per combo (float64, computed with the exact
# original op order → byte-identical output); per-row work drops to one
# add + clip + cast.  The sin() evals were ~60% of the whole flagship
# bench's per-row cost (round-4 profile: gen 213 us/row vs 148 us/row for
# every engine stage combined).
_SINE_CACHE: dict[tuple[float, int, int], np.ndarray] = {}


def _sine_term(freq: float, sr_hz: int, n_samples: int) -> np.ndarray:
    key = (freq, sr_hz, n_samples)
    w = _SINE_CACHE.get(key)
    if w is None:
        t = np.arange(n_samples, dtype=np.float64) / sr_hz
        w = 0.6 * np.sin(2 * np.pi * freq * t)
        if len(_SINE_CACHE) >= 2048:  # ~240 combos in practice; hard bound
            _SINE_CACHE.clear()       # for foreign (sr, n) callers
        _SINE_CACHE[key] = w
    return w


def synth_audio(i: int, sr_hz: int, n_samples: int) -> bytes:
    """Deterministic PCM16 sine+noise, derived purely from ``i``.  In-place
    float64 ops in the exact original arithmetic (IEEE add is commutative
    bitwise), so output bytes are identical to the naive expression."""
    freq = 180.0 + (i % 48) * 17.0
    off = (i * 2654435761) % (len(_NOISE) - n_samples)
    wave = _NOISE[off : off + n_samples] * 0.05
    wave += _sine_term(freq, sr_hz, n_samples)
    wave *= 32767.0
    np.clip(wave, -32768, 32767, out=wave)
    return wave.astype("<i2").tobytes()


def _clip_bytes(i: int, sr_hz: int, n_samples: int) -> bytes:
    """Per-clip audio payload: raw PCM16 for most codecs; opus rows are
    wrapped in a REAL Ogg-Opus container (functions/oggopus.py — valid
    framing/CRCs/OpusHead, opaque payload) whose granule duration matches
    the clip metadata, so the container gate exercises its pass path on
    real structure.  Two deterministic fault strata per opus rotation:
    every 8th opus clip (phase 7) gets a flipped CRC → 'bad_container';
    phase 3 gets a granule claiming 2x the samples → 'duration_mismatch'."""
    pcm = synth_audio(i, sr_hz, n_samples)
    if _CODECS[i % len(_CODECS)] != "opus":
        return pcm
    from ..functions.oggopus import encode_ogg_opus

    phase = (i // len(_CODECS)) % 8
    claimed = n_samples * 2 if phase == 3 else n_samples
    buf = encode_ogg_opus(pcm, claimed, sr_hz)
    if phase == 7:
        buf = bytearray(buf)
        buf[-1] ^= 0xFF  # corrupt the final page body → CRC mismatch
        buf = bytes(buf)
    return buf


def decode_pcm16(b: bytes) -> np.ndarray:
    """PCM16LE → float64 samples in [-1, 1] (the decode side of the
    decoded-PCM allclose invariant)."""
    return np.frombuffer(b, dtype="<i2").astype(np.float64) / 32767.0


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    noise = ref - test
    p_sig = float(np.mean(ref**2))
    p_noise = float(np.mean(noise**2))
    if p_noise == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_noise)


def clips_metadata_batch(indices: np.ndarray) -> pa.Table:
    """Metadata-only clip rows (codec, sr_hz, dur_ms) — the same per-index
    arithmetic as synth_clips_batch with no audio/transcript synthesis,
    for metadata-level passes (e.g. the audio corpus report) that would
    otherwise generate and immediately discard ~64 KB of audio per row."""
    idx = np.asarray(indices, dtype=np.int64)
    srs = np.array(_SR_CHOICES, dtype=np.int64)[idx % len(_SR_CHOICES)]
    n_samples = srs // 4 + (idx % 5) * srs // 100
    return pa.table({
        "codec": pa.array([_CODECS[int(i) % len(_CODECS)] for i in idx],
                          pa.string()),
        "sr_hz": pa.array(srs.astype(np.int32)),
        "dur_ms": pa.array((1000 * n_samples // srs).astype(np.int32)),
    })


def synth_clips_batch(indices: np.ndarray, with_audio: bool = True) -> pa.Table:
    """Generate clip rows for the given clip indices (shard generator; used
    both driver-side and inside map_batches).

    Audio is synthesized per row on purpose: per-row buffers (~64 KB) stay
    inside the malloc small-block pool, while a batch-wide vectorized
    variant allocates 100+ MB temporaries that this sandbox's VM services at
    ~40 MB/s first-touch (measured) — the per-row loop is 20x faster here
    and bit-identical."""
    idx = np.asarray(indices, dtype=np.int64)
    srs = np.array(_SR_CHOICES, dtype=np.int64)[idx % len(_SR_CHOICES)]
    n_samples = srs // 4 + (idx % 5) * srs // 100  # ~250-300 ms
    if with_audio:
        bufs = [
            _clip_bytes(int(i), int(sr), int(n))
            for i, sr, n in zip(idx, srs, n_samples)
        ]
    else:
        bufs = [b""] * len(idx)
    clip_ids = [f"clip_{i:012d}" for i in map(int, idx)]
    texts = [_stratum_transcript(int(i))[1] for i in idx]
    codecs = [_CODECS[int(i) % len(_CODECS)] for i in idx]
    durs = (1000 * n_samples // srs).astype(np.int32)
    return pa.Table.from_arrays(
        [
            pa.array(clip_ids, pa.string()),
            pa.array(bufs, pa.binary()),
            pa.array(srs.astype(np.int32)),
            pa.array(durs),
            pa.array(codecs, pa.string()),
            pa.array(texts, pa.string()),
        ],
        schema=CLIP_SCHEMA,
    )


def synth_clips_table(n: int, with_audio: bool = True) -> pa.Table:
    return synth_clips_batch(np.arange(n), with_audio=with_audio)


def synth_clips_dataset(n: int, with_audio: bool = True, override_num_blocks: int | None = None):
    """Distributed generator: ray.data.range(n) → map_batches(gen).  Each
    block generates its shard independently (seeded by clip index), so the
    source scales to any n without a driver-side materialization."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return synth_clips_batch(batch.column("id").to_numpy(), with_audio=with_audio)

    # batch_size=None → one task per input block: the caller's block count
    # (not the batch coalescer) sets the parallelism.  A fixed 4096 here
    # made the FUSED downstream chain bundle 4096-row tasks — 13 tasks for
    # 50k clips, starving 32 cpus (measured: the whole flagship collapsed
    # to ceil(n/4096) tasks).
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=None)


def synth_note_audio(key: int, sr_hz: int, n_samples: int,
                     gain: float = 0.6, noise_salt: int = 0) -> bytes:
    """Deterministic NON-stationary PCM16: an 8-note melody whose pitches
    derive from md5(key) (two digest bytes per note → 65536 pitch levels,
    so unrelated keys almost never share a quantized note transition),
    plus a noise-table slice.  Unlike ``synth_audio`` (one stationary
    sine), note sequences give spectral-peak landmark fingerprints
    (functions/audiofp.py) real time structure to hash: a twin with the
    same ``key`` but different ``gain``/``noise_salt`` keeps the
    constellation."""
    import hashlib

    dig = hashlib.md5(f"note{key}".encode()).digest()
    t = np.arange(n_samples, dtype=np.float64) / sr_hz
    wave = np.zeros(n_samples, dtype=np.float64)
    seg = max(n_samples // 8, 1)
    top = 0.45 * sr_hz
    for k in range(8):
        f = 150.0 + ((dig[2 * k] << 8 | dig[2 * k + 1]) / 65535.0) * (top - 150.0)
        s = k * seg
        e = n_samples if k == 7 else min((k + 1) * seg, n_samples)
        if s >= e:
            break
        wave[s:e] = np.sin(2 * np.pi * f * t[s:e])
    off = ((key * 2654435761) + noise_salt * 97003) % (len(_NOISE) - n_samples)
    pcm = np.clip((gain * wave + 0.05 * _NOISE[off : off + n_samples]) * 32767.0,
                  -32768, 32767).astype("<i2")
    return pcm.tobytes()


def note_clips_batch(ids: np.ndarray, twin_mod: int = 40,
                     id_offset: int = 10_000_000) -> pa.Table:
    """Note-melody clip rows for the given doc ids; every ``twin_mod``-th id
    additionally emits an acoustic NEAR-DUPLICATE twin (same melody key and
    sample rate, lower gain, different noise slice) at ``id + id_offset`` —
    the planted ground truth for audio-fingerprint dedup.  Pure per-row
    arithmetic shared by the distributed source and the serial oracle."""
    idx = np.asarray(ids, dtype=np.int64)
    out_ids, bufs, srs = [], [], []
    for i in map(int, idx):
        sr = _SR_CHOICES[i % len(_SR_CHOICES)]
        n = sr // 4 + (i % 5) * sr // 100
        out_ids.append(i)
        srs.append(sr)
        bufs.append(synth_note_audio(i, sr, n))
        if i % twin_mod == 0:
            out_ids.append(i + id_offset)
            srs.append(sr)
            bufs.append(synth_note_audio(i, sr, n, gain=0.42, noise_salt=7))
    return pa.table({
        "clip_id": pa.array(out_ids, pa.int64()),
        "bytes": pa.array(bufs, pa.binary()),
        "sr_hz": pa.array(srs, pa.int32()),
        "codec": pa.array(["pcm_s16le"] * len(out_ids), pa.string()),
    })


def note_clips_from_documents(sf_dir: str, twin_mod: int = 40,
                              id_offset: int = 10_000_000):
    """Distributed note-melody corpus over the documents table ids."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(
        lambda b: note_clips_batch(b.column("doc_id").to_numpy(),
                                   twin_mod, id_offset),
        batch_format="pyarrow", batch_size=4096,
    )


def note_clips_table_from_documents(sf_dir: str, twin_mod: int = 40,
                                    id_offset: int = 10_000_000) -> pa.Table:
    """Serial (no-Ray) twin of ``note_clips_from_documents``."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return note_clips_batch(t.column("doc_id").to_numpy(), twin_mod, id_offset)


def docs_to_clips_batch(batch: pa.Table) -> pa.Table:
    """One documents batch → one clips batch (pure per-row arithmetic; the
    shared unit behind the distributed ``clips_from_documents`` and the
    serial oracle path in pipelines/serial_oracles.py)."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    out = synth_clips_batch(ids)
    # replace two of every three transcripts with the document text
    mixed = [
        texts[j] if (int(ids[j]) % 3) else out.column("transcript")[j].as_py()
        for j in range(len(ids))
    ]
    return out.set_column(5, "transcript", pa.array(mixed, pa.string()))


def clips_from_documents(sf_dir: str):
    """Derive a clips Dataset from the driver's documents table (FIXTURES.md
    F8): doc text becomes the transcript; audio bytes seeded by doc_id.
    Every third row additionally carries a synthetic stratum transcript so
    the full cascade is exercised on driver data too."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # strip the pandas schema-metadata dict before the fused chain: Ray's
    # schema-dedup cache can't hash it (the known 2.49 warning) and every
    # block unify pays the miss (same fix as pipelines/queries._read)
    ds = ds.map_batches(lambda t: t.replace_schema_metadata(None),
                        batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(docs_to_clips_batch, batch_format="pyarrow", batch_size=4096)


def clips_table_from_documents(sf_dir: str) -> pa.Table:
    """Serial (no-Ray) twin of ``clips_from_documents`` — identical rows,
    one table.  Used by the serial oracles."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs_to_clips_batch(t)


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def resolve_clip_format(fmt: str = "auto") -> str:
    """Branch selection for the clips source/sink: 'auto' prefers Lance (the
    BASELINE input_hint names Lance tables) and falls back to Parquet when
    the package is absent (this container); explicit 'lance' fails loudly
    rather than silently reading the wrong format."""
    if fmt == "auto":
        return "lance" if lance_available() else "parquet"
    if fmt == "lance" and not lance_available():
        raise ImportError(
            "format='lance' requested but the lance package is not installed; "
            "use format='auto' to fall back to parquet"
        )
    if fmt not in ("lance", "parquet"):
        raise ValueError(f"unknown clips format {fmt!r}")
    return fmt


def read_clips(uri: str, columns: list[str] | None = None, fmt: str = "auto"):
    """Read a clips table: Lance when available (the at-scale path), else
    Parquet."""
    import ray.data as rd

    resolved = resolve_clip_format(fmt)
    if resolved == "lance":
        return rd.read_lance(uri, columns=columns)
    return rd.read_parquet(uri, columns=columns)


def write_clips(ds, uri: str, fmt: str = "auto"):
    """Write a clips table in the same format read_clips would pick."""
    resolved = resolve_clip_format(fmt)
    if resolved == "lance":
        ds.write_lance(uri)
    else:
        ds.write_parquet(uri)
    return resolved
