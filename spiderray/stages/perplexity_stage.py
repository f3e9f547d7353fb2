"""Char-n-gram perplexity scorer (SURVEY.md §2.3 A2; north_rule "KenLM-style
n-gram perplexity scorer ... models loaded once per actor").

A stateful actor-pool stage: ``__init__`` builds (or loads) one char-trigram
backoff LM per language ONCE per actor; ``__call__`` scores each transcript
under its detected language's model (add-k smoothed, order-3 with order-1
backoff), emitting ``ppl`` (perplexity/char, lower = more natural text).
With a real KenLM binary the only change is the ``__init__`` body — the Ray
plumbing (actor pool, batch flow, column contract) is identical.
"""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa

from ..config import PipelineConfig

# per-language seed corpora (shared with LangIdModelActor's profiles); at
# production scale these are model files on shared storage, loaded here.
_SEEDS = {
    "en": "the government announced today a series of measures to improve the air quality in the big cities and the representatives of the associations welcomed this decision after years of debate about public transportation and urban planning",
    "fr": "le gouvernement a annoncé une série de mesures pour améliorer la qualité de l'air dans les grandes villes et les représentants des associations ont salué cette décision très attendue après des années de débats",
    "de": "die regierung hat heute eine reihe von maßnahmen zur verbesserung der luftqualität in den städten angekündigt und die vertreter der verbände begrüßten diese entscheidung nach jahren der debatte",
    "es": "el gobierno anunció hoy una serie de medidas para mejorar la calidad del aire en las grandes ciudades y los representantes de las asociaciones celebraron esta decisión tras años de debate",
    "pt": "o governo anunciou hoje uma série de medidas para melhorar a qualidade do ar nas grandes cidades e os representantes das associações saudaram esta decisão depois de anos de debate",
    "ru": "правительство объявило сегодня о новых мерах по улучшению качества воздуха в крупных городах страны и эксперты поддержали это решение после многих лет обсуждений",
    "zh": "今天上午市政府召开了关于城市交通治理的专题会议与会代表就公共交通优化方案进行了深入讨论会议决定加大投入改善空气质量提升市民生活水平",
    "ja": "政府は今日新しい交通政策を発表しましたこれにより市民の生活はより便利になるでしょう専門家はこの決定を歓迎しています",
    "ko": "정부는 오늘 대도시의 공기 질을 개선하기 위한 새로운 조치를 발표했으며 전문가들은 이 결정을 환영했다",
    "ar": "أعلنت الحكومة اليوم عن مجموعة من الإجراءات الجديدة لتحسين جودة الهواء في المدن الكبرى ورحب الخبراء بهذا القرار المهم",
    "hi": "सरकार ने आज बड़े शहरों में वायु गुणवत्ता में सुधार के लिए नए उपायों की घोषणा की और विशेषज्ञों ने इस निर्णय का स्वागत किया",
}

_ORDER = 3
_ADD_K = 0.1
_MAX_CHARS = 256


class CharLM:
    """Order-3 add-k char LM with unigram backoff.  Log-probs are
    precomputed into flat dicts at build time (once per actor), so scoring
    is ~2 dict probes per char."""

    def __init__(self, corpus: str):
        text = f"  {corpus}  "
        tri = Counter(text[i : i + 3] for i in range(len(text) - 2))
        bi = Counter(text[i : i + 2] for i in range(len(text) - 1))
        uni = Counter(text)
        self._build(tri, bi, uni, n_chars=len(text))

    @classmethod
    def from_counts(cls, tri: dict, bi: dict, uni: dict, n_chars: int) -> "CharLM":
        """Build from pre-aggregated n-gram counts (the distributed-training
        path, stages/lm_train.py) — same smoothing math as __init__."""
        lm = cls.__new__(cls)
        lm._build(Counter(tri), Counter(bi), Counter(uni), n_chars)
        return lm

    def _build(self, tri: Counter, bi: Counter, uni: Counter, n_chars: int):
        n_chars = max(n_chars, 1)
        vocab = max(len(uni), 1)
        kv = _ADD_K * vocab
        # seen-trigram logprobs
        self.tri_lp = {
            g: math.log((c + _ADD_K) / (bi[g[:2]] + kv)) for g, c in tri.items()
        }
        # unseen-trigram-with-seen-context penalty per bigram
        self.ctx_miss_lp = {b: math.log(_ADD_K / (c + kv)) for b, c in bi.items()}
        # unigram backoff for unseen contexts
        self.uni_lp = {ch: math.log((c + _ADD_K) / (n_chars + kv)) for ch, c in uni.items()}
        self.oov_lp = math.log(_ADD_K / (n_chars + kv))

    def perplexity(self, text: str) -> float:
        """Reference scalar path: per-char dict probes, sequential float64
        accumulation.  ``perplexity_batch`` must agree bit-for-bit
        (property-tested) — both stay so the kernel has an independent
        check."""
        t = f"  {text[:_MAX_CHARS]}"
        n = len(t) - 2
        if n <= 0:
            return float("inf")
        tri_lp = self.tri_lp
        ctx_miss = self.ctx_miss_lp
        uni_lp = self.uni_lp
        oov = self.oov_lp
        total = 0.0
        for i in range(n):
            g = t[i : i + 3]
            v = tri_lp.get(g)
            if v is None:
                v = ctx_miss.get(g[:2])
                if v is None:
                    v = uni_lp.get(g[2], oov)
            total += v
        return math.exp(-total / n)

    def _packed(self):
        """Sorted packed-key lookup tables for the batch kernel, built
        lazily from the dicts (so read_arpa/quantize-constructed models get
        them too).  Codepoints < 2^21, so a trigram packs exactly into
        (c0<<42)|(c1<<21)|c2 — no hashing, no collisions."""
        packed = getattr(self, "_packed_tables", None)
        if packed is not None:
            return packed
        import numpy as np

        def mk(d, pack):
            if not d:
                return np.empty(0, np.uint64), np.empty(0, np.float64)
            keys = np.fromiter((pack(k) for k in d), dtype=np.uint64, count=len(d))
            vals = np.fromiter(d.values(), dtype=np.float64, count=len(d))
            o = np.argsort(keys, kind="stable")
            return keys[o], vals[o]

        self._packed_tables = (
            *mk(self.tri_lp, lambda g: (ord(g[0]) << 42) | (ord(g[1]) << 21) | ord(g[2])),
            *mk(self.ctx_miss_lp, lambda g: (ord(g[0]) << 21) | ord(g[1])),
            *mk(self.uni_lp, ord),
        )
        return self._packed_tables

    def perplexity_batch(self, texts) -> "object":
        """Vectorized perplexity over a batch — bit-identical to the scalar
        path: the per-window logprob values are exact dict-equivalent
        lookups (packed-key searchsorted), np.bincount accumulates them in
        window order (the same sequential float64 additions as the loop),
        and the final exp runs through math.exp per row."""
        import numpy as np

        from ..functions.vectext import codepoints

        tk, tv, bk, bv, uk, uv = self._packed()

        def lookup(keys, vals, k):
            if len(keys) == 0:
                return np.zeros(len(k), bool), np.zeros(len(k), np.float64)
            idx = np.minimum(np.searchsorted(keys, k), len(keys) - 1)
            hit = keys[idx] == k
            return hit, vals[idx]

        rows = [f"  {(t or '')[:_MAX_CHARS]}" for t in texts]
        codes, offsets = codepoints(rows)
        codes = codes.astype(np.uint64)
        n3 = np.diff(offsets) - 2  # scored windows per row (= n in scalar)
        win = np.maximum(n3, 0)
        out = np.full(len(rows), np.inf, dtype=np.float64)
        total = int(win.sum())
        if total == 0:
            return out
        row_of = np.repeat(np.arange(len(rows), dtype=np.int64), win)
        base = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum(win, out=base[1:])
        w = np.arange(total, dtype=np.int64) - base[row_of] + offsets[:-1][row_of]
        c0, c1, c2 = codes[w], codes[w + 1], codes[w + 2]
        k3 = (c0 << np.uint64(42)) | (c1 << np.uint64(21)) | c2
        hit3, v = lookup(tk, tv, k3)
        miss = ~hit3
        if miss.any():
            k2 = (c0[miss] << np.uint64(21)) | c1[miss]
            hit2, v2 = lookup(bk, bv, k2)
            vm = np.where(hit2, v2, 0.0)
            m2 = ~hit2
            if m2.any():
                hitu, vu = lookup(uk, uv, c2[miss][m2])
                vm[m2] = np.where(hitu, vu, self.oov_lp)
            v = np.where(miss, 0.0, v)
            v[miss] = vm
        sums = np.bincount(row_of, weights=v, minlength=len(rows))
        nz = n3 > 0
        for i in np.nonzero(nz)[0]:
            out[i] = math.exp(-sums[i] / int(n3[i]))
        return out


class PerplexityActor:
    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        # Real-model swap-in (north_rule names KenLM): when
        # cfg.extra["kenlm_model_paths"] = {lang: path} is set, those
        # binary LMs load here — once per actor — and score their langs;
        # unlisted langs keep the embedded CharLM.  Hard import on a
        # configured path: never silently fall back to the toy model.
        self._kenlm: dict = {}
        km_paths = (self.cfg.extra or {}).get("kenlm_model_paths") or {}
        if km_paths:
            import kenlm

            self._kenlm = {lang: kenlm.Model(p) for lang, p in km_paths.items()}
        self.models = {lang: CharLM(seed) for lang, seed in _SEEDS.items()}
        self.fallback = CharLM(" ".join(_SEEDS.values()))
        # ARPA model files (functions/arpa.py): the in-container realization
        # of "models loaded once per actor from shared storage" — a
        # distributed-trained CharLM serialized to standard ARPA loads here
        # and scores bit-identically to the in-memory model.  Missing path =
        # loud FileNotFoundError, same contract as the kenlm hook.
        arpa_paths = (self.cfg.extra or {}).get("arpa_model_paths") or {}
        if arpa_paths:
            from ..functions.arpa import read_arpa

            for lang, p in arpa_paths.items():
                lm = read_arpa(p)
                if lang == "*":
                    self.fallback = lm
                else:
                    self.models[lang] = lm

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.cfg.text_col).to_pylist()
        langs = (
            batch.column("lang").to_pylist()
            if "lang" in batch.column_names
            else [""] * len(texts)
        )
        # score only surviving rows (mirrors the scrub stage's keep gate);
        # dropped rows get inf — their score is never consumed
        keeps = (
            batch.column("keep").to_pylist()
            if "keep" in batch.column_names and not self.cfg.scrub_dropped
            else [True] * len(texts)
        )
        import numpy as np

        ppls = np.full(len(texts), np.inf, dtype=np.float64)
        # group surviving rows by scoring model → one batch-kernel call per
        # model (the per-row dict-probe loop was the single largest engine
        # stage at ~37 us/row; the kernel is bit-identical, property-tested)
        groups: dict[int, tuple] = {}
        for i, (text, lang, keep) in enumerate(zip(texts, langs, keeps)):
            if not keep:
                continue
            km = self._kenlm.get(lang)
            if km is not None:
                # kenlm scores log10 per word; convert to per-word perplexity
                words = max(len((text or "").split()), 1)
                ppls[i] = 10.0 ** (-km.score(text or "") / words)
                continue
            lm = self.models.get(lang, self.fallback)
            ent = groups.setdefault(id(lm), (lm, []))
            ent[1].append(i)
        for lm, idxs in groups.values():
            ppls[np.asarray(idxs, dtype=np.int64)] = lm.perplexity_batch(
                [texts[i] or "" for i in idxs]
            )
        return batch.append_column(
            "ppl", pa.array(ppls.astype(np.float32), pa.float32())
        )


_PROCESS_LM: "PerplexityActor | None" = None


def _perplexity_fused(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Task-pool variant: the model bank is a module-level singleton built
    once per WORKER PROCESS (Ray reuses workers across tasks, so this has
    actor-pool amortization without forcing the payload blocks through a
    separate pool boundary — measured 2x end-to-end on the flagship, see
    BASELINE.md).  Use the ActorPool variant (cfg.perplexity_actor_pool)
    when the models are too large to replicate per worker."""
    global _PROCESS_LM
    if _PROCESS_LM is None:
        _PROCESS_LM = PerplexityActor(cfg)
    return _PROCESS_LM(batch)


def _adaptive_pool(requested) -> int | tuple[int, int]:
    """Clamp a MODEL pool's requested size to the session's CPU budget (a
    fixed pool larger than the session would wait forever for actor slots;
    leave ~3/4 of the cpus to the task stages).  Every remaining caller
    holds per-actor MODEL state (perplexity/ARPA bank, the langid file
    model, NB/linear/DSIR scorers, tokenizer encoders), so the caller's
    requested size is a MEMORY bound and is respected, never silently
    raised — each extra actor is another model copy (round-5 review
    finding; a mid-round revision let these grow to cpus/2).  The round-4
    pool-starvation finding applied to the stateless decode stages, which
    now run as task maps (stages/taskmap.py) and no longer pass through
    here.  An explicit tuple passes through untouched."""
    if isinstance(requested, tuple):
        return requested
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", requested * 4))
    except Exception:
        cpus = requested * 4
    return max(1, min(int(requested), cpus // 4 if cpus >= 4 else 1))


def _adaptive_tasks(requested) -> int:
    """Task-map concurrency cap: tasks don't reserve slots or hold model
    state, so the cap can sit at half the session regardless of the
    requested pool size — the scheduler fills whatever is free."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", requested * 4))
    except Exception:
        cpus = requested * 4
    return max(int(requested), 1, cpus // 2)


def perplexity_stage(ds, cfg: PipelineConfig):
    if not cfg.perplexity_actor_pool:
        return ds.map_batches(
            lambda b: _perplexity_fused(b, cfg),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
        )
    return ds.map_batches(
        PerplexityActor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
        concurrency=_adaptive_pool(cfg.perplexity_concurrency),
        num_cpus=1,
    )
