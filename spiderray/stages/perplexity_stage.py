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
        ppls = []
        for text, lang, keep in zip(texts, langs, keeps):
            if not keep:
                ppls.append(float("inf"))
                continue
            km = self._kenlm.get(lang)
            if km is not None:
                # kenlm scores log10 per word; convert to per-word perplexity
                words = max(len((text or "").split()), 1)
                ppls.append(10.0 ** (-km.score(text or "") / words))
                continue
            lm = self.models.get(lang, self.fallback)
            ppls.append(lm.perplexity(text or ""))
        return batch.append_column("ppl", pa.array(ppls, pa.float32()))


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
    """Clamp a fixed pool size to the session's CPU budget (a fixed pool
    larger than the session would wait forever for actor slots; leave ~3/4
    of the cpus to the task stages)."""
    if isinstance(requested, tuple):
        return requested
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", requested * 4))
    except Exception:
        cpus = requested * 4
    return max(1, min(int(requested), cpus // 4 if cpus >= 4 else 1))


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
