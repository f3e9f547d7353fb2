"""Language-ID stage — vectorized cascade + rare-branch classifier.

The cascade of /root/reference/lang.go:274-358 runs fully vectorized over the
batch via the ``clean_for_lang_counts`` codepoint kernel (one decode pass per
batch).  Only the rows that reach the "lingua" branches (latin-with-diacritics
or non-Latin-non-CJK — a small minority on real corpora) fall back to the
per-row deterministic classifiers, mirroring how the reference only builds
its lingua detector on those branches (lang.go:335, 349).

``batch_detect_lang`` must agree row-for-row with
``functions.langid.detect_lang`` — property-tested in tests/test_stages.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions import langid, textnorm, vectext
from ..functions.maps import CHARSET_LANG_MAP

_CLASSES = [
    "han", "ja_kana", "ascii_alpha", "latin1_supp",
    "arabic", "cyrillic", "devanagari", "hangul",
]


def batch_detect_lang(texts: list, charsets: list | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized detect_lang over a batch → (langs, positions) object arrays."""
    m = len(texts)
    langs = np.full(m, "", dtype=object)
    poss = np.full(m, "", dtype=object)
    decided = np.zeros(m, dtype=bool)

    # 1. charset → lang shortcut (lang.go:133-139)
    if charsets is not None:
        for i, cs in enumerate(charsets):
            hit = CHARSET_LANG_MAP.get(cs or "")
            if hit:
                langs[i] = hit
                poss[i] = langid.LANG_POS_CHARSET
                decided[i] = True
        # rows with non-UTF charset and no map hit never reach body analysis
        # (lang.go:158: strings.HasPrefix(charset, "UTF"))
        non_utf = np.array(
            [not (cs or "").startswith("UTF") for cs in charsets], dtype=bool
        )
        decided |= non_utf

    cc = vectext.clean_for_lang_counts(texts, _CLASSES, langid.BODY_CHUNK_SIZE)
    n = cc["_len"].astype(np.float64)
    ok_len = cc["_len"] >= langid.BODY_MIN_SIZE
    safe_n = np.where(n > 0, n, 1.0)

    # 2. Han branch (lang.go:297-320)
    han = cc["han"].astype(np.float64)
    han_branch = ~decided & ok_len & (han > 0) & (han / safe_n >= 0.3)
    ja_branch = han_branch & (cc["ja_kana"] > 0) & (
        cc["ja_kana"].astype(np.float64) / np.where(han > 0, han, 1.0) > 0.1
    )
    langs[ja_branch] = "ja"
    langs[han_branch & ~ja_branch] = "zh"
    poss[han_branch] = langid.LANG_POS_BODY
    decided |= han_branch

    # 3. English/Latin branch (lang.go:322-346)
    en = cc["ascii_alpha"].astype(np.float64)
    en_branch = ~decided & ok_len & (en > 0) & (en / safe_n > 0.618)
    latin_branch = en_branch & (cc["latin1_supp"] > 5)
    for i in np.nonzero(latin_branch)[0]:
        cleaned = textnorm.clean_for_lang(texts[i] or "", langid.BODY_CHUNK_SIZE)
        langs[i] = langid.classify_latin(cleaned)
        poss[i] = langid.LANG_POS_LINGUA
    plain_en = en_branch & ~latin_branch
    langs[plain_en] = "en"
    poss[plain_en] = langid.LANG_POS_BODY
    decided |= en_branch

    # 4. non-Latin scripts (lang.go:348-355) — argmax over script counts with
    # classify_nonlatin's strict-> ordering (first max wins, all-zero → "")
    rest = ~decided & ok_len
    if rest.any():
        stack = np.stack(
            [cc["arabic"], cc["cyrillic"], cc["devanagari"], cc["hangul"]]
        )  # order matches langid._NONLATIN_SCRIPTS
        best = np.argmax(stack, axis=0)
        best_cnt = np.max(stack, axis=0)
        codes = np.array(["ar", "ru", "hi", "ko"], dtype=object)
        hit = rest & (best_cnt > 0)
        langs[hit] = codes[best[hit]]
        poss[hit] = langid.LANG_POS_LINGUA

    return langs, poss


def _langid_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    texts = batch.column(cfg.text_col).to_pylist()
    charsets = (
        batch.column("charset").to_pylist() if "charset" in batch.column_names else None
    )
    langs, poss = batch_detect_lang(texts, charsets)
    batch = batch.append_column("lang", pa.array(langs, pa.string()))
    return batch.append_column("lang_pos", pa.array(poss, pa.string()))


def langid_stage(ds, cfg: PipelineConfig):
    return ds.map_batches(
        lambda b: _langid_batch(b, cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )


class LangIdModelActor:
    """Stateful n-gram language-ID model stage (the fastText-lid analog of
    SURVEY.md §2.3 A1; the reference builds its lingua detector per call at
    lang.go:335/349 — a known inefficiency the actor pool removes).

    ``__init__`` builds character-trigram profiles once per actor from the
    embedded seed corpora; ``__call__`` scores only rows whose heuristic
    decision is empty or 'lingua' (the model-refinement set) and writes
    ``lang_model`` + ``lang_conf`` columns.  Used by pipelines that want a
    confidence column next to the heuristic decision.
    """

    _SEEDS = {
        "fr": "le gouvernement a annoncé une série de mesures pour améliorer la qualité de l'air dans les grandes villes et les représentants des associations ont salué cette décision très attendue",
        "de": "die regierung hat heute eine reihe von maßnahmen zur verbesserung der luftqualität in den städten angekündigt und die vertreter der verbände begrüßten diese entscheidung",
        "es": "el gobierno anunció hoy una serie de medidas para mejorar la calidad del aire en las grandes ciudades y los representantes de las asociaciones celebraron esta decisión",
        "pt": "o governo anunciou hoje uma série de medidas para melhorar a qualidade do ar nas grandes cidades e os representantes das associações saudaram esta decisão",
        "en": "the government announced today a series of measures to improve the air quality in the big cities and the representatives of the associations welcomed this decision",
        "ru": "правительство объявило сегодня о новых мерах по улучшению качества воздуха в крупных городах страны и эксперты поддержали это решение",
        "ar": "أعلنت الحكومة اليوم عن مجموعة من الإجراءات الجديدة لتحسين جودة الهواء في المدن الكبرى ورحب الخبراء بهذا القرار",
        "hi": "सरकार ने आज बड़े शहरों में वायु गुणवत्ता में सुधार के लिए नए उपायों की घोषणा की और विशेषज्ञों ने इस निर्णय का स्वागत किया",
        "ko": "정부는 오늘 대도시의 공기 질을 개선하기 위한 새로운 조치를 발표했으며 전문가들은 이 결정을 환영했다",
    }

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        # Real-model swap-in (north_rule names fastText lid.176): when
        # cfg.extra["fasttext_model_path"] is set, the model loads HERE —
        # once per actor, the whole point of the pool — and _score routes
        # through it.  The embedded trigram profiles stay the deterministic
        # default so tests/benches never depend on a model file.
        self._ft = None
        ft_path = (self.cfg.extra or {}).get("fasttext_model_path")
        if ft_path:
            # a configured path must not silently fall back to the toy
            # profiles: either loader raises loudly on a bad path/file.
            # The fasttext package is preferred when present; this
            # container ships without it, so the from-scratch reader of
            # the public .bin format (functions/fasttext_io.py) is the
            # in-sandbox realization of the models-from-file contract.
            # ``repo://`` paths resolve against THIS worker's checkout
            # (under `ray job submit --working-dir` every node unpacks
            # its own copy, so a driver-absolute path would 404 on
            # remote actors — round-5 review finding).
            ft_path = resolve_repo_path(ft_path)
            try:
                import fasttext
            except ImportError:
                from ..functions import fasttext_io as fasttext
            self._ft = fasttext.load_model(ft_path)
        trained = (self.cfg.extra or {}).get("langid_profiles")
        if trained:
            # corpus-trained profiles (stages/lm_train.train_langid_profiles)
            # replace the embedded seeds wholesale
            self.profiles = dict(trained)
            return
        self.profiles: dict[str, dict[str, float]] = {}
        for lang, seed in self._SEEDS.items():
            grams: dict[str, float] = {}
            s = f"  {seed}  "
            for j in range(len(s) - 2):
                g = s[j : j + 3]
                grams[g] = grams.get(g, 0.0) + 1.0
            total = sum(grams.values())
            self.profiles[lang] = {g: c / total for g, c in grams.items()}

    def _score(self, text: str) -> tuple[str, float]:
        if self._ft is not None:
            labels, probs = self._ft.predict(text.replace("\n", " ")[:512] or " ")
            if labels:
                return labels[0].replace("__label__", ""), float(probs[0])
            return "", 0.0
        s = f"  {text.lower()[:512]}  "
        grams = [s[j : j + 3] for j in range(len(s) - 2)]
        if not grams:
            return "", 0.0
        best_lang, best = "", 0.0
        for lang, prof in self.profiles.items():
            sc = sum(prof.get(g, 0.0) for g in grams) / len(grams)
            if sc > best:
                best_lang, best = lang, sc
        return best_lang, best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.cfg.text_col).to_pylist()
        poss = (
            batch.column("lang_pos").to_pylist()
            if "lang_pos" in batch.column_names
            else [""] * len(texts)
        )
        model_langs, confs = [], []
        for text, pos in zip(texts, poss):
            if pos in ("", "lingua"):
                lang, conf = self._score(text or "")
            else:
                lang, conf = "", 0.0
            model_langs.append(lang)
            confs.append(conf)
        batch = batch.append_column("lang_model", pa.array(model_langs, pa.string()))
        return batch.append_column("lang_conf", pa.array(confs, pa.float32()))


_REPO_PREFIX = "repo://"


def resolve_repo_path(path: str) -> str:
    """Resolve a ``repo://relative/path`` against the checkout that holds
    THIS process's spiderray package — on a multi-node `ray job submit
    --working-dir` run every worker unpacks its own copy at a different
    absolute location, so model paths must ship relative and resolve
    worker-side (absolute paths pass through untouched)."""
    import os

    if not path.startswith(_REPO_PREFIX):
        return path
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, *path[len(_REPO_PREFIX):].split("/"))


def default_lid_model_path() -> str | None:
    """The committed fastText-format lid fixture
    (fixtures/models/lid_tiny_ft.bin, rebuilt bit-identically by
    tools/make_lid_fixture.py) as a worker-resolvable ``repo://`` path, or
    None when the checkout has no fixtures.  q_langid_agreement routes its
    pool through this file by default — the ARPA-fixture precedent applied
    to the langid side, so every drive exercises the
    model-file-loaded-once-per-actor path."""
    rel = "repo://fixtures/models/lid_tiny_ft.bin"
    import os

    return rel if os.path.isfile(resolve_repo_path(rel)) else None


def langid_model_stage(ds, cfg: PipelineConfig):
    from .perplexity_stage import _adaptive_pool

    return ds.map_batches(
        LangIdModelActor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
        concurrency=_adaptive_pool(cfg.langid_concurrency),
        num_cpus=1,
    )
