"""fastText ``.bin`` model-file I/O — the public binary format, from scratch.

The north rule names a fastText language-ID model loaded once per actor
(BASELINE.json north_star; reference analog: the per-call lingua detector at
/root/reference/lang.go:335, 349).  The ``fasttext`` Python package is not
installed in this container and there is no network to fetch ``lid.176.ftz``,
so this module implements the documented file format itself — reader, writer
and the supervised prediction rule — against the PUBLIC format of
facebookresearch/fastText v0.9.x (fasttext.cc ``saveModel``/``loadModel``,
args.cc ``Args::save``, dictionary.cc ``Dictionary::save``, densematrix.cc
``DenseMatrix::save``):

    int32  magic = 793712314          (FASTTEXT_FILEFORMAT_MAGIC_INT32)
    int32  version = 12
    Args   dim ws epoch minCount neg wordNgrams loss model bucket minn maxn
           lrUpdateRate (int32 each), t (float64)
    Dict   int32 size, int32 nwords, int32 nlabels, int64 ntokens,
           int64 pruneidx_size; per entry: utf-8 word + NUL, int64 count,
           int8 type (0=word, 1=label); pruneidx pairs (int32,int32) when
           pruneidx_size > 0
    int8   quant flag (0 = dense input matrix)
    Mat    int64 rows, int64 cols, float32 data row-major (input)
    int8   qout flag (0)
    Mat    output matrix, same layout

Scope: dense supervised models with ``minn == maxn == 0`` and
``wordNgrams == 1`` (no char-ngram buckets, no product quantization, no
hierarchical softmax) — the subset the hermetic fixture exercises.  Anything
else raises loudly; nothing falls back silently.  Prediction follows the
supervised softmax rule: whitespace tokens + EOS, unknown words skipped
(no subwords at maxn=0), hidden = mean of input rows, scores = output @
hidden, softmax, top-k — fasttext.cc ``predict`` / model.cc.

A real ``lid.176.bin`` uses char-ngram buckets (minn=2, maxn=4) and would hit
the NotImplementedError guards below; extending to buckets needs only the
FNV-ish ngram hash and is documented at the guard site.  The load-once-per-
actor plumbing (the part that matters at 10^12-clip scale) is identical
either way.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

FASTTEXT_MAGIC = 793712314
FASTTEXT_VERSION = 12

# enum values from args.h
LOSS_HS, LOSS_NS, LOSS_SOFTMAX, LOSS_OVA = 1, 2, 3, 4
MODEL_CBOW, MODEL_SG, MODEL_SUP = 1, 2, 3

EOS = "</s>"
LABEL_PREFIX = "__label__"

_ARGS_FIELDS = ("dim", "ws", "epoch", "min_count", "neg", "word_ngrams",
                "loss", "model", "bucket", "minn", "maxn", "lr_update_rate")


@dataclass
class FastTextModel:
    """A loaded dense supervised model (see module docstring for scope)."""

    args: dict
    words: list[str]
    labels: list[str]
    counts: list[int]
    input: np.ndarray    # (nwords, dim) float32
    output: np.ndarray   # (nlabels, dim) float32
    _word_id: dict = field(default_factory=dict, repr=False)

    def __post_init__(self):
        self._word_id = {w: i for i, w in enumerate(self.words)}

    def predict(self, text: str, k: int = 1):
        """fastText-API-shaped top-k: returns (labels tuple, probs array).
        Supervised softmax rule over known-word mean (unknown words skipped
        — at maxn=0 they contribute no subwords either)."""
        ids = [self._word_id[t] for t in (text.split() + [EOS])
               if t in self._word_id]
        if not ids:
            return (), np.zeros(0, dtype=np.float64)
        hidden = self.input[np.asarray(ids, dtype=np.int64)].mean(
            axis=0, dtype=np.float64)
        scores = self.output.astype(np.float64) @ hidden
        scores -= scores.max()
        e = np.exp(scores)
        probs = e / e.sum()
        order = np.argsort(-probs, kind="stable")[:k]
        return (tuple(self.labels[i] for i in order),
                probs[order])


def write_fasttext_bin(path: str, *, words: list[str], counts: list[int],
                       labels: list[str], label_counts: list[int],
                       input_mat: np.ndarray, output_mat: np.ndarray) -> None:
    """Serialize a dense supervised model in the public .bin layout (format
    details in the module docstring).  ``input_mat`` is (nwords, dim),
    ``output_mat`` (nlabels, dim)."""
    dim = int(input_mat.shape[1])
    if output_mat.shape != (len(labels), dim):
        raise ValueError(f"output shape {output_mat.shape} != "
                         f"({len(labels)}, {dim})")
    if input_mat.shape[0] != len(words):
        raise ValueError("input rows != nwords")
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, FASTTEXT_VERSION))
        f.write(struct.pack(
            "<12id", dim, 5, 5, 1, 5, 1, LOSS_SOFTMAX, MODEL_SUP,
            0, 0, 0, 100, 1e-4))
        ntokens = sum(counts) + sum(label_counts)
        f.write(struct.pack("<iiiqq", len(words) + len(labels), len(words),
                            len(labels), ntokens, -1))
        for w, c in zip(words, counts):
            f.write(w.encode("utf-8") + b"\0" + struct.pack("<qb", c, 0))
        for lb, c in zip(labels, label_counts):
            f.write(lb.encode("utf-8") + b"\0" + struct.pack("<qb", c, 1))
        f.write(struct.pack("<b", 0))  # quant flag
        f.write(struct.pack("<qq", *input_mat.shape))
        f.write(np.ascontiguousarray(input_mat, dtype="<f4").tobytes())
        f.write(struct.pack("<b", 0))  # qout flag
        f.write(struct.pack("<qq", *output_mat.shape))
        f.write(np.ascontiguousarray(output_mat, dtype="<f4").tobytes())


def load_model(path: str) -> FastTextModel:
    """Parse a .bin file (module-docstring layout).  Loud on anything
    outside the dense supervised subset."""
    with open(path, "rb") as f:
        data = f.read()
    off = 0

    def take(fmt):
        nonlocal off
        vals = struct.unpack_from(fmt, data, off)
        off += struct.calcsize(fmt)
        return vals

    magic, version = take("<ii")
    if magic != FASTTEXT_MAGIC:
        raise ValueError(
            f"{path}: not a fastText model (magic {magic}); note .ftz "
            "(quantized) models start with the same magic but set the "
            "quant flag — see below")
    if version > FASTTEXT_VERSION:
        raise ValueError(f"{path}: unsupported format version {version}")
    args = dict(zip(_ARGS_FIELDS, take("<12i")))
    args["t"] = take("<d")[0]
    if args["model"] != MODEL_SUP:
        raise NotImplementedError(
            f"{path}: model type {args['model']} (only supervised)")
    if args["minn"] > 0 or args["maxn"] > 0 or args["bucket"] > 0:
        raise NotImplementedError(
            f"{path}: char-ngram buckets (minn={args['minn']}, "
            f"maxn={args['maxn']}, bucket={args['bucket']}) not implemented "
            "— a real lid.176.bin needs the FNV ngram hash of "
            "dictionary.cc computeSubwords")
    size, nwords, nlabels = take("<iii")
    ntokens, pruneidx_size = take("<qq")
    if pruneidx_size > 0:
        raise NotImplementedError(f"{path}: pruned vocabulary")
    words, labels, counts, label_counts = [], [], [], []
    for _ in range(size):
        end = data.index(b"\0", off)
        word = data[off:end].decode("utf-8")
        off = end + 1
        count, etype = take("<qb")
        if etype == 0:
            words.append(word)
            counts.append(count)
        else:
            labels.append(word)
            label_counts.append(count)
    if len(words) != nwords or len(labels) != nlabels:
        raise ValueError(f"{path}: dictionary counts disagree with header")
    (quant,) = take("<b")
    if quant:
        raise NotImplementedError(f"{path}: quantized (.ftz) input matrix")
    m, n = take("<qq")
    if m != nwords or n != args["dim"]:
        raise ValueError(f"{path}: input matrix {m}x{n} != "
                         f"{nwords}x{args['dim']}")
    input_mat = np.frombuffer(data, dtype="<f4", count=m * n,
                              offset=off).reshape(m, n).copy()
    off += 4 * m * n
    (qout,) = take("<b")
    if qout:
        raise NotImplementedError(f"{path}: quantized output matrix")
    m2, n2 = take("<qq")
    if m2 != nlabels or n2 != args["dim"]:
        raise ValueError(f"{path}: output matrix {m2}x{n2} != "
                         f"{nlabels}x{args['dim']}")
    output_mat = np.frombuffer(data, dtype="<f4", count=m2 * n2,
                               offset=off).reshape(m2, n2).copy()
    off += 4 * m2 * n2
    if off != len(data):
        raise ValueError(f"{path}: {len(data) - off} trailing bytes")
    return FastTextModel(args=args, words=words, labels=labels,
                         counts=counts, input=input_mat, output=output_mat)


def build_lid_model(seeds: dict[str, str], scale: float = 5.0
                    ) -> tuple[dict, np.ndarray, np.ndarray, list, list]:
    """Deterministic hermetic lid model from per-language seed corpora:
    each word's input vector is the normalized one-hot average of the
    languages whose seed contains it; output = scale * I sharpens the
    softmax.  Returns (word->row index data) ready for write_fasttext_bin.
    No RNG, no training loop — partition-irrelevant, bit-stable."""
    langs = list(seeds)
    word_langs: dict[str, list[int]] = {}
    word_count: dict[str, int] = {}
    for li, (lang, seed) in enumerate(seeds.items()):
        for w in seed.lower().split():
            word_langs.setdefault(w, [])
            if li not in word_langs[w]:
                word_langs[w].append(li)
            word_count[w] = word_count.get(w, 0) + 1
    words = list(word_langs) + [EOS]
    counts = [word_count[w] for w in word_langs] + [len(langs)]
    dim = len(langs)
    input_mat = np.zeros((len(words), dim), dtype=np.float32)
    for i, w in enumerate(words[:-1]):
        ls = word_langs[w]
        input_mat[i, ls] = np.float32(1.0 / len(ls))
    # EOS row stays zero: present in every sentence, informative in none
    output_mat = (scale * np.eye(dim)).astype(np.float32)
    labels = [LABEL_PREFIX + lang for lang in langs]
    label_counts = [1] * len(labels)
    return ({"words": words, "counts": counts, "labels": labels,
             "label_counts": label_counts},
            input_mat, output_mat, words, labels)
