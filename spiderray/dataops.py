"""Training-data operations façade — one import surface for the corpus
tooling that goes beyond the reference's crawler semantics:

    from spiderray.dataops import (
        exact_dedup, incremental_exact_dedup, minhash_lsh_pairs,
        simhash_pairs, ngram_jaccard_pairs, embedding_near_dup_pairs,
        chunk_dedup_stats, brute_force_topk, lsh_topk, ivf_train, ivf_topk,
        train_test_split, stratified_sample, quantiles_exact,
        grouped_quantiles_exact, top_k_per_group, hash_join, bucketed_join,
        salted_join, sessionize, tumbling, sliding, train_char_lm,
        train_langid_profiles, prepare_corpus, corpus_summary,
        write_split_corpus, BloomFilter,
    )

Every callable takes/returns ``ray.data.Dataset`` (or plain values for the
trainers) and is individually documented at its definition site.
"""

from .functions.bloom import BloomFilter
from .pipelines.prepare_corpus import corpus_summary, prepare_corpus, write_split_corpus
from .stages.ann import brute_force_topk, ivf_assign, ivf_topk, ivf_train, lsh_topk
from .stages.dedup import (
    chunk_dedup_stats,
    embedding_near_dup_lsh,
    embedding_near_dup_pairs,
    exact_dedup,
    incremental_exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .stages.joins import bucketed_join, hash_join, salted_join
from .stages.lm_train import train_char_lm, train_langid_profiles
from .stages.stats import (
    grouped_quantiles_exact,
    quantiles_exact,
    stratified_sample,
    top_k_per_group,
    train_test_split,
)
from .stages.image import frame_sample_stage, image_features_stage
from .stages.multimodal import (
    audio_features_stage,
    audio_gate_stage,
    audio_spectral_stage,
    audio_transform_stage,
    speech_rate_stage,
    vad_stats_stage,
)
from .stages.windows import sessionize, sliding, tumbling

__all__ = [
    "BloomFilter", "brute_force_topk", "bucketed_join", "chunk_dedup_stats",
    "corpus_summary", "embedding_near_dup_lsh", "embedding_near_dup_pairs",
    "exact_dedup", "grouped_quantiles_exact", "hash_join",
    "incremental_exact_dedup", "ivf_assign", "ivf_topk", "ivf_train",
    "lsh_topk", "minhash_lsh_pairs", "ngram_jaccard_pairs", "prepare_corpus",
    "quantiles_exact", "salted_join", "sessionize", "simhash_pairs",
    "sliding", "stratified_sample", "top_k_per_group", "train_char_lm",
    "train_langid_profiles", "train_test_split", "tumbling",
    "write_split_corpus",
    # multimodal stages
    "audio_features_stage", "audio_gate_stage", "audio_spectral_stage",
    "audio_transform_stage", "frame_sample_stage", "image_features_stage",
    "speech_rate_stage", "vad_stats_stage",
]
