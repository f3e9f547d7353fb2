"""Training-data operations façade — one import surface for the corpus
tooling that goes beyond the reference's crawler semantics:

    from spiderray.dataops import (
        exact_dedup, incremental_exact_dedup, minhash_lsh_pairs,
        simhash_pairs, ngram_jaccard_pairs, embedding_near_dup_pairs,
        semantic_dedup, decontaminate, chunk_dedup_stats,
        brute_force_topk, lsh_topk, ivf_train, ivf_topk,
        kmeans_fit_distributed, kmeans_assign, bm25_topk, term_doc_freqs,
        train_test_split, stratified_sample, quantiles_exact,
        quantiles_approx, grouped_quantiles_exact, top_k_per_group,
        hash_join, bucketed_join, salted_join, asof_join, range_join,
        sessionize, tumbling, sliding, window_functions, train_char_lm,
        train_langid_profiles, prepare_corpus, corpus_summary,
        write_split_corpus, BloomFilter,
    )

Every callable takes/returns ``ray.data.Dataset`` (or plain values for the
trainers) and is individually documented at its definition site.
"""

from .functions.arpa import quantize_lm, read_arpa, write_arpa
from .functions.bloom import BloomFilter
from .pipelines.prepare_corpus import corpus_summary, prepare_corpus, write_split_corpus
from .stages.ann import (ann_recall, batch_topk, brute_force_topk,
                         ivf_assign, ivf_topk, ivf_train, lsh_topk,
                         mmr_topk, pq_topk, pq_train, smallest_id_vectors)
from .stages.dedup import (
    apply_deletions,
    chunk_dedup_stats,
    decontaminate,
    dup_connected_components,
    embedding_near_dup_lsh,
    embedding_near_dup_pairs,
    exact_dedup,
    incremental_exact_dedup,
    minhash_lsh_pairs,
    near_dedup,
    near_dedup_best,
    ngram_jaccard_pairs,
    prototype_prune,
    semantic_dedup,
    simhash_pairs,
)
from .stages.ann import kmeans_assign, kmeans_fit_distributed
from .stages.joins import (asof_join, broadcast_join, bucketed_join,
                           hash_join, range_join, salted_join)
from .stages.lm_train import train_char_lm, train_langid_profiles
from .stages.stats import (
    grouped_outliers,
    grouped_quantiles_approx,
    grouped_quantiles_exact,
    heavy_hitters,
    profile_columns,
    quantiles_approx,
    quantiles_exact,
    stratified_sample,
    temperature_resample,
    top_k_per_group,
    train_test_split,
)
from .stages.graph import hits_int, pagerank_int
from .stages.windows import global_scan, pack_chunks
from .stages.textindex import bm25_topk, corpus_token_stats, term_doc_freqs
from .stages.image import frame_sample_stage, image_features_stage
from .stages.multimodal import (
    audio_augment_stage,
    audio_features_stage,
    audio_gate_stage,
    audio_spectral_stage,
    audio_transform_stage,
    speech_rate_stage,
    vad_segment_stage,
    vad_stats_stage,
    window_chunk_stage,
)
from .stages.quality_stage import compression_stage
from .stages.bpe_train import bpe_encode_stage, corpus_word_freqs, train_bpe
from .stages.nbayes import NaiveBayesModel, nb_predict_stage, train_naive_bayes
from .stages.dsir import (
    corpus_bucket_counts,
    dsir_score_stage,
    dsir_select,
    log_ratio_vector,
)
from .stages.audiodedup import audio_fingerprint_pairs
from .stages.audioquality import (
    audio_defect_stage,
    audio_loudness_stage,
    audio_mfcc_stage,
    audio_snr_stage,
    mfcc_vector_batch,
)
from .stages.c4 import c4_filter_stage, c4_span_dedup
from .stages.quality_stage import (gopher_stage, lang_consistency_stats,
                                   readability_stage)
from .stages.windows import sessionize, sliding, tumbling, window_functions
from .functions.scrub import pseudonymize
from .functions.sketch import (cms_estimate, count_min_build,
                               grouped_count_distinct_approx)
from .functions.tdigest import td_build, td_merge, td_quantile
from .sources.wds import read_tar_shards, write_tar_shards
from .stages.audioquality import (
    grouped_cmvn,
    loudness_normalize_stage,
    silence_trim_stage,
    specaugment_stage,
)
from .stages.multimodal import (acoustic_augment_stage,
                                flac_transcode_stage, pitch_shift_stage,
                                speed_perturb_stage, time_stretch_stage)
from .stages.quarantine import quarantine_map_batches, read_quarantine
from .stages.stats import (
    bottomk_sample,
    grouped_quantile_buckets,
    tdigest_quantiles,
    tdigest_quantiles_keyed,
)
from .stages.substring_dedup import substring_dedup
from .stages.textindex import sliding_chunks
from .stages.multimodal import audio_corpus_report
from .stages.textnorm_stage import (fix_mojibake_stage,
                                    unicode_normalize_stage)
from .stages.unigram_train import (
    train_unigram,
    train_unigram_corpus,
    unigram_encode_stage,
)
from .functions.mp3parse import parse_mp3
from .pipelines.prepare_audio import prepare_audio_corpus
from .pipelines.prepare_speech import prepare_speech
from .sources.compact import compact_parquet, read_parquet_evolved
from .stages.audiodedup import audio_decontaminate
from .stages.expectations import (
    categorical_drift,
    validate_expectations,
    windowed_drift,
)
from .stages.c4 import (line_dedup_within_doc, paragraph_dedup,
                        paragraph_dedup_bloom)
from .stages.dedup import decontaminate_spans, embedding_decontaminate
from .stages.dedup import hamming64_pairs
from .stages.image import image_hash_stage, image_near_dup_pairs
from .stages.audioquality import (audio_bandwidth_stage,
                                  audio_channel_stage, audio_compress_stage,
                                  audio_denoise_stage,
                                  audio_hum_stage, audio_qc_stage,
                                  audio_reverb_stage, codec_sniff_stage)
from .sources.hive import read_hive_partitioned, write_hive_partitioned
from .sources.jsonl import read_jsonl_shards, write_jsonl_shards
from .stages.stats import (
    calibration_bins,
    canary_scan,
    grouped_rollup,
    rank_blend,
    classifier_auc,
    corpus_diff,
    grouped_linfit_outliers,
    term_drift,
    grouped_split,
    mixture_plan,
    threshold_sweep,
    unimax_plan,
    unimax_resample,
    weighted_sample,
)
from .stages.wordpiece_train import (train_wordpiece, wordpiece_encode_stage,
                                     wordpiece_fertility, wordpiece_vocab)
from .stages.textindex import (build_inverted_index, build_vocab,
                               hash_embed, lookup_postings, ngram_novelty,
                               vocab_coverage)
from .stages.windows import duration_bucket_batches, epoch_order, pack_bins

__all__ = [
    "BloomFilter", "asof_join", "bm25_topk", "bpe_encode_stage",
    "broadcast_join", "flac_transcode_stage", "grouped_rollup",
    "lang_consistency_stats", "rank_blend", "pseudonymize",
    "batch_topk", "ann_recall", "hash_embed", "count_min_build", "cms_estimate",
    "write_hive_partitioned", "read_hive_partitioned",
    "brute_force_topk",
    "bucketed_join", "c4_filter_stage", "c4_span_dedup",
    "corpus_bucket_counts", "corpus_word_freqs",
    "dsir_score_stage", "dsir_select", "log_ratio_vector",
    "chunk_dedup_stats", "corpus_summary",
    "corpus_token_stats", "decontaminate", "dup_connected_components",
    "embedding_near_dup_lsh",
    "embedding_near_dup_pairs", "exact_dedup", "gopher_stage",
    "grouped_quantiles_approx", "grouped_quantiles_exact",
    "hash_join", "incremental_exact_dedup", "ivf_assign", "ivf_topk",
    "ivf_train", "kmeans_assign", "kmeans_fit_distributed", "lsh_topk",
    "minhash_lsh_pairs", "NaiveBayesModel", "nb_predict_stage", "near_dedup", "near_dedup_best",
    "ngram_jaccard_pairs",
    "prepare_corpus",
    "quantiles_approx", "quantiles_exact", "quantize_lm", "range_join",
    "read_arpa", "salted_join",
    "prototype_prune", "mmr_topk", "smallest_id_vectors",
    "semantic_dedup", "sessionize", "simhash_pairs", "sliding", "stratified_sample",
    "term_doc_freqs", "top_k_per_group", "train_bpe", "train_char_lm",
    "train_naive_bayes",
    "train_langid_profiles", "train_test_split", "tumbling",
    "window_functions", "write_arpa", "write_split_corpus",
    "global_scan", "grouped_outliers", "heavy_hitters", "hits_int",
    "pack_chunks", "pagerank_int", "profile_columns",
    "temperature_resample",
    # multimodal stages
    "audio_features_stage", "audio_fingerprint_pairs", "audio_gate_stage",
    "audio_loudness_stage", "audio_mfcc_stage", "audio_snr_stage",
    "audio_spectral_stage",
    "audio_transform_stage", "frame_sample_stage", "image_features_stage",
    "mfcc_vector_batch", "speech_rate_stage", "vad_segment_stage",
    "vad_stats_stage", "audio_defect_stage", "audio_augment_stage",
    "window_chunk_stage", "compression_stage",
    # fifth continuation
    "acoustic_augment_stage", "bottomk_sample", "grouped_cmvn",
    "grouped_count_distinct_approx", "grouped_quantile_buckets",
    "loudness_normalize_stage", "quarantine_map_batches", "read_quarantine",
    "read_tar_shards", "silence_trim_stage", "sliding_chunks",
    "specaugment_stage", "speed_perturb_stage", "substring_dedup",
    "time_stretch_stage", "pitch_shift_stage", "embedding_decontaminate",
    "audio_denoise_stage", "audio_qc_stage", "prepare_speech",
    "readability_stage",
    "td_build", "td_merge", "td_quantile", "tdigest_quantiles",
    "tdigest_quantiles_keyed", "train_unigram", "train_unigram_corpus",
    "unigram_encode_stage", "write_tar_shards",
    "audio_decontaminate", "build_inverted_index", "categorical_drift",
    "compact_parquet", "duration_bucket_batches", "grouped_split",
    "lookup_postings", "parse_mp3", "prepare_audio_corpus",
    "validate_expectations", "windowed_drift", "epoch_order",
    "mixture_plan", "read_parquet_evolved", "apply_deletions",
    # round 4
    "unicode_normalize_stage", "fix_mojibake_stage", "canary_scan",
    "wordpiece_fertility", "line_dedup_within_doc", "audio_compress_stage",
    "audio_corpus_report", "corpus_diff",
    "weighted_sample",
    "paragraph_dedup", "paragraph_dedup_bloom", "decontaminate_spans", "hamming64_pairs", "image_hash_stage",
    "image_near_dup_pairs", "audio_bandwidth_stage", "threshold_sweep",
    "unimax_plan", "unimax_resample", "write_jsonl_shards",
    "read_jsonl_shards",
    # round 4, fourth wave
    "audio_hum_stage", "audio_reverb_stage", "pq_train", "pq_topk",
    "build_vocab", "vocab_coverage", "grouped_linfit_outliers",
    "train_wordpiece", "wordpiece_vocab", "wordpiece_encode_stage",
    "term_drift", "audio_channel_stage", "classifier_auc",
    "calibration_bins", "pack_bins", "codec_sniff_stage", "ngram_novelty",
]
