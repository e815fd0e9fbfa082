"""Training-data pipeline operators over document / embedding tables.

Beyond the reference's probabilistic-filter surface (guava-probably exposes
membership sketches only — see SURVEY.md §2), a 100 TB curation pipeline needs
dedup, similarity search, text analysis and multimodal plumbing. These are
first-class operators here, built Spark-first:

- ``dedup``      — exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard
- ``components`` — connected components over near-dup pairs + canonical pick
- ``sampling``   — deterministic hash-rank samples / stratified / splits
- ``packing``    — exact distributed prefix sum + context-window packing
- ``similarity`` — brute-force cosine top-k, random-hyperplane LSH ANN
- ``textops``    — language-ID heuristic, quality scoring, token counting,
                   rolling-hash fingerprinting
- ``multimodal`` — opaque binary columns + mapInPandas decode/feature plumbing
- ``textexpr``   — dual-dialect (Spark SQL / DuckDB) expression builders so
                   every operator has a bit-exact DuckDB oracle
"""

from guava_probably_spark.pipeline import textexpr
from guava_probably_spark.pipeline.components import (
    connected_components,
    keep_canonical,
)
from guava_probably_spark.pipeline.dedup import (
    banding_drop_stats,
    exact_dedup,
    exact_jaccard_pairs,
    lsh_candidate_pairs,
    lsh_drop_stats,
    minhash_signatures,
    shingle_df,
    simhash_df,
    simhash_drop_stats,
    simhash_near_pairs,
)
from guava_probably_spark.pipeline.wmh import (
    neardup_pairs_wminhash,
    trigram_counts_df,
    weighted_jaccard_pairs,
    wmh_band_keys,
    wmh_signatures_text,
)
from guava_probably_spark.pipeline.sampling import (
    hash_sample,
    hash_split,
    hash_threshold_sample,
    interleave_sources,
    priority_sample,
    priority_sample_sql_duck,
    stratified_sample,
    temperature_sample,
    temperature_sample_sql_duck,
    temperature_thresholds,
    temperature_weights,
    weighted_sample,
)
from guava_probably_spark.pipeline.classifier import (
    featurize,
    logreg_fit,
    logreg_score,
    quality_classifier_scores,
)
from guava_probably_spark.pipeline.contamination import flag_contaminated
from guava_probably_spark.pipeline.packing import (
    concat_group_texts,
    pack_sequences,
    prefix_sum,
)
from guava_probably_spark.pipeline.multimodal import (
    decode_image,
    decode_resize_features,
    extract_binary_features,
    frame_sample,
    resize_image,
    with_payload,
)
from guava_probably_spark.pipeline.ivf import assign_lists, ivf_topk, train_codebook
from guava_probably_spark.pipeline.kmeans import (
    assign_clusters,
    kmeans_fit,
    semantic_dedup,
    semantic_dedup_pairs,
    semantic_drop_stats,
)
from guava_probably_spark.pipeline.similarity import (
    cosine_drop_stats,
    cosine_neardup_pairs,
    cosine_topk,
    hyperplane_signatures,
)
from guava_probably_spark.pipeline.textops import (
    gopher_quality_df,
    langid_df,
    ngram_repetition_df,
    quality_df,
    redact_df,
    remove_boilerplate_lines,
    rolling_fingerprint_df,
    token_counts_df,
    vocab_topk,
    word_repetition_df,
)

__all__ = [
    "textexpr",
    "connected_components",
    "keep_canonical",
    "hash_sample",
    "hash_split",
    "hash_threshold_sample",
    "stratified_sample",
    "prefix_sum",
    "pack_sequences",
    "concat_group_texts",
    "flag_contaminated",
    "weighted_sample",
    "priority_sample",
    "priority_sample_sql_duck",
    "interleave_sources",
    "redact_df",
    "word_repetition_df",
    "vocab_topk",
    "resize_image",
    "frame_sample",
    "decode_resize_features",
    "exact_dedup",
    "exact_jaccard_pairs",
    "banding_drop_stats",
    "lsh_candidate_pairs",
    "lsh_drop_stats",
    "minhash_signatures",
    "shingle_df",
    "simhash_df",
    "simhash_drop_stats",
    "simhash_near_pairs",
    "neardup_pairs_wminhash",
    "trigram_counts_df",
    "weighted_jaccard_pairs",
    "wmh_band_keys",
    "wmh_signatures_text",
    "assign_lists",
    "ivf_topk",
    "train_codebook",
    "assign_clusters",
    "kmeans_fit",
    "semantic_dedup",
    "semantic_dedup_pairs",
    "semantic_drop_stats",
    "cosine_drop_stats",
    "cosine_neardup_pairs",
    "cosine_topk",
    "hyperplane_signatures",
    "gopher_quality_df",
    "langid_df",
    "ngram_repetition_df",
    "featurize",
    "logreg_fit",
    "logreg_score",
    "quality_classifier_scores",
    "quality_df",
    "remove_boilerplate_lines",
    "rolling_fingerprint_df",
    "temperature_sample",
    "temperature_sample_sql_duck",
    "temperature_thresholds",
    "temperature_weights",
    "token_counts_df",
    "with_payload",
    "extract_binary_features",
    "decode_image",
]
