"""Operator surface: one import for every documented DataFrame operator."""

from .aggregate import (
    aggregate_by_host,
    aggregate_by_status_bucket,
    aggregate_by_window,
)
from .asof import asof_join
from .cluster import connected_components, duplicate_clusters
from .dedup import (
    embedding_near_dup_pairs,
    exact_dedup_keep_first,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    with_minhash,
    with_simhash,
)
from .enrich import enrich, normalize_lang
from .multimodal import extract_stub_features, frame_sample_stub, resize_stub
from .parse import narrow, parse_stage
from .route import malformed_count, route, sink_counts
from .sketch import (
    cms_counter_table,
    cms_estimate,
    cms_heavy_hitters,
    cms_merge_counters,
    histogram_merge,
    histogram_quantiles,
    histogram_table,
    hll_distinct,
    hll_estimate,
    hll_merge_registers,
    hll_register_table,
)
from .sample import (
    hash_sample,
    stratified_hash_sample,
    top_k_by_hash,
)
from .similarity import (
    cosine_to,
    ivf_assign,
    ivf_topk_cosine,
    lsh_topk_cosine,
    topk_cosine,
    with_lsh_bucket,
)
from .text import (
    with_bpe_token_count,
    with_fingerprint,
    with_lang_guess,
    with_quality_score,
    with_token_count,
)

__all__ = [
    "asof_join",
    "aggregate_by_host", "aggregate_by_status_bucket", "aggregate_by_window",
    "connected_components", "duplicate_clusters",
    "embedding_near_dup_pairs", "exact_dedup_keep_first",
    "minhash_lsh_candidates", "ngram_jaccard_pairs", "simhash_near_pairs",
    "with_minhash", "with_simhash",
    "enrich", "normalize_lang",
    "extract_stub_features", "frame_sample_stub", "resize_stub",
    "narrow", "parse_stage",
    "malformed_count", "route", "sink_counts",
    "hash_sample", "stratified_hash_sample", "top_k_by_hash",
    "cms_counter_table", "cms_estimate", "cms_heavy_hitters",
    "cms_merge_counters",
    "histogram_merge", "histogram_quantiles", "histogram_table",
    "hll_distinct", "hll_estimate", "hll_merge_registers",
    "hll_register_table",
    "cosine_to", "ivf_assign", "ivf_topk_cosine", "lsh_topk_cosine",
    "topk_cosine", "with_lsh_bucket",
    "with_bpe_token_count", "with_fingerprint", "with_lang_guess",
    "with_quality_score", "with_token_count",
]
