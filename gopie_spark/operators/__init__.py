"""Spark-side operator surface for gopie_spark."""

from gopie_spark.operators.dedup import (
    bucket_cap_stats,
    duplicate_stats,
    exact_dedup,
    incremental_minhash_dedup,
    incremental_simhash_dedup,
    minhash_lsh_candidates,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_candidates,
)
from gopie_spark.operators.decontaminate import (
    add_contamination_hits,
    build_eval_gram_filter,
    decontaminate,
    decontaminate_keep,
    ngram_strings,
)
from gopie_spark.operators.graph import connected_components
from gopie_spark.operators.hoststats import (
    canonical_url,
    extract_domain,
    extract_host,
    filter_blocklist,
    host_budget_sample,
    host_stats,
)
from gopie_spark.operators.membership import (
    bloom_shards_build,
    bloom_shards_filter,
)
from gopie_spark.operators.similarity import (
    brute_force_topk,
    build_ivf_index,
    build_lsh_index,
    lsh_topk_indexed,
    ivf_topk_indexed,
    ivf_probe_stats,
    cosine_dedup,
    cosine_dedup_pairs,
    ivf_topk,
    lsh_probe_stats,
    lsh_topk,
    probe_work_stats,
    train_ivf_centroids,
    train_pq_codebooks,
    pq_encode,
    pq_topk,
    build_pq_index,
    pq_topk_indexed,
    load_pq_codebooks,
)
from gopie_spark.operators.redact import (
    pii_counts,
    pii_stats,
    redact_pii,
    scrub,
)
from gopie_spark.operators.sampling import (
    hash_sample,
    hash_sample_fraction,
    mixture_sample,
    priority_sample,
    priority_threshold,
    stratified_hash_sample,
)
from gopie_spark.operators.sketch_agg import (
    build_partials,
    merge_partials,
    sketch_agg,
    global_sketch,
    hll_count_distinct,
    tdigest_quantiles,
    kll_quantiles,
    cms_build,
    cms_tokens_build,
    cms_estimate_map,
    bloom_build,
    bloom_filter,
    suggest_salt,
)
from gopie_spark.operators.textstats import (
    add_lang_id,
    add_lm_score,
    dup_ngram_stats,
    quality_filter,
    repetition_stats,
    tfidf_top_terms,
    vocab_top_tokens,
    bpe_ish_token_count,
    content_fingerprint,
    quality_features,
    rolling_fingerprint,
    token_count,
)
from gopie_spark.operators.windows import (
    sliding_window_counts,
    windowed_sketch_agg,
)

__all__ = [
    "build_partials", "merge_partials", "sketch_agg", "global_sketch",
    "hll_count_distinct", "tdigest_quantiles", "kll_quantiles",
    "cms_build", "cms_tokens_build", "cms_estimate_map",
    "bloom_build", "bloom_filter", "suggest_salt",
    "exact_dedup", "duplicate_stats", "bucket_cap_stats",
    "minhash_lsh_candidates", "incremental_minhash_dedup",
    "incremental_simhash_dedup",
    "minhash_lsh_dedup", "simhash_candidates", "ngram_jaccard_pairs",
    "connected_components",
    "decontaminate", "decontaminate_keep", "build_eval_gram_filter",
    "add_contamination_hits", "ngram_strings",
    "hash_sample", "hash_sample_fraction", "stratified_hash_sample",
    "priority_sample", "priority_threshold",
    "bloom_shards_build", "bloom_shards_filter",
    "brute_force_topk", "lsh_topk", "ivf_topk", "train_ivf_centroids",
    "build_ivf_index", "ivf_topk_indexed",
    "build_lsh_index", "lsh_topk_indexed",
    "probe_work_stats", "lsh_probe_stats", "ivf_probe_stats",
    "cosine_dedup", "cosine_dedup_pairs",
    "token_count", "bpe_ish_token_count", "quality_features",
    "content_fingerprint", "rolling_fingerprint", "add_lang_id",
    "dup_ngram_stats", "quality_filter", "repetition_stats",
    "add_lm_score", "mixture_sample",
    "tfidf_top_terms", "vocab_top_tokens",
    "pii_counts", "pii_stats", "redact_pii", "scrub",
    "canonical_url", "extract_host", "extract_domain", "host_stats",
    "filter_blocklist", "host_budget_sample",
    "train_pq_codebooks", "pq_encode", "pq_topk",
    "build_pq_index", "pq_topk_indexed", "load_pq_codebooks",
    "sliding_window_counts", "windowed_sketch_agg",
]
