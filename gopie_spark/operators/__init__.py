"""Spark-side operator surface for gopie_spark."""

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

__all__ = [
    "build_partials", "merge_partials", "sketch_agg", "global_sketch",
    "hll_count_distinct", "tdigest_quantiles", "kll_quantiles",
    "cms_build", "cms_tokens_build", "cms_estimate_map",
    "bloom_build", "bloom_filter", "suggest_salt",
]
