#!/usr/bin/env python
"""Headline benchmark for the driver: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "docs_per_sec_sketch_suite": ...}

The per-query timings are end-to-end (plan + execute + collect).  The
sketch-suite docs/sec figure is the north-star throughput proxy at this
scale (rows consumed by sketch builds / total sketch-build wall time).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from gopie_spark.plans import get_spark
    spark = get_spark("gopie_spark-bench", cores=int(cpus),
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    queries = entrymod.queries()

    headline = [
        "hll_distinct_global", "hll_distinct_per_lang",
        "hll_distinct_per_window", "hll_union_reuse",
        "cms_event_type_counts", "cms_topk_heavy_hitters",
        "mg_heavy_hitters",
        "bloom_membership", "bloom_shards_membership",
        "tdigest_quantiles", "kll_quantiles",
        "pushsum_mean", "topk_orders", "window_tumbling_counts",
        "dedup_exact_keep", "minhash_lsh_dedup", "simhash_dedup",
        "ann_brute_force", "ann_lsh", "ann_ivf",
        "token_stats", "bpe_token_stats", "quality_scores",
        "doc_fingerprints", "lang_id_histogram",
        "cms_token_heavy_hitters", "cms_topk_tokens_per_lang",
        "sliding_window_epoch_counts",
        "cosine_pairs_bruteforce", "iceflake_unique",
        "bloom_scalable_membership", "tdigest_grouped_median",
        # round 2: sketch algebra, distributed remove, transitive closure
        "hll_intersect", "bloom_counting_remove_dist", "cc_components",
        # round 3: latest-N conflation, sliding-window sketches, vocab
        "latest_n_events", "hll_distinct_per_sliding_window",
        "vocab_top_tokens", "tfidf_top_terms", "repetition_stats",
        # round 3 late: PII scrub, host analytics, dup-ngram fraction,
        # composed quality filter, PQ compressed-scan ANN
        "pii_redaction", "host_blocklist_stats", "dup_ngram_stats",
        "quality_filter_flags", "ann_pq", "lm_doc_scores",
        "canonical_urls", "dedup_spans", "host_dup_factor",
        "token_budget_sample",
        "mixture_sample_docs",
        # round 4: IVF x PQ composed ANN (pruned compressed scan), the
        # end-to-end curation pipeline certificate, context-window chunking
        "ann_ivfpq", "filter_corpus_stages", "doc_chunks",
        "packed_sequences", "boilerplate_spans",
        # round 4b: paragraph keep-first dedup, overlap decontamination,
        # SemDeDup pair cert, sketch-gated quantile band
        "paragraph_dedup", "contamination_overlap", "semantic_dedup",
        "quantile_gate_docs", "temperature_mixture", "ngram_containment",
        # round 4c: leakage-safe host split, deterministic epoch order,
        # URL hygiene filter
        "host_split_assign", "training_order_docs", "url_filter_docs",
        "compression_gate", "normalize_gate", "mirror_hosts",
        "doc_sentences", "sentence_dedup", "ams_f2_join_size",
        "token_entropy_per_lang",
        # round 4d: theta/KMV set algebra, persisted sketch cube,
        # BPE pair statistics, Frequent-Directions covariance
        "theta_distinct_events", "theta_shingle_algebra",
        "sketch_cube_rollup", "bpe_pair_counts", "freqdir_covariance",
        "dsir_weights", "session_stats", "retention_cohorts", "funnel_steps",
        "grouped_topk", "ams_join_size_cross",
        # round 4e: DDSketch relative-error quantiles (pure-Catalyst build)
        "ddsketch_quantiles",
        # round 4f: as-of join (union + running-last), binned interval
        # overlap join, sketch-driven balanced range sharding
        "asof_click_attribution", "session_overlap_pairs",
        "range_shard_balance",
        # round 4f: ICWS weighted-MinHash over token multisets,
        # unbiased CountSketch point estimates
        "weighted_minhash_pairs", "countsketch_token_counts",
        # round 4m: b-bit minwise LSH verification (64x smaller shuffle)
        "bbit_minhash_pairs",
        # round 4g: deletable cuckoo-filter membership (strict subtract),
        # sliding-HLL suffix-window distinct (query-time windows)
        "cuckoo_membership_remove", "sliding_hll_suffix_distinct",
        # round 4g: windowed CMS trailing-window frequencies
        "window_cms_trending", "ddsketch_window_quantiles",
        # round 4i: sketch-only corpus snapshot drift (theta set algebra
        # + CountSketch difference + KLL two-sample KS)
        "corpus_drift",
        # round 4i: sketch-driven join planning (one-scan key profiles,
        # broadcast/salt/width advice anchored to exact answers)
        "join_plan_advice",
        # round 4i: per-language drift via the one-scan keyed co-build
        "lang_drift",
        # round 4l: advised join execution (Bloom semi-join prefilter +
        # bounded-load salting, hash-equal to the plain join)
        "advised_join_orders",
        # round 4l: SketchStore serving layer (persist once, answer the
        # whole north-star question set with zero Spark + bounds)
        "sketch_store_answers",
        # round 4n: pure-SQL sketch rollup via the gopie_sketch_merge
        # grouped aggregate (merge KB blobs in spark.sql, never raw rows)
        "sql_sketch_rollup",
        # round 4p: incremental dedup-vs-history through the persisted
        # LSM band index (store + index built in-query, indexed probe
        # pinned equal to index-free, planted re-crawls die)
        "incremental_dedup_indexed",
        # round 5: the daily loop end-to-end (two run_daily days inside
        # the query: curate -> conflate -> dedup-vs-history -> store
        # fold -> cube -> drift).  Composition-dominated by design —
        # its wall time is the orchestration of ~10 certified stages
        # over a bounded two-day corpus, not a per-row throughput
        # measure.
        "daily_update_cert",
    ]
    # rows consumed by the sketch-building queries (docs/sec denominator)
    sketch_queries = {"hll_distinct_global", "hll_distinct_per_lang",
                      "hll_distinct_per_window",
                      "cms_event_type_counts", "cms_topk_heavy_hitters",
                      "bloom_membership", "tdigest_quantiles",
                      "kll_quantiles"}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    rows_consumed = {
        "hll_distinct_global": n_docs, "hll_distinct_per_lang": n_docs,
        "hll_distinct_per_window": n_events,
        "cms_event_type_counts": n_events, "cms_topk_heavy_hitters": n_events,
        "bloom_membership": n_events, "tdigest_quantiles": n_docs,
        "kll_quantiles": n_events,
    }

    # Two passes, steady-state timed — the same methodology as
    # BENCH/run_scaling.py ("first pass warms JIT + Python workers").
    # Whole-stage-codegen compilation of the heavier expression pipelines
    # (md5/regexp projections, higher-order array transforms) costs
    # 10-20s ONCE per session on this VM, landing on whichever query runs
    # that shape first; pass 0 absorbs it (plus Python-worker imports) so
    # pass 1 measures the queries, not session warmup.  Pass-0 wall time
    # is reported alongside for transparency.
    timings = {}
    sketch_rows = 0
    sketch_time = 0.0
    warmup_s = 0.0
    bound_checks = bound_passed = 0  # north-star error-bound pass-rate
    for pass_no in (0, 1):
        for name in headline:
            fn = queries[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            rows = df.collect()
            n = len(rows)
            dt = time.perf_counter() - t0
            if pass_no == 0:
                warmup_s += dt
                continue
            timings[name] = round(dt, 3)
            if name in sketch_queries:
                sketch_rows += rows_consumed[name]
                sketch_time += dt
            if "within_bound" in df.columns:
                bound_checks += n
                bound_passed += sum(1 for r in rows if r["within_bound"])
            print(f"# {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    scaling = None
    summary_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH", "scaling_summary.json")
    if os.path.exists(summary_path):
        with open(summary_path) as fh:
            s = json.load(fh)
        scaling = {
            "pages_rows": s["pages_rows"],
            "docs_per_sec_by_cores": {c: v["docs_per_sec"]
                                      for c, v in s["levels"].items()},
            "efficiency_2_to_8": s["scaling_efficiency_2_to_8"],
            "efficiency_8_to_32": s["scaling_efficiency_8_to_32"],
            "gate_pass": s["pass"],
        }
    out = {
        "metric": ("headline query suite wall time (sketches + dedup + "
                   "similarity + textstats) on testdata"),
        "value": total,
        "unit": "sec",
        "warmup_pass_sec": round(warmup_s, 3),
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
        "docs_per_sec_sketch_suite": round(sketch_rows / sketch_time, 1)
        if sketch_time else None,
        "error_bound_pass_rate": round(bound_passed / bound_checks, 4)
        if bound_checks else None,
        "error_bound_checks": bound_checks,
        "scaling": scaling,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
