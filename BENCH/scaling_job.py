#!/usr/bin/env python
"""One scaling-measurement worker: build the sketch suite over the pages
table at a given parallelism, print one JSON line.

Usage: python BENCH/scaling_job.py <cores> <pages_dir>

The job is the north-rule workload over the pages table:

- per-lang HLL distinct-url build+merge,
- global token-level Count-Min sketch via the JVM wordcount-shuffle
  pre-agg (cms_tokens_build).  Measured trade-off vs the Arrow-side
  tokenize path (cms_build(tokenize=True)): the Arrow path wins absolute
  single-node throughput (22s vs 39s at 8 pinned cores — no token row
  ever shuffles) but is memory-bandwidth-bound, so it scales worse as
  cores *share one node's* memory bus (0.69 vs 0.81 efficiency 2->8 on
  this VM).  Executor scaling on a real cluster adds a memory bus per
  executor, where both paths scale; the shuffle path is the
  core-scalable choice and is what this gate job measures,
- global KLL over whitespace token counts,
- global Bloom build over urls (input coalesced to the core count so
  partial-state volume, MBs per state, tracks cores not splits),
- per-lang Theta/KMV distinct-url build+merge (round-4d kernel; same
  two-level shape as the HLL pass, k=4096 states).

Docs consumed = 5 x rows (five full passes).  Timing starts after the
Python worker pool is warm (a tiny mapInPandas touching every core pays
the one-time worker-spawn + numpy/pandas import cost) — matching a real
cluster, where long-lived executor workers amortize imports across the
whole job, so we measure the workload rather than interpreter startup.
"""

import json
import sys
import time


def main() -> None:
    cores = int(sys.argv[1])
    pages_dir = sys.argv[2]

    sys.path.insert(0, ".")
    import pandas as pd
    from pyspark.sql import functions as F
    from gopie_spark.plans import get_spark
    from gopie_spark.kernels import KLL, BloomBit, HLL
    from gopie_spark.operators import (cms_tokens_build, global_sketch,
                                       sketch_agg)

    spark = get_spark(f"scaling-{cores}", cores=cores,
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    # -- warmup: spawn + import in every Python worker -----------------------
    def _warm(batches):
        import numpy  # noqa: F401
        import gopie_spark.kernels  # noqa: F401
        for pdf in batches:
            yield pdf

    spark.range(cores * 8).repartition(cores * 4) \
        .mapInPandas(_warm, "id long").count()
    pages = spark.read.parquet(pages_dir)
    n = pages.count()

    def suite() -> dict:
        timings = {}
        t0 = time.perf_counter()
        hll_states = sketch_agg(
            pages.select("lang", "url"), ["lang"], "url", HLL(p=14))
        n_langs = hll_states.count()
        timings["hll_per_lang_url"] = round(time.perf_counter() - t0, 3)

        t1 = time.perf_counter()
        cms, cms_state = cms_tokens_build(pages.select("text"), "text")
        timings["cms_tokens"] = round(time.perf_counter() - t1, 3)

        t2 = time.perf_counter()
        toks = pages.select(
            (F.regexp_count(F.col("text"), F.lit(r"\s+")) + 1)
            .cast("double").alias("ntok"))
        kll_state = global_sketch(toks, "ntok", KLL(k=200))
        timings["kll_token_counts"] = round(time.perf_counter() - t2, 3)

        t3 = time.perf_counter()
        from gopie_spark.operators.membership import bloom_shards_build
        shard_states = bloom_shards_build(pages.select("url"), "url",
                                          n=n, p=0.001, shards=64)
        n_shards = shard_states.count()
        timings["bloom_urls_sharded"] = round(time.perf_counter() - t3, 3)

        t4 = time.perf_counter()
        from gopie_spark.kernels import Theta
        theta_states = sketch_agg(
            pages.select("lang", "url"), ["lang"], "url", Theta(k=4096))
        n_theta = theta_states.count()
        timings["theta_per_lang_url"] = round(time.perf_counter() - t4, 3)
        return {
            "seconds": round(time.perf_counter() - t0, 3),
            "timings": timings,
            "n_langs": n_langs,
            "cms_total": int(cms.count(cms_state)),
            "bloom_shards": n_shards,
            "theta_groups": n_theta,
        }

    # pass 1 warms the JVM (JIT of the parquet/Arrow hot loops); pass 2 is
    # the measured steady state — the regime a real multi-minute cluster
    # stage runs in.  Both are reported.
    cold = suite()
    steady = suite()
    docs = 5 * n  # five full passes over the table
    print(json.dumps({
        "cores": cores, "rows": n, "docs_consumed": docs,
        "seconds": steady["seconds"],
        "docs_per_sec": round(docs / steady["seconds"], 1),
        "timings": steady["timings"],
        "cold_seconds": cold["seconds"],
        "cold_timings": cold["timings"],
        "n_langs": steady["n_langs"],
        "cms_total": steady["cms_total"],
        "bloom_shards": steady["bloom_shards"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
