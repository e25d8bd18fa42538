#!/usr/bin/env python
"""Dedup-tier throughput over the deterministic pages table.

Writes the numbers behind BENCH/DEDUP_BASELINE.md: exact dedup, SimHash
fingerprints, MinHash signatures, and end-to-end LSH candidate pairs
over 1M pages on local[$SPARK_GRAFT_CPUS].  Same steady-state
methodology as run_scaling.py (warm best-of-2; generate the pages table
first via run_scaling.py or generate_pages)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PAGES_DIR = os.environ.get("SPARK_GRAFT_PAGES_DIR", "/tmp/gopie_pages_4m")
N_ROWS = int(os.environ.get("SPARK_GRAFT_DEDUP_ROWS", "1000000"))


def main() -> None:
    from pyspark.sql import functions as F
    from gopie_spark.plans import get_spark
    from gopie_spark.operators.dedup import (add_minhash_signatures,
                                             add_simhash, exact_dedup,
                                             minhash_lsh_candidates)
    from gopie_spark.sources.pages import generate_pages

    if not os.path.isdir(PAGES_DIR):
        generate_pages(PAGES_DIR, 4_000_000, n_files=64, seed=7)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dedup-bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(PAGES_DIR).select(
        F.monotonically_increasing_id().alias("doc_id"), F.col("text")) \
        .limit(N_ROWS).repartition(2 * cpus).persist()
    n = pages.count()
    nb = pages.agg(F.sum(F.length("text"))).collect()[0][0]
    print(f"# rows={n} bytes={nb / 1e6:.0f}MB cpus={cpus}")

    def timed(name, fn, runs=2):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best:.1f}s  {n / best:,.0f} docs/s  "
              f"{nb / best / 1e6:.0f} MB/s")

    timed("exact_dedup", lambda: exact_dedup(pages).count())
    timed("simhash_fingerprints",
          lambda: add_simhash(pages).agg(F.count("simhash")).collect())
    timed("minhash_signatures_k64",
          lambda: add_minhash_signatures(pages, k=64)
          .agg(F.count("minhash")).collect())
    timed("minhash_lsh_candidates_k64",
          lambda: minhash_lsh_candidates(pages, k=64, bands=16).count(),
          runs=1)
    spark.stop()


if __name__ == "__main__":
    main()
