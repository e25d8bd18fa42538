#!/usr/bin/env python
"""Corpus card: one-JSON dataset documentation for a pages corpus —
the datasheet a training-data release ships with, composed entirely
from the library's certified operators:

    cd /root/repo && zip -qr /tmp/gopie_spark.zip gopie_spark
    spark-submit --py-files /tmp/gopie_spark.zip jobs/corpus_report.py \\
        --input /path/corpus --output /path/card.json \\
        [--format parquet|iceberg|warc] [--mirror-top 10] \\
        [--text-col text] [--url-col url]

Sections (each cheap at 10^12 docs — sketches and partial-aggregable
folds only, no windows, no all-pairs):

- counts: docs, tokens, per-lang doc/token shares
- diversity: per-lang token entropy (exact two-agg fold)
- length: token-count quantiles from ONE mergeable t-digest pass
- duplication: exact-digest duplicate fraction (normalized text)
- hosts (when a url column exists): distinct hosts, top hosts by doc
  share, top mirror pairs (digest-blocked, capped)
- quality: per-rule flag rates of the C4/Gopher stack (zero-shuffle)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus_card(spark, df, *, text_col="text",
                url_col="url", mirror_top=10) -> dict:
    """Build the card dict; pure function of its inputs."""
    from pyspark.sql import functions as F
    from gopie_spark.kernels import TDigest
    from gopie_spark.operators.dedup import duplicate_stats
    from gopie_spark.operators.hoststats import (extract_host,
                                                 mirror_host_pairs)
    from gopie_spark.operators.sketch_agg import global_sketch
    from gopie_spark.operators.textstats import (QUALITY_FILTER_FLAGS,
                                                 quality_filter,
                                                 token_count,
                                                 token_entropy)

    df = df.persist()
    card: dict = {"n_docs": df.count()}

    # counts + diversity per lang (entropy fold includes token totals)
    has_lang = "lang" in df.columns
    ent = token_entropy(df, keys=["lang"] if has_lang else [],
                        text_col=text_col).collect()
    if has_lang:
        card["languages"] = {
            r["lang"]: {"n_tokens": r["n_tokens"],
                        "n_distinct_tokens": r["n_distinct"],
                        "entropy_bits": round(r["entropy_bits"], 4)}
            for r in ent}
        card["n_tokens"] = int(sum(r["n_tokens"] for r in ent))
    else:
        card["n_tokens"] = int(ent[0]["n_tokens"])
        card["entropy_bits"] = round(ent[0]["entropy_bits"], 4)

    # token-length quantiles: one mergeable t-digest pass
    td = TDigest()
    st = global_sketch(
        df.select(token_count(text_col).cast("double").alias("v")),
        "v", td)
    qs = (0.01, 0.25, 0.5, 0.75, 0.99)
    card["token_length_quantiles"] = {
        str(q): round(float(np.asarray(td.quantile(st, q)).reshape(-1)[0]),
                      1) for q in qs}

    # duplication
    dup = duplicate_stats(df, text_col=text_col).collect()[0]
    card["exact_duplicate_fraction"] = round(
        1.0 - dup["n_unique"] / max(dup["n_docs"], 1), 6)

    # quality flag rates (zero-shuffle scan + one agg)
    flagged = quality_filter(df, text_col)
    rates = flagged.agg(
        *[F.avg(F.col(f"flag_{nm}").cast("double")).alias(nm)
          for nm in QUALITY_FILTER_FLAGS],
        F.avg(F.col("keep").cast("double")).alias("keep")).collect()[0]
    card["quality_flag_rates"] = {
        nm: round(float(rates[nm] or 0.0), 6)
        for nm in (*QUALITY_FILTER_FLAGS, "keep")}

    # hosts
    if url_col in df.columns:
        # distinct urls via the theta sketch (the exact count would be
        # a full-url shuffle at corpus scale; the KMV state is 32 KB
        # and exact below k anyway)
        from gopie_spark.kernels import Theta
        th = Theta(k=4096)
        st_u = global_sketch(df.select(F.col(url_col).alias("v")),
                             "v", th)
        card["distinct_urls_est"] = int(round(th.estimate(st_u)))
        hosts = (df.select(extract_host(url_col).alias("h"))
                 .filter(F.col("h") != ""))
        card["n_hosts"] = hosts.distinct().count()
        top = (hosts.groupBy("h").count()
               .orderBy(F.desc("count"), "h").limit(10).collect())
        card["top_hosts"] = {r["h"]: r["count"] for r in top}
        if mirror_top:
            card["mirror_pairs"] = [
                {"host_a": r["host_a"], "host_b": r["host_b"],
                 "n_shared": r["n_shared"],
                 "overlap": round(r["overlap"], 4)}
                for r in (mirror_host_pairs(df, url_col=url_col,
                                            text_col=text_col,
                                            min_shared=2,
                                            min_overlap=0.0)
                          .orderBy(F.desc("overlap"),
                                   F.desc("n_shared"),
                                   "host_a", "host_b")
                          .limit(int(mirror_top)).collect())]
    df.unpersist()
    return card


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", default="parquet")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--mirror-top", type=int, default=10)
    ap.add_argument("--compare", default=None, metavar="PATH",
                    help="previous corpus snapshot: adds a 'drift' "
                         "section (operators/drift.py — sketch-only: "
                         "theta URL-set algebra, CountSketch-difference "
                         "token movers, KLL two-sample KS) comparing "
                         "PATH (A, the old crawl) to --input (B)")
    ap.add_argument("--compare-format", default=None,
                    help="format of --compare (defaults to --format)")
    args = ap.parse_args()

    from gopie_spark.plans import get_spark
    from gopie_spark.sources.catalog import load_table

    spark = get_spark("gopie-corpus-report")
    t0 = time.perf_counter()
    df = load_table(spark, args.input, args.format)
    card = corpus_card(spark, df,
                       text_col=args.text_col, url_col=args.url_col,
                       mirror_top=args.mirror_top)
    if args.compare:
        from gopie_spark.operators.drift import drift_report
        prev = load_table(spark, args.compare,
                          args.compare_format or args.format)
        card["drift"] = drift_report(
            prev, df, text_col=args.text_col,
            url_col=(args.url_col if args.url_col in df.columns
                     and args.url_col in prev.columns else None))
    card["wall_sec"] = round(time.perf_counter() - t0, 2)
    line = json.dumps(card)
    print(line)
    with open(args.output, "w") as fh:
        fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
