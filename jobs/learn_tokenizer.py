#!/usr/bin/env python
"""Learn a BPE merge table over a corpus and report tokenizer quality —
the production wrapper around operators/bpe.py:

    cd /root/repo && zip -qr /tmp/gopie_spark.zip gopie_spark
    spark-submit --py-files /tmp/gopie_spark.zip jobs/learn_tokenizer.py \\
        --input /path/corpus --out /path/tokenizer \\
        [--format parquet|iceberg|warc] [--text-col text] \\
        [--n-merges 8000] [--v-words 1000000] [--sample-docs 2000]

Writes ``<out>/merges.json`` (rank-ordered pairs — the whole model) and
``<out>/tokenizer_report.json``: histogram coverage of the v_words cap
(dropped-tail token mass, never silent), vocabulary sizes, and fertility
(BPE tokens per word) on a deterministic doc sample before/after
learning — the standard tokenizer-quality number.

Scale shape: ONE corpus-scale pass (the word-frequency groupBy; the
shuffle carries the word vocabulary); the merge loop runs driver-side
on the bounded histogram; the fertility probe encodes only the sampled
docs (hash-sampled, reproducible).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def learn_and_report(spark, df, out, *, text_col="text", n_merges=1000,
                     v_words=100_000, sample_docs=2000,
                     id_col=None) -> dict:
    """Pure function: learn merges, write artifacts, return the report."""
    from pyspark.sql import functions as F
    from gopie_spark.operators.bpe import apply_bpe, learn_bpe

    t0 = time.perf_counter()
    merges, report = learn_bpe(df, n_merges=n_merges, text_col=text_col,
                               v_words=v_words)

    # deterministic doc sample for the fertility probe: smallest
    # md5-derived keys over a stable id (provided id col, else the text
    # digest), the repo's standard seeded-hash rule
    key_col = F.col(id_col).cast("string") if id_col else F.md5(text_col)
    sample = (df.filter(F.col(text_col).isNotNull())
              .withColumn("_k", F.md5(F.concat(F.lit("tok|"), key_col)))
              .orderBy("_k").limit(sample_docs))
    enc = apply_bpe(sample, merges, text_col=text_col)
    probe = enc.select(
        F.size(F.filter(F.split(F.lower(F.trim(F.col(text_col))),
                                r"\s+"), lambda t: t != ""))
        .alias("n_words"),
        F.size("bpe_tokens").alias("n_tokens")).agg(
        F.sum("n_words").alias("w"), F.sum("n_tokens").alias("t"),
        F.count("*").alias("docs")).collect()[0]

    vocab = sorted({s for m in merges for s in ("".join(m),)} |
                   {c for m in merges for p in m for c in p})
    n_w = int(probe["w"] or 0)
    n_t = int(probe["t"] or 0)
    report.update({
        "fertility_tokens_per_word": round(n_t / max(n_w, 1), 4),
        "fertility_sample_docs": int(probe["docs"]),
        "vocab_size_learned": len(vocab),
        "wall_s": round(time.perf_counter() - t0, 2),
    })
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "merges.json"), "w") as f:
        json.dump([list(m) for m in merges], f)
    with open(os.path.join(out, "tokenizer_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--format", default="parquet")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default=None)
    ap.add_argument("--n-merges", type=int, default=8000)
    ap.add_argument("--v-words", type=int, default=1_000_000)
    ap.add_argument("--sample-docs", type=int, default=2000)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from gopie_spark.plans import get_spark
    from gopie_spark.sources.catalog import load_table

    spark = get_spark("gopie-learn-tokenizer")
    df = load_table(spark, args.input, args.format)
    report = learn_and_report(spark, df, args.out,
                              text_col=args.text_col,
                              n_merges=args.n_merges,
                              v_words=args.v_words,
                              sample_docs=args.sample_docs,
                              id_col=args.id_col)
    report["input"] = args.input
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
