#!/usr/bin/env python
"""Production entrypoint: materialize training epochs from a curated
corpus — the last step of a pretraining-data build, producing the
files a data-loader actually reads:

    cd /root/repo && zip -qr /tmp/gopie_spark.zip gopie_spark
    spark-submit --py-files /tmp/gopie_spark.zip jobs/make_epochs.py \\
        --input /path/curated --output /path/epochs \\
        --n-shards 1024 --epochs 3 [--seed0 0] [--id-col doc_id] \\
        [--split train] [--chunk-tokens 2048] \\
        [--format parquet|iceberg|warc] [--report /path/report.json]

Each epoch ``e`` lands at ``<output>/epoch=<e>/shard=<k>/`` with rows
PHYSICALLY in position order inside each shard file
(operators/split.write_training_shards): one hash Exchange per epoch,
per-shard local sorts, never a global orderBy.  Epoch ``e`` uses seed
``seed0 + e`` — each epoch is an independent deterministic permutation,
reproducible from (corpus, seed0) alone.  ``--split train`` filters a
split-stamped corpus (filter_corpus --split-fractions) to one split
before sharding, so eval rows can never leak into the training order.

Size ``--n-shards`` so one shard ≈ one target file (corpus_bytes /
file_size); at 100 TB and 1 GB files that is ~10^5 shards, each sorted
locally by its own task.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_epochs(df, output: str, *, n_shards: int, epochs: int,
                seed0: int = 0, id_col: str = "doc_id",
                chunk_tokens: int | None = None,
                text_col: str = "text") -> dict:
    """Write ``epochs`` deterministic permutations of ``df``; returns
    the accounting dict.  Pure function of its inputs (jobs and tests
    share it).

    ``chunk_tokens=N``: shuffle context-window CHUNKS instead of whole
    documents — ``chunk_documents`` (zero-shuffle Generate) splits each
    doc into consecutive N-token pieces first, and the epoch unit
    becomes ``<id>#<chunk_idx>`` (a deterministic string id, so the
    permutation stays engine-reproducible).  This is the shape sequence
    packing wants: pieces of one long document scatter across the
    epoch instead of arriving consecutively."""
    from pyspark.sql import functions as F
    from gopie_spark.operators.split import write_training_shards
    report = {"n_shards": n_shards, "epochs": []}
    if chunk_tokens is not None:
        from gopie_spark.operators.textstats import chunk_documents
        df = chunk_documents(df, max_tokens=chunk_tokens, id_col=id_col,
                             text_col=text_col) \
            .withColumn("chunk_id",
                        F.concat(F.col(id_col).cast("string"),
                                 F.lit("#"), F.col("chunk_idx")))
        id_col = "chunk_id"
        report["chunk_tokens"] = chunk_tokens
    df = df.persist()
    rows = df.count()
    report["input_rows"] = rows
    for e in range(epochs):
        path = os.path.join(output, f"epoch={e}")
        t0 = time.perf_counter()
        write_training_shards(df, path, id_col=id_col,
                              n_shards=n_shards, seed=seed0 + e)
        report["epochs"].append(
            {"epoch": e, "seed": seed0 + e, "path": path,
             "wall_sec": round(time.perf_counter() - t0, 2)})
    df.unpersist()
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", default="parquet")
    ap.add_argument("--n-shards", type=int, required=True)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--seed0", type=int, default=0)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--chunk-tokens", type=int, default=None,
                    help="chunk docs into N-token pieces and shuffle "
                         "the chunks instead of whole documents")
    ap.add_argument("--split", default=None,
                    help="keep only this value of the corpus's split "
                         "column before sharding")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from gopie_spark.plans import get_spark
    from gopie_spark.sources.catalog import load_table

    spark = get_spark("gopie-make-epochs")
    df = load_table(spark, args.input, args.format)
    if args.split is not None:
        df = df.filter(F.col("split") == args.split)
    report = make_epochs(df, args.output, n_shards=args.n_shards,
                         epochs=args.epochs, seed0=args.seed0,
                         id_col=args.id_col, text_col=args.text_col,
                         chunk_tokens=args.chunk_tokens)
    line = json.dumps(report)
    print(line)
    if args.report:
        with open(args.report, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
