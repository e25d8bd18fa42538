#!/usr/bin/env python
"""Production entrypoint: build and query persisted ANN indexes over an
embeddings table — the similarity tier's spark-submit surface next to
``dedup_corpus`` / ``filter_corpus``:

    cd /root/repo && zip -qr /tmp/gopie_spark.zip gopie_spark
    spark-submit --py-files /tmp/gopie_spark.zip jobs/ann_index.py build \\
        --input /path/embeddings_parquet --index /path/index \\
        --kind ivfpq [--n-centroids 64] [--m 8] [--n-codes 16] \\
        [--n-planes 10] [--residual]
    spark-submit --py-files /tmp/gopie_spark.zip jobs/ann_index.py query \\
        --index /path/index --kind ivfpq --queries /path/queries_parquet \\
        --input /path/embeddings_parquet --output /path/out \\
        [--k 10] [--nprobe 4] [--refine 4] [--multiprobe 2]

Index kinds (all from ``operators/similarity.py``; every layout prunes
the probe-time scan):

- ``lsh``    — corpus partitioned by hyperplane bucket; probes prune to
  the probed bucket directories.
- ``ivf``    — corpus partitioned by k-means cell; probes prune to the
  ``nprobe`` cell directories.
- ``pq``     — m-byte compressed codes (no vectors at rest); ADC scan +
  exact refine against ``--input``.
- ``ivfpq``  — PQ codes partitioned by IVF cell: static pruning AND the
  compressed scan; ``--residual`` stores IVFADC residual codes.

``query`` emits a one-line JSON report with row counts, wall time, and
(for ivf/ivfpq) the pre-flight probe-work stats — the same
look-before-the-expensive-stage accounting the dedup jobs print —
computed from the stored codebook before the probe runs.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import os
# bare local runs (`python jobs/<job>.py`) find the package next to
# jobs/; spark-submit deployments supply it via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(spark, args) -> dict:
    from gopie_spark.operators.similarity import (build_ivf_index,
                                                  build_ivfpq_index,
                                                  build_lsh_index,
                                                  build_pq_index)
    corpus = spark.read.parquet(args.input)
    n = corpus.count()
    if args.kind == "lsh":
        build_lsh_index(corpus, args.index, n_planes=args.n_planes,
                        id_col=args.id_col, vec_col=args.vec_col)
    elif args.kind == "ivf":
        build_ivf_index(corpus, args.index, n_centroids=args.n_centroids,
                        id_col=args.id_col, vec_col=args.vec_col)
    elif args.kind == "pq":
        build_pq_index(corpus, args.index, m=args.m, n_codes=args.n_codes,
                       id_col=args.id_col, vec_col=args.vec_col)
    else:  # ivfpq
        build_ivfpq_index(corpus, args.index,
                          n_centroids=args.n_centroids, m=args.m,
                          n_codes=args.n_codes, id_col=args.id_col,
                          vec_col=args.vec_col, residual=args.residual)
    return {"mode": "build", "kind": args.kind, "rows_indexed": n,
            "index": args.index, "residual": bool(args.residual)}


def _query(spark, args) -> dict:
    import numpy as np
    from pyspark.sql import functions as F
    from gopie_spark.operators.similarity import (ivf_topk_indexed,
                                                  ivfpq_probe_stats,
                                                  ivfpq_topk_indexed,
                                                  lsh_topk_indexed,
                                                  pq_topk_indexed)
    queries = spark.read.parquet(args.queries)
    n_q = queries.count()
    report = {"mode": "query", "kind": args.kind, "n_queries": n_q,
              "k": args.k}
    corpus = spark.read.parquet(args.input) if args.input else None
    if args.kind in ("pq", "ivfpq") and corpus is None:
        raise SystemExit(f"--kind {args.kind} needs --input for the "
                         "exact-refine vectors")
    if args.kind in ("ivf", "ivfpq") and corpus is not None:
        # pre-flight: cell histogram + ADC/rescore work from the stored
        # codebook, BEFORE the probe runs (tune nprobe from evidence)
        cb = spark.read.parquet(f"{args.index}/codebook") \
            .orderBy("ivf_cell").collect()
        cents = np.array([r["centroid"] for r in cb])
        pf = ivfpq_probe_stats(corpus, queries, cents,
                               nprobe=args.nprobe, id_col=args.id_col,
                               vec_col=args.vec_col).collect()[0]
        report["probe_preflight"] = {k: int(v) for k, v in
                                     pf.asDict().items()}
    if args.kind == "lsh":
        out = lsh_topk_indexed(spark, args.index, queries, k=args.k,
                               multiprobe=args.multiprobe,
                               id_col=args.id_col, vec_col=args.vec_col)
    elif args.kind == "ivf":
        out = ivf_topk_indexed(spark, args.index, queries, k=args.k,
                               nprobe=args.nprobe, id_col=args.id_col,
                               vec_col=args.vec_col)
    elif args.kind == "pq":
        out = pq_topk_indexed(spark, args.index, corpus, queries,
                              k=args.k, refine=args.refine,
                              id_col=args.id_col, vec_col=args.vec_col)
    else:  # ivfpq
        out = ivfpq_topk_indexed(spark, args.index, corpus, queries,
                                 k=args.k, nprobe=args.nprobe,
                                 refine=args.refine, id_col=args.id_col,
                                 vec_col=args.vec_col)
    out = out.select("query_id", "match_id", "rank",
                     F.col("cosine").cast("double").alias("cosine"))
    out.write.mode("overwrite").parquet(args.output)
    report["result_rows"] = spark.read.parquet(args.output).count()
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--index", required=True)
    common.add_argument("--kind", choices=("lsh", "ivf", "pq", "ivfpq"),
                        default="ivfpq")
    common.add_argument("--id-col", default="vec_id")
    common.add_argument("--vec-col", default="embedding")

    b = sub.add_parser("build", parents=[common])
    b.add_argument("--input", required=True)
    b.add_argument("--n-centroids", type=int, default=64)
    b.add_argument("--m", type=int, default=8)
    b.add_argument("--n-codes", type=int, default=16)
    b.add_argument("--n-planes", type=int, default=10)
    b.add_argument("--residual", action="store_true")

    q = sub.add_parser("query", parents=[common])
    q.add_argument("--queries", required=True)
    q.add_argument("--input", default=None,
                   help="embeddings parquet (vectors for exact refine; "
                        "required for pq/ivfpq)")
    q.add_argument("--output", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--nprobe", type=int, default=4)
    q.add_argument("--refine", type=int, default=4)
    q.add_argument("--multiprobe", type=int, default=2)

    args = ap.parse_args()
    from gopie_spark.plans import get_spark
    spark = get_spark("gopie-ann-index")
    t0 = time.perf_counter()
    report = _build(spark, args) if args.mode == "build" \
        else _query(spark, args)
    report["seconds"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
