#!/usr/bin/env python
"""Production entrypoint: deduplicate a pages corpus end to end.

    cd /root/repo && zip -qr /tmp/gopie_spark.zip gopie_spark
    spark-submit --py-files /tmp/gopie_spark.zip jobs/dedup_corpus.py \\
        --input /path/to/pages_parquet --output /path/to/deduped \\
        [--format parquet|iceberg] [--sig-dir /path/for/signatures] \\
        [--threshold 0.8] [--strategy cc|greedy] [--k 128] [--bands 32] \\
        [--max-bucket 64] [--incremental] [--paragraph-store /path/pstore] \\
        [--batch-date 2026-08-21] [--band-index /path/bidx] \\
        [--paragraph-index /path/pkidx]

Pipeline (all stages scale-shaped — see operators/dedup.py):

1. **Exact dedup** — normalized content digest, one partially-aggregable
   shuffle; survivors keep the smallest doc id per digest.
2. **MinHash-LSH near-dup pairs** over the exact survivors — signatures
   materialized to ``--sig-dir`` (parquet) when given, so a re-run or an
   incremental pass never repeats the k-linear signature stage.
3. **Survivor selection** — ``cc`` (default): connected components over
   the verified pairs, keep each cluster's smallest id (true transitive
   closure, log-convergent rounds); or ``greedy``: drop the larger id of
   every pair (one pass, over-drops on chains — see minhash_lsh_dedup).
4. Write the deduped corpus + a one-line JSON report (counts per
   stage; use operators.bucket_cap_stats separately when tuning
   ``--max-bucket``).

With ``--incremental`` (requires ``--sig-dir``), the input is treated
as a NEW batch deduped against the signature store of everything
processed before (operators.incremental_minhash_dedup): history text is
never re-read, history is never dropped, survivors' signatures append
to the store, and the output holds only this batch's survivors — run it
per crawl increment with disjoint, increasing doc ids.

The doc id is synthesized as a content-independent dense id when the
input has none (monotonically_increasing_id — stable within one run,
recorded in the output so later incremental runs can join on it).
"""

from __future__ import annotations

import argparse
import json
import time

import os
import sys
# bare local runs (`python jobs/<job>.py`) find the package next to
# jobs/; spark-submit deployments supply it via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def novelty_preflight(batch_df, text_col: str, sig_dir: str,
                      k: int = 4096) -> dict:
    """Theta content-novelty estimate BEFORE the incremental dedup's
    candidate work: one KMV pass over the BATCH's content digests (the
    store is a persisted 32 KB sketch, never rescanned) estimates how
    much of the batch is new vs already-seen content — the
    skip-this-crawl / budget signal, with the sketch's published
    bounds.  The batch state then merges into the store sketch
    (associative, so the store equals a from-scratch build).  Uses the
    same digest rule as exact_dedup."""
    from pyspark.sql import functions as F
    from gopie_spark.kernels import Theta
    from gopie_spark.operators.dedup import content_digest
    from gopie_spark.operators.sketch_agg import global_sketch

    th = Theta(k=k)
    batch = global_sketch(
        batch_df.filter(F.col(text_col).isNotNull())
        .select(content_digest(text_col).alias("v")), "v", th)
    path = os.path.join(sig_dir, "_theta_digests.bin")
    if os.path.exists(path):
        with open(path, "rb") as fh:
            store = th.deserialize(fh.read())
    else:
        store = th.zero()
    est_batch = th.estimate(batch)
    overlap = (th.intersect_estimate(store, batch)
               if store["hashes"].size else 0.0)
    merged = th.merge(store, batch)
    os.makedirs(sig_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(th.serialize(merged))
    os.replace(tmp, path)
    return {
        "batch_distinct_est": int(round(est_batch)),
        "overlap_with_store_est": int(round(overlap)),
        "new_distinct_est": int(round(max(est_batch - overlap, 0.0))),
        "store_distinct_est": int(round(th.estimate(merged))),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", default="parquet")
    ap.add_argument("--sig-dir", default=None,
                    help="materialize MinHash signatures to this parquet "
                         "dir (reusable by later runs)")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--strategy", choices=("cc", "greedy"), default="cc")
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--max-bucket", type=int, default=64)
    ap.add_argument("--incremental", action="store_true",
                    help="dedup this input as a NEW batch against the "
                         "--sig-dir store (history immutable; "
                         "survivor sigs appended)")
    ap.add_argument("--batch-date", default=None,
                    help="day label for this batch: signature and "
                         "paragraph store updates overwrite their own "
                         "batch=<date> partition (idempotent re-runs) "
                         "instead of appending; required for the "
                         "index options below")
    ap.add_argument("--band-index", default=None,
                    help="with --incremental: probe history through "
                         "this build_band_index directory (bucketed "
                         "at-rest scans; post-index partitions as "
                         "deltas) instead of re-aggregating the store")
    ap.add_argument("--bbit", type=int, default=None,
                    choices=(1, 2, 4, 8),
                    help="verify candidates from packed b-bit words "
                         "(64/b-fold smaller verification shuffle; "
                         "with --incremental the fetch reads the band "
                         "index's packed layout at rest when present)")
    ap.add_argument("--paragraph-index", default=None,
                    help="with --paragraph-store: history anti-join "
                         "through this build_pk_index directory")
    ap.add_argument("--paragraph-unit", default="paragraph",
                    choices=["paragraph", "sentence"],
                    help="granularity of the keep-first stage (a store "
                         "holds keys of ONE unit kind; do not mix)")
    ap.add_argument("--paragraph-store", default=None,
                    help="run CCNet keep-first paragraph dedup against "
                         "this paragraph-key parquet store FIRST (text "
                         "replaced by surviving paragraphs, emptied "
                         "docs dropped, new keys appended)")
    ap.add_argument("--quarantine", action="store_true",
                    help="split rows with null --text-col (or oversize "
                         "with --max-text-len) off before any dedup "
                         "stage, persist them with reasons to "
                         "<output>.quarantine, and report per-reason "
                         "counts (sources/quality.py)")
    ap.add_argument("--max-text-len", type=int, default=None,
                    help="with --quarantine: also quarantine rows whose "
                         "text exceeds this many characters")
    args = ap.parse_args()
    if args.incremental and not args.sig_dir:
        raise SystemExit("--incremental requires --sig-dir")
    if args.band_index and not args.incremental:
        raise SystemExit("--band-index requires --incremental")
    if args.paragraph_index and not args.paragraph_store:
        raise SystemExit("--paragraph-index requires --paragraph-store")
    if (args.band_index or args.paragraph_index) and not args.batch_date:
        raise SystemExit("the index options require --batch-date (the "
                         "stores must be day-partitioned)")

    from pyspark.sql import functions as F
    from gopie_spark.plans import get_spark
    from gopie_spark.operators.dedup import (exact_dedup,
                                             incremental_minhash_dedup,
                                             lsh_preflight_report,
                                             minhash_lsh_dedup,
                                             minhash_signature_table)
    from gopie_spark.sources.catalog import load_table

    spark = get_spark("gopie-dedup-corpus")
    t0 = time.perf_counter()

    pages = load_table(spark, args.input, args.format)
    if args.text_col not in pages.columns:
        raise SystemExit(f"--input has no '{args.text_col}' column "
                         f"(columns: {pages.columns})")
    if "doc_id" not in pages.columns:
        pages = pages.withColumn("doc_id", F.monotonically_increasing_id())
    quarantined = None
    if args.quarantine:
        # contract violators never reach a digest or signature: a null
        # text would otherwise tokenize to nothing and (pre null-safe
        # exact_dedup) every null row shared one null digest group
        from gopie_spark.sources.quality import split_quarantine
        qurl = "url" if "url" in pages.columns else None
        pages, bad = split_quarantine(pages, url_col=qurl,
                                      text_col=args.text_col,
                                      max_text_len=args.max_text_len)
        qdir = args.output.rstrip("/") + ".quarantine"
        bad.write.mode("overwrite").parquet(qdir)
        quarantined = {
            r["_reason"]: r["n"]
            for r in spark.read.parquet(qdir).groupBy("_reason")
            .agg(F.count("*").alias("n")).collect()}
    n_input = pages.count()

    # stage 0 (optional): paragraph-level keep-first dedup vs the
    # paragraph-key store — boilerplate paragraphs vanish BEFORE any
    # doc-level digest/signature sees them
    n_para = None
    if args.paragraph_store:
        from gopie_spark.operators.dedup import incremental_paragraph_dedup
        pd_out = incremental_paragraph_dedup(
            pages, args.paragraph_store, text_col=args.text_col,
            unit=args.paragraph_unit,
            joiner=" " if args.paragraph_unit == "sentence" else "\n",
            store_partition=args.batch_date,
            pk_index=args.paragraph_index)
        pages = (pd_out.filter(F.col("n_paras_kept") > 0)
                 .withColumn(args.text_col, F.col("clean_text"))
                 .drop("clean_text", "n_paras", "n_paras_kept")
                 .persist())
        n_para = pages.count()

    # stage 1: exact dedup (cheap, removes byte-identical boilerplate
    # before the k-linear signature stage sees it)
    survivors = exact_dedup(pages, text_col=args.text_col).persist()
    n_exact = survivors.count()

    # stage 2+3: near-dup pairs + survivor selection
    preflight = None
    novelty = None
    if args.incremental:
        novelty = novelty_preflight(pages, args.text_col, args.sig_dir)
        deduped = incremental_minhash_dedup(
            survivors, args.sig_dir, text_col=args.text_col,
            threshold=args.threshold, strategy=args.strategy, k=args.k,
            bands=args.bands, max_bucket=args.max_bucket,
            store_partition=args.batch_date,
            band_index=args.band_index, bbit=args.bbit).persist()
    else:
        # build the (k-linear) signature table ONCE, run the pre-flight
        # skew report on it (one cheap groupBy — tells you whether
        # --max-bucket is capping recall BEFORE the quadratic pair
        # expansion runs), then feed the same table to the expansion
        sigs = minhash_signature_table(
            survivors, text_col=args.text_col, k=args.k,
            sig_path=args.sig_dir)
        preflight = lsh_preflight_report(sigs, k=args.k,
                                         bands=args.bands,
                                         max_bucket=args.max_bucket)
        deduped = minhash_lsh_dedup(
            survivors, text_col=args.text_col, threshold=args.threshold,
            strategy=args.strategy, k=args.k, bands=args.bands,
            max_bucket=args.max_bucket, sigs=sigs,
            bbit=args.bbit).persist()
    n_final = deduped.count()
    if not args.incremental:
        sigs.unpersist()  # no-op when parquet-backed via --sig-dir

    deduped.write.mode("overwrite").parquet(args.output)

    report = {
        "rows_in": n_input,
        "after_paragraph_dedup": n_para,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_final,
        "exact_dups_removed": n_input - n_exact,
        "near_dups_removed": n_exact - n_final,
        "strategy": args.strategy,
        "threshold": args.threshold,
        "seconds": round(time.perf_counter() - t0, 3),
        "signatures": args.sig_dir,
        "paragraph_store": args.paragraph_store,
        "incremental": args.incremental,
        "batch_date": args.batch_date,
        "band_index": args.band_index,
        "paragraph_index": args.paragraph_index,
        "lsh_preflight": preflight,
        "novelty_preflight": novelty,
        "quarantined": quarantined,
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
