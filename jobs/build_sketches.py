#!/usr/bin/env python
"""Production entrypoint: build the sketch suite over a pages table.

Run with spark-submit and the packaged library (north-rule packaging):

    cd /root/repo && zip -qr /tmp/gopie_spark.zip gopie_spark
    spark-submit --py-files /tmp/gopie_spark.zip jobs/build_sketches.py \\
        --input /path/to/pages_parquet \\
        --checkpoint /path/to/ckpt \\
        --output /path/to/results \\
        [--format parquet|iceberg] [--salt 8] [--hll-p 14] [--resume-only]

For Iceberg inputs pass ``--format iceberg --input catalog.db.pages`` and
launch with the Iceberg runtime on the classpath (sources/catalog.py has
the exact spark-submit configuration).

Resumable: work is bucketed by jump-hash of input file names (stable
across cluster sizes); re-running after a failure processes only the
missing buckets, and the final merged states are byte-identical to an
uninterrupted run (see plans/checkpoint.py).

Skew: the per-lang aggregation salts hot keys (--salt) — en is ~45% of a
Common-Crawl-style corpus; salting bounds any single merge task's fan-in
and cannot change results (merge associativity).

Dirty input: a real crawl always has contract-violating rows (null/empty
url or text, decoded-binary oversize pages).  --quarantine excludes them
from every build and persists them with reasons to <output>/quarantine
(sources/quality.py); the summary always reports single-pass quality
counters for the raw input either way.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--format", default="parquet",
                    help="input table format: parquet (default) or "
                         "iceberg (catalog table name or path; requires "
                         "the Iceberg runtime jar — see sources/catalog.py)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--hll-p", type=int, default=14)
    ap.add_argument("--salt", type=int, default=-1,
                    help="finalize-merge salt for hot keys; -1 "
                         "(default) = data-driven via suggest_salt on "
                         "a 1%% sample, 0 = off")
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--resume-only", action="store_true",
                    help="finalize from existing checkpoint without "
                         "processing new buckets")
    ap.add_argument("--time-windows", action="store_true",
                    help="also build the query-time-window states over "
                         "warc_ts: sliding-HLL distinct urls (any suffix "
                         "cutoff) and windowed-CMS token frequencies "
                         "(any trailing window) — one extra pass each")
    ap.add_argument("--window-resolution", type=float, default=86400.0,
                    help="windowed-CMS tick width in seconds")
    ap.add_argument("--window-horizon", type=int, default=365,
                    help="windowed-CMS retention horizon in ticks")
    ap.add_argument("--drift-states", action="store_true",
                    help="also persist this snapshot's drift states "
                         "(theta url set, CountSketch + Misra-Gries "
                         "token frequencies, KLL token counts, exact "
                         "lang counts) to <output>/drift — two such "
                         "directories diff with jobs/snapshot_diff.py "
                         "using ZERO Spark and ZERO corpus reads")
    ap.add_argument("--drift-group-col", default=None,
                    help="with --drift-states: also persist per-group "
                         "theta/KLL drift states keyed by this column "
                         "(e.g. lang) — one extra keyed co-build scan; "
                         "snapshot_diff then reports per-group drift")
    ap.add_argument("--quarantine", action="store_true",
                    help="exclude contract-violating rows (null/empty "
                         "url, null/empty text, oversize text with "
                         "--max-text-len) from EVERY sketch build and "
                         "persist them with reasons to "
                         "<output>/quarantine; per-reason counts land "
                         "in the summary.  Must be passed consistently "
                         "across resumes of one --checkpoint dir: it "
                         "changes what the bucket partials contain")
    ap.add_argument("--bloom-n", type=int, default=None,
                    help="size the sharded Bloom filters for this "
                         "PLANNED key capacity instead of the input's "
                         "row count — required consistent across "
                         "stores that will be merge-folded "
                         "(jobs/daily_update.py / merge_stores)")
    ap.add_argument("--max-text-len", type=int, default=None,
                    help="with --quarantine: also quarantine rows whose "
                         "text exceeds this many characters (decoded-"
                         "binary garbage pages)")
    args = ap.parse_args()

    from gopie_spark.plans import get_spark
    spark = get_spark("gopie-build-sketches")
    summary = run_build(spark, args)
    print(json.dumps(summary))
    spark.stop()


def run_build(spark, args) -> dict:
    """The whole build as a library call (``args`` is any object with
    the CLI's attributes — argparse.Namespace or types.SimpleNamespace)
    so orchestrators (jobs/daily_update.py) and tests compose it
    in-process on one SparkSession; ``main`` is the CLI twin."""
    from pyspark.sql import functions as F
    from gopie_spark.plans.checkpoint import SketchCheckpoint
    from gopie_spark.kernels import HLL
    from gopie_spark.operators import cms_build
    from gopie_spark.operators.membership import bloom_shards_build
    from gopie_spark.sources.catalog import load_table

    t0 = time.perf_counter()

    # fail fast with a clear message if --input is not a pages table
    # (a directory of mixed parquet tables otherwise dies deep inside
    # the checkpoint stage with a schema-mismatch plan dump)
    probe = load_table(spark, args.input, args.format)
    missing = {"url", "text", "lang"} - set(probe.columns)
    if missing:
        raise SystemExit(
            f"--input {args.input} is not a pages table: missing "
            f"column(s) {sorted(missing)}; expected the schema from "
            "sources/pages.py (url, warc_ts, html, text, lang)")

    from gopie_spark.sources.quality import (input_quality_aggs,
                                             quarantine_to_dir,
                                             split_quarantine)
    clean_transform = None
    if args.quarantine:
        def clean_transform(df):
            return split_quarantine(df, max_text_len=args.max_text_len)[0]

    hll = HLL(p=args.hll_p)
    ckpt = SketchCheckpoint(args.checkpoint, hll, ["lang"], "url",
                            n_buckets=args.n_buckets,
                            transform=clean_transform)
    if not args.resume_only:
        # iceberg: buckets are planned from the <table>.files metadata
        # table (sources/catalog.py), same resumability guarantees
        ckpt.run_until_complete(spark, args.input, fmt=args.format)
    pages = load_table(spark, args.input, args.format)

    # quality counters describe the RAW input and ride its row-count
    # scan — one pass, no extras (null url/text/lang/ts, empty text)
    qrow = pages.agg(F.count("*").alias("rows"),
                     *input_quality_aggs(
                         ts_col=("warc_ts" if "warc_ts" in pages.columns
                                 else None),
                         max_text_len=args.max_text_len)).collect()[0]
    n = int(qrow["rows"])
    input_quality = {k: int(qrow[k] or 0)
                     for k in qrow.asDict() if k != "rows"}

    quarantined = None
    if args.quarantine:
        # every downstream build sees only contract-honouring rows;
        # the offenders are persisted once, with reasons, for triage
        pages, quarantined = quarantine_to_dir(
            pages, f"{args.output}/quarantine",
            max_text_len=args.max_text_len)
        n -= sum(quarantined.values())  # rows the builds actually see
    salt = args.salt
    if salt < 0:
        # bounded-load rule made batch: no merge task's key above
        # 1.25x the average share, measured on a 1% sample
        from gopie_spark.operators.sketch_agg import suggest_salt
        salt = suggest_salt(pages, ["lang"], sample_fraction=0.01)
    states = ckpt.finalize(spark, salt=salt)
    states.write.mode("overwrite").parquet(f"{args.output}/hll_lang_url")

    # Arrow-side tokenize: no token row ever shuffles (measured 1.8x
    # faster than the JVM wordcount-shuffle variant, same sketch)
    cms, cms_state = cms_build(pages.select("text"), "text", tokenize=True)
    with open(f"{args.output}/cms_tokens.bin", "wb") as fh:
        fh.write(cms.serialize(cms_state))

    # ONE set of routing parameters shared by the build and the store
    # meta — a mismatch would silently route every later probe to the
    # wrong shard (false negatives), so they must not be two literals.
    # bloom_n (optional attr / --bloom-n) sizes the filters for a PLANNED
    # capacity instead of this input's row count — stores that will be
    # folded together (jobs/daily_update.py) must share one sizing or
    # the per-shard geometries cannot merge (operators/store.py).
    bloom_shards, bloom_p = 256, 0.001
    bloom_n = getattr(args, "bloom_n", None) or n
    shard_states = bloom_shards_build(pages.select("url"), "url",
                                      n=bloom_n, p=bloom_p,
                                      shards=bloom_shards)
    shard_states.write.mode("overwrite") \
        .parquet(f"{args.output}/bloom_url_shards")

    # the output directory is a SketchStore (operators/store.py): record
    # what a zero-Spark reader needs to route probes and name keyed cols
    from gopie_spark.operators.store import update_store_meta
    update_store_meta(args.output, bloom_shards=bloom_shards,
                      bloom_n=bloom_n, bloom_p=bloom_p,
                      hll_key_col="lang", rows=n)

    outputs = ["hll_lang_url", "bloom_url_shards", "cms_tokens.bin"]
    if args.time_windows:
        # query-time-window states: built once, answer any suffix /
        # trailing window later (kernels/slidinghll.py, windowcms.py)
        from gopie_spark.operators import (sliding_hll_build,
                                           window_cms_tokens_build)
        sh, sh_state = sliding_hll_build(pages, "url", "warc_ts",
                                         p=args.hll_p)
        with open(f"{args.output}/sliding_hll_url.bin", "wb") as fh:
            fh.write(sh.serialize(sh_state))
        wc, wc_state = window_cms_tokens_build(
            pages, text_col="text", ts_col="warc_ts",
            resolution=args.window_resolution,
            n_ticks=args.window_horizon)
        with open(f"{args.output}/window_cms_tokens.bin", "wb") as fh:
            fh.write(wc.serialize(wc_state))
        outputs += ["sliding_hll_url.bin", "window_cms_tokens.bin"]

    if args.drift_states:
        # snapshot-diff states: a later crawl persisted the same way is
        # compared by jobs/snapshot_diff.py without re-reading either
        # corpus (operators/drift.py)
        from gopie_spark.operators.drift import persist_drift_states
        persist_drift_states(pages, f"{args.output}/drift",
                             group_col=args.drift_group_col)
        outputs.append("drift")

    if quarantined is not None:
        outputs.append("quarantine")
    summary = {
        "rows": n,
        "seconds": round(time.perf_counter() - t0, 3),
        "outputs": outputs,
        "input_quality": input_quality,
    }
    if quarantined is not None:
        summary["quarantined"] = quarantined
    return summary


if __name__ == "__main__":
    main()
