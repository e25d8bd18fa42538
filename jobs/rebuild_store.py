#!/usr/bin/env python
"""Rebuild the serving artifacts of a daily_update state from its
curated days — the disaster-recovery / flag-change path.

The daily fold refuses to commit a day whose build flags mismatch the
serving store (one-sided artifacts would be silently dropped), and its
remedy is "rebuild the store from scratch".  This job IS that rebuild:
the curated per-day documents are the durable source of truth, so the
serving store, the (lang, day) url cube, and the MinHash signature
store are all reconstructible from them without re-crawling,
re-curating, or re-deduplicating anything:

    cd /root/repo && zip -qr /tmp/gopie_spark.zip gopie_spark
    spark-submit --py-files /tmp/gopie_spark.zip jobs/rebuild_store.py \\
        --state /path/to/state [--bloom-n N] [--hll-p 14] \\
        [--time-windows [--window-resolution SECS] [--window-horizon N]] \\
        [--skip-sigs] [--skip-cube]

What it does:

1. **Serving store**: ONE resumable sketch build over ALL curated days
   (jobs/build_sketches.run_build on ``<state>/curated`` — the
   partition layout is checkpoint-bucketed file-by-file, quarantine
   dirs are hidden by the ``_`` rule), then an atomic swap into
   ``<state>/store`` with every day's applied marker carried in.  This
   is cheaper than replaying N day-folds and byte-equivalent for the
   linear/lattice kernels (merge gates, operators/store.py).
2. **Signature store**: per-day MinHash signatures rebuilt into the
   day-partitioned layout ``incremental_minhash_dedup`` maintains
   (every curated doc is a survivor by construction, so its signature
   belongs in the store).  ``--k/--shingle-width`` must match the
   values the daily job used or future batches would compare
   incompatible signatures.
3. **Cube**: the (lang, day) url HLL cube rebuilt from scratch over
   the same scan's day partitions.

Swaps reuse the daily job's crash-safe rename protocol (recovered on
the next run of either job).  The state-level ``_applied`` mirrors are
rewritten to exactly the curated day set.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from types import SimpleNamespace

_JOBS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_JOBS_DIR))
sys.path.insert(0, _JOBS_DIR)


def run_rebuild(spark, state: str, *, bloom_n: int = 1_000_000_000,
                hll_p: int = 14, time_windows: bool = False,
                window_resolution: float = 86400.0,
                window_horizon: int = 365, k: int = 128,
                shingle_width: int = 3, skip_sigs: bool = False,
                skip_cube: bool = False,
                compact_sigs: bool = False,
                band_index: bool = False,
                bbit=None) -> dict:
    """The whole rebuild as a library call; ``main`` is the CLI twin."""
    from pyspark.sql import functions as F
    from gopie_spark.kernels import HLL
    from gopie_spark.operators.dedup import add_minhash_signatures
    from daily_update import _recover_swaps, _swap_dir  # noqa: E402
    from build_sketches import run_build  # noqa: E402
    from sketch_cube import run_cube  # noqa: E402

    t0 = time.perf_counter()
    curated = os.path.join(state, "curated")
    days = sorted(d.split("=", 1)[1] for d in os.listdir(curated)
                  if d.startswith("day=")) if os.path.isdir(curated) else []
    if not days:
        raise SystemExit(f"nothing to rebuild: no curated day=* dirs "
                         f"under {curated}")
    _recover_swaps(state)
    acct: dict = {"days": days}

    # -- 1. serving store: one build over every curated day.  A crashed
    # rebuild RESUMES its checkpoint buckets (the whole point of the
    # checkpoint on an N-day corpus scan); only when the curated
    # listing changed since the crash (another daily ran) is the
    # checkpoint reset — SketchCheckpoint detects that itself.
    ckpt = os.path.join(state, "ckpt_rebuild")
    new_store = os.path.join(state, "store.rebuild")
    if os.path.exists(new_store):
        shutil.rmtree(new_store)
    build_args = SimpleNamespace(
        input=curated, format="parquet", checkpoint=ckpt,
        output=new_store, hll_p=hll_p, salt=-1, n_buckets=32,
        resume_only=False, time_windows=time_windows,
        window_resolution=window_resolution,
        window_horizon=window_horizon,
        drift_states=False, drift_group_col=None, quarantine=False,
        max_text_len=None, bloom_n=bloom_n)
    try:
        acct["store_build"] = run_build(spark, build_args)
    except ValueError as e:
        if "different input listing" not in str(e):
            raise
        shutil.rmtree(ckpt)
        acct["ckpt_reset"] = True
        acct["store_build"] = run_build(spark, build_args)
    applied = os.path.join(new_store, "_applied")
    os.makedirs(applied, exist_ok=True)
    for d in days:
        with open(os.path.join(applied, d), "w") as fh:
            fh.write(json.dumps({"rebuilt": True}))
    _swap_dir(new_store, os.path.join(state, "store"))
    shutil.rmtree(ckpt, ignore_errors=True)

    # -- 2. signature store: day-partitioned, or compacted into ONE
    # base partition (--compact-sigs) — after years of daily batches
    # the per-day layout costs a file listing per partition on every
    # incremental probe; compaction keeps the partitioned layout
    # contract (future days still overwrite their own batch=<date>)
    if not skip_sigs:
        sig_new = os.path.join(state, "sig_store.rebuild")
        if os.path.exists(sig_new):
            shutil.rmtree(sig_new)

        def _sigs(df):
            return add_minhash_signatures(
                df, "text", k=k, shingle_width=shingle_width,
                out_col="minhash") \
                .select(F.col("url").alias("_id"), "minhash")

        if compact_sigs:
            _sigs(spark.read.parquet(curated)) \
                .write.mode("overwrite") \
                .parquet(os.path.join(sig_new, "batch=base"))
            acct["sig_store"] = {"batches": 1, "compacted": True,
                                 "k": k, "shingle_width": shingle_width}
        else:
            for d in days:
                _sigs(spark.read.parquet(
                    os.path.join(curated, f"day={d}"))) \
                    .write.mode("overwrite") \
                    .parquet(os.path.join(sig_new, f"batch={d}"))
            acct["sig_store"] = {"batches": len(days), "k": k,
                                 "shingle_width": shingle_width}
        idx_dir = os.path.join(state, "band_index")
        has_index = os.path.exists(
            os.path.join(idx_dir, "_index_meta.json"))
        if has_index:
            # the swap below invalidates the index base (rewritten /
            # compacted partitions; possibly changed signatures) and
            # the rebuild only runs AFTER it — persist needs_rebuild
            # first so a crash inside the window is picked up as
            # reindex_force by the next daily run instead of probing
            # through a stale base (the rebuild's fresh meta commit
            # clears the flag)
            from gopie_spark.operators.dedup import _write_index_meta
            with open(os.path.join(idx_dir, "_index_meta.json")) as fh:
                _imeta = json.load(fh)
            _imeta["needs_rebuild"] = True
            _write_index_meta(idx_dir, _imeta)
        _swap_dir(sig_new, os.path.join(state, "sig_store"))
        if band_index or has_index:
            # an EXISTING index must be rebuilt after the store rewrite
            # even without --band-index: after --compact-sigs its base
            # covers batch names that no longer exist (every rewritten
            # partition becomes a delta — the O(corpus x bands) cost
            # the index exists to remove), and even a name-preserving
            # rebuild may have changed the signatures themselves (a k
            # or shingle-width change leaves names identical but makes
            # the index base silently stale — recall loss with no
            # error).  Proving content-identity would need the
            # original build's parameters, which the store does not
            # record, so the rebuild is unconditional; its cost is the
            # same order as the re-sign this job just paid.
            # Keep the old index's own bands/cap/buckets; k must match
            # the signatures just written, so it follows this rebuild.
            from gopie_spark.operators.dedup import build_band_index
            kw = {"k": k, "bands": 32, "max_bucket": 64,
                  "bbit": bbit}
            if has_index:
                with open(os.path.join(idx_dir,
                                       "_index_meta.json")) as fh:
                    old = json.load(fh)
                kw = {"k": k, "bands": old["bands"],
                      "max_bucket": old["max_bucket"],
                      "index_buckets": old["index_buckets"],
                      "bbit": bbit if bbit is not None
                      else old.get("bbit")}
                if not band_index:
                    acct["band_index_auto"] = (
                        "existing index rebuilt after store rewrite")
            acct["band_index"] = build_band_index(
                spark, os.path.join(state, "sig_store"), idx_dir, **kw)

    # -- 3. (lang, day) url cube ---------------------------------------
    if not skip_cube:
        cells = (spark.read.parquet(curated)
                 .select("lang", F.col("day").cast("string").alias("day"),
                         "url"))
        cube_new = os.path.join(state, "cube.rebuild")
        if os.path.exists(cube_new):
            shutil.rmtree(cube_new)
        acct["cube"] = run_cube(spark, cells, ["lang", "day"], "url",
                                HLL(p=hll_p), cube_new,
                                partition_dim="day")
        _swap_dir(cube_new, os.path.join(state, "cube"))

    # -- 4. state-level applied mirrors == exactly the curated days ----
    mirror = os.path.join(state, "_applied")
    if os.path.exists(mirror):
        shutil.rmtree(mirror)
    os.makedirs(mirror)
    for d in days:
        with open(os.path.join(mirror, d), "w") as fh:
            fh.write(json.dumps({"rebuilt": True}))

    acct["seconds"] = round(time.perf_counter() - t0, 3)
    os.makedirs(os.path.join(state, "accounting"), exist_ok=True)
    out = os.path.join(state, "accounting", f"rebuild_thru_{days[-1]}.json")
    with open(out + ".tmp", "w") as fh:
        json.dump(acct, fh)
    os.replace(out + ".tmp", out)
    return acct


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True,
                    help="a jobs/daily_update.py --state directory")
    ap.add_argument("--bloom-n", type=int, default=1_000_000_000)
    ap.add_argument("--hll-p", type=int, default=14)
    ap.add_argument("--time-windows", action="store_true")
    ap.add_argument("--window-resolution", type=float, default=86400.0)
    ap.add_argument("--window-horizon", type=int, default=365)
    ap.add_argument("--k", type=int, default=128,
                    help="MinHash slots — must match the daily job")
    ap.add_argument("--shingle-width", type=int, default=3,
                    help="must match the daily job")
    ap.add_argument("--skip-sigs", action="store_true")
    ap.add_argument("--skip-cube", action="store_true")
    ap.add_argument("--compact-sigs", action="store_true",
                    help="rebuild the signature store as ONE base "
                         "partition instead of per-day batches")
    ap.add_argument("--bbit", type=int, default=None,
                    choices=(1, 2, 4, 8),
                    help="store packed b-bit words alongside the "
                         "signatures in the (re)built band index so "
                         "daily probes with the same bbit fetch "
                         "64/b-fold less; an existing index keeps its "
                         "recorded bbit unless overridden here")
    ap.add_argument("--band-index", action="store_true",
                    help="also (re)build the persisted LSH band-bucket "
                         "member index (operators/dedup."
                         "build_band_index) — the daily loop then "
                         "probes history with a zero-shuffle bucketed "
                         "scan instead of re-aggregating the store")
    args = ap.parse_args()

    from gopie_spark.plans import get_spark
    spark = get_spark("gopie-rebuild-store")
    acct = run_rebuild(
        spark, args.state, bloom_n=args.bloom_n, hll_p=args.hll_p,
        time_windows=args.time_windows,
        window_resolution=args.window_resolution,
        window_horizon=args.window_horizon, k=args.k,
        shingle_width=args.shingle_width, skip_sigs=args.skip_sigs,
        skip_cube=args.skip_cube, compact_sigs=args.compact_sigs,
        band_index=args.band_index, bbit=args.bbit)
    print(json.dumps(acct))
    spark.stop()


if __name__ == "__main__":
    main()
