#!/usr/bin/env python
"""Sketch-cube builder: scan a table once, persist a cube of mergeable
sketch states keyed on dimension columns, answer every later rollup by
merge-only reads (operators/cube.py).  Incremental: `--merge-into`
folds this run's cube into an existing one cell-wise — history is
never rescanned, and by merge associativity the result is byte-equal
to a from-scratch build over all the data.

    cd /root/repo && zip -qr /tmp/gopie_spark.zip gopie_spark
    spark-submit --py-files /tmp/gopie_spark.zip jobs/sketch_cube.py \\
        --input /path/pages --dims lang,day --value url \\
        --out /path/cube [--sketch hll:p=14 | theta:k=4096] \\
        [--partition-dim day] [--derive-day-from warc_ts] \\
        [--format parquet|iceberg] [--salt 8] \\
        [--merge-into /path/existing_cube]

At 10^12 docs: the build is ONE two-level sketch_agg pass (the same
shuffle a groupBy needs, but reduced rows are constant-size states);
the persisted cube is |cells| x KB — megabytes where the table is
100 TB.  Hot cells (en is ~45% of Common Crawl) salt with --salt,
which cannot change results.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_sketch(spec: str):
    """'hll:p=14' / 'theta:k=4096' / 'hll' -> kernel instance."""
    from gopie_spark.kernels import HLL, Theta
    name, _, params = spec.partition(":")
    kw = {}
    for kv in filter(None, params.split(",")):
        k, _, v = kv.partition("=")
        kw[k] = int(v)
    if name == "hll":
        return HLL(**kw)
    if name == "theta":
        return Theta(**kw)
    raise SystemExit(f"--sketch {spec!r}: want hll[:p=N] or theta[:k=N]")


def run_cube_checkpointed(spark, input_dir, dims, value, sketch, out,
                          checkpoint, *, fmt="parquet", transform=None,
                          partition_dim=None, salt=0) -> dict:
    """Resumable cube build: partial states per jump-hash file bucket
    land in the checkpoint with lineage + metrics (plans/checkpoint.py);
    re-running after a kill processes only missing buckets, and the
    finalized cells are byte-identical to an uninterrupted build (merge
    associativity).  ``transform`` derives dim columns (e.g. day from a
    timestamp) after the raw read."""
    import json as _json

    from gopie_spark.operators.cube import _CELLS, _META
    from gopie_spark.plans.checkpoint import SketchCheckpoint

    if partition_dim is not None and partition_dim not in dims:
        raise SystemExit(
            f"--partition-dim {partition_dim!r} not in dims {list(dims)}")
    t0 = time.perf_counter()
    ckpt = SketchCheckpoint(checkpoint, sketch, list(dims), value,
                            transform=transform)
    ckpt.run_until_complete(spark, input_dir, fmt=fmt)
    cells = ckpt.finalize(spark, salt=salt).localCheckpoint()
    w = cells.write.mode("overwrite")
    if partition_dim:
        w = w.partitionBy(partition_dim)
    w.parquet(os.path.join(out, _CELLS))
    meta = {"dims": list(dims), "value_col": value,
            "partition_dim": partition_dim,
            "zero_blob_hex": sketch.serialize(sketch.zero()).hex()}
    tmp_meta = os.path.join(out, _META + ".tmp")
    with open(tmp_meta, "w") as f:
        _json.dump(meta, f)
    os.replace(tmp_meta, os.path.join(out, _META))
    report = {
        "dims": list(dims), "value": value, "cells": cells.count(),
        "incremental": False, "checkpointed": True,
        "runs": len(ckpt._manifested_runs()),
        "wall_s": round(time.perf_counter() - t0, 2),
    }
    with open(os.path.join(out, "cube_report.json"), "w") as f:
        _json.dump(report, f, indent=1)
    return report


def run_cube(spark, df, dims, value, sketch, out, *,
             partition_dim=None, salt=0, merge_into=None) -> dict:
    """Build (or incrementally extend) a persisted cube; returns the
    report dict.  Pure function of its inputs."""
    from gopie_spark.operators.cube import (_CELLS, _META,
                                            build_sketch_cube,
                                            load_sketch_cube, merge_cubes)

    t0 = time.perf_counter()
    n_rows = df.count()
    if merge_into:
        old_cells, old_sketch, old_dims = load_sketch_cube(spark,
                                                           merge_into)
        if old_dims != list(dims):
            raise SystemExit(
                f"--merge-into cube dims {old_dims} != {list(dims)}")
        if old_sketch.serialize(old_sketch.zero()) != \
                sketch.serialize(sketch.zero()):
            raise SystemExit("--merge-into cube kernel/params differ "
                             "from --sketch (states would not merge)")
        new_cells = build_sketch_cube(df, dims, value, sketch, salt=salt)
        cells = merge_cubes(old_cells, new_cells, dims, sketch,
                            salt=salt).localCheckpoint()
        w = cells.write.mode("overwrite")
        if partition_dim:
            w = w.partitionBy(partition_dim)
        w.parquet(os.path.join(out, _CELLS))
        with open(os.path.join(merge_into, _META)) as f:
            meta = json.load(f)
        tmp_meta = os.path.join(out, _META + ".tmp")
        with open(tmp_meta, "w") as f:
            json.dump(meta, f)
        os.replace(tmp_meta, os.path.join(out, _META))
    else:
        cells = build_sketch_cube(df, dims, value, sketch, path=out,
                                  partition_dim=partition_dim, salt=salt)
    report = {
        "rows": n_rows, "dims": list(dims), "value": value,
        "cells": cells.count(), "incremental": bool(merge_into),
        "wall_s": round(time.perf_counter() - t0, 2),
    }
    with open(os.path.join(out, "cube_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def run_rollup(spark, cube_dir, keep_dims, where_sql=None) -> list:
    """Query mode: reopen a persisted cube, merge up to ``keep_dims``
    (optionally filtering cells with a SQL predicate first — a
    partition-dim predicate statically prunes files), return
    [{dims..., estimate}] — merge-only, no raw-table access."""
    from pyspark.sql import functions as F
    from gopie_spark.operators.cube import (load_sketch_cube,
                                            rollup_estimates)
    cells, sketch, dims = load_sketch_cube(spark, cube_dir)
    bad = [k for k in keep_dims if k not in dims]
    if bad:
        raise SystemExit(f"--rollup dims {bad} not in cube dims {dims}")
    where = F.expr(where_sql) if where_sql else None
    out = rollup_estimates(cells, keep_dims, sketch, where=where)
    return [{**{k: str(r[k]) for k in keep_dims},
             "estimate": r["estimate"]} for r in out.collect()]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input",
                    help="build mode: input table (required unless "
                         "--rollup)")
    ap.add_argument("--format", default="parquet")
    ap.add_argument("--dims",
                    help="build mode: comma-separated dimension columns")
    ap.add_argument("--value",
                    help="build mode: column whose distincts the "
                         "sketch tracks")
    ap.add_argument("--out",
                    help="build mode: cube output dir")
    ap.add_argument("--rollup",
                    help="query mode: comma-separated dims to keep "
                         "(requires --cube; '' for the global state)")
    ap.add_argument("--cube", help="query mode: persisted cube dir")
    ap.add_argument("--local", action="store_true",
                    help="query mode: serve the rollup with ZERO Spark "
                         "(pyarrow + NumPy; --where limited to one "
                         "dim='value' equality, which file-prunes the "
                         "hive partition layout)")
    ap.add_argument("--where", default=None,
                    help="query mode: SQL predicate over cube cells "
                         "(partition-dim predicates prune files)")
    ap.add_argument("--sketch", default="hll:p=14")
    ap.add_argument("--partition-dim", default=None)
    ap.add_argument("--derive-day-from", default=None,
                    help="timestamp column to derive a 'day' dim from")
    ap.add_argument("--salt", type=int, default=-1,
                    help="merge-fanin salt for hot cells; -1 (default) "
                         "= data-driven via suggest_salt on a 1%% "
                         "sample (reported), 0 = off")
    ap.add_argument("--merge-into", default=None,
                    help="existing cube dir: fold this build into it "
                         "cell-wise (incremental; history not rescanned)")
    ap.add_argument("--checkpoint", default=None,
                    help="build mode: resumable bucket-checkpointed "
                         "build (per-partition lineage + metrics; "
                         "re-run after a failure to continue)")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    if args.rollup is not None and args.local:
        # serve mode: NO SparkSession — pyarrow + NumPy only
        # (operators/cube.py:local_rollup; the cells table is KB-sized
        # states regardless of corpus scale)
        if not args.cube:
            raise SystemExit("--rollup requires --cube")
        import re
        from gopie_spark.operators.cube import local_rollup
        keep = [d for d in args.rollup.split(",") if d]
        filters = None
        if args.where:
            m = re.fullmatch(r"\s*(\w+)\s*=\s*'?([^']*)'?\s*", args.where)
            if not m:
                raise SystemExit("--local supports only a single "
                                 "\"dim = 'value'\" --where predicate")
            dim, raw = m.group(1), m.group(2)
            # coerce to the dim's actual (hive-inferred) type — pyarrow
            # filter kernels refuse e.g. (int32, string) comparisons
            import pyarrow.dataset as pads
            field = pads.dataset(os.path.join(args.cube, "cells"),
                                 partitioning="hive").schema.field(dim)
            import pyarrow as pa
            try:
                value = pa.scalar(raw).cast(field.type).as_py()
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
                raise SystemExit(
                    f"--where value {raw!r} does not parse as {dim}'s "
                    f"type {field.type}: {e}")
            filters = [(dim, "=", value)]
        kernel, states = local_rollup(args.cube, keep, filters=filters)
        final = getattr(kernel, "estimate", None) or kernel.count
        rows = [{**dict(zip(keep, (str(v) for v in k))),
                 "estimate": float(final(st))}
                for k, st in sorted(states.items(),
                                    key=lambda kv: tuple(map(str, kv[0])))]
        print(json.dumps({"cube": args.cube, "rollup": keep,
                          "where": args.where, "local": True,
                          "cells": rows}))
        return

    from gopie_spark.plans import get_spark
    from gopie_spark.sources.catalog import load_table

    spark = get_spark("gopie-sketch-cube")
    if args.rollup is not None:
        if not args.cube:
            raise SystemExit("--rollup requires --cube")
        keep = [d for d in args.rollup.split(",") if d]
        rows = run_rollup(spark, args.cube, keep, args.where)
        print(json.dumps({"cube": args.cube, "rollup": keep,
                          "where": args.where, "cells": rows}))
        spark.stop()
        return
    if not (args.input and args.dims and args.value and args.out):
        raise SystemExit("build mode requires --input --dims --value "
                         "--out (or use --rollup --cube)")
    transform = None
    if args.derive_day_from:
        ts = args.derive_day_from

        def transform(d):  # noqa: E306
            return d.withColumn("day", F.to_date(F.col(ts)))
    dims = args.dims.split(",")
    df = load_table(spark, args.input, args.format)
    if transform is not None:
        df = transform(df)
    salt = args.salt
    if salt < 0:
        # data-driven: no merge task's cell may exceed 1.25x the average
        # share; key shares converge on a 1% sample (exact counts never
        # needed) — the skew pre-flight the 100-TB build wants by default
        from gopie_spark.operators.sketch_agg import suggest_salt
        salt = suggest_salt(df, dims, sample_fraction=0.01)
    if args.checkpoint:
        if args.merge_into:
            raise SystemExit("--checkpoint and --merge-into are "
                             "separate build modes")
        report = run_cube_checkpointed(
            spark, args.input, dims, args.value,
            parse_sketch(args.sketch), args.out, args.checkpoint,
            fmt=args.format, transform=transform,
            partition_dim=args.partition_dim, salt=salt)
    else:
        report = run_cube(spark, df, dims, args.value,
                          parse_sketch(args.sketch), args.out,
                          partition_dim=args.partition_dim, salt=salt,
                          merge_into=args.merge_into)
    report["input"] = args.input
    report["salt"] = salt
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
