#!/usr/bin/env python
"""Sketch-driven join/agg planning: profile a table's join key once,
then advise every later job from the KB-sized profile — zero Spark.

Profile (one corpus scan per table; the only Spark step):

    spark-submit --py-files /tmp/gopie_spark.zip jobs/plan_advice.py \\
        profile --table /data/orders.parquet --key o_custkey \\
        --out /indexes/profiles/orders [--bytes-cols c1,c2] \\
        [--format parquet]

Advise (pure NumPy over two persisted profiles — laptop-fast):

    python jobs/plan_advice.py advise \\
        --left /indexes/profiles/orders --right /indexes/profiles/customer \\
        [--broadcast-mb 10] [--target-partition-mb 128] [--out plan.json]

    python jobs/plan_advice.py agg --profile /indexes/profiles/orders \\
        [--target-rows-per-task 4000000]

Execute (Spark again — run the join the advice planned, via
plans/joiner.py: broadcast hint, or Bloom semi-join prefilter below
the shuffle + capped bounded-load salting; output multiset-equal to
the plain join):

    spark-submit --py-files /tmp/gopie_spark.zip jobs/plan_advice.py \\
        execute --left-table /data/orders.parquet --left-key o_custkey \\
        --right-table /data/customer.parquet --right-key c_custkey \\
        --out /data/joined [--how inner|left_semi] \\
        [--left-profile /indexes/profiles/orders] [--right-profile ...] \\
        [--max-salt 64]

The advice JSON carries the physical knobs a 1000-executor run must
set before touching the data: broadcast vs shuffle (from EXACT payload
bytes), the bounded-load salt for the hottest key (Misra-Gries upper
bound vs average rows/key), the shuffle width (exact bytes / target
partition bytes), and the estimated join output cardinality with its
4-sigma AMS bound — the number that says whether the join is safe to
run at all.  Every estimate is anchored to the exact answer within its
kernel's bound by the driver certificate ``join_plan_advice``
(``__spark_entry__.py``).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

# bare local runs (`python jobs/<job>.py`) find the package next to
# jobs/; spark-submit deployments supply it via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cmd_profile(args) -> None:
    from gopie_spark.plans import get_spark
    from gopie_spark.plans.advisor import (build_join_profile,
                                           persist_join_profile)
    from gopie_spark.sources.catalog import load_table

    spark = get_spark("plan-advice-profile")
    try:
        df = load_table(spark, args.table, fmt=args.format)
        prof = build_join_profile(
            df, args.key,
            bytes_cols=(args.bytes_cols.split(",")
                        if args.bytes_cols else None),
            theta_k=args.theta_k, mg_k=args.mg_k,
            ams_means=args.ams_means)
        written = persist_join_profile(prof, args.out)
        print(json.dumps({"profile": written, "key": args.key,
                          "n_rows": prof.n_rows,
                          "total_bytes": prof.total_bytes,
                          "distinct_est": prof.distinct_est}))
    finally:
        spark.stop()


def _cmd_advise(args) -> None:
    from gopie_spark.plans.advisor import join_advice, load_join_profile

    advice = join_advice(
        load_join_profile(args.left), load_join_profile(args.right),
        broadcast_bytes=args.broadcast_mb << 20,
        target_partition_bytes=args.target_partition_mb << 20,
        load_factor=args.load_factor)
    out = json.dumps(advice)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out + "\n")
    print(out)


def _cmd_execute(args) -> None:
    """Run the advised join end-to-end: load (or build) the two
    profiles, advise, execute with :func:`plans.joiner.advised_join`,
    write the result, and print one JSON line with the advice plan,
    the execution report (prefilter side, Bloom bytes, salt actually
    used), and the output row count — the same accounting shape as
    ``dedup_corpus``'s preflight blocks."""
    from gopie_spark.plans import get_spark
    from gopie_spark.plans.advisor import (build_join_profile,
                                           join_advice, load_join_profile)
    from gopie_spark.plans.joiner import advised_join
    from gopie_spark.sources.catalog import load_table

    spark = get_spark("plan-advice-execute")
    try:
        left = load_table(spark, args.left_table, fmt=args.format)
        right = load_table(spark, args.right_table, fmt=args.format)
        pl = (load_join_profile(args.left_profile) if args.left_profile
              else build_join_profile(left, args.left_key))
        pr = (load_join_profile(args.right_profile) if args.right_profile
              else build_join_profile(right, args.right_key))
        advice = join_advice(
            pl, pr, broadcast_bytes=args.broadcast_mb << 20,
            target_partition_bytes=args.target_partition_mb << 20,
            load_factor=args.load_factor)
        report: dict = {}
        joined = advised_join(left, right,
                              (args.left_key, args.right_key), advice,
                              how=args.how, max_salt=args.max_salt,
                              report=report)
        joined.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"out": args.out, "rows": n, "how": args.how,
                          "plan": advice["plan"], "execution": report}))
    finally:
        spark.stop()


def _cmd_agg(args) -> None:
    from gopie_spark.plans.advisor import agg_advice, load_join_profile

    advice = agg_advice(load_join_profile(args.profile),
                        target_rows_per_task=args.target_rows_per_task,
                        load_factor=args.load_factor)
    out = json.dumps(advice)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out + "\n")
    print(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("profile", help="one-scan key profile (Spark)")
    p.add_argument("--table", required=True)
    p.add_argument("--key", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--format", default="parquet")
    p.add_argument("--bytes-cols", default=None,
                   help="comma-separated columns to price (default: all)")
    p.add_argument("--theta-k", type=int, default=4096)
    p.add_argument("--mg-k", type=int, default=256)
    p.add_argument("--ams-means", type=int, default=64)
    p.set_defaults(fn=_cmd_profile)

    a = sub.add_parser("advise", help="join advice from two profiles "
                                      "(no Spark)")
    a.add_argument("--left", required=True)
    a.add_argument("--right", required=True)
    a.add_argument("--broadcast-mb", type=int, default=10)
    a.add_argument("--target-partition-mb", type=int, default=128)
    a.add_argument("--load-factor", type=float, default=1.25)
    a.add_argument("--out", default=None)
    a.set_defaults(fn=_cmd_advise)

    e = sub.add_parser("execute", help="run the advised join "
                                       "(Spark; plans/joiner.py)")
    e.add_argument("--left-table", required=True)
    e.add_argument("--left-key", required=True)
    e.add_argument("--right-table", required=True)
    e.add_argument("--right-key", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--how", default="inner",
                   choices=["inner", "left_semi"])
    e.add_argument("--format", default="parquet")
    e.add_argument("--left-profile", default=None,
                   help="persisted profile dir (default: build inline)")
    e.add_argument("--right-profile", default=None)
    e.add_argument("--broadcast-mb", type=int, default=10)
    e.add_argument("--target-partition-mb", type=int, default=128)
    e.add_argument("--load-factor", type=float, default=1.25)
    e.add_argument("--max-salt", type=int, default=64)
    e.set_defaults(fn=_cmd_execute)

    g = sub.add_parser("agg", help="groupBy advice from one profile "
                                   "(no Spark)")
    g.add_argument("--profile", required=True)
    g.add_argument("--target-rows-per-task", type=int, default=4_000_000)
    g.add_argument("--load-factor", type=float, default=1.25)
    g.add_argument("--out", default=None)
    g.set_defaults(fn=_cmd_agg)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
