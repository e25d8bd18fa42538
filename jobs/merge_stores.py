#!/usr/bin/env python
"""Fold one sketch store into another — ZERO Spark, ZERO corpus reads.

The incremental-crawl workflow: jobs/build_sketches.py runs over day-2's
NEW pages only, then this merges day-2's store into the serving store;
day-1 data is never rescanned.  Linear/lattice artifacts (HLL, Theta,
Bloom, CMS, sliding-HLL, windowed-CMS, exact counts) merge byte-equal to
a from-scratch build over the union corpus; Misra-Gries / KLL merge to
valid states with their published bounds (split-dependent bytes,
documented in operators/store.py:merge_stores).

    python jobs/merge_stores.py --a DAY1_OUT --b DAY2_OUT --out MERGED

Prints one JSON report: per-artifact merged / dropped_one_sided /
absent.  Exits 2 on a refused merge (mismatched shard routing or
kernel geometry).
"""

from __future__ import annotations

import argparse
import json
import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="first store directory")
    ap.add_argument("--b", required=True, help="second store directory")
    ap.add_argument("--out", required=True,
                    help="merged store directory (created)")
    args = ap.parse_args(argv)

    from gopie_spark.operators.store import merge_stores

    try:
        report = merge_stores(args.a, args.b, args.out)
    except ValueError as e:
        print(json.dumps({"error": "merge_refused", "reason": str(e)}))
        return 2
    print(json.dumps({"out": args.out, "artifacts": report},
                     sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
