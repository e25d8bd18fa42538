#!/usr/bin/env python
"""Diff two corpus snapshots from their persisted sketch states —
no Spark session, no corpus reads, pure NumPy over KB-sized blobs.

    python jobs/snapshot_diff.py \\
        --a /path/to/crawl_a_results/drift \\
        --b /path/to/crawl_b_results/drift \\
        [--top 20] [--out report.json]

Each input directory is what ``jobs/build_sketches.py --drift-states``
wrote (operators/drift.py:persist_drift_states): a theta state of the
URL set, CountSketch + Misra-Gries states of the token frequencies, a
KLL state of the per-doc token counts, and exact per-lang counts.  The
report (URL-set algebra with 4-sigma bounds, top token movers from the
linear CountSketch difference, bounded-error two-sample KS, language
L1) is identical to the live ``drift_report`` over the raw corpora
(tested), but costs ZERO cluster work: at 10^12 docs per snapshot the
builds were amortized into the snapshot's own sketch pass, and this
diff runs on a laptop in milliseconds.

This script never constructs a SparkSession — only the TLV codec and
the kernels' NumPy algebra run (the driver-side half of the library).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

# bare local runs (`python jobs/<job>.py`) find the package next to
# jobs/; there is nothing to spark-submit — no Spark runs here
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True,
                    help="drift-state directory of the OLD snapshot")
    ap.add_argument("--b", required=True,
                    help="drift-state directory of the NEW snapshot")
    ap.add_argument("--top", type=int, default=20,
                    help="number of token movers to report")
    ap.add_argument("--out", default=None,
                    help="also write the JSON report to this file")
    args = ap.parse_args()

    from gopie_spark.operators.drift import (drift_report_from_states,
                                             load_drift_states)

    report = drift_report_from_states(load_drift_states(args.a),
                                      load_drift_states(args.b),
                                      top=args.top)
    out = json.dumps(report)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
