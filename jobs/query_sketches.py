#!/usr/bin/env python
"""Answer analytics questions from a persisted sketch store — ZERO Spark.

The serving twin of jobs/build_sketches.py: point it at that job's
--output directory (optionally one that also holds --time-windows /
--drift-states artifacts) and ask.  Everything here is file IO + NumPy;
no SparkSession is created and the corpus is never read — the printed
provenance (artifact + bytes_read) proves it.

    python jobs/query_sketches.py --store /path/to/out coverage
    python jobs/query_sketches.py --store OUT distinct-urls [--langs en,de]
    python jobs/query_sketches.py --store OUT distinct-urls --since 2026-01-01
    python jobs/query_sketches.py --store OUT token-freq --tokens the,data \\
        [--window-ticks 7]
    python jobs/query_sketches.py --store OUT top-tokens [--k 20]
    python jobs/query_sketches.py --store OUT member --urls u1,u2,u3
    python jobs/query_sketches.py --store OUT toklen-quantiles --q 0.5,0.99
    python jobs/query_sketches.py --store OUT lang-histogram

Prints ONE JSON object: {"question": ..., "answer": {value, bound,
bound_kind, source, bytes_read, ...}}.  A question the store cannot
answer exits 3 with the build flag that would cover it.
"""

from __future__ import annotations

import argparse
import json
import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_since(s: str) -> float:
    """Epoch seconds from a float or an ISO date/datetime string."""
    try:
        return float(s)
    except ValueError:
        pass
    from datetime import datetime, timezone
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True,
                    help="a jobs/build_sketches.py --output directory")
    ap.add_argument("question",
                    choices=["coverage", "distinct-urls", "token-freq",
                             "top-tokens", "member", "toklen-quantiles",
                             "lang-histogram"])
    ap.add_argument("--langs", default=None,
                    help="comma-separated lang subset for distinct-urls")
    ap.add_argument("--since", default=None,
                    help="distinct-urls cutoff: epoch seconds or ISO "
                         "date (uses the sliding-HLL suffix state)")
    ap.add_argument("--tokens", default=None)
    ap.add_argument("--window-ticks", type=int, default=None)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--refine", action="store_true",
                    help="top-tokens: re-rank Misra-Gries candidates "
                         "with unbiased CountSketch estimates "
                         "(two-sided 3-sigma bound)")
    ap.add_argument("--urls", default=None)
    ap.add_argument("--q", default="0.5",
                    help="comma-separated quantiles for toklen-quantiles")
    args = ap.parse_args(argv)

    from gopie_spark.operators.store import SketchStore, StoreMiss

    store = SketchStore(args.store)
    try:
        if args.question == "coverage":
            print(json.dumps({"question": "coverage",
                              "answer": store.coverage(),
                              "meta": store.meta}, sort_keys=True))
            return 0
        if args.question == "distinct-urls":
            if args.since is not None:
                if args.langs:
                    # the suffix state is global; answering --langs from
                    # it would silently return an all-language count
                    ap.error("--since cannot be combined with --langs "
                             "(the sliding-HLL suffix state is global; "
                             "build per-lang windowed states to slice "
                             "both ways)")
                ans = store.distinct_urls_since(_parse_since(args.since))
            else:
                langs = (args.langs.split(",") if args.langs else None)
                ans = store.distinct_urls(langs)
        elif args.question == "token-freq":
            if not args.tokens:
                ap.error("token-freq requires --tokens")
            ans = store.token_freq(args.tokens.split(","),
                                   window_ticks=args.window_ticks)
        elif args.question == "top-tokens":
            ans = store.top_tokens(args.k, refine=args.refine)
        elif args.question == "member":
            if not args.urls:
                ap.error("member requires --urls")
            ans = store.maybe_contains_urls(args.urls.split(","))
        elif args.question == "toklen-quantiles":
            qs = [float(x) for x in args.q.split(",")]
            ans = store.token_length_quantiles(qs)
        else:  # lang-histogram
            ans = store.lang_histogram()
    except StoreMiss as miss:
        print(json.dumps({"question": args.question,
                          "error": "store_miss", "missing": miss.what,
                          "remedy": miss.remedy}))
        return 3
    except (KeyError, ValueError) as e:
        # bad request (unknown lang, malformed value, unroutable probe)
        print(json.dumps({"question": args.question,
                          "error": "bad_request", "reason": str(e)}))
        return 4
    print(json.dumps({"question": args.question,
                      "answer": ans.to_json()}, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
