#!/usr/bin/env python
"""Production entrypoint: streaming deduplication of an arriving corpus.

    cd /root/repo && zip -qr /tmp/gopie_spark.zip gopie_spark
    spark-submit --py-files /tmp/gopie_spark.zip jobs/stream_dedup.py \\
        --input /path/of/arriving_parquet --output /path/to/deduped \\
        --checkpoint /path/for/stream_checkpoint \\
        [--tier sharded-bloom|exact|exact-watermark|cuckoo-window] \\
        [--text-col text] [--order-col doc_id] \\
        [--n-shards 64] [--p 1e-6] \\
        [--window 24 --n-window 1048576 --state-dir /path/for/filter_state] \\
        [--ts-col ts --within "1 hour"] \\
        [--max-files-per-trigger 8] [--drain]

Tiers (see streaming/dedup.py for the trade-offs):

- ``sharded-bloom`` (default): bounded-state — the scalable-Bloom
  filter sharded across Spark's streaming state store
  (applyInPandasWithState).  O(bits) state on an unbounded stream,
  executor-resident, restart-safe via the stream checkpoint; FP rate
  <= ``--p`` of unique docs wrongly dropped, never the reverse.
- ``exact``: ``dropDuplicates`` on the content digest — exact, but the
  state store grows with the number of distinct documents ever seen.
- ``exact-watermark``: exact within a late-data horizon
  (``--ts-col``/``--within``); state bounded by the horizon.
- ``cuckoo-window``: dedup against the last ``--window`` micro-batches
  with EXACT state expiry (duplicates past the window re-emit) — the
  cuckoo filter's strict subtract removes the departing batch's keys,
  so state is O(window x keys-per-batch) on any stream length.  Uses
  foreachBatch; persist the filter via ``--state-dir`` for replay
  rewind + restart resume (the stream checkpoint handles offsets).

``--drain`` processes everything currently in ``--input`` with
``trigger(availableNow=True)`` and exits (batch-like catch-up run —
also how tests drive this job); without it the query runs until
terminated, picking up new files as they arrive.  Restarts with the
same ``--checkpoint`` resume exactly where the stream left off.
"""

from __future__ import annotations

import argparse

import os
import sys
# bare local runs (`python jobs/<job>.py`) find the package next to
# jobs/; spark-submit deployments supply it via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--tier", default="sharded-bloom",
                    choices=("sharded-bloom", "exact", "exact-watermark",
                             "cuckoo-window"))
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--order-col", default="doc_id")
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--p", type=float, default=1e-6)
    ap.add_argument("--window", type=int, default=24,
                    help="cuckoo-window: suppression horizon in "
                         "micro-batches")
    ap.add_argument("--n-window", type=int, default=1 << 20,
                    help="cuckoo-window: expected distinct digests per "
                         "window (sizes the filter)")
    ap.add_argument("--state-dir", default=None,
                    help="cuckoo-window: directory for persisted filter "
                         "state (replay rewind + restart resume)")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--within", default="1 hour")
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    ap.add_argument("--drain", action="store_true",
                    help="process available input with availableNow "
                         "and exit (otherwise run continuously)")
    args = ap.parse_args()

    from gopie_spark.plans import get_spark
    from gopie_spark.streaming.dedup import (CuckooWindowedStreamingDedup,
                                             sharded_bloom_streaming_dedup,
                                             streaming_exact_dedup)

    spark = get_spark("gopie-stream-dedup")
    spark.sparkContext.setLogLevel("WARN")

    # schema from the files already present (a streaming source needs
    # one up front; new files must match)
    schema = spark.read.parquet(args.input).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", args.max_files_per_trigger)
              .parquet(args.input))

    if args.tier == "cuckoo-window":
        d = CuckooWindowedStreamingDedup(
            spark, args.output, window=args.window,
            text_col=args.text_col, order_col=args.order_col,
            n_window=args.n_window, p=args.p, state_dir=args.state_dir)
        writer = (stream.writeStream.foreachBatch(d.process_batch)
                  .option("checkpointLocation", args.checkpoint))
        if args.drain:
            q = writer.trigger(availableNow=True).start()
        else:
            q = writer.start()
        q.awaitTermination()
        return

    if args.tier == "sharded-bloom":
        deduped = sharded_bloom_streaming_dedup(
            stream, text_col=args.text_col, order_col=args.order_col,
            n_shards=args.n_shards, p=args.p)
    elif args.tier == "exact":
        deduped = streaming_exact_dedup(stream, args.text_col)
    else:
        deduped = streaming_exact_dedup(stream, args.text_col,
                                        ts_col=args.ts_col,
                                        within=args.within)

    writer = (deduped.writeStream.format("parquet")
              .option("path", args.output)
              .option("checkpointLocation", args.checkpoint))
    if args.drain:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
        q.awaitTermination()


if __name__ == "__main__":
    main()
