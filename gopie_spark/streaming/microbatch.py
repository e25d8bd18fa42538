"""Structured Streaming sketch builds — the pubsub/batch lifecycle on Spark.

Reference lifecycle (SURVEY.md §3.3): ``NewTopic -> Publish -> fan-out ->
Subscription.Receive`` with ``batch.Batch`` flushing on count/timeout
(pkg/pubsub/pubsub.go:112-314, pkg/batch/batch.go:27-137).  Spark's
equivalent: a streaming source -> micro-batch trigger -> ``foreachBatch``
subscription.  The sketch state is the natural streaming aggregate — each
micro-batch builds partials with the same two-level kernel aggregation
and merges into a persisted running state (associativity makes the
micro-batch boundaries invisible, exactly like the checkpoint/resume
path).

``Latest``-conflation (pkg/latest/latest.go) maps to only ever keeping
the newest merged state per key.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from gopie_spark.operators.sketch_agg import (STATE_COL, build_partials,
                                              merge_partials)


class StreamingSketch:
    """Continuously-merged sketch over a stream, via foreachBatch.

    State layout: ``<state_dir>/current/`` holds one parquet of
    (keys..., state) — the Latest-conflated running sketch.  Each
    micro-batch merges (previous state ∪ batch partials) per key and
    atomically replaces it.

    Replay safety: Structured Streaming re-invokes ``foreachBatch``
    with the same ``batch_id`` after a failure.  Register-max sketches
    (HLL, Bloom) merge idempotently, but counter sketches (CMS,
    t-digest, KLL, DDSketch) would DOUBLE-COUNT a replayed batch — so the batch
    id rides inside the state dir (an ``_batch_id`` marker written into
    the tmp dir *before* the atomic swap, so state and marker commit
    together) and an already-committed batch id is skipped."""

    def __init__(self, spark: SparkSession, sketch, keys: Sequence[str],
                 value_col: str, state_dir: str):
        self.spark = spark
        self.sketch = sketch
        self.keys = list(keys)
        self.value_col = value_col
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        from gopie_spark.streaming.swap import recover
        recover(state_dir, "current")

    @property
    def _current(self) -> str:
        return os.path.join(self.state_dir, "current")

    def current_states(self) -> Optional[DataFrame]:
        if not os.path.exists(self._current):
            return None
        return self.spark.read.parquet(self._current)

    def committed_batch_id(self) -> Optional[int]:
        """Batch id of the newest committed state (None before the
        first); parquet readers ignore the underscore marker file."""
        marker = os.path.join(self._current, "_batch_id")
        if not os.path.exists(marker):
            return None
        with open(marker) as fh:
            return int(fh.read().strip())

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: merge this micro-batch into the running state."""
        last = self.committed_batch_id()
        if last is not None and batch_id <= last:
            return  # replayed batch: state already includes it
        partials = build_partials(batch_df, self.keys, self.value_col,
                                  self.sketch)
        prev = self.current_states()
        if prev is not None:
            partials = partials.unionByName(prev)
        merged = merge_partials(partials, self.keys, self.sketch)
        tmp = os.path.join(self.state_dir, f"_tmp_batch_{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_batch_id"), "w") as fh:
            fh.write(str(batch_id))
        # crash-safe swap: a kill between the two renames is healed by
        # recover() on the next startup (streaming/swap.py)
        from gopie_spark.streaming.swap import swap_in
        swap_in(self.state_dir, "current", tmp, batch_id)

    def attach(self, stream_df: DataFrame,
               checkpoint_dir: Optional[str] = None,
               available_now: bool = True):
        """Attach to any streaming DataFrame: each micro-batch merges into
        the running state.  ``available_now`` drains what exists and stops
        — the batch-like trigger used in tests."""
        writer = (stream_df.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation",
                          checkpoint_dir or
                          os.path.join(self.state_dir, "_stream_ckpt")))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def start_file_stream(self, input_dir: str, schema,
                          checkpoint_dir: Optional[str] = None,
                          available_now: bool = True):
        """Consume a file-source stream (new parquet files = new events),
        merging each micro-batch."""
        reader = (self.spark.readStream.schema(schema)
                  .parquet(input_dir))
        return self.attach(reader, checkpoint_dir, available_now)


def windowed_streaming_sketch(spark: SparkSession, sketch,
                              stream_df: DataFrame, ts_col: str,
                              value_col: str, width_s: int,
                              state_dir: str, keys: Sequence[str] = (),
                              checkpoint_dir: Optional[str] = None,
                              available_now: bool = True):
    """Per-event-time-window sketch over a stream: the tumbling window
    start is just another grouping key, so the same foreachBatch merge
    machinery applies unchanged (SURVEY.md §2.5 windowed sketches,
    streaming form).  Returns ``(streaming_query, StreamingSketch)`` —
    read running per-window states via ``.current_states()``.

    Late data needs NO watermark for *correctness* — a late row's partial
    simply merges into its window's state (merge associativity), unlike
    exact streaming aggregates where the watermark bounds correctness.
    A watermark would only bound state *retention*; per-window state is
    O(sketch), so retention is cheap and left to the caller's compaction
    policy.
    """
    from gopie_spark.operators.windows import _tumbling_start

    ss = StreamingSketch(spark, sketch, ["window_start"] + list(keys),
                         value_col, state_dir)
    windowed = stream_df.withColumn("window_start",
                                    _tumbling_start(ts_col, width_s))
    query = ss.attach(windowed, checkpoint_dir, available_now)
    return query, ss


def windowed_stream_counts(stream_df: DataFrame, ts_col: str,
                           window: str = "1 hour",
                           slide: Optional[str] = None,
                           watermark: str = "2 hours",
                           keys: Sequence[str] = ()) -> DataFrame:
    """Watermarked sliding/tumbling window counts on a streaming DataFrame
    (late data beyond the watermark is dropped; OutputMode update gives
    Latest-conflation of window results)."""
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(win.alias("window"), *list(keys))
            .agg(F.count("*").alias("n")))


def fanout_foreach_batch(subscriptions):
    """One-topic / N-subscription fan-out (pubsub parity: the reference
    topic loop hands every message to every live subscription,
    /root/reference/pkg/pubsub/pubsub.go:218-246).

    ``subscriptions`` is a sequence of ``fn(batch_df, batch_id)``
    callables; the returned function is a single ``foreachBatch`` hook
    that delivers each micro-batch to every subscription.  One source
    read per batch — attaching N separate writeStream queries to the
    same source would re-read (and for file sources, re-plan) the data
    N times; the fan-out happens after the read, exactly like the
    reference's in-process dispatch.  A persisted batch frame keeps the
    N deliveries from recomputing the source lineage."""
    subs = list(subscriptions)

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for fn in subs:
                fn(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    return hook
