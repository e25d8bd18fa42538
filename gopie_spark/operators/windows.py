"""Windowed sketch aggregation — tumbling and sliding event-time windows.

Capability parity: the reference's sliding-window rate limiter
(pkg/ratelimit/sliding_window.go:50-86) counts events in fixed windows
with weighted overlap; its batch/pubsub machinery (SURVEY.md §2.3) is the
micro-batching substrate.  Here the same semantics ride Spark event-time
windows, and the *sketch* variants answer per-window distinct/frequency/
quantile questions with mergeable state:

- tumbling: window_start = floor(ts / width) — a plain derived column, so
  the two-level sketch aggregation applies unchanged with
  (window_start, *keys) as the grouping key;
- sliding: each row belongs to width/slide windows; the row is exploded
  to its windows JVM-side (sequence + transform, whole-stage codegen)
  and then reduced exactly like tumbling.  Sketch states still merge
  associatively within each window.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from gopie_spark.operators.sketch_agg import sketch_agg


def _tumbling_start(ts_col: str, width_s: int) -> Column:
    epoch = F.unix_timestamp(F.col(ts_col))
    return F.timestamp_seconds((epoch / width_s).cast("long") * width_s)


def windowed_sketch_agg(df: DataFrame, ts_col: str, value_col: str, sketch,
                        width_s: int, slide_s: Optional[int] = None,
                        keys: Sequence[str] = (),
                        out_window_col: str = "window_start") -> DataFrame:
    """DataFrame[window_start, keys..., sketch_state] over event-time
    windows of ``width_s`` seconds (sliding every ``slide_s`` if given).

    State sizing at scale: total sketch state is
    ``n_windows x n_key_combos x state_bytes`` — with HLL p=14 (16 KB)
    and a year of hourly windows x 100 keys that is ~14 GB spread over
    the shuffle, fine; with millions of fine-grained windows prefer a
    smaller ``p`` (p=12 -> 4 KB, std err 1.6%) or coarser windows and
    merge states downstream (register-max union means coarse windows
    are recoverable from fine ones, never the reverse).  States stay
    distributed — nothing here collects to the driver."""
    keys = list(keys)
    if slide_s is None or slide_s == width_s:
        windowed = df.withColumn(out_window_col,
                                 _tumbling_start(ts_col, width_s))
    else:
        if width_s % slide_s:
            raise ValueError("width_s must be a multiple of slide_s")
        epoch = F.unix_timestamp(F.col(ts_col))
        first = ((epoch - width_s + slide_s) / slide_s).cast("long")
        # guard: windows cannot start before epoch 0 alignment
        starts = F.transform(
            F.sequence(first, (epoch / slide_s).cast("long")),
            lambda i: F.timestamp_seconds(i * slide_s))
        windowed = df.withColumn(out_window_col, F.explode(starts))
    return sketch_agg(windowed, [out_window_col] + keys, value_col, sketch)


def sliding_window_counts(df: DataFrame, ts_col: str,
                          width_s: int, slide_s: int,
                          keys: Sequence[str] = ()) -> DataFrame:
    """Exact sliding-window event counts (the sliding_window.go analog),
    pure built-ins: explode to member windows, then hash aggregate."""
    keys = list(keys)
    epoch = F.unix_timestamp(F.col(ts_col))
    first = ((epoch - width_s + slide_s) / slide_s).cast("long")
    starts = F.transform(
        F.sequence(first, (epoch / slide_s).cast("long")),
        lambda i: F.timestamp_seconds(i * slide_s))
    return (df.withColumn("window_start", F.explode(starts))
            .groupBy("window_start", *keys)
            .agg(F.count("*").alias("n")))
