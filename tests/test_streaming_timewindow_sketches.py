"""Query-time-window sketches over STREAMS: the round-4g sliding HLL and
windowed CMS ride the generic StreamingSketch foreachBatch protocol
unchanged — the (value, ts) struct column is just another value column,
and both kernels' merges prune their own state (Pareto frontier /
retention horizon), so the persisted streaming state stays bounded with
no extra expiry plumbing.

Gates: micro-batch-merged state == one-shot batch build, byte-equal;
suffix/window queries answered from the recovered streaming state match
the batch answers; the WindowCMS streaming state never holds more than
n_ticks ticks even when the stream spans more.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gopie_spark.kernels import SlidingHLL, WindowCMS
from gopie_spark.operators.sketch_agg import STATE_COL


def _struct_frame(df, value_col, ts_col):
    return df.select(
        F.struct(F.col(value_col).cast("string").alias("v"),
                 F.col(ts_col).cast("timestamp").cast("double").alias("t"))
        .alias("_vt"))


def _write_batches(spark, src, sf_dir, n_files=4):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(n_files).write.mode("overwrite").parquet(src)
    return ev


def test_streaming_sliding_hll_equals_batch(spark, sf_dir, tmp_path):
    from gopie_spark.operators import sliding_hll_build
    from gopie_spark.streaming import StreamingSketch

    src = str(tmp_path / "shll_src")
    ev = _write_batches(spark, src, sf_dir)
    sh, batch_state = sliding_hll_build(ev, "event_id", "ts", p=11)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1).parquet(src)
    ss = StreamingSketch(spark, sh, [], "_vt",
                         str(tmp_path / "shll_state"))
    q = ss.attach(_struct_frame(stream, "event_id", "ts"))
    q.awaitTermination(180)

    cur = ss.current_states().collect()
    assert len(cur) == 1
    got = sh.deserialize(bytes(cur[0][STATE_COL]))
    assert sh.serialize(got) == sh.serialize(batch_state)
    # a suffix query answered from the recovered streaming state
    epoch = F.col("ts").cast("timestamp").cast("double")
    lo, hi = ev.agg(F.min(epoch), F.max(epoch)).first()
    cut = lo + 0.5 * (hi - lo)
    assert sh.count(got, cutoff=cut) == sh.count(batch_state, cutoff=cut)


def test_streaming_window_cms_equals_batch_and_stays_bounded(
        spark, sf_dir, tmp_path):
    from gopie_spark.operators import window_cms_build
    from gopie_spark.streaming import StreamingSketch

    src = str(tmp_path / "wcms_src")
    ev = _write_batches(spark, src, sf_dir)
    # horizon SHORTER than the stream's span: the streaming state must
    # self-expire through the merge's horizon prune
    wc, batch_state = window_cms_build(
        ev, "event_type", "ts", epsilon=0.01, delta=0.99,
        resolution=86400.0, n_ticks=7)
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1).parquet(src)
    ss = StreamingSketch(spark, wc, [], "_vt",
                         str(tmp_path / "wcms_state"))
    q = ss.attach(_struct_frame(stream, "event_type", "ts"))
    q.awaitTermination(180)

    cur = ss.current_states().collect()
    got = wc.deserialize(bytes(cur[0][STATE_COL]))
    assert wc.serialize(got) == wc.serialize(batch_state)
    assert got["ticks"].size <= 7
    ticks = ev.select(
        F.floor(F.col("ts").cast("timestamp").cast("double") / 86400.0)
        .cast("long").alias("t")).agg(F.countDistinct("t")).first()[0]
    assert ticks > 7  # the stream really did span past the horizon
    # trailing-window estimates from the streaming state == batch
    probes = np.array([r[0] for r in
                       ev.select("event_type").distinct().collect()],
                      dtype=object)
    for w in (1, 7):
        assert (wc.estimate(got, probes, window_ticks=w)
                == wc.estimate(batch_state, probes, window_ticks=w)).all()
