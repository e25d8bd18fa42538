"""Streaming sessionization (streaming/sessions.py).

Gates: multi-micro-batch streaming fold == batch session_stats
row-for-row on the same events (closed ∪ open view); sessions spanning
batch boundaries stitch; replayed batch ids are no-ops; state is one
row per user with an open session."""
import os
import time

import pytest
from pyspark.sql import functions as F

from gopie_spark.operators.sessions import session_stats
from gopie_spark.streaming.sessions import StreamingSessions

GAP = 21600


def _write_time_split_files(spark, sf_dir, out_dir, n_parts=3):
    """Split events into contiguous time ranges, one file each, with
    increasing mtimes so the file stream processes them in event-time
    order (the operator's documented ordering contract)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("user_id", "ts").orderBy("ts")
    rows = ev.collect()
    cuts = [len(rows) * i // n_parts for i in range(n_parts + 1)]
    paths = []
    for i in range(n_parts):
        part = spark.createDataFrame(rows[cuts[i]:cuts[i + 1]],
                                     ev.schema)
        p = os.path.join(out_dir, f"part_{i}")
        part.coalesce(1).write.parquet(p)
        paths.append(p)
    os.makedirs(os.path.join(out_dir, "stream"), exist_ok=True)
    for i, p in enumerate(paths):
        for f in os.listdir(p):
            if f.endswith(".parquet"):
                dst = os.path.join(out_dir, "stream", f"f{i}.parquet")
                os.rename(os.path.join(p, f), dst)
                os.utime(dst, (time.time() + i, time.time() + i))
    return os.path.join(out_dir, "stream")


def test_streaming_sessions_equal_batch(spark, sf_dir, tmp_path):
    src = _write_time_split_files(spark, str(sf_dir), str(tmp_path))
    ev_all = spark.read.parquet(src)
    ss = StreamingSessions(spark, str(tmp_path / "st"), gap_s=GAP)
    q = (spark.readStream.schema(ev_all.schema)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(ss.process_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert ss.committed_batch_id() >= 2  # really multiple batches

    got = {(r["user_id"], r["session_id"]):
           (r["n_events"], r["session_start"], r["session_end"],
            r["duration_s"])
           for r in ss.sessions_view().collect()}
    want = {(r["user_id"], r["session_id"]):
            (r["n_events"], r["session_start"], r["session_end"],
             r["duration_s"])
            for r in session_stats(ev_all, gap_s=GAP).collect()}
    assert got == want

    # at least one session spans a batch boundary (stitching exercised):
    # total sessions < sessions-if-each-batch-were-independent
    per_batch = 0
    for i in range(3):
        part = spark.read.parquet(f"{src}/f{i}.parquet")
        per_batch += session_stats(part, gap_s=GAP).count()
    assert len(got) < per_batch

    # open state: one row per user
    op = ss.open_sessions()
    assert op.groupBy("user_id").count().agg(
        F.max("count")).collect()[0][0] == 1

    # replayed batch id is a no-op (state unchanged)
    before = sorted(map(tuple, op.collect()))
    ss.process_batch(spark.read.parquet(f"{src}/f0.parquet"), 0)
    after = sorted(map(tuple, ss.open_sessions().collect()))
    assert before == after


def test_streaming_sessions_restart_resumes(spark, sf_dir, tmp_path):
    """Process-restart simulation: a FRESH StreamingSessions instance
    (new object, same state dir + stream checkpoint) continues where
    the killed one stopped; the final view equals batch."""
    src = _write_time_split_files(spark, str(sf_dir),
                                  str(tmp_path), n_parts=4)
    ev_all = spark.read.parquet(src)
    state = str(tmp_path / "st")

    ss1 = StreamingSessions(spark, state, gap_s=GAP)
    # first "process": consume only 2 of the 4 files, then die
    ss1.process_batch(spark.read.parquet(f"{src}/f0.parquet"), 0)
    ss1.process_batch(spark.read.parquet(f"{src}/f1.parquet"), 1)
    del ss1

    ss2 = StreamingSessions(spark, state, gap_s=GAP)
    assert ss2.committed_batch_id() == 1
    # replay of an already-committed batch on restart: no-op
    ss2.process_batch(spark.read.parquet(f"{src}/f1.parquet"), 1)
    ss2.process_batch(spark.read.parquet(f"{src}/f2.parquet"), 2)
    ss2.process_batch(spark.read.parquet(f"{src}/f3.parquet"), 3)

    got = {(r["user_id"], r["session_id"]):
           (r["n_events"], r["duration_s"])
           for r in ss2.sessions_view().collect()}
    want = {(r["user_id"], r["session_id"]):
            (r["n_events"], r["duration_s"])
            for r in session_stats(ev_all, gap_s=GAP).collect()}
    assert got == want


def test_streaming_sessions_boundary_stitch(spark, tmp_path):
    """Explicit stitch fixture: user 1's session straddles the batch
    boundary (gap within limit) -> ONE session; user 2's does not ->
    two."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)

    def df(rows):
        return spark.createDataFrame(
            [(u, base + dt.timedelta(seconds=s)) for u, s in rows],
            "user_id long, ts timestamp")

    ss = StreamingSessions(spark, str(tmp_path / "st"), gap_s=100)
    ss.process_batch(df([(1, 0), (1, 50), (2, 0)]), 0)
    ss.process_batch(df([(1, 140), (2, 500)]), 1)
    got = {r["session_id"]: (r["n_events"], r["duration_s"])
           for r in ss.sessions_view().collect()}
    assert got == {"1:0": (3, 140), "2:0": (1, 0), "2:1": (1, 0)}
