"""CuckooWindowedStreamingDedup — sliding-window dedup with EXACT state
expiry (streaming/dedup.py): a duplicate inside the window is dropped,
a duplicate arriving after its emitted copy expired is re-emitted, the
rolling filter equals the merge of the live batch states at every step
(subtract exactness), replay rewinds byte-equal, and restarts resume
mid-window from the persisted rolling + per-batch blobs."""
import pytest

from pyspark.sql import functions as F


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batches(spark):
    """window=2 scenario: 'alpha' emitted in b0, suppressed in b1
    (inside window), expired after b2, re-emitted in b3.  'beta'
    emitted in b0 and again in b3 (its b0 copy left the window)."""
    return [
        _mk(spark, [(1, "alpha"), (2, "beta")]),          # b0: emit both
        _mk(spark, [(3, "alpha"), (4, "gamma")]),         # b1: drop alpha
        _mk(spark, [(5, "gamma"), (6, "delta")]),         # b2: drop gamma
        _mk(spark, [(7, "alpha"), (8, "beta")]),          # b3: both expired
    ]


EXPECT = [1, 2, 4, 6, 7, 8]


def _run(spark, out, st=None, window=2):
    from gopie_spark.streaming.dedup import CuckooWindowedStreamingDedup
    d = CuckooWindowedStreamingDedup(spark, out, window=window, p=1e-8,
                                     state_dir=st)
    for bid, b in enumerate(_batches(spark)):
        d.process_batch(b, bid)
    return d


def test_window_expiry_reemits(spark, tmp_path):
    _run(spark, str(tmp_path / "out"))
    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(str(tmp_path / "out")).collect())
    # b1's alpha (doc 3) dropped: emitted in b0, inside window=2.
    # b2's gamma (doc 5) dropped: emitted in b1's... gamma first emitted
    # in b1 (doc 4), so doc 5 is inside its window.  b3's alpha (7) and
    # beta (8) re-emitted: their b0 copies expired after 2 batches.
    assert got == EXPECT


def test_window_one_only_dedups_adjacent(spark, tmp_path):
    _run(spark, str(tmp_path / "out"), window=1)
    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(str(tmp_path / "out")).collect())
    # window=1: only the immediately-previous batch suppresses; alpha in
    # b1 still dropped (emitted in b0), gamma in b2 dropped (emitted in
    # b1), everything in b3 emitted
    assert got == EXPECT


def test_rolling_equals_merge_of_live_batches(spark, tmp_path):
    """Subtract exactness: after every batch, the rolling state is
    byte-equal to the merge of the last `window` persisted batch
    states — expiry removed exactly what the expired batch added."""
    from gopie_spark.streaming.dedup import CuckooWindowedStreamingDedup
    st = str(tmp_path / "state")
    d = CuckooWindowedStreamingDedup(spark, str(tmp_path / "out"),
                                     window=2, p=1e-8, state_dir=st)
    for bid, b in enumerate(_batches(spark)):
        d.process_batch(b, bid)
        live = [x for x in (d._batch_state(i)
                            for i in range(max(0, bid - 2), bid + 1))
                if x is not None]
        want = d.cf.zero()
        for s in live:
            want = d.cf.merge(want, s)
        assert d.cf.serialize(d.rolling) == d.cf.serialize(want)


def test_replay_rewinds_and_rewrites(spark, tmp_path):
    from gopie_spark.streaming.dedup import CuckooWindowedStreamingDedup
    out, st = str(tmp_path / "out"), str(tmp_path / "state")
    batches = _batches(spark)
    d = CuckooWindowedStreamingDedup(spark, out, window=2, p=1e-8,
                                     state_dir=st)
    d.process_batch(batches[0], 0)
    d.process_batch(batches[1], 1)
    d.process_batch(batches[1], 1)   # replay after simulated failure
    d.process_batch(batches[2], 2)
    d.process_batch(batches[3], 3)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == EXPECT


def test_restart_resumes_mid_window(spark, tmp_path):
    from gopie_spark.streaming.dedup import CuckooWindowedStreamingDedup
    out, st = str(tmp_path / "out"), str(tmp_path / "state")
    batches = _batches(spark)
    d1 = CuckooWindowedStreamingDedup(spark, out, window=2, p=1e-8,
                                      state_dir=st)
    d1.process_batch(batches[0], 0)
    d1.process_batch(batches[1], 1)
    # driver restart: a NEW instance must keep suppressing inside the
    # window (gamma in b2) and re-emitting past it (alpha/beta in b3)
    d2 = CuckooWindowedStreamingDedup(spark, out, window=2, p=1e-8,
                                      state_dir=st)
    d2.process_batch(batches[2], 2)
    d2.process_batch(batches[3], 3)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == EXPECT


def test_window_validation():
    from gopie_spark.streaming.dedup import CuckooWindowedStreamingDedup
    with pytest.raises(ValueError, match="window"):
        CuckooWindowedStreamingDedup(None, "/tmp/x", window=0)


def test_stream_dedup_job_cuckoo_window_tier(tmp_path):
    """jobs/stream_dedup.py --tier cuckoo-window as a black box: two
    --drain invocations against a growing input dir, one stream
    checkpoint and one --state-dir produce exactly one survivor per
    distinct digest (window larger than the batch count, so no expiry
    inside the test horizon; the re-emission semantic is pinned by the
    unit tests above)."""
    import os
    import subprocess
    import sys
    import duckdb

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    st = str(tmp_path / "fstate")
    con = duckdb.connect()
    os.makedirs(src)
    con.execute(f"""
        COPY (SELECT doc_id, text
              FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
              WHERE doc_id % 2 = 0)
        TO '{src}/a.parquet' (FORMAT PARQUET)""")

    def run():
        env = dict(os.environ, SPARK_GRAFT_CPUS="8",
                   PYTHONPATH="/root/repo")
        r = subprocess.run(
            [sys.executable, "jobs/stream_dedup.py",
             "--input", src, "--output", out, "--checkpoint", ckpt,
             "--tier", "cuckoo-window", "--window", "24",
             "--n-window", "65536", "--p", "1e-8",
             "--state-dir", st, "--drain"],
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=400)
        assert r.returncode == 0, r.stderr[-2000:]

    run()
    con.execute(f"""
        COPY (SELECT doc_id, text
              FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
              WHERE doc_id % 2 = 1)
        TO '{src}/b.parquet' (FORMAT PARQUET)""")
    run()  # restart: same checkpoint + filter state, new file arrived

    got = con.execute(
        f"SELECT count(*), count(DISTINCT md5(lower(regexp_replace("
        f"text,'\\s+',' ','g')))) FROM "
        f"read_parquet('{out}/batch_id=*/*.parquet')").fetchone()
    n_digests = con.execute(
        "SELECT count(DISTINCT md5(lower(regexp_replace(text,'\\s+',"
        "' ','g')))) FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).fetchone()[0]
    assert got == (n_digests, n_digests)
