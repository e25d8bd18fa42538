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
