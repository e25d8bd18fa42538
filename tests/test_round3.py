"""Round-3 hardening tests: CC reliable checkpoint/resume + small-graph
endgame, executor-side streaming-dedup state fold + batch idempotence,
Iceberg metadata contract, LSH dim-probe removal, probe-work
observability, latest-N conflation, PubSub fan-out parity."""

import os

import pytest

from pyspark.sql import functions as F


# -- connected components: durability + endgame ------------------------------

def _chain_edges(spark, n=60):
    return spark.createDataFrame([(i, i + 1) for i in range(n)],
                                 "id_a long, id_b long")


def test_cc_reliable_checkpoint_resume(spark, tmp_path):
    """Kill-mid-rounds simulation: a run capped below convergence raises
    but leaves durable round files; a rerun with the same checkpoint_dir
    resumes from them and finishes with the right answer."""
    from gopie_spark.operators.graph import connected_components
    edges = _chain_edges(spark)
    ckpt = str(tmp_path / "cc")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2, checkpoint_dir=ckpt,
                             checkpoint_every=1, local_threshold=0)
    # the crashed run persisted completed rounds durably
    assert os.path.exists(os.path.join(ckpt, "round_00000", "_SUCCESS"))
    out = connected_components(edges, checkpoint_dir=ckpt,
                               checkpoint_every=1,
                               local_threshold=0).collect()
    assert len(out) == 61
    assert {r["component"] for r in out} == {0}


def test_cc_resume_skips_completed_rounds(spark, tmp_path):
    """Resume starts after the newest _SUCCESS round: completing a run,
    then rerunning with the same dir, converges immediately (the loaded
    edge set is already star-shaped) and agrees byte-for-byte."""
    from gopie_spark.operators.graph import connected_components
    edges = _chain_edges(spark)
    ckpt = str(tmp_path / "cc2")
    a = sorted(map(tuple, connected_components(
        edges, checkpoint_dir=ckpt, checkpoint_every=1,
        local_threshold=0).collect()))
    b = sorted(map(tuple, connected_components(
        edges, checkpoint_dir=ckpt, checkpoint_every=1,
        local_threshold=0).collect()))
    assert a == b
    assert {c for _, c in a} == {0}


def test_cc_checkpoint_every_mix(spark, tmp_path):
    """checkpoint_every=2 interleaves reliable parquet rounds with
    localCheckpoint rounds; result identical to the plain run."""
    from gopie_spark.operators.graph import connected_components
    edges = _chain_edges(spark)
    plain = sorted(map(tuple, connected_components(
        edges, local_threshold=0).collect()))
    mixed = sorted(map(tuple, connected_components(
        edges, checkpoint_dir=str(tmp_path / "cc3"), checkpoint_every=2,
        local_threshold=0).collect()))
    assert plain == mixed


def test_cc_local_endgame_matches_distributed(spark):
    """The size-gated driver union-find endgame returns exactly the
    distributed answer (self-loops canonicalized away in both paths)."""
    from gopie_spark.operators.graph import connected_components
    edges = spark.createDataFrame(
        [(5, 9), (9, 1), (30, 31), (7, 7), (2, 40), (40, 3)],
        "id_a long, id_b long")
    dist = sorted(map(tuple, connected_components(
        edges, local_threshold=0).collect()))
    loc = sorted(map(tuple, connected_components(
        edges, local_threshold=1 << 16).collect()))
    assert dist == loc
    assert dict(loc)[3] == 2


def test_cc_mid_loop_shrink_takes_local_path(spark):
    """local_threshold between 0 and the input size: the loop starts
    distributed and hands off to the endgame once the checksum count
    drops under the bound — answer unchanged.  A complete graph K12 (66
    edges) collapses to 11 star edges after one round, crossing a
    threshold of 30 mid-loop."""
    from gopie_spark.operators.graph import connected_components
    edges = spark.createDataFrame(
        [(i, j) for i in range(12) for j in range(i + 1, 12)],
        "id_a long, id_b long")
    out = connected_components(edges, local_threshold=30)
    rows = out.collect()
    assert len(rows) == 12
    assert {r["component"] for r in rows} == {0}


# -- streaming dedup: executor-side fold + idempotence -----------------------

def _doc_batches(spark):
    """Three batches with cross-batch duplicates (same text => same
    digest): batch0 {a,b}, batch1 {b,c}, batch2 {a,c,d}."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return [mk([(1, "alpha"), (2, "beta")]),
            mk([(3, "beta"), (4, "gamma")]),
            mk([(5, "alpha"), (6, "gamma"), (7, "delta")])]


def test_bloom_streaming_dedup_executor_side_fold(spark, tmp_path,
                                                  monkeypatch):
    """The driver never receives O(survivors) rows: every collect()
    issued during process_batch returns at most one row (the merged
    filter blob / tiny aggregates), yet dedup is still exact across
    batches at tiny p."""
    # patch the concrete class (pyspark.sql.DataFrame is the abstract
    # base in Spark 4; method lookup resolves on the classic subclass)
    from pyspark.sql.classic.dataframe import DataFrame
    from gopie_spark.streaming.dedup import BloomStreamingDedup

    collected_sizes = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        collected_sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    d = BloomStreamingDedup(spark, str(tmp_path / "out"), p=1e-9)
    for bid, b in enumerate(_doc_batches(spark)):
        d.process_batch(b, bid)
    monkeypatch.undo()
    assert collected_sizes and max(collected_sizes) <= 1
    got = sorted(r["doc_id"] for r in
                 spark.read.parquet(str(tmp_path / "out")).collect())
    assert got == [1, 2, 4, 7]


def test_bloom_streaming_dedup_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replay (same batch_id re-delivered after a failure)
    neither duplicates output rows nor double-folds state: with
    state_dir the filter rewinds to the pre-batch blob and the keyed
    output dir is overwritten."""
    from gopie_spark.streaming.dedup import BloomStreamingDedup

    batches = _doc_batches(spark)
    out, st = str(tmp_path / "out"), str(tmp_path / "state")
    d = BloomStreamingDedup(spark, out, p=1e-9, state_dir=st)
    d.process_batch(batches[0], 0)
    d.process_batch(batches[1], 1)
    d.process_batch(batches[1], 1)  # replay after simulated failure
    d.process_batch(batches[2], 2)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 4, 7]


def test_bloom_streaming_dedup_restart_resumes_state(spark, tmp_path):
    """A new instance with the same state_dir (driver restart) loads the
    persisted filter: duplicates of pre-restart docs are dropped."""
    from gopie_spark.streaming.dedup import BloomStreamingDedup

    batches = _doc_batches(spark)
    out, st = str(tmp_path / "out"), str(tmp_path / "state")
    d1 = BloomStreamingDedup(spark, out, p=1e-9, state_dir=st)
    d1.process_batch(batches[0], 0)
    d1.process_batch(batches[1], 1)
    del d1
    d2 = BloomStreamingDedup(spark, out, p=1e-9, state_dir=st)
    d2.process_batch(batches[2], 2)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 4, 7]


def test_bloom_streaming_dedup_replay_without_state_dir_skips(spark,
                                                              tmp_path):
    """Without state_dir the in-memory filter cannot rewind; a replay of
    an already-folded batch is a no-op (output dir stands, no dupes)."""
    from gopie_spark.streaming.dedup import BloomStreamingDedup

    batches = _doc_batches(spark)
    out = str(tmp_path / "out")
    d = BloomStreamingDedup(spark, out, p=1e-9)
    d.process_batch(batches[0], 0)
    d.process_batch(batches[0], 0)  # replay
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2]


# -- LSH: no driver dim-probe job --------------------------------------------

def test_add_hyperplane_bucket_schedules_no_job(spark):
    """Building the bucketed frame (and the full lsh_topk plan) must
    schedule ZERO Spark jobs before an action — the vector dim is
    learned lazily from each task's first Arrow batch, not via a
    driver-side first()/collect probe."""
    from gopie_spark.operators.similarity import (add_hyperplane_bucket,
                                                  lsh_topk)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sc = spark.sparkContext
    sc.setJobGroup("lsh-build-probe", "no jobs expected")
    try:
        bucketed = add_hyperplane_bucket(emb, n_planes=6, vec_col="embedding")
        _plan = lsh_topk(spark, emb, emb.filter("vec_id < 3"), k=3,
                         n_planes=4, multiprobe=1, vec_col="embedding")
        jobs = sc.statusTracker().getJobIdsForGroup("lsh-build-probe")
    finally:
        sc.setJobGroup(None, None)
    assert list(jobs) == []
    assert "lsh_bucket" in bucketed.columns


def test_lazy_dim_buckets_match_pinned_dim(spark):
    """Lazy per-task dim inference produces byte-identical buckets to an
    explicitly pinned dim (fixed-seed planes are a pure function of
    (dim, n_planes))."""
    from gopie_spark.operators.similarity import add_hyperplane_bucket
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    lazy = {r["vec_id"]: r["lsh_bucket"] for r in
            add_hyperplane_bucket(emb, n_planes=8).collect()}
    pinned = {r["vec_id"]: r["lsh_bucket"] for r in
              add_hyperplane_bucket(emb, n_planes=8, dim=dim).collect()}
    assert lazy == pinned and len(lazy) > 0


# -- latest-N conflation -----------------------------------------------------

def test_latest_n_matches_window_plan(spark):
    """Two-level capped latest_n == the window row_number reference plan,
    including a hot key and ties in the order column."""
    from pyspark.sql import Window
    from gopie_spark.streaming.conflate import latest_n
    rows = [(1, t, f"v{t}") for t in range(50)]          # hot key
    rows += [(2, 5, "a"), (2, 5, "b"), (2, 3, "c")]       # ties on t=5
    rows += [(3, 9, "z")]                                 # under-full key
    df = spark.createDataFrame(rows, "k long, t long, v string")
    got = sorted(map(tuple, latest_n(df, ["k"], "t", 3).collect()))
    w = Window.partitionBy("k").orderBy(F.desc("t"), F.desc("v"))
    want = sorted(map(tuple, df.withColumn("_rn", F.row_number().over(w))
                      .filter(F.col("_rn") <= 3).drop("_rn").collect()))
    assert got == want
    assert len(got) == 3 + 3 + 1


def test_latest_n_conflate_streaming_equals_batch(spark, tmp_path):
    """LatestNConflate over micro-batches == latest_n over the union —
    the conflation is associative, so batch boundaries are invisible."""
    from gopie_spark.streaming.conflate import LatestNConflate, latest_n
    b0 = spark.createDataFrame([(1, 1, "a"), (1, 2, "b"), (2, 1, "x")],
                               "k long, t long, v string")
    b1 = spark.createDataFrame([(1, 3, "c"), (2, 0, "y"), (3, 7, "q")],
                               "k long, t long, v string")
    b2 = spark.createDataFrame([(1, 9, "d"), (1, 0, "e")],
                               "k long, t long, v string")
    conf = LatestNConflate(spark, ["k"], "t", 2,
                           str(tmp_path / "state"))
    for bid, b in enumerate([b0, b1, b2]):
        conf.process_batch(b, bid)
    got = sorted(map(tuple, conf.current().collect()))
    want = sorted(map(tuple, latest_n(
        b0.unionByName(b1).unionByName(b2), ["k"], "t", 2).collect()))
    assert got == want


# -- pubsub fan-out parity ---------------------------------------------------

def test_fanout_n_subscriptions_parity(spark, tmp_path):
    """One rate-limited source, N foreachBatch subscriptions (the
    reference topic hands every message to every subscription): each
    sink's drained output equals the batch run of the same pipeline."""
    from gopie_spark.streaming.microbatch import fanout_foreach_batch

    src = str(tmp_path / "src")
    docs = spark.createDataFrame(
        [(i, f"doc {i % 7}") for i in range(60)],
        "doc_id long, text string")
    for f in range(3):  # 3 files -> maxFilesPerTrigger=1 gives 3 batches
        docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == f) \
            .coalesce(1).write.mode("overwrite").parquet(f"{src}/p{f}")
    static = spark.read.parquet(f"{src}/p*")

    sink_dirs = [str(tmp_path / f"sink{i}") for i in range(3)]

    def mk_sink(path, transform):
        def sink(batch_df, batch_id):
            transform(batch_df).write.mode("append").parquet(path)
        return sink

    transforms = [
        lambda df: df,                                         # raw copy
        lambda df: df.filter(F.col("doc_id") % 2 == 0),        # filter
        lambda df: df.groupBy("text").agg(                     # per-batch agg
            F.count("*").alias("n")),
    ]
    sinks = [mk_sink(d, t) for d, t in zip(sink_dirs, transforms)]

    stream = spark.readStream.schema(static.schema) \
        .option("maxFilesPerTrigger", 1).parquet(f"{src}/p*")
    q = (stream.writeStream
         .foreachBatch(fanout_foreach_batch(sinks))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # sink 0/1: row-level parity with the batch run
    got0 = sorted(map(tuple, spark.read.parquet(sink_dirs[0]).collect()))
    assert got0 == sorted(map(tuple, static.collect()))
    got1 = sorted(map(tuple, spark.read.parquet(sink_dirs[1]).collect()))
    assert got1 == sorted(map(tuple,
                              static.filter(F.col("doc_id") % 2 == 0)
                              .collect()))
    # sink 2: per-batch aggregates re-aggregate to the batch answer
    got2 = spark.read.parquet(sink_dirs[2]).groupBy("text") \
        .agg(F.sum("n").alias("n"))
    want2 = static.groupBy("text").agg(F.count("*").alias("n"))
    assert sorted(map(tuple, got2.collect())) \
        == sorted(map(tuple, want2.collect()))


# -- ANN probe-work observability --------------------------------------------

def test_probe_work_stats_sees_planted_viral_cell(spark):
    """A planted viral bucket (90% of the corpus in one cell) must show
    up in max_cell_size, and max_task_rescore_rows must reflect the
    post-salting per-task bound (~ceil(viral/salts) x probes), not the
    whole cell."""
    import math
    from gopie_spark.operators.similarity import probe_work_stats
    n, viral = 1000, 900
    corpus = spark.createDataFrame(
        [(i, 0 if i < viral else 1 + i % 7) for i in range(n)],
        "vec_id long, cell long")
    probes = spark.createDataFrame(
        [(100 + q, c) for q in range(4) for c in (0, 1)],
        "query_id long, cell long")
    row = probe_work_stats(corpus, probes, "cell", bucket_salts=8) \
        .collect()[0]
    assert row["max_cell_size"] == viral
    assert row["total_rows"] == n
    assert row["n_probed_cells"] == 2
    # 4 probes hit the viral cell; per-task bound is ceil(900/8)*4
    assert row["max_task_rescore_rows"] == math.ceil(viral / 8) * 4
    # total rescore work = 4 probes x (viral cell + cell 1's members)
    cell1 = sum(1 for i in range(viral, n) if 1 + i % 7 == 1)
    assert row["rescore_rows"] == 4 * (viral + cell1)


def test_lsh_and_ivf_probe_stats_run_on_real_embeddings(spark):
    """The convenience wrappers produce one coherent stats row on the
    real embeddings table with the same params the probes use."""
    from gopie_spark.operators.similarity import (ivf_probe_stats,
                                                  lsh_probe_stats,
                                                  train_ivf_centroids)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    r1 = lsh_probe_stats(emb, q, n_planes=4, multiprobe=1).collect()[0]
    assert r1["n_probed_cells"] >= 1
    assert r1["max_task_rescore_rows"] <= r1["rescore_rows"]
    cents = train_ivf_centroids(emb, n_centroids=8)
    r2 = ivf_probe_stats(emb, q, cents, nprobe=2).collect()[0]
    assert r2["total_rows"] == emb.count()
    assert r2["n_probed_cells"] >= 1


# -- streaming replay guards (StreamingSketch / LatestNConflate) -------------

def test_streaming_sketch_replay_does_not_double_count(spark, tmp_path):
    """foreachBatch replay with a counter sketch (CMS — NOT idempotent
    under re-merge, unlike HLL's register max) must leave the committed
    state byte-identical; the next new batch still applies."""
    from gopie_spark.kernels import CMS
    from gopie_spark.operators.sketch_agg import STATE_COL
    from gopie_spark.streaming.microbatch import StreamingSketch

    b0 = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    b1 = spark.createDataFrame([("a",), ("c",)], "v string")
    cms = CMS(width=64, depth=3)
    ss = StreamingSketch(spark, cms, [], "v", str(tmp_path / "st"))
    ss.process_batch(b0, 0)
    blob_after_0 = bytes(ss.current_states().collect()[0][STATE_COL])
    ss.process_batch(b0, 0)  # replay after simulated failure
    assert bytes(ss.current_states().collect()[0][STATE_COL]) \
        == blob_after_0
    assert ss.committed_batch_id() == 0
    ss.process_batch(b1, 1)
    st = cms.deserialize(
        bytes(ss.current_states().collect()[0][STATE_COL]))
    assert cms.estimate(st, ["a"])[0] == 3  # 2 from b0 + 1 from b1, once
    assert ss.committed_batch_id() == 1


def test_latest_n_conflate_replay_no_duplicate_rows(spark, tmp_path):
    """Replaying a conflation batch must not union its rows into the
    ring twice (newest-N would then hold duplicate rows)."""
    from gopie_spark.streaming.conflate import LatestNConflate
    b0 = spark.createDataFrame([(1, 9, "x"), (1, 8, "y")],
                               "k long, t long, v string")
    conf = LatestNConflate(spark, ["k"], "t", 2, str(tmp_path / "st"))
    conf.process_batch(b0, 0)
    conf.process_batch(b0, 0)  # replay
    got = sorted(map(tuple, conf.current().collect()))
    assert got == [(1, 8, "y"), (1, 9, "x")]


def test_bloom_streaming_dedup_real_stream(spark, tmp_path):
    """BloomStreamingDedup attached to a real file stream (availableNow,
    maxFilesPerTrigger=1) drains to exactly the FIRST-SEEN-in-stream-
    order survivors (streaming dedup keeps the first arrival of each
    digest, unlike batch exact_dedup's global min) — exercises the
    foreachBatch wiring, not just direct calls."""
    from gopie_spark.streaming.dedup import BloomStreamingDedup

    docs = [(i, f"text {i % 11}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    src = str(tmp_path / "src")
    for f in range(4):
        df.filter(F.pmod(F.col("doc_id"), F.lit(4)) == f).coalesce(1) \
            .write.mode("overwrite").parquet(f"{src}/p{f}")
    static = spark.read.parquet(f"{src}/p*")
    # first occurrence per digest in (batch index, doc_id) stream order
    seen, want = set(), []
    for i, text in sorted(docs, key=lambda d: (d[0] % 4, d[0])):
        if text not in seen:
            seen.add(text)
            want.append(i)
    want = sorted(want)

    out = str(tmp_path / "out")
    d = BloomStreamingDedup(spark, out, p=1e-9,
                            state_dir=str(tmp_path / "state"))
    stream = spark.readStream.schema(static.schema) \
        .option("maxFilesPerTrigger", 1).parquet(f"{src}/p*")
    q = (stream.writeStream.foreachBatch(d.process_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == want


# -- HLL sparse partial encoding ---------------------------------------------

def test_hll_sparse_encoding_roundtrip_and_size():
    """Sparse blobs round-trip to identical registers, are chosen
    exactly when smaller, and equal states serialize byte-equal
    regardless of which path built them."""
    import numpy as np
    from gopie_spark.kernels import HLL
    hll = HLL(p=14)
    st = hll.zero()
    hll.update(st, [f"v{i}" for i in range(150)])
    blob = hll.serialize(st)
    assert len(blob) < 2000  # sparse: ~150 x 4B, not 16 KB dense
    assert np.array_equal(hll.deserialize(blob), st)
    # estimates identical through the sparse round trip
    assert hll.count(hll.deserialize(blob)) == hll.count(st)
    # dense kicks in when 4*nnz >= m
    big = hll.zero()
    hll.update(big, [f"w{i}" for i in range(100_000)])
    dense_blob = hll.serialize(big)
    assert len(dense_blob) >= hll.m
    assert np.array_equal(hll.deserialize(dense_blob), big)
    # byte-determinism: same registers -> same bytes
    st2 = hll.zero()
    hll.update(st2, [f"v{i}" for i in range(150)])
    assert hll.serialize(st2) == blob


def test_hll_sparse_blob_rejects_corrupt_index():
    """A sparse entry pointing past 2^p registers must raise, not write
    out of bounds."""
    import numpy as np
    import pytest as _pytest
    from gopie_spark.kernels import HLL
    from gopie_spark.kernels import codec
    hll = HLL(p=8)
    bad = codec.pack(codec.KIND_HLL, [
        (1, np.uint32(8).tobytes()),
        (4, np.array([(300 << 6) | 5], dtype=np.uint32).tobytes()),
        (3, hll.hash_name.encode()),
    ])
    with _pytest.raises(ValueError, match="out of range"):
        hll.deserialize(bad)


def test_latest_n_property_random_inputs(spark):
    """latest_n == the window row_number plan on a batch of random
    (key, order, value) tables with heavy ties and n in {1, 2, 4} —
    the two-level cap must never drop a top-N row."""
    import random
    from pyspark.sql import Window
    from gopie_spark.streaming.conflate import latest_n
    rng = random.Random(0xF00D)
    for trial in range(4):
        n = rng.choice([1, 2, 4])
        rows = [(rng.randint(0, 6), rng.randint(0, 9),
                 rng.randint(0, 99)) for _ in range(rng.randint(1, 120))]
        df = spark.createDataFrame(rows, "k long, t long, v long")
        got = sorted(map(tuple, latest_n(df, ["k"], "t", n).collect()))
        w = Window.partitionBy("k").orderBy(F.desc("t"), F.desc("v"))
        want = sorted(map(tuple,
                          df.withColumn("_rn", F.row_number().over(w))
                          .filter(F.col("_rn") <= n).drop("_rn")
                          .collect()))
        assert got == want, f"trial {trial} n={n}"


def test_cms_and_bloom_sparse_encoding_roundtrip():
    """Adaptive sparse partial blobs (CMS counters, BloomBit words,
    BloomCounting counters) round-trip to identical state, shrink
    lightly-loaded states by orders of magnitude, fall back to dense
    when full, and reject out-of-range sparse indexes."""
    import numpy as np
    from gopie_spark.kernels import CMS, BloomBit, BloomCounting, codec

    cms = CMS(width=2719, depth=7)
    st = cms.update(cms.zero(), [f"t{i}" for i in range(200)])
    blob = cms.serialize(st)
    assert len(blob) < 7 * 2719 * 8 / 4  # far below the 152 KB dense
    rt = cms.deserialize(blob)
    assert np.array_equal(rt["matrix"], st["matrix"])
    assert cms.estimate(rt, ["t0"])[0] == cms.estimate(st, ["t0"])[0]
    full = cms.update(cms.zero(), [f"x{i}" for i in range(60_000)])
    assert np.array_equal(cms.deserialize(cms.serialize(full))["matrix"],
                          full["matrix"])

    bb = BloomBit.from_guess(1_000_000, 1e-6)
    sb = bb.update(bb.zero(), [f"u{i}" for i in range(300)])
    bblob = bb.serialize(sb)
    assert len(bblob) < len(sb["words"]) * 8 / 4
    rtb = bb.deserialize(bblob)
    assert np.array_equal(rtb["words"], sb["words"])
    assert bb.exist(rtb, ["u5", "nope"]).tolist() == [True, False]

    bc = BloomCounting.from_guess(100_000, 1e-6)
    sc = bc.update(bc.zero(), [f"v{i}" for i in range(300)])
    cblob = bc.serialize(sc)
    assert len(cblob) < len(sc["counters"]) * 2 / 4
    rtc = bc.deserialize(cblob)
    assert np.array_equal(rtc["counters"], sc["counters"])

    import pytest as _pytest
    bad = codec.pack(codec.KIND_CMS, [
        (1, np.array([7, 2719], dtype=np.uint32).tobytes()),
        (2, np.zeros(1, dtype=np.uint64).tobytes()),
        (4, np.array([7 * 2719 + 5], dtype=np.uint32).tobytes()),
        (5, np.array([1], dtype=np.uint64).tobytes()),
    ])
    with _pytest.raises(ValueError, match="out of range"):
        cms.deserialize(bad)


def test_sharded_bloom_streaming_dedup_state_store(spark, tmp_path):
    """State-store-sharded Bloom dedup over a real stream: drained
    output == first-seen-in-stream-order survivors, and a SECOND run
    from the same checkpoint (driver restart) with new files drops
    everything already seen — restart recovery comes from Spark's own
    state-store checkpoint, no custom state files."""
    from gopie_spark.streaming.dedup import sharded_bloom_streaming_dedup

    docs = [(i, f"text {i % 11}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    for f in range(2):
        df.filter(F.pmod(F.col("doc_id"), F.lit(4)) == f).coalesce(1) \
            .write.mode("overwrite").parquet(f"{src}/p{f}")

    def drain():
        stream = spark.readStream.schema(df.schema) \
            .option("maxFilesPerTrigger", 1).parquet(f"{src}/p*")
        deduped = sharded_bloom_streaming_dedup(stream, n_shards=8,
                                                p=1e-9)
        q = (deduped.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()  # phase 1: files p0, p1
    for f in range(2, 4):  # new arrivals, heavy overlap with phase 1
        df.filter(F.pmod(F.col("doc_id"), F.lit(4)) == f).coalesce(1) \
            .write.mode("overwrite").parquet(f"{src}/p{f}")
    drain()  # phase 2: restart from the same checkpoint

    seen, want = set(), []
    for i, text in sorted(docs, key=lambda d: (d[0] % 4, d[0])):
        if text not in seen:
            seen.add(text)
            want.append(i)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == sorted(want)


def test_stream_dedup_job_end_to_end(tmp_path):
    """jobs/stream_dedup.py as a black box (own SparkSession in a
    subprocess): two --drain invocations against a growing input dir
    and one checkpoint produce exactly the distinct-digest survivors,
    with the second run dropping documents first seen in the first."""
    import os
    import subprocess
    import sys
    import duckdb

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
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
             "--p", "1e-9", "--n-shards", "8", "--drain"],
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=400)
        assert r.returncode == 0, r.stderr[-2000:]

    run()
    con.execute(f"""
        COPY (SELECT doc_id, text
              FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
              WHERE doc_id % 2 = 1)
        TO '{src}/b.parquet' (FORMAT PARQUET)""")
    run()  # restart from the same checkpoint, new file arrived

    got = con.execute(
        f"SELECT count(*), count(DISTINCT md5(lower(regexp_replace("
        f"text,'\\s+',' ','g')))) FROM read_parquet('{out}/*.parquet')"
    ).fetchone()
    n_digests = con.execute(
        "SELECT count(DISTINCT md5(lower(regexp_replace(text,'\\s+',"
        "' ','g')))) FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).fetchone()[0]
    # one survivor per distinct digest across BOTH phases
    assert got == (n_digests, n_digests)


# -- incremental dedup against a signature store ------------------------------

def _near_dup_corpus(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


def test_incremental_minhash_dedup_matches_full_batch(spark, tmp_path):
    """Two-phase incremental dedup == one full-batch cc dedup when
    phase-1 ids precede phase-2 ids: history survivors + incremental
    survivors must be exactly the batch survivors (planted near-dup
    cliques spanning the phase boundary, plus uniques)."""
    from gopie_spark.operators.dedup import (incremental_minhash_dedup,
                                             minhash_lsh_dedup)
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight ") * 6
    alt = ("completely different content about distributed sketch "
           "aggregation over very large web corpora at scale ") * 6
    rows1 = [(1, base), (2, base + "tail one"), (10, alt),
             (20, "unique text number twenty " * 10)]
    long_unique = " ".join(f"w{i}token" for i in range(80))
    rows2 = [(101, base + "tail two"),          # joins cluster {1,2}
             (110, alt + " tiny change"),       # joins cluster {10}
             (120, long_unique),
             (121, long_unique + " extra")]     # new-new near-dup pair
    store = str(tmp_path / "sigs")
    p1 = _near_dup_corpus(spark, rows1)
    p2 = _near_dup_corpus(spark, rows2)

    kw = dict(threshold=0.8, k=128, bands=32, strategy="cc")
    surv1 = incremental_minhash_dedup(p1, store, **kw)  # empty store
    ids1 = sorted(r["doc_id"] for r in surv1.collect())
    surv2 = incremental_minhash_dedup(p2, store, **kw)
    ids2 = sorted(r["doc_id"] for r in surv2.collect())

    batch = minhash_lsh_dedup(p1.unionByName(p2), threshold=0.8,
                              k=128, bands=32, strategy="cc")
    want = sorted(r["doc_id"] for r in batch.collect())
    assert sorted(ids1 + ids2) == want
    assert 101 not in ids2 and 110 not in ids2  # dropped against history
    assert 120 in ids2 and 121 not in ids2      # new-new keeps min


def test_incremental_dedup_store_holds_survivor_sigs(spark, tmp_path):
    """The signature store after both phases contains exactly one row
    per surviving doc (reusable by the next increment)."""
    from gopie_spark.operators.dedup import incremental_minhash_dedup
    store = str(tmp_path / "sigs")
    base = " ".join(f"tok{i}word" for i in range(70))
    p1 = _near_dup_corpus(spark, [(1, base), (2, base + " z")])
    p2 = _near_dup_corpus(spark, [(5, base + " z z"),
                                  (6, " ".join(f"oth{i}" for i in
                                               range(60)))])
    s1 = incremental_minhash_dedup(p1, store, strategy="cc").collect()
    s2 = incremental_minhash_dedup(p2, store, strategy="cc").collect()
    surviving = sorted(r["doc_id"] for r in s1) \
        + sorted(r["doc_id"] for r in s2)
    stored = sorted(r["_id"] for r in spark.read.parquet(store).collect())
    assert stored == sorted(surviving)
    assert stored == [1, 6]  # 2, 5 are near-dups of 1


def test_incremental_dedup_never_drops_history(spark, tmp_path):
    """History is immutable: even when a new doc bridges two historical
    docs, both stored docs remain in the store."""
    from gopie_spark.operators.dedup import incremental_minhash_dedup
    store = str(tmp_path / "sigs")
    t = " ".join(f"base{i}word" for i in range(60))
    t = t + " "
    p1 = _near_dup_corpus(spark, [(1, t + "one one one one"),
                                  (2, t + "two two two two")])
    incremental_minhash_dedup(p1, store, threshold=0.95,
                              strategy="cc").collect()
    before = sorted(r["_id"] for r in spark.read.parquet(store).collect())
    p2 = _near_dup_corpus(spark, [(9, t + "one one two two")])  # bridge
    surv = incremental_minhash_dedup(p2, store, threshold=0.8,
                                     strategy="cc").collect()
    after = sorted(r["_id"] for r in spark.read.parquet(store).collect())
    assert before == [1, 2]
    assert [r["doc_id"] for r in surv] == []   # bridge doc dropped
    assert after == before                      # history untouched


def test_dedup_corpus_job_incremental_mode(tmp_path):
    """jobs/dedup_corpus.py --incremental as a black box: two runs over
    disjoint halves with one --sig-dir produce together the same
    survivors as one full-batch run."""
    import json
    import os
    import subprocess
    import sys
    import duckdb

    con = duckdb.connect()
    half_dirs = []
    for i, pred in enumerate(("doc_id < 250", "doc_id >= 250")):
        p = str(tmp_path / f"half{i}")
        con.execute(f"""
            COPY (SELECT * FROM
                  read_parquet('/root/testdata/sf0.01/documents.parquet')
                  WHERE {pred}) TO '{p}' (FORMAT PARQUET)""")
        half_dirs.append(p)
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", PYTHONPATH="/root/repo")

    def run(extra):
        r = subprocess.run(
            [sys.executable, "jobs/dedup_corpus.py"] + extra,
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=400)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    sig = str(tmp_path / "sigs")
    inc_ids = []
    for i, h in enumerate(half_dirs):
        out = str(tmp_path / f"inc{i}")
        run(["--input", h, "--output", out, "--sig-dir", sig,
             "--incremental"])
        inc_ids += [r[0] for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{out}/*.parquet')"
        ).fetchall()]

    full_out = str(tmp_path / "full")
    run(["--input", "/root/testdata/sf0.01/documents.parquet",
         "--output", full_out])
    full_ids = [r[0] for r in con.execute(
        f"SELECT doc_id FROM read_parquet('{full_out}/*.parquet')"
    ).fetchall()]
    assert sorted(inc_ids) == sorted(full_ids)


# -- HLL precision fold -------------------------------------------------------

def test_hll_fold_equals_direct_build():
    """fold(build_at_p, p') must reproduce build_at_p' register-exactly
    wherever the old cap didn't engage (rank < (32-p)+1), and never
    exceed the direct build at capped registers; counts agree within
    the p' error bound; folding enables cross-precision union."""
    import numpy as np
    from gopie_spark.kernels import HLL
    vals = [f"doc{i}" for i in range(20_000)]
    hi, lo = HLL(p=14), HLL(p=11)
    st_hi = hi.update(hi.zero(), vals)
    st_lo = lo.update(lo.zero(), vals)
    folded = hi.fold(st_hi, 11)
    cap = (32 - 14) + 1
    uncapped = st_lo < cap
    assert np.array_equal(folded[uncapped], st_lo[uncapped])
    assert (folded <= st_lo).all()
    assert abs(lo.count(folded) - lo.count(st_lo)) <= \
        3 * lo.std_err * len(vals)
    # cross-precision union: fold then merge with a native p=11 sketch
    other = lo.update(lo.zero(), [f"x{i}" for i in range(5000)])
    union = lo.merge(folded, other.copy())
    exact = 25_000
    assert abs(lo.count(union) - exact) <= 3 * lo.std_err * exact + 5
    # identity fold and invalid targets
    assert np.array_equal(hi.fold(st_hi, 14), st_hi)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="cannot fold"):
        hi.fold(st_hi, 15)


def test_cosine_dedup_keeps_cluster_minimum(spark):
    """Embedding keep/drop tier: planted near-identical vector pairs
    collapse to the smallest id per cluster; distinct vectors survive."""
    import numpy as np
    from gopie_spark.operators.similarity import cosine_dedup
    rng = np.random.default_rng(7)
    a = rng.standard_normal(16)
    b = rng.standard_normal(16)
    rows = [(1, (a + 0.001 * rng.standard_normal(16)).tolist()),
            (2, (a + 0.001 * rng.standard_normal(16)).tolist()),
            (3, (a + 0.001 * rng.standard_normal(16)).tolist()),
            (10, b.tolist()),
            (11, (-b).tolist())]  # anti-parallel: cosine -1, no dup
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = sorted(r["vec_id"] for r in
                  cosine_dedup(spark, df, threshold=0.95).collect())
    assert kept == [1, 10, 11]
    kept_g = sorted(r["vec_id"] for r in
                    cosine_dedup(spark, df, threshold=0.95,
                                 strategy="greedy").collect())
    assert kept_g == [1, 10, 11]


def test_incremental_simhash_dedup_contract_on_real_corpus(spark,
                                                           tmp_path):
    """Two-phase incremental SimHash dedup over the real documents
    table honors the operator's guarantees: (a) it never drops a doc
    the full-batch cc run keeps (conservative-keep — the documented
    divergence is the REVERSE direction, a new doc whose only links
    were to already-dropped, non-stored docs surviving), (b) the
    retained corpus is pairwise near-dup-free (zero Hamming<=3 pairs
    among survivors), and (c) the store holds exactly the survivors'
    fingerprints."""
    from gopie_spark.operators.dedup import (incremental_simhash_dedup,
                                             simhash_candidates)
    from gopie_spark.operators.graph import connected_components
    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet").select("doc_id",
                                                          "text")
    store = str(tmp_path / "fps")
    p1, p2 = docs.filter("doc_id < 250"), docs.filter("doc_id >= 250")
    s1 = sorted(r["doc_id"] for r in
                incremental_simhash_dedup(p1, store).collect())
    s2 = sorted(r["doc_id"] for r in
                incremental_simhash_dedup(p2, store).collect())
    retained = set(s1 + s2)
    pairs = simhash_candidates(docs).select("id_a", "id_b")
    comp = connected_components(pairs)
    losers = {r["id"] for r in
              comp.filter(F.col("id") != F.col("component")).collect()}
    batch_kept = {r["doc_id"] for r in docs.collect()} - losers
    assert batch_kept <= retained          # (a) never over-drops
    kept_docs = docs.join(
        docs.sparkSession.createDataFrame(
            [(i,) for i in sorted(retained)], "doc_id long"),
        "doc_id", "left_semi")
    assert simhash_candidates(kept_docs).count() == 0  # (b) dup-free
    stored = sorted(r["_id"] for r in
                    spark.read.parquet(store).collect())
    assert stored == sorted(retained)      # (c) store == survivors


def test_streaming_heavy_hitters_matches_batch_mg(spark, tmp_path):
    """Per-key streaming Misra-Gries (state-store blob per key): the
    final emission per key equals a serial MG over that key's values
    in stream order, and the true per-key top value is present with a
    count within the emitted error bound of its exact frequency."""
    from gopie_spark.kernels import MisraGries
    from gopie_spark.streaming.stateful import streaming_heavy_hitters

    rows = []
    for i in range(600):
        lang = ["en", "de"][i % 2]
        tok = "hot" if i % 3 == 0 else f"t{i % 40}"
        rows.append((i, lang, tok))
    df = spark.createDataFrame(rows, "i long, lang string, tok string")
    src = str(tmp_path / "src")
    df.orderBy("i").coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src) \
        .select("lang", "tok")
    out = streaming_heavy_hitters(stream, "lang", "tok", k=16, top_n=3)
    q = (out.writeStream.format("memory").queryName("mg_stream")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from mg_stream").collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r["lang"], []).append(r)
    for lang in ("en", "de"):
        top1 = min(by_key[lang], key=lambda r: r["rank"])
        assert top1["value"] == "hot"
        exact = sum(1 for _, lg, t in rows if lg == lang and t == "hot")
        assert abs(top1["est_count"] - exact) <= top1["err"]
