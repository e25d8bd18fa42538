"""Theta/KMV sketch: kernel properties + Spark sketch_agg integration.

Gates: distinct estimate within 4/sqrt(k-2) of exact in the theta tier
and EXACT below k; set-algebra estimates (union / intersect / diff)
within their derived 4-sigma bounds; merge == serial byte-equal under
any split (min-k of a union is associative); blob roundtrip + refusals;
distributed == serial byte-equal through sketch_agg; composition with
the windowed and streaming tiers.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gopie_spark.kernels import Theta
from gopie_spark.operators.sketch_agg import (STATE_COL, global_sketch,
                                              sketch_agg)


def _build(t, vals, chunks=5):
    st = t.zero()
    for c in np.array_split(np.asarray(vals, dtype=object), chunks):
        if len(c):
            t.update(st, list(c))
    return st


def test_theta_kernel_estimate_bounds():
    t = Theta(k=1024)
    # theta tier: n >> k
    st = _build(t, [f"u-{i}" for i in range(20000)])
    est = t.estimate(st)
    assert abs(est - 20000) <= 4 * t.rel_err * 20000
    # exact tier: n < k retains every hash
    small = _build(t, [f"s-{i}" for i in range(700)] * 3)  # dup-blind
    assert t.estimate(small) == 700.0


def test_theta_set_algebra_bounds():
    t = Theta(k=1024)
    A = [f"x-{i}" for i in range(5000)]
    B = [f"x-{i}" for i in range(3000, 9000)]
    sa, sb = _build(t, A), _build(t, B)
    cases = [
        (t.union_estimate(sa, sb), 9000, t.union_bound(sa, sb)),
        (t.intersect_estimate(sa, sb), 2000, t.intersect_bound(sa, sb)),
        (t.diff_estimate(sa, sb), 3000, t.diff_bound(sa, sb)),
        (t.diff_estimate(sb, sa), 4000, t.diff_bound(sb, sa)),
    ]
    for est, exact, bound in cases:
        assert abs(est - exact) <= bound, (est, exact, bound)
    j = t.jaccard_estimate(sa, sb)
    assert abs(j - 2000 / 9000) <= 4 * np.sqrt(j * (1 - j) / t.k) + 0.01


def test_theta_merge_byte_associative_and_idempotent():
    t = Theta(k=256)
    vals = [f"v-{i % 900}" for i in range(5000)]  # dups across splits
    serial = t.serialize(_build(t, vals, chunks=1))
    for chunks in (2, 3, 8):
        parts = np.array_split(np.asarray(vals, dtype=object), chunks)
        states = [_build(t, list(p), chunks=1) for p in parts]
        merged = states[0]
        for s in states[1:]:
            merged = t.merge(merged, s)
        assert t.serialize(merged) == serial
    # idempotent: A u A == A
    a = _build(t, vals[:2000])
    b = t.deserialize(t.serialize(a))
    assert t.serialize(t.merge(a, b)) == t.serialize(
        t.deserialize(t.serialize(b)))


def test_theta_codec_roundtrip_and_refusals():
    t = Theta(k=128)
    st = _build(t, [f"r-{i}" for i in range(300)])
    blob = t.serialize(st)
    assert np.array_equal(t.deserialize(blob)["hashes"], st["hashes"])
    assert Theta.from_blob(blob).k == 128
    with pytest.raises(ValueError):
        Theta(k=64).deserialize(blob)
    with pytest.raises(Exception):
        t.deserialize(b"\x00garbage")


def test_theta_spark_distributed_equals_serial(spark, sf_dir):
    """sketch_agg partial/merge over the events table == one serial
    kernel pass, byte-equal (strongest merge gate: the state IS the
    k smallest hashes, identical under any partitioning)."""
    t = Theta(k=512)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select(F.col("event_id").cast("string").alias("v"))
    st = global_sketch(ev, "v", t)
    vals = [r["v"] for r in ev.collect()]
    serial = _build(t, vals, chunks=1)
    assert t.serialize(st) == t.serialize(serial)
    n_exact = len(set(vals))
    assert abs(t.estimate(st) - n_exact) <= 4 * t.rel_err * n_exact


def test_theta_grouped_union_reuse(spark, sf_dir):
    """Per-lang states built once; any lang-subset distinct answered by
    merging states (no rescan), estimate within bound of exact union."""
    t = Theta(k=512)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    states = {r["lang"]: t.deserialize(bytes(r[STATE_COL])) for r in
              sketch_agg(docs.select(
                  "lang", F.col("doc_id").cast("string").alias("v")),
                  ["lang"], "v", t).collect()}
    langs = sorted(states)[:2]
    merged = t.merge(t.deserialize(t.serialize(states[langs[0]])),
                     states[langs[1]])
    exact = docs.filter(F.col("lang").isin(langs)) \
        .select("doc_id").distinct().count()
    assert abs(t.estimate(merged) - exact) <= \
        max(4 * t.rel_err * exact, 1.0)


def test_theta_windowed_and_sql_surface(spark, sf_dir):
    """Theta composes with windowed_sketch_agg, and the
    gopie_theta_estimate SQL finalizer reads the states."""
    from gopie_spark.functions.sql import register_sql_functions
    from gopie_spark.operators.windows import windowed_sketch_agg

    t = Theta(k=256)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    win = windowed_sketch_agg(ev, "ts", "user_id", t, width_s=6 * 3600)
    register_sql_functions(spark)
    win.createOrReplaceTempView("theta_win")
    rows = spark.sql(
        "SELECT window_start, gopie_theta_estimate(sketch_state) AS n "
        "FROM theta_win").collect()
    assert len(rows) > 1
    exact = {r["ws"]: r["n"] for r in ev.groupBy(
        F.window("ts", "6 hours").start.alias("ws")).agg(
        F.countDistinct("user_id").alias("n")).collect()}
    for r in rows:
        ex = exact[r["window_start"]]
        assert abs(r["n"] - ex) <= max(4 * t.rel_err * ex, 1.0)


def test_theta_pairwise_sql_surface(spark, sf_dir):
    """gopie_theta_union/intersect/jaccard over a self-joined state
    table: pairwise host/source overlap answered entirely in SQL —
    exact-tier states, so union == exact union and the estimates agree
    with the kernel's driver-side values."""
    from gopie_spark.functions.sql import register_sql_functions
    register_sql_functions(spark)
    t = Theta(k=512)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    states = sketch_agg(docs.select(
        "source", F.col("doc_id").cast("string").alias("v")),
        ["source"], "v", t)
    states.createOrReplaceTempView("theta_src")
    rows = spark.sql("""
        SELECT a.source AS sa, b.source AS sb,
               gopie_theta_union(a.sketch_state, b.sketch_state) AS u,
               gopie_theta_intersect(a.sketch_state,
                                     b.sketch_state) AS i,
               gopie_theta_jaccard(a.sketch_state, b.sketch_state) AS j
        FROM theta_src a JOIN theta_src b ON a.source < b.source
    """).collect()
    assert rows
    kern_states = {r["source"]: t.deserialize(bytes(r[STATE_COL]))
                   for r in states.collect()}
    exact = {r["source"]: {x["doc_id"] for x in
                           docs.filter(F.col("source") == r["source"])
                           .select("doc_id").collect()}
             for r in states.collect()}
    for r in rows:
        a, b = exact[r["sa"]], exact[r["sb"]]
        # doc_id sets are disjoint across sources and < k: exact tier
        assert r["u"] == float(len(a | b))
        assert r["i"] == t.intersect_estimate(kern_states[r["sa"]],
                                              kern_states[r["sb"]])
        assert r["j"] == t.jaccard_estimate(kern_states[r["sa"]],
                                            kern_states[r["sb"]])


def test_theta_streaming_equals_batch(spark, tmp_path):
    """Micro-batch-merged streaming state == one-shot batch state
    byte-equal (theta merge is idempotent AND associative, so replay
    is doubly safe; the committed-batch-id guard still applies)."""
    from gopie_spark.sources.pages import generate_pages
    from gopie_spark.streaming import StreamingSketch

    t = Theta(k=512)
    src = str(tmp_path / "theta_stream")
    generate_pages(src, 1200, n_files=3, seed=5)
    df_all = spark.read.parquet(src)
    want = global_sketch(df_all.select(F.col("url").alias("v")), "v", t)
    ss = StreamingSketch(spark, t, [], "v", str(tmp_path / "st"))
    q = ss.attach(spark.readStream.schema(df_all.schema).parquet(src)
                  .select(F.col("url").alias("v")))
    q.awaitTermination(120)
    got = t.deserialize(
        bytes(ss.current_states().collect()[0][STATE_COL]))
    assert t.serialize(got) == t.serialize(want)
