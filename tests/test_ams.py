"""AMS F2 sketch: kernel properties + Spark sketch_agg integration.

F2 = Σ f² (self-join size).  Gates: estimate within 4·sqrt(2/n_means)
of exact (the single-mean Chebyshev bound; the median only tightens
it), merge == serial byte-equal under any partition split, blob
roundtrip, shape/garbage refusal.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from gopie_spark.kernels import AMS
from gopie_spark.operators.sketch_agg import (STATE_COL, global_sketch,
                                              sketch_agg)


def test_ams_kernel_bound_and_merge():
    rng = np.random.default_rng(11)
    vals = np.array([f"key{i}" for i in range(500)], dtype=object)
    cnts = (rng.zipf(1.7, size=500) % 1000 + 1).astype(np.int64)
    f2 = float((cnts.astype(np.float64) ** 2).sum())
    ams = AMS(n_means=64, n_medians=5)
    st = ams.update(ams.zero(), vals, cnts)
    est = ams.estimate(st)
    assert abs(est - f2) <= 4 * ams.rel_err * f2
    # linearity: any split merges to the identical state
    for cut in (1, 137, 499):
        a = ams.update(ams.zero(), vals[:cut], cnts[:cut])
        b = ams.update(ams.zero(), vals[cut:], cnts[cut:])
        assert np.array_equal(ams.merge(a, b)["z"], st["z"])
    # roundtrip + refusals
    blob = ams.serialize(st)
    rt = ams.deserialize(blob)
    assert np.array_equal(rt["z"], st["z"])
    with pytest.raises(ValueError):
        AMS(n_means=32).deserialize(blob)
    with pytest.raises(Exception):
        ams.deserialize(b"\x00garbage")


def test_ams_spark_distributed_equals_serial(spark, sf_dir):
    """sketch_agg partial/merge over the real events table == one
    serial kernel pass, byte-equal; estimate within the bound of the
    exact F2 (self-join size of event_type)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select(F.col("event_type").alias("v"))
    ams = AMS(n_means=64, n_medians=5)
    st = global_sketch(ev, "v", ams)
    rows = [(r["v"], r["cnt"]) for r in
            ev.groupBy("v").agg(F.count("*").alias("cnt")).collect()]
    vals = np.array([r[0] for r in rows], dtype=object)
    cnts = np.array([r[1] for r in rows], dtype=np.int64)
    serial = ams.update(ams.zero(), vals, cnts)
    assert np.array_equal(st["z"], serial["z"])
    f2 = float((cnts.astype(np.float64) ** 2).sum())
    assert abs(ams.estimate(st) - f2) <= 4 * ams.rel_err * f2


def test_ams_grouped_sketch_agg(spark, sf_dir):
    """Grouped AMS per lang: each group's estimate within the bound of
    its exact per-group F2 over doc sources."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ams = AMS(n_means=64, n_medians=5)
    states = {r["lang"]: bytes(r[STATE_COL]) for r in
              sketch_agg(docs.select("lang", F.col("source").alias("v")),
                         ["lang"], "v", ams).collect()}
    exact = {}
    for r in docs.groupBy("lang", "source").count().collect():
        exact.setdefault(r["lang"], []).append(r["count"])
    assert set(states) == set(exact)
    for lang, blob in states.items():
        est = ams.estimate(ams.deserialize(blob))
        f2 = float(np.sum(np.asarray(exact[lang], dtype=np.float64) ** 2))
        assert abs(est - f2) <= 4 * ams.rel_err * f2, lang


def test_ams_windowed_and_streaming(spark, sf_dir, tmp_path):
    """AMS composes with the generic tiers: per-window states equal the
    batch windowed aggregation, and the micro-batch-merged streaming
    state equals the one-shot batch state byte-for-byte (AMS is a
    counter-style sketch — replay safety comes from StreamingSketch's
    committed-batch-id guard)."""
    from gopie_spark.operators.windows import windowed_sketch_agg
    from gopie_spark.sources.pages import generate_pages
    from gopie_spark.streaming import StreamingSketch

    ams = AMS(n_means=32, n_medians=3)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    win = windowed_sketch_agg(ev, "ts", "event_type", ams,
                              width_s=6 * 3600)
    rows = win.collect()
    assert len(rows) > 1
    for r in rows:
        st = ams.deserialize(bytes(r[STATE_COL]))
        assert ams.estimate(st) > 0

    src = str(tmp_path / "ams_stream")
    generate_pages(src, 1500, n_files=3, seed=13)
    df_all = spark.read.parquet(src)
    want = global_sketch(df_all.select(F.col("lang").alias("v")),
                         "v", ams)
    ss = StreamingSketch(spark, ams, [], "v", str(tmp_path / "st"))
    q = ss.attach(spark.readStream.schema(df_all.schema).parquet(src)
                  .select(F.col("lang").alias("v")))
    q.awaitTermination(120)
    got = ams.deserialize(
        bytes(ss.current_states().collect()[0][STATE_COL]))
    import numpy as np
    assert np.array_equal(got["z"], want["z"])
    assert got["count"][0] == want["count"][0]


def test_ams_inner_product_join_size():
    """AGMS join-size estimation: two columns over a shared key domain,
    estimate within the 4-sigma product bound; shared-seed requirement
    enforced; distributed split-merge states give the identical
    estimate (linearity)."""
    rng = np.random.default_rng(7)
    ams = AMS(n_means=256, n_medians=5)
    keys = np.array([f"u{i}" for i in range(300)], dtype=object)
    fa = (rng.zipf(1.5, 300) % 40 + 1).astype(np.int64)
    fb = (rng.zipf(1.5, 300) % 25 + 1).astype(np.int64)
    sa = ams.update(ams.zero(), keys, fa)
    sb = ams.update(ams.zero(), keys, fb)
    exact = float((fa * fb).sum())
    est = ams.inner_product(sa, sb)
    assert abs(est - exact) <= ams.inner_product_bound(sa, sb)
    # split-merge linearity: same estimate from merged partials
    h1 = ams.update(ams.zero(), keys[:150], fa[:150])
    h2 = ams.update(ams.zero(), keys[150:], fa[150:])
    assert ams.inner_product(ams.merge(h1, h2), sb) == est
    with pytest.raises(ValueError):
        ams.inner_product(sa, AMS(n_means=32, n_medians=5).zero())
