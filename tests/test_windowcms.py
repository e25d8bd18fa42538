"""Windowed Count-Min sketch (kernels/windowcms.py + the builds).

Gates: every trailing-window point estimate obeys the published CMS
bound (never undercounts; overcount <= 3 * epsilon * N_window on the
tested probes) against exact windowed counts; the whole-horizon matrix
equals a plain CMS built on the same values (counter parity); the
per-tick merge is associative, commutative, and byte-stable (split ==
serial) INCLUDING under live horizon pruning; expire preserves every
query at or after the horizon; codec round-trips (dense and sparse) and
refuses mismatches; the distributed struct-column build and the JVM
(token, tick) pre-agg build equal the serial kernel byte-for-byte.
"""
import numpy as np
import pytest

from gopie_spark.kernels import CMS, WindowCMS


def _stream(n=30000, vocab=300, seed=7):
    rng = np.random.default_rng(seed)
    ids = rng.zipf(1.3, size=n) % vocab
    vals = np.array([f"tok-{i}" for i in ids], dtype=object)
    ts = rng.uniform(0.0, 1000.0, n)
    return vals, ts


def _exact_window(vals, ts, wc, window_ticks, at_tick):
    tick = wc.tick_of(ts)
    live = (tick <= at_tick) & (tick > at_tick - window_ticks)
    out = {}
    for v in vals[live]:
        out[v] = out.get(v, 0) + 1
    return out, int(live.sum())


def test_window_estimates_obey_cms_bound():
    wc = WindowCMS(width=2719, depth=7, resolution=100.0, n_ticks=10)
    vals, ts = _stream()
    st = wc.update(wc.zero(), vals, ts)
    at = int(st["ticks"].max())
    probes = np.array([f"tok-{i}" for i in range(50)], dtype=object)
    for w in (1, 3, 10):
        exact, n_win = _exact_window(vals, ts, wc, w, at)
        assert wc.window_total(st, window_ticks=w) == n_win
        est = wc.estimate(st, probes, window_ticks=w)
        for p, e in zip(probes, est):
            true = exact.get(p, 0)
            assert e >= true                       # never undercounts
            assert e - true <= 3 * wc.epsilon * n_win


def test_full_horizon_matches_plain_cms():
    wc = WindowCMS(width=1024, depth=5, resolution=100.0, n_ticks=50)
    cms = CMS(width=1024, depth=5)
    vals, ts = _stream(8000)
    st = wc.update(wc.zero(), vals, ts)
    plain = cms.update(cms.zero(), vals)
    assert (st["mats"].sum(axis=0, dtype=np.uint64)
            == plain["matrix"]).all()
    assert wc.window_total(st) == cms.count(plain)


def test_merge_gates_and_split_equals_serial():
    wc = WindowCMS(width=512, depth=5, resolution=100.0, n_ticks=10)
    vals, ts = _stream(9000)
    whole = wc.update(wc.zero(), vals, ts)
    parts = [wc.update(wc.zero(), vals[i::3], ts[i::3]) for i in range(3)]
    ab_c = wc.merge(wc.merge(parts[0], parts[1]), parts[2])
    c_ba = wc.merge(parts[2], wc.merge(parts[1], parts[0]))
    assert wc.serialize(ab_c) == wc.serialize(c_ba) == wc.serialize(whole)


def test_merge_byte_stable_under_live_horizon_prune():
    """A part holding ONLY old ticks loses them to the prune whichever
    merge order brings in the newest tick — truncation-to-global-max
    composes exactly."""
    wc = WindowCMS(width=256, depth=4, resolution=10.0, n_ticks=3)
    old = wc.update(wc.zero(), ["a", "b"], [0.0, 11.0])     # ticks 0, 1
    mid = wc.update(wc.zero(), ["c"], [25.0])               # tick 2
    new = wc.update(wc.zero(), ["d"], [55.0])               # tick 5
    serial = wc.update(wc.zero(), ["a", "b", "c", "d"],
                       [0.0, 11.0, 25.0, 55.0])
    m1 = wc.merge(wc.merge(old, mid), new)
    m2 = wc.merge(old, wc.merge(mid, new))
    m3 = wc.merge(new, wc.merge(mid, old))
    assert wc.serialize(m1) == wc.serialize(m2) == wc.serialize(m3) \
        == wc.serialize(serial)
    assert list(m1["ticks"]) == [5]                          # horizon 3
    # the survivor's counts are intact
    assert wc.estimate(m1, ["d"])[0] == 1


def test_expire_preserves_queries_at_or_after_horizon():
    wc = WindowCMS(width=512, depth=5, resolution=100.0, n_ticks=10)
    vals, ts = _stream(10000)
    st = wc.update(wc.zero(), vals, ts)
    at = int(st["ticks"].max())
    ex = wc.expire(st, at - 4)
    assert ex["ticks"].size < st["ticks"].size
    probes = np.array([f"tok-{i}" for i in range(30)], dtype=object)
    for w in (1, 4):
        assert (wc.estimate(ex, probes, window_ticks=w)
                == wc.estimate(st, probes, window_ticks=w)).all()
        assert wc.window_total(ex, window_ticks=w) \
            == wc.window_total(st, window_ticks=w)


def test_codec_roundtrip_sparse_dense_and_refusals():
    from gopie_spark.kernels import codec, sketch_from_blob
    wc = WindowCMS(width=512, depth=5, resolution=100.0, n_ticks=10)
    vals, ts = _stream(200)          # sparse: few counters touched
    st = wc.update(wc.zero(), vals, ts)
    blob = wc.serialize(st)
    assert wc.serialize(wc.deserialize(blob)) == blob
    wc2 = sketch_from_blob(blob)
    assert (wc2.width, wc2.depth, wc2.resolution, wc2.n_ticks) \
        == (wc.width, wc.depth, wc.resolution, wc.n_ticks)
    # dense path: saturate enough counters that dense wins
    vals2, ts2 = _stream(60000, vocab=5000)
    st2 = wc.update(wc.zero(), vals2, ts2)
    blob2 = wc.serialize(st2)
    assert wc.serialize(wc.deserialize(blob2)) == blob2
    with pytest.raises(ValueError):
        WindowCMS(width=512, depth=5, resolution=50.0,
                  n_ticks=10).deserialize(blob)
    with pytest.raises(ValueError):
        wc.deserialize(codec.pack(codec.KIND_CMS, [(1, b"x")]))
    with pytest.raises(ValueError):
        WindowCMS(resolution=0.0)
    with pytest.raises(ValueError):
        WindowCMS(n_ticks=0)


def test_null_values_and_empty_batches_are_noops():
    wc = WindowCMS(width=256, depth=4, resolution=10.0, n_ticks=5)
    st = wc.update(wc.zero(), [], [])
    assert st["ticks"].size == 0
    st = wc.update(st, [None, "a", None], [1.0, 2.0, np.nan])
    assert wc.window_total(st) == 1
    assert wc.estimate(st, ["a"])[0] == 1


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_distributed_build_equals_serial(spark, sf_dir, parts):
    import pyspark.sql.functions as F
    from gopie_spark.operators import window_cms_build
    events = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .repartition(parts)
    wc, state = window_cms_build(events, "event_type", "ts",
                                 epsilon=0.005, delta=0.99,
                                 resolution=86400.0, n_ticks=60)
    rows = events.select(F.col("event_type").cast("string"),
                         F.col("ts").cast("timestamp").cast("double")) \
        .collect()
    vals = np.array([r[0] for r in rows], dtype=object)
    ts = np.array([r[1] for r in rows])
    serial = wc.update(wc.zero(), vals, ts)
    assert wc.serialize(state) == wc.serialize(serial)


def test_tokens_preagg_build_equals_serial(spark, sf_dir):
    """The JVM (token, tick) wordcount pre-agg build is byte-equal to
    feeding every raw (token, epoch) row through the kernel."""
    import pyspark.sql.functions as F
    from gopie_spark.operators import window_cms_tokens_build
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(2000)
    wc, state = window_cms_tokens_build(
        ev, text_col="props", ts_col="ts",
        epsilon=0.01, delta=0.99, resolution=86400.0, n_ticks=400)
    rows = (ev.select(
        F.explode(F.split("props", r"\s+")).alias("tok"),
        F.col("ts").cast("timestamp").cast("double").alias("e"))
        .filter(F.col("tok") != "").collect())
    vals = np.array([r["tok"] for r in rows], dtype=object)
    ts = np.array([r["e"] for r in rows])
    serial = wc.update(wc.zero(), vals, ts)
    assert wc.serialize(state) == wc.serialize(serial)


def test_update_list_input_with_null_value_and_nan_ts():
    from gopie_spark.kernels import WindowCMS
    wc = WindowCMS(width=64, depth=3, resolution=1.0, n_ticks=10)
    st = wc.update(wc.zero(), ([None, "a", "b"], [1.0, 2.0, float("nan")]))
    clean = wc.update(wc.zero(), (["a"], [2.0]))
    assert wc.serialize(st) == wc.serialize(clean)


def test_tokens_build_null_ts_rows_are_dropped_deterministically(spark):
    """Rows with a null timestamp must not reach the kernel as a
    NaN->int64 garbage tick: the build filters them JVM-side."""
    from gopie_spark.operators import window_cms_tokens_build
    df = spark.createDataFrame(
        [("a b a", 86400.0), ("b c", None), ("a", 86400.0 * 2)],
        "text string, e double").selectExpr(
            "text", "cast(e as timestamp) as ts")
    wc, st = window_cms_tokens_build(df, text_col="text", ts_col="ts",
                                     epsilon=0.01, delta=0.99,
                                     resolution=86400.0, n_ticks=10)
    clean = wc.update(wc.zero(),
                      np.array(["a", "b", "a", "a"], dtype=object),
                      np.array([86400.0, 86400.0, 86400.0, 86400.0 * 2]))
    assert wc.serialize(st) == wc.serialize(clean)


def test_grouped_build_forwards_coalesce_to(spark, sf_dir):
    """keys= + coalesce_to must bound partial count AND stay correct."""
    import pyspark.sql.functions as F
    from gopie_spark.operators import window_cms_build
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(3000) \
        .repartition(8)
    wc, states = window_cms_build(ev, "event_id", "ts",
                                  epsilon=0.01, delta=0.9,
                                  resolution=86400.0, n_ticks=400,
                                  keys=["event_type"], coalesce_to=2)
    exact = dict(ev.groupBy("event_type").count().collect())
    for r in states.collect():
        st = wc.deserialize(bytes(r["sketch_state"]))
        n = wc.window_total(st)
        assert n == exact[r["event_type"]]
