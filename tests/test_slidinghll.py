"""Sliding HyperLogLog (kernels/slidinghll.py + sliding_hll_build).

Gates: every suffix-window estimate within the 3σ·1.04/√m HLL band
against exact; the cutoff=None registers equal a plain HLL built on the
same values (estimator parity); frontier-union merge is associative,
commutative, idempotent, and byte-stable (split == serial); the frontier
is a true Pareto set (no entry dominated by a newer >= rank) with the
expected O(ln n) entries per register; expire preserves every query at
or after the horizon; codec round-trips and refuses mismatches; the
distributed struct-column build equals the serial kernel byte-for-byte.
"""
import numpy as np
import pytest

from gopie_spark.kernels import HLL, SlidingHLL


def _data(n=40000, seed=3):
    rng = np.random.default_rng(seed)
    vals = np.array([f"u{i}" for i in range(n)], dtype=object)
    ts = rng.uniform(0.0, 1000.0, n)
    return vals, ts


def test_suffix_estimates_within_band():
    sh = SlidingHLL(p=12)
    vals, ts = _data()
    st = sh.update(sh.zero(), (vals, ts))
    for cutoff in (0.0, 250.0, 500.0, 900.0, 990.0):
        exact = int((ts >= cutoff).sum())       # unique values
        est = sh.count(st, cutoff=cutoff)
        assert abs(est - exact) <= 3 * sh.std_err * exact + 1


def test_full_window_matches_plain_hll():
    sh = SlidingHLL(p=11)
    hll = HLL(p=11)
    vals, ts = _data(8000)
    st = sh.update(sh.zero(), (vals, ts))
    plain = hll.update(hll.zero(), vals)
    assert (sh.registers(st) == plain).all()
    assert sh.count(st) == hll.count(plain)


def test_merge_gates_and_split_equals_serial():
    sh = SlidingHLL(p=10)
    vals, ts = _data(9000)
    whole = sh.update(sh.zero(), (vals, ts))
    parts = [sh.update(sh.zero(), (vals[i::3], ts[i::3])) for i in range(3)]
    ab_c = sh.merge(sh.merge(parts[0], parts[1]), parts[2])
    c_ba = sh.merge(parts[2], sh.merge(parts[1], parts[0]))
    assert sh.serialize(ab_c) == sh.serialize(c_ba) == sh.serialize(whole)
    assert sh.serialize(sh.merge(whole, whole)) == sh.serialize(whole)


def test_frontier_is_pareto_and_compact():
    sh = SlidingHLL(p=10)
    vals, ts = _data(50000)
    st = sh.update(sh.zero(), (vals, ts))
    reg, t, r = st["reg"], st["ts"], st["rank"]
    # no entry is dominated: within a register, strictly newer entries
    # have strictly smaller ranks (sorted by t desc => rank increasing)
    for g in np.unique(reg[:64]):
        sel = reg == g
        order = np.argsort(-t[sel])
        rr = r[sel][order]
        assert (np.diff(rr.astype(int)) > 0).all()
    # expected O(ln(n)) entries per register, generously bounded
    per_reg = st["reg"].size / sh.m
    assert per_reg <= 4 * np.log(50000 / sh.m)


def test_expire_preserves_queries_at_or_after_horizon():
    sh = SlidingHLL(p=11)
    vals, ts = _data(20000)
    st = sh.update(sh.zero(), (vals, ts))
    ex = sh.expire(st, 400.0)
    assert sh.n_entries(ex) < sh.n_entries(st)
    for cutoff in (400.0, 600.0, 950.0):
        assert sh.count(ex, cutoff) == sh.count(st, cutoff)


def test_codec_roundtrip_and_refusals():
    from gopie_spark.kernels import codec, sketch_from_blob
    sh = SlidingHLL(p=10)
    vals, ts = _data(3000)
    st = sh.update(sh.zero(), (vals, ts))
    blob = sh.serialize(st)
    rt = sh.deserialize(blob)
    assert sh.serialize(rt) == blob
    sh2 = sketch_from_blob(blob)
    assert (sh2.p, sh2.hash_name) == (sh.p, sh.hash_name)
    with pytest.raises(ValueError):
        SlidingHLL(p=12).deserialize(blob)
    with pytest.raises(ValueError):
        sh.deserialize(codec.pack(codec.KIND_HLL, [(1, b"x")]))
    bad = {"reg": np.array([sh.m + 1], dtype=np.uint32),
           "ts": np.array([1.0]), "rank": np.array([2], dtype=np.uint8)}
    with pytest.raises(ValueError, match="out of range"):
        sh.deserialize(sh.serialize(bad))


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_distributed_build_equals_serial(spark, sf_dir, parts):
    import pyspark.sql.functions as F
    from gopie_spark.operators import sliding_hll_build
    events = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .repartition(parts)
    sh, state = sliding_hll_build(events, "event_id", "ts", p=11)
    rows = events.select(F.col("event_id").cast("string"),
                         F.col("ts").cast("timestamp").cast("double")) \
        .collect()
    vals = np.array([r[0] for r in rows], dtype=object)
    ts = np.array([r[1] for r in rows])
    serial = sh.update(sh.zero(), (vals, ts))
    assert sh.serialize(state) == sh.serialize(serial)


def test_grouped_build(spark, sf_dir):
    """keys= path returns one state per group; each group's suffix
    estimate is within band of its exact count."""
    import pyspark.sql.functions as F
    from gopie_spark.operators import sliding_hll_build
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    sh, states = sliding_hll_build(events, "event_id", "ts", p=11,
                                   keys=["event_type"])
    exact = dict(events.groupBy("event_type").count().collect())
    for r in states.collect():
        st = sh.deserialize(bytes(r["sketch_state"]))
        est = sh.count(st)
        assert abs(est - exact[r["event_type"]]) \
            <= 3 * sh.std_err * exact[r["event_type"]] + 1


def test_update_list_input_with_null_value_and_nan_ts():
    # the documented non-Arrow (values, ts) path must FILTER a null
    # value / NaN timestamp, not crash boolean-masking a Python list
    sh = SlidingHLL(p=10)
    st = sh.update(sh.zero(), ([None, "a", "b"], [1.0, 2.0, float("nan")]))
    clean = sh.update(sh.zero(), (["a"], [2.0]))
    assert sh.serialize(st) == sh.serialize(clean)
