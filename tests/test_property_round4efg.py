"""Hypothesis properties for the round-4e/4f/4g kernels (DDSketch,
CountSketch, WeightedMinHash, CuckooFilter, SlidingHLL, WindowCMS,
AMS): randomized inputs + arbitrary partition splits must preserve the
kernels' DETERMINISTIC guarantees — split-merge byte-equality (the
merge-associativity currency of the whole engine), exact inversions,
the DDSketch alpha band, the CMS one-sided floor, and the sliding-HLL
"suffix registers == plain HLL of the suffix" structural identity.
Probabilistic guarantees (error bands that hold with probability
1 - delta) are certified in the driver queries, NOT here — hypothesis
would hunt down the legitimate tail cases."""
import numpy as np
from hypothesis import given, settings, strategies as st

from gopie_spark.kernels import (AMS, HLL, CountSketch, CuckooFilter,
                                 DDSketch, SlidingHLL, WeightedMinHash,
                                 WindowCMS)

tokens = st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                  min_size=1, max_size=120)
n_parts = st.integers(2, 6)


def _split(seq, k):
    """Deterministic k-way round-robin split (covers uneven sizes)."""
    return [seq[i::k] for i in range(k)]


def _obj(vals):
    return np.asarray(vals, dtype=object)


# --------------------------------------------------------------------------
# DDSketch
# --------------------------------------------------------------------------

values = st.lists(st.floats(min_value=-1e6, max_value=1e6,
                            allow_nan=False, allow_infinity=False),
                  min_size=1, max_size=150)


@settings(max_examples=25, deadline=None)
@given(values, n_parts)
def test_ddsketch_split_merge_byte_equal(vals, k):
    dd = DDSketch(alpha=0.02, max_bins=64)
    serial = dd.update(dd.zero(), vals)
    parts = [dd.update(dd.zero(), p) for p in _split(vals, k) if p]
    merged = parts[0]
    for p in parts[1:]:
        merged = dd.merge(merged, p)
    assert dd.serialize(merged) == dd.serialize(serial)


@settings(max_examples=25, deadline=None)
@given(values, st.sampled_from([0.25, 0.5, 0.75, 0.99]))
def test_ddsketch_alpha_band_holds(vals, q):
    """The relative-error guarantee is DETERMINISTIC (not
    probabilistic) as long as no low-end collapse happened — use
    max_bins large enough that it never does here.  Exact rank uses
    the kernel's own convention: 1-indexed rank floor(q*(n-1)) + 1."""
    dd = DDSketch(alpha=0.02, max_bins=4096)
    state = dd.update(dd.zero(), vals)
    est = float(dd.quantile(state, np.array([q]))[0])
    arr = np.sort(np.asarray(vals, dtype=np.float64))
    exact = float(arr[int(np.floor(q * (len(arr) - 1)))])
    if abs(exact) < dd.min_value:
        assert abs(est) <= dd.min_value
    else:
        assert abs(est - exact) <= dd.alpha * abs(exact) + 1e-9


# --------------------------------------------------------------------------
# CountSketch
# --------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(tokens, n_parts)
def test_countsketch_split_merge_byte_equal(vals, k):
    cs = CountSketch(width=64, depth=3)
    serial = cs.update(cs.zero(), _obj(vals))
    merged = cs.zero()
    for p in _split(vals, k):
        if p:
            merged = cs.merge(merged, cs.update(cs.zero(), _obj(p)))
    assert cs.serialize(merged) == cs.serialize(serial)


@settings(max_examples=25, deadline=None)
@given(tokens, tokens)
def test_countsketch_subtract_inverts_merge(a_vals, b_vals):
    """Integer counters: (A + B) - B == A exactly, for ANY streams —
    the linearity that makes the drift report's difference sketch."""
    cs = CountSketch(width=64, depth=3)
    a = cs.update(cs.zero(), _obj(a_vals))
    b = cs.update(cs.zero(), _obj(b_vals))
    ab = cs.merge({"matrix": a["matrix"].copy(),
                   "count": a["count"].copy()}, b)
    back = cs.subtract(ab, b)
    assert cs.serialize(back) == cs.serialize(a)


# --------------------------------------------------------------------------
# WeightedMinHash (disjoint-feature split: merge = pointwise max weight)
# --------------------------------------------------------------------------

weighted = st.dictionaries(
    st.integers(0, 2**32),   # features are pre-hashed uint64 ids
    st.floats(min_value=0.1, max_value=50.0, allow_nan=False),
    min_size=1, max_size=40)


@settings(max_examples=25, deadline=None)
@given(weighted, n_parts)
def test_wminhash_disjoint_split_merge_byte_equal(wmap, k):
    wm = WeightedMinHash(k=16)
    feats = np.asarray(sorted(wmap), dtype=np.uint64)
    w = np.asarray([wmap[f] for f in sorted(wmap)], dtype=np.float64)
    serial = wm.update_weighted(wm.zero(), feats, w)
    merged = wm.zero()
    for i in range(k):
        part = slice(i, None, k)
        if feats[part].size:
            merged = wm.merge(
                merged, wm.update_weighted(wm.zero(), feats[part], w[part]))
    assert wm.serialize(merged) == wm.serialize(serial)
    # identical signatures estimate J_w = 1 with themselves
    sig = (serial["feat"], serial["t"])
    assert WeightedMinHash.estimate(sig, sig) == 1.0


# --------------------------------------------------------------------------
# CuckooFilter (canonical entry-multiset transport)
# --------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(tokens, n_parts, st.integers(0, 3))
def test_cuckoo_split_merge_and_subtract(vals, k, drop_mod):
    cf = CuckooFilter.from_guess(n=max(64, len(vals)), p=0.01)
    serial = cf.update(cf.zero(), _obj(vals))
    merged = cf.zero()
    for p in _split(vals, k):
        if p:
            merged = cf.merge(merged, cf.update(cf.zero(), _obj(p)))
    assert cf.serialize(merged) == cf.serialize(serial)

    # distributed delete: strict sub-multiset subtract, then probing
    # the SURVIVING multiset must answer true for every survivor
    removed = [v for i, v in enumerate(vals) if i % 4 == drop_mod]
    survivors = list(vals)
    for v in removed:
        survivors.remove(v)
    after = cf.subtract(merged, cf.update(cf.zero(), _obj(removed)))
    assert cf.n(after) == len(survivors)
    if survivors:
        assert bool(cf.exist(after, _obj(survivors)).all())


# --------------------------------------------------------------------------
# SlidingHLL (suffix registers == plain HLL of the suffix, any cutoff)
# --------------------------------------------------------------------------

timed_rows = st.lists(
    st.tuples(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
              st.floats(min_value=0.0, max_value=1000.0,
                        allow_nan=False)),
    min_size=1, max_size=120)


@settings(max_examples=25, deadline=None)
@given(timed_rows, n_parts, st.floats(min_value=0.0, max_value=1000.0))
def test_slidinghll_suffix_equals_plain_hll(rows, k, cutoff):
    sh = SlidingHLL(p=6)
    vals = _obj([r[0] for r in rows])
    ts = np.asarray([r[1] for r in rows], dtype=np.float64)
    serial = sh.update(sh.zero(), (vals, ts))
    merged = sh.zero()
    for i in range(k):
        part = slice(i, None, k)
        if vals[part].size:
            merged = sh.merge(
                merged, sh.update(sh.zero(), (vals[part], ts[part])))
    assert sh.serialize(merged) == sh.serialize(serial)

    hll = HLL(p=6, hash_name=sh.hash_name)
    suffix_vals = vals[ts >= cutoff]
    plain = hll.update(hll.zero(), suffix_vals)
    assert np.array_equal(sh.registers(merged, cutoff), plain)


# --------------------------------------------------------------------------
# WindowCMS (tick-sum floor + split-merge byte-equality)
# --------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(timed_rows, n_parts, st.integers(1, 8))
def test_windowcms_split_merge_and_floor(rows, k, window):
    wc = WindowCMS(width=64, depth=3, resolution=100.0, n_ticks=16)
    vals = _obj([r[0] for r in rows])
    ts = np.asarray([r[1] for r in rows], dtype=np.float64)
    serial = wc.update(wc.zero(), vals, ts)
    merged = wc.zero()
    for i in range(k):
        part = slice(i, None, k)
        if vals[part].size:
            merged = wc.merge(
                merged, wc.update(wc.zero(), vals[part], ts[part]))
    assert wc.serialize(merged) == wc.serialize(serial)

    # one-sided floor is DETERMINISTIC: est >= exact count per window,
    # and the window total is exactly the window's item count (ticks
    # inside the retained horizon here by construction)
    ticks = wc.tick_of(ts)
    at = int(ticks.max())
    live = (ticks <= at) & (ticks > at - window)
    probe = sorted(set(np.asarray(vals[live]).tolist()))
    if probe:
        est = wc.estimate(merged, _obj(probe), window_ticks=window)
        exact = np.asarray(
            [int(np.sum(vals[live] == p)) for p in probe])
        assert (est.astype(np.int64) >= exact).all()
    assert wc.window_total(merged, window_ticks=window) == int(live.sum())


# --------------------------------------------------------------------------
# AMS (linear counters: split-merge byte-equality, symmetric product)
# --------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(tokens, tokens, n_parts)
def test_ams_split_merge_and_symmetry(a_vals, b_vals, k):
    ams = AMS(n_means=16, n_medians=3)
    serial = ams.update(ams.zero(), _obj(a_vals))
    merged = ams.zero()
    for p in _split(a_vals, k):
        if p:
            merged = ams.merge(merged, ams.update(ams.zero(), _obj(p)))
    assert ams.serialize(merged) == ams.serialize(serial)

    other = ams.update(ams.zero(), _obj(b_vals))
    assert ams.inner_product(merged, other) == \
        ams.inner_product(other, merged)
